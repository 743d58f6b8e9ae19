"""Relational-core declared queries (SURVEY.md §2.2–§2.8).

Each query is the Spark-first expression of one reference operator, run on
the TPC-H-ish fixtures, with a DuckDB oracle. Determinism contract (the
driver value-hashes results):

* money aggregates: per-row products stay double (both engines compute the
  identical IEEE value), cross-row sums go through DECIMAL(18,4) — exact,
  order-independent — then cast back to DOUBLE for a stable schema;
* every window/arg-max has a total order (unique tie-break key);
* no engine-specific functions in the oracle; SQL mirrors the Spark plan
  structurally.

Scale notes appear per query: what broadcasts, what shuffles, what prunes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from w4h_etl_container_spark.session import read_events, read_table
from w4h_etl_container_spark.plans.registry import register

# revenue per line item: exact 4-decimal value computed identically in both
# engines (2dp price × (1 − 2dp discount) has ≤ 4 decimals)
_REV_SQL = "l_extendedprice * (1.0 - l_discount)"


def _rev():
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


def _dec_sum(col, alias):
    """Order-independent sum of a ≤4-decimal double: exact decimal add."""
    return F.sum(col.cast("decimal(18,4)")).cast("double").alias(alias)


# ---------------------------------------------------------------------------
# PRJ-1 — column projection with pushed-down predicate
# ---------------------------------------------------------------------------
@register(
    "q_prj_select",
    sql=f"""
    SELECT l_orderkey, l_linenumber, l_quantity, {_REV_SQL} AS revenue
    FROM lineitem
    WHERE l_returnflag = 'R'
    """,
    survey_ids=("PRJ-1", "SF-1"),
    gate=False,
)
def q_prj_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRJ-1 (reference ``main.py:83-103``): select named columns + derived
    arithmetic. Scale: Catalyst prunes the scan to 5 of 11 columns and
    pushes ``l_returnflag = 'R'`` into the parquet reader (row-group skip).

    Library tier: PRJ-1/SF-1 stay gate-checked via
    ``q_sql_pricing_summary`` (same pruned-scan + pushed-filter shape);
    this slot went to the corpus-pipeline operators (plans/corpus.py).
    """
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_linenumber", "l_quantity", _rev().alias("revenue"))
    )


# ---------------------------------------------------------------------------
# PRJ-2 — ordinal slice (isel analog)
# ---------------------------------------------------------------------------
@register(
    "q_prj_slice",
    sql="""
    SELECT event_id, ts, user_id, value
    FROM (
      SELECT event_id, ts, user_id, value,
             row_number() OVER (ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn BETWEEN 2 AND 121
    """,
    survey_ids=("PRJ-2", "SRT-1", "SRT-2"),
)
def q_prj_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRJ-2 (reference ``isel(time=slice(1,121))``, ``main.py:97``):
    positional slice from the stream head — take the first 121 rows in
    event-time order, drop the head row (the reference's exact hour-0
    drop), keep 120.

    Spark-first shape with NO window at all: ``orderBy().limit(121)``
    plans TakeOrderedAndProject — per-partition top-k heaps merged at the
    driver, never a global sort or a single-task unpartitioned window
    (round-1's ``WindowExec: No Partition Defined`` finding). The head
    row is then removed by a broadcast anti-join on its unique key
    (min over (ts, event_id) structs — deterministic total order). At
    100 TB the heap merge touches k rows per partition and nothing
    else."""
    ev = read_events(spark, sf_dir)
    head = (
        ev.select("event_id", "ts", "user_id", "value")
        .orderBy("ts", "event_id")
        .limit(121)
    )
    first_key = head.agg(F.min(F.struct("ts", "event_id")).alias("k")).select("k.event_id")
    return head.join(F.broadcast(first_key), "event_id", "left_anti")


# ---------------------------------------------------------------------------
# PRJ-3 — range predicate on keys (bounding box analog)
# ---------------------------------------------------------------------------
@register(
    "q_prj_range",
    sql="""
    SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_quantity >= 10.0 AND l_quantity <= 20.0
    """,
    survey_ids=("PRJ-3", "FLT-3"),
)
def q_prj_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRJ-3 (reference ``sel(lat=slice(S,N), lon=slice(W,E))``,
    ``main.py:98-100``): conjunctive range predicate on key columns.
    Scale: both ranges reach the parquet scan as min/max row-group filters;
    on a date-partitioned table the shipdate range prunes whole partitions.
    """
    li = read_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & F.col("l_quantity").between(10.0, 20.0)
    ).select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")


# ---------------------------------------------------------------------------
# FLT-1 — mask semi-join filter
# ---------------------------------------------------------------------------
@register(
    "q_flt_semi",
    sql="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    """,
    survey_ids=("FLT-1", "JOIN-3"),
    gate=False,
)
def q_flt_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLT-1 (reference near-land gate ``main.py:291-292``): emit only rows
    whose key appears in a filter set — LEFT SEMI JOIN. Scale: the filter
    side aggregates to distinct keys first; Spark broadcasts it when small
    (the reference's 1M-cell mask fits comfortably), else shuffles both
    sides on the key.
    """
    cust = read_table(spark, sf_dir, "customer")
    keys = read_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select("o_custkey")
    return cust.join(
        F.broadcast(keys), cust.c_custkey == keys.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_acctbal")


# ---------------------------------------------------------------------------
# FLT-3 — retention clip (watermark-style)
# ---------------------------------------------------------------------------
@register(
    "q_flt_retention",
    sql="""
    SELECT event_id, ts, user_id, event_type
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
    """,
    survey_ids=("FLT-3",),
    gate=False,
)
def q_flt_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLT-3 (reference retention clip ``main.py:246-250``): drop rows
    older than the retention cutoff before merging. Scale: pure pushed
    predicate; on a ts-partitioned snapshot this is partition pruning, the
    dominant cost saver for the 100 TB snapshot table.

    Library tier: FLT-3's pushed-range shape stays gate-checked via
    ``q_prj_range`` (tagged FLT-3) and the streaming retention ops; this
    slot went to the corpus-pipeline operators (plans/corpus.py)."""
    ev = read_events(spark, sf_dir)
    return ev.where(F.col("ts") >= F.lit("2024-01-20 00:00:00").cast("timestamp")).select(
        "event_id", "ts", "user_id", "event_type"
    )


# ---------------------------------------------------------------------------
# FLT-2 — global null-slice drop (the dropna("time") gate)
# ---------------------------------------------------------------------------
@register(
    "q_flt_dropna",
    sql="""
    WITH seeded AS (
      SELECT event_id, ts, user_id, date_trunc('hour', ts) AS hts,
             CASE WHEN event_id % 37 = 5 THEN NULL ELSE value END AS v
      FROM events
    ), clean AS (
      SELECT hts FROM seeded
      GROUP BY hts
      HAVING max(CASE WHEN v IS NULL THEN 1 ELSE 0 END) = 0
    )
    SELECT event_id, ts, user_id, v
    FROM seeded WHERE hts IN (SELECT hts FROM clean)
    """,
    survey_ids=("FLT-2",),
)
def q_flt_dropna(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLT-2 (reference ``data.dropna('time')``, ``main.py:402``): a time
    label dies if ANY cell is null at that label — a global-per-timestep
    predicate, NOT a per-row dropna (SURVEY §4's flagged subtle-semantics
    risk). Nulls are seeded deterministically (event_id % 37 = 5) so the
    gate's behavior is oracle-pinned on real null inputs.

    Spark shape is ``operators.gates.drop_incomplete_timesteps``: one
    aggregate per timestep (bounded cardinality: hours) and a broadcast
    semi-join back — survives any grid width at 100 TB."""
    from w4h_etl_container_spark.operators.gates import drop_incomplete_timesteps

    ev = read_events(spark, sf_dir)
    seeded = ev.select(
        "event_id",
        "ts",
        "user_id",
        F.date_trunc("HOUR", "ts").alias("hts"),
        F.when(F.col("event_id") % 37 == 5, F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("v"),
    )
    return drop_incomplete_timesteps(seeded, "hts", ["v"]).select(
        "event_id", "ts", "user_id", "v"
    )


# ---------------------------------------------------------------------------
# JOIN-1 — multi-way align (merge) as n-way join
# ---------------------------------------------------------------------------
@register(
    "q_join_merge",
    sql=f"""
    SELECT r_name,
           n_name,
           CAST(SUM(CAST({_REV_SQL} AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderstatus = 'O'
    GROUP BY r_name, n_name
    """,
    survey_ids=("JOIN-1", "AGG-1"),
    gate=False,
)
def q_join_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-1 (reference ``xr.merge`` coordinate align, ``main.py:93-103``)
    as its relational dual: n-way equi-join over shared keys, aggregated.

    Scale: fact-to-fact (lineitem⋈orders) shuffles on orderkey — AQE picks
    sort-merge with skew splitting; the three dimension joins broadcast
    (hinted; nation/region/customer are small). Revenue sums are
    decimal-exact so the hash is partition-order independent.
    """
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(_dec_sum(_rev(), "revenue"), F.count(F.lit(1)).alias("n_items"))
    )


# ---------------------------------------------------------------------------
# JOIN-2 — prefer-new merge (combine_first)
# ---------------------------------------------------------------------------
@register(
    "q_join_combine_first",
    sql="""
    WITH new AS (
      SELECT o_orderkey, o_totalprice + 10.0 AS price, o_orderstatus
      FROM orders WHERE (o_orderkey % 3) <> 0
    ), old AS (
      SELECT o_orderkey, o_totalprice AS price, o_orderstatus
      FROM orders WHERE (o_orderkey % 2) = 0
    )
    SELECT COALESCE(new.o_orderkey, old.o_orderkey) AS o_orderkey,
           COALESCE(new.price, old.price) AS price,
           COALESCE(new.o_orderstatus, old.o_orderstatus) AS status,
           CASE WHEN new.o_orderkey IS NOT NULL THEN 'new' ELSE 'old' END AS src
    FROM new FULL OUTER JOIN old ON new.o_orderkey = old.o_orderkey
    """,
    survey_ids=("JOIN-2",),
)
def q_join_combine_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-2 (reference ``combine_first``, ``main.py:246-250``): full outer
    join on the key, each value column coalesced new-over-old. The two
    inputs here are disjoint-ish slices of orders so all three cases
    (new-only, old-only, both) occur.

    Scale: both sides shuffle on the join key (sort-merge). For the real
    snapshot-merge workload both tables would be bucketed by key on write,
    making this a zero-shuffle join. AQE handles the skew case.
    """
    o = read_table(spark, sf_dir, "orders")
    new = (
        o.where((F.col("o_orderkey") % 3) != 0)
        .select(F.col("o_orderkey"), (F.col("o_totalprice") + F.lit(10.0)).alias("price"), "o_orderstatus")
    )
    old = o.where((F.col("o_orderkey") % 2) == 0).select(
        "o_orderkey", F.col("o_totalprice").alias("price"), "o_orderstatus"
    )
    j = new.alias("new").join(old.alias("old"), F.col("new.o_orderkey") == F.col("old.o_orderkey"), "full_outer")
    return j.select(
        F.coalesce(F.col("new.o_orderkey"), F.col("old.o_orderkey")).alias("o_orderkey"),
        F.coalesce(F.col("new.price"), F.col("old.price")).alias("price"),
        F.coalesce(F.col("new.o_orderstatus"), F.col("old.o_orderstatus")).alias("status"),
        F.when(F.col("new.o_orderkey").isNotNull(), F.lit("new")).otherwise(F.lit("old")).alias("src"),
    )


# ---------------------------------------------------------------------------
# JOIN-3 — broadcast dimension join
# ---------------------------------------------------------------------------
@register(
    "q_join_broadcast",
    sql=f"""
    SELECT p_brand,
           CAST(SUM(CAST({_REV_SQL} AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size >= 20
    GROUP BY p_brand
    """,
    survey_ids=("JOIN-3", "FLT-1"),
    gate=False,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-3 (reference near-land mask zip, ``main.py:281-304``): fact
    joined to a small dimension — explicitly broadcast, so the 100 TB fact
    side never shuffles; the filtered dimension ships to every executor
    once (the reference's 1 MB mask is exactly this shape).

    Library tier: the broadcast fact-dim shape stays gate-checked via
    ``q_flt_semi`` (JOIN-3) and ``q_join_merge``'s broadcast dims; this
    slot went to the corpus-pipeline operators (plans/corpus.py)."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").where(F.col("p_size") >= 20)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(_dec_sum(_rev(), "revenue"), F.count(F.lit(1)).alias("n_items"))
    )


# ---------------------------------------------------------------------------
# JOIN-4 — as-of join (engine extension; reference lacks it)
# ---------------------------------------------------------------------------
@register(
    "q_join_asof",
    sql="""
    SELECT e.event_id, e.ts, e.user_id,
           (SELECT max(p.ts) FROM events p
             WHERE p.user_id = e.user_id AND p.event_type = 'purchase' AND p.ts <= e.ts
           ) AS last_purchase_ts
    FROM events e
    WHERE e.event_type = 'error'
    """,
    survey_ids=("JOIN-4",),
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-4 (SURVEY §2.3, engine-provided): as-of join — for each 'error'
    event, the most recent 'purchase' by the same user at or before it.

    Spark-first formulation: no per-row subquery and no range join blowup —
    union both streams, one pass of ``max(purchase_ts)`` over an ordered
    running window per user. One shuffle on (user_id), linear work; this is
    the scalable shape (the correlated-subquery oracle is O(n·m)).
    Purchases sort before other events at the same instant so ``<=``
    semantics hold.
    """
    ev = read_events(spark, sf_dir)
    tagged = ev.select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        F.when(F.col("event_type") == "purchase", F.col("ts")).alias("purchase_ts"),
        F.when(F.col("event_type") == "purchase", F.lit(0)).otherwise(F.lit(1)).alias("tie"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tie", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("last_purchase_ts", F.max("purchase_ts").over(w))
        .where(F.col("event_type") == "error")
        .select("event_id", "ts", "user_id", "last_purchase_ts")
    )


# ---------------------------------------------------------------------------
# AGG-1 — grouped min/max (daily highs/lows shape)
# ---------------------------------------------------------------------------
@register(
    "q_agg_daily",
    sql="""
    SELECT user_id, CAST(ts AS DATE) AS d,
           min(value) AS lo, max(value) AS hi, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM events
    GROUP BY user_id, CAST(ts AS DATE)
    """,
    survey_ids=("AGG-1",),
    gate=False,
)
def q_agg_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AGG-1 (reference per-date ``max('time')``/``min('time')``,
    ``main.py:405-408``): hash aggregate keyed (cell, date). Scale: partial
    (map-side) min/max/sum then one shuffle on the group key; decimal sum
    keeps the hash order-independent."""
    ev = read_events(spark, sf_dir)
    return ev.groupBy("user_id", F.col("ts").cast("date").alias("d")).agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.count(F.lit(1)).alias("n"),
        _dec_sum(F.col("value"), "total"),
    )


# ---------------------------------------------------------------------------
# AGG-2 — distinct
# ---------------------------------------------------------------------------
@register(
    "q_agg_distinct",
    sql="SELECT DISTINCT CAST(ts AS DATE) AS d, event_type, 1 AS approx_ok FROM events",
    survey_ids=("AGG-2", "AGG-6"),
    gate=False,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AGG-2 (reference ``np.unique`` over dates/offsets, ``main.py:401,365``):
    distinct on computed columns — hash aggregate without values; partial
    dedup map-side.

    Also carries the AGG-6 approx-distinct self-check: ``approx_ok`` is 1
    iff HyperLogLog++ ``approx_count_distinct(user_id)`` (2% rsd) lands
    within 5% of the exact global count — sketch internals are
    engine-specific, so the *bound* is the oracle-checkable contract (the
    oracle's constant 1 fails the gate if the sketch drifts out of
    tolerance). At 100 TB the approx variant replaces exact distincts
    whose shuffle would dominate the job."""
    ev = read_events(spark, sf_dir)
    distinct = ev.select(F.col("ts").cast("date").alias("d"), "event_type").distinct()
    check = ev.agg(
        (
            (
                F.abs(F.approx_count_distinct("user_id", 0.02) - F.countDistinct("user_id"))
                / F.countDistinct("user_id")
            )
            <= 0.05
        )
        .cast("int")
        .alias("approx_ok")
    )
    return distinct.crossJoin(F.broadcast(check))


# ---------------------------------------------------------------------------
# AGG-3 — arg-max / max_by
# ---------------------------------------------------------------------------
@register(
    "q_agg_maxby",
    sql="""
    SELECT l_returnflag,
           max_by(l_orderkey, l_extendedprice * 10000000.0 + l_orderkey) AS top_orderkey,
           max(l_extendedprice) AS top_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    survey_ids=("AGG-3", "SRC-1"),
)
def q_agg_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AGG-3 (reference latest-run arg-max over scraped links,
    ``main.py:50,59``): ``max_by`` with a totally-ordered key
    (price⋅1e7 + orderkey stays exact below 2⁵³, making the arg-max unique
    and engine-independent). Scale: a single partial+final aggregate — the
    SRC-1 'find latest source' pattern at any cardinality."""
    li = read_table(spark, sf_dir, "lineitem")
    rank_key = F.col("l_extendedprice") * F.lit(10000000.0) + F.col("l_orderkey")
    return li.groupBy("l_returnflag").agg(
        F.max_by("l_orderkey", rank_key).alias("top_orderkey"),
        F.max("l_extendedprice").alias("top_price"),
    )


# ---------------------------------------------------------------------------
# AGG-4 — completeness gate (count-having)
# ---------------------------------------------------------------------------
@register(
    "q_agg_gate",
    sql="""
    SELECT CAST(ts AS DATE) AS d, COUNT(DISTINCT date_part('hour', ts)) AS n_hours
    FROM events
    GROUP BY CAST(ts AS DATE)
    HAVING COUNT(DISTINCT date_part('hour', ts)) >= 20
    """,
    survey_ids=("AGG-4",),
    gate=False,
)
def q_agg_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AGG-4 (reference ``len(data.time) >= 24`` gate, ``main.py:403-404``):
    keep only dates with enough distinct hours. Scale: count-distinct
    shuffles (date, hour) pairs — bounded cardinality (24/date), so the
    exact distinct is cheap; no approx needed."""
    ev = read_events(spark, sf_dir)
    return (
        ev.groupBy(F.col("ts").cast("date").alias("d"))
        .agg(F.countDistinct(F.hour("ts")).alias("n_hours"))
        .where(F.col("n_hours") >= 20)
    )


# ---------------------------------------------------------------------------
# AGG-5 — ordered collect (per-cell time series array)
# ---------------------------------------------------------------------------
@register(
    "q_agg_collect",
    sql="""
    SELECT l_orderkey,
           array_to_string(list(l_linenumber ORDER BY l_linenumber, l_quantity), ',') AS lines,
           array_to_string(list(CAST(l_quantity AS INTEGER) ORDER BY l_linenumber, l_quantity), ',') AS quantities
    FROM lineitem
    GROUP BY l_orderkey
    """,
    survey_ids=("AGG-5",),
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AGG-5 (reference per-cell encoded array build, ``main.py:296-303``):
    per-key array ordered by an explicit sort key — the engine makes the
    reference's positional ordering explicit (SURVEY §2.4). Spark shape:
    collect structs, ``sort_array``, project the payload with
    ``transform`` — all JVM-side. The declared output joins each array to
    a CSV string so every compared cell is a flat scalar (array cells
    crash pandas-based canonicalizers — round-1 driver finding); the
    arrays themselves are the intermediate, unchanged. Scale: one shuffle
    on the key; array sizes are bounded (≤ 7 lines/order; ≤ ~170
    hours/cell in the weather workload) so no skew risk."""
    li = read_table(spark, sf_dir, "lineitem")
    pair = F.struct(F.col("l_linenumber").alias("k"), F.col("l_quantity").cast("int").alias("q"))
    return (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list(pair)).alias("pairs"))
        .select(
            "l_orderkey",
            F.concat_ws(",", F.transform("pairs", lambda s: s.k)).alias("lines"),
            F.concat_ws(",", F.transform("pairs", lambda s: s.q)).alias("quantities"),
        )
    )


# ---------------------------------------------------------------------------
# AGG-6 — rollup / grouping sets
# ---------------------------------------------------------------------------
@register(
    "q_agg_rollup",
    sql="""
    SELECT r_name, n_name, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY CUBE (r_name, n_name)
    """,
    survey_ids=("AGG-6",),
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AGG-6 (engine extension; SURVEY §2.4): CUBE over (region, nation) —
    all four grouping sets in one pass, a strict superset of the rollup
    hierarchy (the ROLLUP sets plus the nation-only marginal), so one
    declared query pins the whole grouping-sets machinery. Scale: Spark
    expands grouping sets map-side then one shuffle; dimension joins
    broadcast."""
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .cube("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _dec_sum(F.col("c_acctbal"), "total_bal"),
        )
    )


# ---------------------------------------------------------------------------
# WIN-2 — ordinal offset from stream head
# ---------------------------------------------------------------------------
@register(
    "q_win_offset",
    sql="""
    SELECT event_id, ts,
           CAST(FLOOR(date_diff('second', (SELECT min(ts) FROM events), ts) / 3600.0) AS BIGINT) AS offset_hours
    FROM events
    """,
    survey_ids=("WIN-2",),
    gate=False,
)
def q_win_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WIN-2 (reference ``time − time[0]`` → integer hours,
    ``main.py:263-275``): offset of each row from the global stream head.

    Spark-first: the scalar ``min(ts)`` is computed as a 1-row aggregate
    and cross-joined (broadcast — it's one row), not a window over an
    unpartitioned frame; at 100 TB the former is a cheap two-stage
    reduction while the latter would serialize. Integer-hour conversion
    uses second-difference then floor-divide — the reference's
    accessor-based (lossless) semantics, not float ns division
    (``main.py:266-270``)."""
    ev = read_events(spark, sf_dir)
    head = ev.agg(F.min("ts").alias("t0"))
    return (
        ev.crossJoin(F.broadcast(head))
        .select(
            "event_id",
            "ts",
            F.floor(
                (F.unix_timestamp("ts") - F.unix_timestamp("t0")) / F.lit(3600.0)
            ).alias("offset_hours"),
        )
    )


# ---------------------------------------------------------------------------
# WIN-3 — the window-function suite: ranking, frames, lag/lead
# ---------------------------------------------------------------------------
@register(
    "q_win_funcs",
    sql="""
    SELECT event_id, user_id, ts, rnk, moving_sum, n_in_frame, delta_prev, delta_next
    FROM (
      SELECT event_id, user_id, ts,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rnk,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum,
             COUNT(*) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS n_in_frame,
             value - lag(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta_prev,
             lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) - value AS delta_next
      FROM events
    ) WHERE rnk <= 5
    """,
    survey_ids=("WIN-3", "SRT-2"),
    gate=False,
)
def q_win_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WIN-3 (SURVEY §2.5, engine-provided): the full window-function
    family over one shared (partition, order) spec — ranking
    (row_number + top-5-per-key filter), a 3-row moving frame
    (decimal-exact so incremental frame evaluation can't drift), and
    lag/lead deltas. One shuffle on user_id serves every function; the
    rank filter bounds what leaves the stage (SRT-2 per-group top-k
    shape). Scale: frames evaluate streaming per partition — no
    re-buffering per function."""
    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(-2, 0)
    return (
        ev.select(
            "event_id",
            "user_id",
            "ts",
            F.row_number().over(w).alias("rnk"),
            F.sum(F.col("value").cast("decimal(18,4)")).over(wf).cast("double").alias("moving_sum"),
            F.count(F.lit(1)).over(wf).alias("n_in_frame"),
            (F.col("value") - F.lag("value").over(w)).alias("delta_prev"),
            (F.lead("value").over(w) - F.col("value")).alias("delta_next"),
        )
        .where(F.col("rnk") <= 5)
    )


# ---------------------------------------------------------------------------
# SRT-1 — multi-key sort;  SRT-2 — top-k
# ---------------------------------------------------------------------------
@register(
    "q_srt_topk",
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    survey_ids=("SRT-1", "SRT-2"),
    gate=False,
)
def q_srt_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRT-2 (SURVEY §2.6): global top-k with a unique tie-break. Scale:
    Spark plans TakeOrderedAndProject — per-partition heaps then a k-row
    driver merge; no global sort ever materializes. (SRT-1's full
    ``orderBy`` is exercised by AGG-5's explicit array ordering and the
    oracle's ORDER BY — result hashing is order-insensitive.)

    Library tier: SRT-1/SRT-2 stay gate-checked via ``q_prj_slice``
    (same TakeOrderedAndProject plan), ``q_top_customers``, and
    ``q_win_funcs``; this slot went to the corpus-pipeline operators
    (plans/corpus.py)."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# SET-1 — union along an axis;  SET-2 — cyclic-point union
# ---------------------------------------------------------------------------
@register(
    "q_set_union",
    sql="""
    SELECT 'h1' AS half, l_orderkey, l_linenumber, l_quantity FROM lineitem
      WHERE l_shipdate <  TIMESTAMP '1998-01-01' AND l_linestatus = 'F'
    UNION ALL
    SELECT 'h2' AS half, l_orderkey, l_linenumber, l_quantity FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_linestatus = 'O'
    """,
    survey_ids=("SET-1",),
    gate=False,
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SET-1 (reference ``xr.concat`` along time, ``main.py:115-131``):
    union of disjoint slices with provenance tag. Scale: unionByName is
    plan-level only — zero data movement; both branches read the same
    parquet with different pushed predicates."""
    li = read_table(spark, sf_dir, "lineitem")
    cut = F.lit("1998-01-01").cast("timestamp_ntz")
    h1 = li.where((F.col("l_shipdate") < cut) & (F.col("l_linestatus") == "F")).select(
        F.lit("h1").alias("half"), "l_orderkey", "l_linenumber", "l_quantity"
    )
    h2 = li.where((F.col("l_shipdate") >= cut) & (F.col("l_linestatus") == "O")).select(
        F.lit("h2").alias("half"), "l_orderkey", "l_linenumber", "l_quantity"
    )
    return h1.unionByName(h2)


@register(
    "q_set_cyclic",
    sql="""
    SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS n FROM events GROUP BY 1, 2
    UNION ALL
    SELECT user_id + 100 AS user_id, CAST(ts AS DATE) AS d, COUNT(*) AS n
    FROM events WHERE user_id = 0 GROUP BY 1, 2
    """,
    survey_ids=("SET-2",),
)
def q_set_cyclic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SET-2 (reference cyclic-point append: copy lon=0 as lon=360,
    ``main.py:345-350``): duplicate one key slice under a shifted key so a
    downstream consumer (the contour renderer) sees a closed seam. Scale:
    the appended slice is one key's worth of rows — negligible; plan-level
    union."""
    ev = read_events(spark, sf_dir)
    base = ev.groupBy("user_id", F.col("ts").cast("date").alias("d")).agg(F.count(F.lit(1)).alias("n"))
    seam = (
        ev.where(F.col("user_id") == 0)
        .groupBy((F.col("user_id") + F.lit(100)).alias("user_id"), F.col("ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return base.unionByName(seam)


# ---------------------------------------------------------------------------
# SET-3 — intersect / except
# ---------------------------------------------------------------------------
@register(
    "q_set_ops",
    sql="""
    SELECT p_type, 'intersect' AS op FROM (
      SELECT p_type FROM part WHERE p_size >= 25
      INTERSECT
      SELECT p_type FROM part WHERE p_retailprice >= 1500.0
    )
    UNION ALL
    SELECT p_type, 'except' AS op FROM (
      SELECT p_type FROM part WHERE p_size >= 25
      EXCEPT
      SELECT p_type FROM part WHERE p_retailprice >= 1500.0
    )
    """,
    survey_ids=("SET-3",),
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SET-3 (SURVEY §2.7, engine-provided): INTERSECT (distinct hash
    semi-join) and EXCEPT DISTINCT (``subtract`` — NOT
    ``exceptAll().distinct()``, which is bag difference and wrongly keeps
    values with surplus multiplicity in a), tagged and unioned. Scale:
    both are one shuffle on the compared column; the tag union is
    plan-level only."""
    p = read_table(spark, sf_dir, "part")
    a = p.where(F.col("p_size") >= 25).select("p_type")
    b = p.where(F.col("p_retailprice") >= 1500.0).select("p_type")
    return a.intersect(b).withColumn("op", F.lit("intersect")).unionByName(
        a.subtract(b).withColumn("op", F.lit("except"))
    )


# ---------------------------------------------------------------------------
# SF-6 — datetime accessors;  SF-7/8 — strings & regex
# ---------------------------------------------------------------------------
@register(
    "q_sf_datetime",
    sql="""
    SELECT event_id,
           date_part('year', ts)  AS y,
           date_part('month', ts) AS mo,
           date_part('day', ts)   AS dom,
           date_part('hour', ts)  AS h,
           date_part('doy', ts)   AS doy,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
           CAST(ts AS DATE)       AS d,
           CASE WHEN props IS NOT NULL AND json_valid(props)
                THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                ELSE NULL END AS k
    FROM events
    """,
    survey_ids=("SF-6", "SF-11"),
    gate=False,
)
def q_sf_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SF-6 (reference dt accessors, ``main.py:121-124,142,221``): the full
    datetime accessor family as native Column functions — all codegen'd,
    no UDF. Plus SF-11 typed JSON extraction from the props column
    (``from_json`` with an explicit schema — deterministic, single-pass,
    vectorized; not schema_of_json). Malformed/null props and
    non-numeric k yield NULL on BOTH engines: from_json is PERMISSIVE
    by default, and the oracle mirrors it with json_valid + TRY_CAST —
    DuckDB's bare json_extract ERRORS on malformed input (hostile-events
    finding; the fixture's props are all well-formed)."""
    ev = read_events(spark, sf_dir)
    return ev.select(
        "event_id",
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("mo"),
        F.dayofmonth("ts").cast("long").alias("dom"),
        F.hour("ts").cast("long").alias("h"),
        F.dayofyear("ts").cast("long").alias("doy"),
        F.date_trunc("DAY", "ts").alias("day_start"),
        F.col("ts").cast("date").alias("d"),
        F.from_json("props", "k BIGINT").getField("k").alias("k"),
    )


@register(
    "q_sf_strings",
    sql="""
    SELECT doc_id,
           printf('%05d,%s', doc_id, lang) AS cell_id,
           CAST(regexp_extract(source, 'src(\\d+)', 1) AS BIGINT) AS src_num,
           concat_ws('-', lang, source) AS tag,
           upper(lang) AS lang_uc,
           length(text) AS text_len
    FROM documents
    """,
    survey_ids=("SF-7", "SF-8"),
)
def q_sf_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SF-7/8 (reference ``f"{lat:.2f},{lon:.2f}"`` ids and href regexes,
    ``main.py:293,298,394-398``): format_string / regexp_extract /
    concat_ws as native expressions."""
    d = read_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.format_string("%05d,%s", F.col("doc_id"), F.col("lang")).alias("cell_id"),
        F.regexp_extract("source", r"src(\d+)", 1).cast("long").alias("src_num"),
        F.concat_ws("-", "lang", "source").alias("tag"),
        F.upper("lang").alias("lang_uc"),
        F.length("text").cast("long").alias("text_len"),
    )


# ---------------------------------------------------------------------------
# anti join / correlated EXISTS
# ---------------------------------------------------------------------------
@register(
    "q_flt_anti",
    sql="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
    )
    """,
    survey_ids=("FLT-1", "SET-3"),
    gate=False,
)
def q_flt_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLT-1 complement: LEFT ANTI join — rows whose key does NOT appear
    in the filter set (the 'not near land' / 'never purchased' shape).
    Oracle uses NOT EXISTS, whose null semantics match left_anti exactly
    (NOT IN's three-valued logic empties the result if any key is NULL).
    Scale: same broadcast hash plan as the semi join, negated.

    Library tier: FLT-1 stays gate-checked via ``q_flt_semi``; the
    anti/except shape via ``q_set_ops`` (EXCEPT) and ``q_prj_slice``'s
    broadcast anti-join; this slot went to the corpus-pipeline operators
    (plans/corpus.py)."""
    cust = read_table(spark, sf_dir, "customer")
    keys = read_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select("o_custkey")
    return cust.join(
        F.broadcast(keys), cust.c_custkey == keys.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "q_exists_priority",
    sql="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    """,
    survey_ids=("FLT-1", "JOIN-1", "AGG-1"),
)
def q_exists_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (TPC-H Q4 shape): orders with at least one
    late-shipped line, counted per priority. Spark plans the EXISTS as a
    left-semi join on the correlation key with the extra predicate —
    declared through the SQL frontend so the correlated-subquery surface
    itself is exercised. Scale: semi join shuffles on orderkey; the date
    range prunes the orders scan first."""
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    read_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql("""
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
          )
        GROUP BY o_orderpriority
    """)


@register(
    "q_top_customers",
    sql=f"""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST({_REV_SQL} AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    survey_ids=("JOIN-1", "AGG-1", "SRT-2"),
    gate=False,
)
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-revenue per customer, top 20. Exercises
    the full join→aggregate→top-k pipeline in one plan. Scale: lineitem⋈
    orders shuffles; customer/nation broadcast; TakeOrdered bounds the
    result without a global sort. Revenue tie-break by custkey keeps the
    limit deterministic."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = read_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_dec_sum(_rev(), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )
