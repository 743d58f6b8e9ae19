"""Extended operator coverage — the SURVEY §2 'opt' rows (JOIN-4 range
join, AGG-6 exact percentiles) plus engine-surface demos (SQL frontend,
IVF centroid assignment). WIN-3 frames live in q_win_funcs
(plans/relational.py), CUBE in q_agg_rollup, sliding windows in
q_stream_tumbling (plans/eventsops.py), edit-distance verification in
q_minhash_lsh (plans/textops.py)."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from w4h_etl_container_spark.functions.vectorkernels import ivf_centroids, make_ivf_assign_udf
from w4h_etl_container_spark.kernels import tree_sum
from w4h_etl_container_spark.plans.registry import register
from w4h_etl_container_spark.plans.vectors import DIM, _S, _elem
from w4h_etl_container_spark.session import parallelize_compute, read_embeddings, read_events, read_table


# ---------------------------------------------------------------------------
# JOIN-4 — range (non-equi) join
# ---------------------------------------------------------------------------
@register(
    "q_join_range",
    sql="""
    SELECT p.p_partkey, p.p_size, COUNT(*) AS n_close
    FROM part p JOIN lineitem l
      ON l.l_quantity >= p.p_size - 1.0 AND l.l_quantity <= p.p_size + 1.0
    WHERE p.p_size >= 45
    GROUP BY p.p_partkey, p.p_size
    """,
    survey_ids=("JOIN-4",),
    gate=False,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-4 (SURVEY §2.3, engine-provided): range join — each (filtered)
    part paired with lineitems whose quantity falls in ±1 of its size.

    Spark-first formulation, two rewrites stacked:

    * **binning**: a raw non-equi join plans BroadcastNestedLoopJoin —
      O(n·m) comparisons (7.5 s at sf0.1 for 600 k × 2.4 k). Each part
      explodes into its covered integer bins; the fact side joins on
      floor(quantity) = bin as an equi-key (hash join); the exact range
      predicate post-filters. With two large sides the bin key
      co-partitions both — no broadcast needed.
    * **eager aggregation**: the final aggregate only needs COUNT per
      part, and the fact side's join key has ~50 distinct values — so
      the fact side pre-aggregates to (quantity, cnt) BEFORE the join
      (600 k rows → ~50) and the count is a SUM of cnt after it. The
      join's intermediate collapses from ~20 M rows to ~10 k. This is
      the classic aggregate-pushdown-below-join rewrite, legal because
      quantity determines the join+filter outcome entirely.

    (The oracle keeps the declarative range-join SQL; DuckDB's IEJoin
    optimizes it natively.)"""
    p = read_table(spark, sf_dir, "part").where(F.col("p_size") >= 45).select("p_partkey", "p_size")
    p_bins = p.select(
        "p_partkey",
        "p_size",
        F.explode(F.sequence(F.col("p_size") - 1, F.col("p_size") + 1)).alias("bin"),
    )
    li = (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_quantity")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("bin", F.floor("l_quantity").cast("int"))
    )
    cond = (F.col("l_quantity") >= F.col("p_size") - 1.0) & (
        F.col("l_quantity") <= F.col("p_size") + 1.0
    )
    return (
        li.join(F.broadcast(p_bins), "bin")
        .where(cond)
        .groupBy("p_partkey", "p_size")
        .agg(F.sum("cnt").alias("n_close"))
    )


# ---------------------------------------------------------------------------
# exact percentiles
# ---------------------------------------------------------------------------
@register(
    "q_percentile",
    sql="""
    SELECT l_returnflag,
           FLOOR(quantile_cont(l_extendedprice, 0.5) * 1000000.0 + 0.5) / 1000000.0 AS p50,
           FLOOR(quantile_cont(l_extendedprice, 0.9) * 1000000.0 + 0.5) / 1000000.0 AS p90,
           quantile_disc(CAST(ROUND(l_extendedprice * 100) AS BIGINT), 0.5) AS p50a_cents,
           quantile_disc(CAST(ROUND(l_extendedprice * 100) AS BIGINT), 0.9) AS p90a_cents
    FROM lineitem
    GROUP BY l_returnflag
    """,
    survey_ids=("AGG-6",),
    gate=False,
)
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentiles, BOTH renderings on the hash-checked gate — and since
    round 7 BOTH are bounded-state at any scale:

    * exact continuous (``p50``/``p90``) — the refined two-scan operator
      (``operators.percentiles.exact_percentile_refined``): one
      GK-sketch scan brackets both target ranks, one more scan counts
      below-bracket and collect_lists ONLY the ~6εn in-bracket rows, and
      per-group array arithmetic interpolates — reproducing
      ``percentile`` ≡ DuckDB ``quantile_cont`` bit-for-bit (audited,
      full-group fallback). The previous rendering
      (``percentile(x, array(...))``) buffered every group value in one
      aggregator — it was the last unbounded-buffer plan on the gate.
    * discrete (``p50a_cents``/``p90a_cents``) — DuckDB
      ``quantile_disc`` read off the SAME bracket pool at rank
      max(1, ⌈q·n⌉): no extra sketch, no extra scan, and — unlike the
      previous ``percentile_approx(accuracy=1e6)`` rendering, whose
      exactness held only while accuracy exceeded the group size (a
      bound that breaks at 100 TB) — exact at every scale because the
      audit proves the pool contains the disc rank."""
    from w4h_etl_container_spark.operators.percentiles import (
        exact_percentile_refined,
    )

    li = read_table(spark, sf_dir, "lineitem")
    r6 = lambda c: F.floor(c * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)  # noqa: E731
    # disc=True reads the DISCRETE percentile off the same bracket pool
    # (rank max(1, ⌈q·n⌉) — DuckDB quantile_disc's rule) — no second
    # sketch, no third scan. The cents rendering applies the monotone
    # cents map to the selected element; order (hence rank) is
    # preserved, so it equals quantile_disc over per-row cents.
    # NO compute spread here (measured, sf0.1 warm): GK inserts cost
    # ~0.5 µs/row — the round-robin exchange of 600 k rows (+0.43 s)
    # costs more than single-task sketching saves (0.49 s unspread vs
    # 0.79 s spread). parallelize_compute is for kernel-grade per-row
    # work (winnow's ~300 md5/doc); at real scale the input has many
    # splits and GK partials parallelize off the scan for free.
    src = li.select("l_returnflag", "l_extendedprice")
    both = exact_percentile_refined(
        src, "l_extendedprice", "l_returnflag", [0.5, 0.9], disc=True
    )
    cents = lambda c: F.round(c * F.lit(100.0), 0).cast("long")  # noqa: E731
    return both.select(
        "l_returnflag",
        r6(F.col("p")[0]).alias("p50"),
        r6(F.col("p")[1]).alias("p90"),
        cents(F.col("p_disc")[0]).alias("p50a_cents"),
        cents(F.col("p_disc")[1]).alias("p90a_cents"),
    )


# ---------------------------------------------------------------------------
# IVF centroid assignment (the ANN scale path's partitioner)
# ---------------------------------------------------------------------------
N_CENTROIDS = 4

_ivf_udf = make_ivf_assign_udf(ivf_centroids(N_CENTROIDS, DIM))


def _centroid(k: int, j: int) -> float:
    """Centroid component — lockstep with vectorkernels.ivf_centroids."""
    return math.cos(k * 31.0 + j * 7.0)


def _ivf_dist_expr(dialect: str, k: int) -> str:
    terms = []
    for j in range(DIM):
        e = _elem(dialect, "embedding", j + 1)
        terms.append(_S(f"(({e} - {_centroid(k, j)!r}) * ({e} - {_centroid(k, j)!r}))"))
    return str(tree_sum(terms))


def _ivf_sql() -> str:
    # distances bound once as lateral aliases; argmin references the names
    # (unbound, each distance tree is duplicated 2^k times by the unroll)
    binds = ", ".join(f"({_ivf_dist_expr('duck', k)}) AS __d{k}" for k in range(N_CENTROIDS))
    expr_k, expr_d = "0", "__d0"
    for k in range(1, N_CENTROIDS):
        expr_k = f"(CASE WHEN __d{k} < {expr_d} THEN {k} ELSE {expr_k} END)"
        expr_d = f"(CASE WHEN __d{k} < {expr_d} THEN __d{k} ELSE {expr_d} END)"
    return f"""
    SELECT vec_id, label,
           CAST({expr_k} AS BIGINT) AS centroid_id,
           CAST(FLOOR({expr_d} * 1000000.0 + 0.5) AS BIGINT) AS dist2_e6
    FROM (SELECT *, {binds} FROM embeddings)
    """


@register("q_ivf_assign", sql=_ivf_sql(), survey_ids=("EXT-SIM",), gate=False)
def q_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantization: assign each vector to its nearest centroid
    (deterministic literal centroids; argmin with ties to lowest id).
    Spark side is the Arrow numpy kernel (see vectorkernels.py — identical
    op order as the oracle's SQL trees, micro-unit integer output).

    This is the ANN scale path's partitioner: repartition by centroid_id
    and a query probes only its nearest cells — sub-linear search with
    data locality (pairs with q_ann_lsh). The literal centroids exist so
    the oracle can check the assignment; the real index build — Lloyd's
    k-means with the same Arrow assign kernel, posexplode centroid
    update, distortion-monotone — lives in ``operators/ivfindex.py``
    (tested) and feeds this identical plan a trained matrix.

    Library tier: EXT-SIM's IVF surface stays gate-checked via
    ``q_ann_probe`` (whose probe path contains this assignment); this
    slot went to the corpus-pipeline operators (plans/corpus.py)."""
    emb = read_embeddings(spark, sf_dir)
    return emb.select("vec_id", "label", _ivf_udf("embedding").alias("iv")).select(
        "vec_id", "label", "iv.centroid_id", "iv.dist2_e6"
    )


# ---------------------------------------------------------------------------
# UDF-6 — grouped-map (applyInPandas) on the oracle-checked surface
# ---------------------------------------------------------------------------
@register(
    "q_grouped_map",
    sql="""
    SELECT user_id, event_id,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
           COALESCE(date_diff('second',
                              lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                              ts), -1) AS gap_s
    FROM events
    """,
    survey_ids=("UDF-6",),
)
def q_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDF-6 (SURVEY §2.10): the grouped-map surface on the hash-checked
    gate — per-user event ordinal + whole-second inter-event gap computed
    by a Python kernel over whole groups (the shape custom sessionization
    kernels need). Integer outputs keep the oracle exact.

    Physical strategy: this corpus is the many-SMALL-groups regime, where
    ``applyInPandas``'s per-group Arrow batch + Python call is pure
    overhead (~2.4 ms/group measured), so the declared plan uses the
    batched form — repartition by key, sort within partitions, one
    ``mapInPandas`` pass segmenting groups per batch with cross-batch
    state carry (operators/groupedmap.py). The ``applyInPandas``
    rendering of the same kernel is the large-group path; both are
    parity-pinned against each other and the native window form in
    tests. Scale: one shuffle on user_id either way."""
    from w4h_etl_container_spark.operators.groupedmap import session_features_batched

    return session_features_batched(read_events(spark, sf_dir))


# ---------------------------------------------------------------------------
# SQL frontend — the engine's second query surface
# ---------------------------------------------------------------------------
_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q_sql_pricing_summary", sql=_PRICING_SQL, survey_ids=("PRJ-1", "AGG-1", "SF-1"))
def q_sql_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL frontend: the same ANSI text runs on Spark SQL and
    the DuckDB oracle verbatim (TPC-H-Q1-shaped pricing summary). Proves
    users can address every relational operator through ``spark.sql`` —
    the DataFrame registry and the SQL surface share Catalyst plans."""
    read_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_PRICING_SQL)


# ---------------------------------------------------------------------------
# exact percentiles with bounded state (the 100 TB-exact rendering)
# ---------------------------------------------------------------------------
@register(
    "q_percentile_exactscale",
    sql="""
    SELECT l_returnflag,
           FLOOR(quantile_cont(l_extendedprice, 0.5) * 1000000.0 + 0.5) / 1000000.0 AS p50,
           FLOOR(quantile_cont(l_extendedprice, 0.9) * 1000000.0 + 0.5) / 1000000.0 AS p90
    FROM lineitem
    GROUP BY l_returnflag
    """,
    survey_ids=("AGG-6",),
    gate=False,
)
def q_percentile_exactscale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bounded-state EXACT percentile (``operators.percentiles.
    exact_percentile_refined``): a sketch-bracket scan narrows each
    group's candidate window to ~6·n/accuracy values, a second scan
    counts below-bracket and collect_lists only the in-bracket rows,
    and per-group array arithmetic interpolates — reproducing
    ``percentile``/``quantile_cont`` bit-for-bit (audited, with a
    full-group fallback). The rendering of AGG-6 that stays exact AND
    memory-bounded at 100 TB. Library tier; the same r6 rounding
    contract as q_percentile on both sides.

    Both quantiles come from ONE call (round 7): the multi-quantile
    signature shares both scans — one GK sketch emits both brackets,
    one aggregation carries both audits and the union pool — so the
    two-quantile report costs the same two data scans as one."""
    from w4h_etl_container_spark.operators.percentiles import (
        exact_percentile_refined,
    )

    li = read_table(spark, sf_dir, "lineitem")
    r6 = lambda c: F.floor(c * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)  # noqa: E731
    # no compute spread — same measurement as q_percentile: the
    # exchange costs more than single-task GK saves at this row weight
    src = li.select("l_returnflag", "l_extendedprice")
    ps = exact_percentile_refined(src, "l_extendedprice", "l_returnflag", [0.5, 0.9])
    return ps.select(
        "l_returnflag",
        r6(F.col("p")[0]).alias("p50"),
        r6(F.col("p")[1]).alias("p90"),
    )


# ---------------------------------------------------------------------------
# EXT-SKEW — salted join: the skew-mitigation technique, parity-pinned
# against the plain join it must be indistinguishable from
# ---------------------------------------------------------------------------
SALT_FANOUT = 16


def _salted_join_sql() -> str:
    return """
    SELECT c.c_mktsegment,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(e.value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_e6
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY c.c_mktsegment
    """


@register(
    "q_salted_join",
    sql=_salted_join_sql(),
    survey_ids=("EXT-SKEW", "JOIN-1"),
    gate=False,
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events⋈customer revenue-by-segment THROUGH a salted join — the
    manual skew-mitigation pattern, declared so its one hard invariant
    is hash-pinned: salting must be semantically invisible (the oracle
    is the PLAIN join).

    The fixture's events stream is maximally skewed (~150 distinct
    users over any row count — every key is hot). A vanilla shuffle
    join lands each hot key on ONE reducer; here the fact side gets a
    deterministic salt (event_id mod 16) and the dim side replicates
    ×16 via explode(sequence(...)), so the join key (user, salt)
    spreads every hot key across 16 reducers. Trade: 16× the dim rows
    shuffle (dims are small — that's why the dim side takes the
    fan-out) for 16× the parallelism on the skewed side. AQE's
    skew-split handles moderate skew without this; the manual salt is
    for the pathological key that exceeds a single executor's spill
    budget even post-split.

    The value sum crosses the engine boundary as e6 integer units
    (order-free BIGINT sum — float summation order would differ under
    the salted regrouping, which is exactly the bug class the pin
    exists to catch); NULL values drop from SUM identically."""
    ev = read_events(spark, sf_dir).withColumn(
        # coalesce: a NULL event_id must salt to a real bucket (0), not a
        # NULL salt that the equi-join would silently drop — salting is
        # semantically invisible, so null-key rows join exactly as in the
        # plain-join oracle.
        "salt",
        F.coalesce(
            F.pmod(F.col("event_id"), F.lit(SALT_FANOUT)), F.lit(0)
        ).cast("int"),
    )
    cust = read_table(spark, sf_dir, "customer").withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(SALT_FANOUT - 1)))
    )
    joined = ev.join(
        cust,
        (ev["user_id"] == cust["c_custkey"]) & (ev["salt"] == cust["salt"]),
    )
    e6 = F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(e6).alias("sum_value_e6"),
    )


# ---------------------------------------------------------------------------
# EXT-SKEW / JOIN-3 — Bloom-filter join pruning: the broadcast bit-set
# that replaces a shuffle semi-join at 100 TB, built deterministically
# (md5 positions) so both engines compute the identical filter
# ---------------------------------------------------------------------------
BLOOM_BITS = 4096  # m: filter size in bits (128 32-bit-packed words)
BLOOM_K = 3  # hash functions per key
_BLOOM_SEG = "MACHINERY"  # the selective dim predicate being pruned for


def _bloom_pos_sql(key: str, j: str) -> str:
    from w4h_etl_container_spark.plans.textops import _nib_sql

    md5 = f"md5('b' || {j} || ':' || CAST({key} AS VARCHAR))"
    return f"({_nib_sql(md5, 8)}) % {BLOOM_BITS}"


def _bloom_prune_sql() -> str:
    seeds = ", ".join(f"({j})" for j in range(BLOOM_K))
    return f"""
    WITH dim AS (
      SELECT c_custkey AS k FROM customer WHERE c_mktsegment = '{_BLOOM_SEG}'
    ),
    bits AS (
      SELECT {_bloom_pos_sql('dim.k', 's.j')} AS pos
      FROM dim CROSS JOIN (VALUES {seeds}) s(j)
    ),
    words AS (
      SELECT pos // 32 AS word,
             bit_or(1::BIGINT << CAST(pos % 32 AS INTEGER)) AS wbits
      FROM bits GROUP BY 1
    ),
    probes AS (
      SELECT o.o_orderkey, o.o_custkey, o.o_orderpriority,
             {_bloom_pos_sql('o.o_custkey', 's.j')} AS pos
      FROM orders o CROSS JOIN (VALUES {seeds}) s(j)
    ),
    checked AS (
      SELECT p.o_orderkey, p.o_custkey, p.o_orderpriority,
             BOOL_AND(((COALESCE(w.wbits, 0) >> CAST(p.pos % 32 AS INTEGER)) & 1) = 1) AS pass
      FROM probes p LEFT JOIN words w ON w.word = p.pos // 32
      GROUP BY 1, 2, 3
    )
    SELECT c.o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN c.pass THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pass,
           CAST(SUM(CASE WHEN d.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
           CAST(SUM(CASE WHEN c.pass AND d.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
    FROM checked c LEFT JOIN dim d ON d.k = c.o_custkey
    GROUP BY 1
    """


@register(
    "q_bloom_prune",
    sql=_bloom_prune_sql(),
    survey_ids=("EXT-SKEW", "JOIN-3", "EXT-SKETCH"),
    gate=False,
)
def q_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join pruning, made deterministic and hash-pinned:
    build a 4096-bit / 3-hash Bloom filter over the custkeys of one
    market segment, probe every order against it as pure expressions
    over a BROADCAST 1-row bit-set, and report per-priority how many
    orders pass the filter vs truly match — the false-positive column
    is the sketch's accuracy diagnostic (and ≥0 by the no-false-negative
    guarantee, which the hostile/pytest pins rely on).

    This is the manual rendering of what AQE's runtime bloom pruning
    (`spark.sql.optimizer.runtime.bloomFilter.enabled`) injects
    automatically — declared here because at 100 TB it is THE join
    technique worth pinning: the fact side never shuffles and never
    fans out; membership is K expression probes against m/8 = 512
    BYTES of broadcast state (vs a shuffle semi-join moving every
    fact row). The filter build is one map-side-combinable bit_or
    aggregate over |dim|·K positions, collapsed to ≤128 (word, bits)
    rows, then folded into a single map literal.

    Cross-engine contract: positions are md5-nibble integers (the
    dedup family's idiom), words pack 32 bits in a BIGINT (bit 63
    shifts overflow DuckDB), and every output cell is a BIGINT count.
    Spark probes via try_element_at on the broadcast map (ANSI-safe
    NULL for absent words → coalesce 0, same as the oracle's outer
    join); the engines share the FILTER, not the plan."""
    cust = read_table(spark, sf_dir, "customer")
    dim = cust.where(F.col("c_mktsegment") == _BLOOM_SEG).select(
        F.col("c_custkey").alias("k")
    )

    def pos(key: F.Column, j: int) -> F.Column:
        seeded = F.concat(F.lit(f"b{j}:"), key.cast("string"))
        return F.pmod(
            F.conv(F.substring(F.md5(seeded), 1, 8), 16, 10).cast("long"),
            F.lit(BLOOM_BITS),
        )

    bits = dim.select(
        F.explode(F.array(*[pos(F.col("k"), j) for j in range(BLOOM_K)])).alias(
            "pos"
        )
    )
    words = bits.groupBy(F.expr("pos div 32").alias("word")).agg(
        F.bit_or(
            F.expr("shiftleft(1L, CAST(pos % 32 AS INT))")
        ).alias("wbits")
    )
    bloom = words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "wbits"))).alias(
            "bloom"
        )
    )

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    probed = orders.crossJoin(F.broadcast(bloom))
    # variable-amount shifts need the SQL form (the F.shiftright binding
    # takes a Python int), so name the probe positions and test bits
    # with one expr over them
    flagged = probed.select(
        "o_orderkey",
        "o_custkey",
        "o_orderpriority",
        *[pos(F.col("o_custkey"), j).alias(f"p{j}") for j in range(BLOOM_K)],
        F.col("bloom"),
    )
    pass_expr = " AND ".join(
        f"((coalesce(try_element_at(bloom, p{j} div 32), 0L) "
        f">> CAST(p{j} % 32 AS INT)) & 1) = 1"
        for j in range(BLOOM_K)
    )
    flagged = flagged.withColumn("pass", F.expr(pass_expr))
    truth = flagged.join(
        F.broadcast(dim), flagged["o_custkey"] == dim["k"], "left"
    )
    return truth.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("pass"), 1).otherwise(0)).alias("n_bloom_pass"),
        F.sum(F.when(F.col("k").isNotNull(), 1).otherwise(0)).alias("n_true"),
        F.sum(
            F.when(F.col("pass") & F.col("k").isNull(), 1).otherwise(0)
        ).alias("n_false_pos"),
    )


# ---------------------------------------------------------------------------
# EXT-SKEW — join/shuffle key-skew diagnostics: the numbers an operator
# looks at BEFORE choosing salting / AQE skew-split / broadcast for a
# key (q_salted_join is the mitigation; this is the measurement)
# ---------------------------------------------------------------------------
@register(
    "q_key_skew",
    sql="""
    WITH per_key AS (
      SELECT event_type, user_id, COUNT(*) AS cnt
      FROM events GROUP BY event_type, user_id
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           CAST(MAX(cnt) AS BIGINT) AS max_cnt,
           CAST(SUM(cnt * cnt) AS BIGINT) AS sum_cnt_sq,
           CAST(FLOOR(CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE)
                      * 1000000.0 + 0.5) AS BIGINT) AS top_share_e6
    FROM per_key
    GROUP BY event_type
    """,
    survey_ids=("EXT-SKEW", "AGG-1"),
    gate=False,
)
def q_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(event_type) skew profile of the ``user_id`` shuffle key:
    key count, row count, the hottest key's row count and share
    (e6-rounded), and the EXACT integer concentration numerator
    Σcnt² — consumers divide by n_rows² for the Herfindahl index at
    whatever precision they want (the same emit-exact-integers
    discipline as cov_num). On the fixture this reads ~150 keys at
    top_share ≈ 1/150: every key hot — exactly the regime
    q_salted_join exists for, now measurable instead of assumed.

    Scale: two map-side-combined aggregates back to back; the second
    groups the FIRST's output (≤ |types|·|keys| rows of four
    integers). The diagnostic itself can never skew: its reduce keys
    are event types."""
    ev = read_events(spark, sf_dir)
    per_key = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return per_key.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("n_rows"),
        F.max("cnt").cast("long").alias("max_cnt"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("sum_cnt_sq"),
        F.floor(
            F.max("cnt").cast("double") / F.sum("cnt").cast("double")
            * F.lit(1000000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("top_share_e6"),
    )


# ---------------------------------------------------------------------------
# EXT-ENTITY (round 11) — fuzzy equi-join promoted into the oracle-
# checked surface. The operator (operators/entity.fuzzy_join) renders
# edit-distance-1 matching as a DELETION-VARIANT equi-join (SymSpell/
# FastSS); the oracle is the thing the operator exists to avoid — the
# cross product with a levenshtein filter — which DuckDB can afford at
# fixture scale. Hash parity therefore proves the deletion-neighborhood
# candidate generation is COMPLETE for d ≤ 1 on real keys (exact
# copies, planted single-deletions, distance-2 non-matches, and the
# incidental substitution-distance-1 neighbors among sequential ids).
# ---------------------------------------------------------------------------
_FJ_LKEY = "concat('k', lpad(CAST(doc_id AS STRING), 6, '0'))"
_FJ_LKEY_DUCK = "'k' || lpad(CAST(doc_id AS VARCHAR), 6, '0')"


def _fj_rkey(key: str) -> str:
    """Engine-shared rendering of the right key: doc_id % 3 == 0 → one
    planted deletion at position doc_id % 6 + 2; == 1 → exact copy;
    == 2 → +2 appended chars (distance 2: must NOT match)."""
    p = "(doc_id % 6 + 2)"
    return (
        f"CASE CAST(doc_id % 3 AS INTEGER) "
        f"WHEN 0 THEN concat(substr({key}, 1, CAST({p} AS INTEGER) - 1), "
        f"substr({key}, CAST({p} AS INTEGER) + 1)) "
        f"WHEN 1 THEN {key} "
        f"ELSE concat({key}, 'zz') END"
    )


@register(
    "q_fuzzy_join",
    sql=f"""
    WITH l AS (
      SELECT doc_id AS lid, {_FJ_LKEY_DUCK} AS lkey FROM documents
    ), r AS (
      SELECT doc_id AS rid, {_fj_rkey(_FJ_LKEY_DUCK)} AS rkey FROM documents
    )
    SELECT lid, rid, CAST(levenshtein(lkey, rkey) AS BIGINT) AS dist
    FROM l JOIN r ON levenshtein(lkey, rkey) <= 1
    """,
    survey_ids=("EXT-ENTITY",),
)
def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 entity join, candidates from deletion variants
    only (never the cross product the oracle spells). Scale: the
    variant explode multiplies rows by ~key length, the candidate join
    is an ordinary hash equi-join on the variant string (AQE-skew-
    splittable), exact levenshtein runs on candidates alone."""
    from w4h_etl_container_spark.operators.entity import fuzzy_join

    docs = read_table(spark, sf_dir, "documents")
    left = docs.selectExpr("doc_id AS lid", f"{_FJ_LKEY} AS lkey")
    right = docs.selectExpr("doc_id AS rid", f"{_fj_rkey(_FJ_LKEY)} AS rkey")
    return fuzzy_join(left, right, "lkey", "rkey").select("lid", "rid", "dist")
