"""Data-quality operators (SURVEY.md §2.11 extension surface) — the
two governance primitives a warehouse runs before anything else touches
a landed batch:

* **Expectation suite** (``q_dq_report``): a declarative constraint
  table — null/range checks, key uniqueness, referential integrity —
  evaluated as ONE conditional-aggregation pass per fact table plus one
  anti-join per foreign key, emitting the per-constraint violation
  report (the Deequ/Great-Expectations shape, Spark-first).
* **SCD Type-2 build** (``q_scd2``): collapse an event stream into
  validity intervals per user — only state CHANGES open a new interval
  (classic CDC → slowly-changing-dimension compression), with
  ``valid_to = NULL`` marking the current row.

Reference scope note: the reference pipeline has no DQ layer; these
extend the engine the same way the corpus operators do (BASELINE.json
extension mandate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from w4h_etl_container_spark.plans.registry import register
from w4h_etl_container_spark.session import read_events, read_table


def _dq_sql() -> str:
    return """
    WITH o AS (
      SELECT COUNT(*) AS n,
             COUNT(*) - COUNT(CASE WHEN o_totalprice > 0 THEN 1 END) AS v_price,
             COUNT(*) - COUNT(o_orderdate) AS v_date,
             COUNT(*) - COUNT(DISTINCT o_orderkey) AS v_pk
      FROM orders
    ),
    l AS (
      SELECT COUNT(*) AS n,
             COUNT(*) - COUNT(CASE WHEN l_quantity > 0 THEN 1 END) AS v_qty,
             COUNT(*) - COUNT(CASE WHEN l_discount >= 0 AND l_discount <= 1 THEN 1 END) AS v_disc,
             COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS v_pk
      FROM lineitem
    ),
    o_ref AS (
      -- NOT EXISTS, not NOT IN: a NULL parent key must not null out the
      -- whole predicate; this matches Spark's LEFT ANTI exactly
      SELECT COUNT(*) AS v FROM orders o2
      WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o2.o_custkey)
    ),
    l_ref AS (
      SELECT COUNT(*) AS v FROM lineitem l2
      WHERE NOT EXISTS (SELECT 1 FROM orders o3 WHERE o3.o_orderkey = l2.l_orderkey)
    )
    SELECT * FROM (
      SELECT 'orders_totalprice_positive' AS constraint_name, n AS n_checked, v_price AS n_violations FROM o
      UNION ALL SELECT 'orders_orderdate_not_null', n, v_date FROM o
      UNION ALL SELECT 'orders_orderkey_unique', n, v_pk FROM o
      UNION ALL SELECT 'orders_custkey_in_customer', n, (SELECT v FROM o_ref) FROM o
      UNION ALL SELECT 'lineitem_quantity_positive', n, v_qty FROM l
      UNION ALL SELECT 'lineitem_discount_unit_interval', n, v_disc FROM l
      UNION ALL SELECT 'lineitem_pk_unique', n, v_pk FROM l
      UNION ALL SELECT 'lineitem_orderkey_in_orders', n, (SELECT v FROM l_ref) FROM l
    )
    """


@register(
    "q_dq_report",
    sql=_dq_sql(),
    survey_ids=("EXT-DQ", "AGG-4"),
    gate=False,
)
def q_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation-suite violation report over orders/lineitem/customer:
    8 constraints, 3 columns (constraint_name, n_checked, n_violations).

    Plan shape — the part that matters at 100 TB: every per-table
    constraint (null, range, PK-uniqueness) folds into ONE aggregation
    pass over that table (conditional counts share the scan; uniqueness
    is count − count(distinct pk), a partial-aggregating shuffle, not a
    self-join). Referential checks are LEFT ANTI joins against the
    DISTINCT key projection of the parent — broadcast when the parent
    is dim-sized (customer), shuffle-hash on the fact key otherwise —
    and reuse the fact count already computed, so each FK costs exactly
    one join. Nothing collects to the driver; the report is itself a
    DataFrame a pipeline can sink or gate on.

    NULL semantics: a NULL fails a range expectation (it is not
    provably in range) — both sides count violations as
    ``n − count(CASE WHEN pred THEN 1 END)``, which treats NULL and
    false identically."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    cust = read_table(spark, sf_dir, "customer")

    n1 = F.count(F.lit(1))

    def viol(pred):
        return (n1 - F.count(F.when(pred, 1))).cast("long")

    o = orders.agg(
        n1.alias("n"),
        viol(F.col("o_totalprice") > 0).alias("v_price"),
        (n1 - F.count("o_orderdate")).cast("long").alias("v_date"),
        (n1 - F.count_distinct("o_orderkey")).cast("long").alias("v_pk"),
    )
    l = li.agg(
        n1.alias("n"),
        viol(F.col("l_quantity") > 0).alias("v_qty"),
        viol((F.col("l_discount") >= 0) & (F.col("l_discount") <= 1)).alias("v_disc"),
        (n1 - F.count_distinct("l_orderkey", "l_linenumber")).cast("long").alias("v_pk"),
    )
    o_ref = orders.join(
        F.broadcast(cust.select("c_custkey").distinct()),
        orders["o_custkey"] == F.col("c_custkey"),
        "left_anti",
    ).agg(n1.alias("v"))
    l_ref = li.join(
        orders.select("o_orderkey").distinct(),
        li["l_orderkey"] == F.col("o_orderkey"),
        "left_anti",
    ).agg(n1.alias("v"))

    o_rows = o.crossJoin(F.broadcast(o_ref)).select(
        F.expr(
            "stack(4,"
            " 'orders_totalprice_positive', n, v_price,"
            " 'orders_orderdate_not_null', n, v_date,"
            " 'orders_orderkey_unique', n, v_pk,"
            " 'orders_custkey_in_customer', n, v) AS (constraint_name, n_checked, n_violations)"
        )
    )
    l_rows = l.crossJoin(F.broadcast(l_ref)).select(
        F.expr(
            "stack(4,"
            " 'lineitem_quantity_positive', n, v_qty,"
            " 'lineitem_discount_unit_interval', n, v_disc,"
            " 'lineitem_pk_unique', n, v_pk,"
            " 'lineitem_orderkey_in_orders', n, v) AS (constraint_name, n_checked, n_violations)"
        )
    )
    return o_rows.unionAll(l_rows)


def _scd2_sql() -> str:
    return """
    WITH ev AS (
      SELECT user_id, event_type, ts, event_id FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    ),
    ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM ev
    ),
    changes AS (
      SELECT user_id, event_type AS state, ts AS valid_from, event_id
      FROM ordered WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id, state, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id) AS valid_to,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id) IS NULL AS is_current
    FROM changes
    """


@register(
    "q_scd2",
    sql=_scd2_sql(),
    survey_ids=("EXT-DQ", "WIN-3"),
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 interval build from the event stream: per user, each
    run of consecutive identical event_type states compresses to one
    row ``(user_id, state, valid_from, valid_to, is_current)`` —
    valid_to is the next state's start (half-open intervals), NULL on
    the current row.

    Two window passes, both partitioned by user_id with the
    (ts, event_id) total order (event_id breaks same-microsecond ties
    deterministically — the hostile fixture ships duplicate (user, ts)
    pairs): LAG to keep only change rows, LEAD to close each interval.
    One shuffle total — both windows share the partitioning, so
    Catalyst plans a single exchange; per-user state is the window
    sort, which spills rather than OOMs on a pathological single-user
    stream. This is the CDC-compaction shape: output rows = number of
    state CHANGES, not number of events — the compression that makes a
    dimension table queryable at all."""
    ev = (
        read_events(spark, sf_dir)
        .where(F.col("user_id").isNotNull() & F.col("event_type").isNotNull())
        .select("user_id", "event_type", "ts", "event_id")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .where(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
            "event_id",
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return changes.select(
        "user_id",
        "state",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# EXT-DQ — table content digest: order-free per-bucket fingerprints so
# two copies of a 100 TB table can be compared by exchanging 64 rows
# (replication / migration / backfill audit) instead of re-reading
# either side twice
# ---------------------------------------------------------------------------
DIGEST_BUCKETS = 64


def _digest_row_sql() -> str:
    from w4h_etl_container_spark.plans.textops import _nib_sql

    row = (
        "COALESCE(CAST(l_orderkey AS VARCHAR), '∅') || ':' || "
        "COALESCE(CAST(l_linenumber AS VARCHAR), '∅') || ':' || "
        "COALESCE(CAST(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS VARCHAR), '∅') || ':' || "
        "COALESCE(l_returnflag, '∅')"
    )
    return _nib_sql(f"md5({row})", 15)


def _table_digest_sql() -> str:
    return f"""
    SELECT l_orderkey % {DIGEST_BUCKETS} AS bucket,
           COUNT(*) AS n_rows,
           CAST(bit_xor({_digest_row_sql()}) AS BIGINT) AS digest
    FROM lineitem
    GROUP BY 1
    """


@register(
    "q_table_digest",
    sql=_table_digest_sql(),
    survey_ids=("EXT-DQ", "AGG-1"),
    gate=False,
)
def q_table_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy content digest of ``lineitem``: each row collapses
    to a 60-bit md5 fingerprint of its canonicalized key+payload
    rendering (NULLs spelled explicitly — concat_ws's silent null-skip
    would make ('a',NULL,'b') and ('a','b') collide), XOR-folded per
    orderkey bucket. XOR is commutative/associative ⇒ the digest is
    partition-order-free and incrementally maintainable (a row's
    insert and delete cancel), which is why replica comparison,
    backfill verification, and CDC reconciliation all reduce to
    diffing these 64 (bucket, n_rows, digest) rows — any single-cell
    corruption flips its bucket's digest with probability 1−2⁻⁶⁰.

    Shape: ONE map-side-combinable aggregate over the scan; the
    shuffle carries ≤ 64 rows per partition. The same plan at 100 TB
    is bounded by the scan, which is the floor for any audit."""
    li = read_table(spark, sf_dir, "lineitem")
    nul = F.lit("∅")
    row = F.concat_ws(
        ":",
        F.coalesce(F.col("l_orderkey").cast("string"), nul),
        F.coalesce(F.col("l_linenumber").cast("string"), nul),
        F.coalesce(
            F.floor(F.col("l_extendedprice") * F.lit(100.0) + F.lit(0.5))
            .cast("long")
            .cast("string"),
            nul,
        ),
        F.coalesce(F.col("l_returnflag"), nul),
    )
    fp = F.conv(F.substring(F.md5(row), 1, 15), 16, 10).cast("long")
    return (
        li.groupBy(F.pmod(F.col("l_orderkey"), F.lit(DIGEST_BUCKETS)).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.bit_xor(fp).alias("digest"),
        )
    )


def table_digest(df: DataFrame, key: F.Column, row_repr: F.Column, buckets: int = DIGEST_BUCKETS) -> DataFrame:
    """Generic rendering of q_table_digest for ANY relation: bucket on
    ``key`` (pmod), fingerprint each row as the 60-bit md5 of
    ``row_repr`` (caller canonicalizes — spell NULLs explicitly), XOR-
    fold per bucket. See q_table_digest for the anti-entropy contract."""
    fp = F.conv(F.substring(F.md5(row_repr), 1, 15), 16, 10).cast("long")
    return df.groupBy(F.pmod(key, F.lit(buckets)).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.bit_xor(fp).alias("digest"),
    )


def digest_diff(mine: DataFrame, theirs: DataFrame) -> DataFrame:
    """Compare two digest frames (bucket, n_rows, digest) — the 64-row
    exchange that replaces a full-table comparison: returns one row per
    bucket that disagrees, with both sides' counts/digests (NULL where
    a bucket exists on one side only). Empty result ⇔ the tables'
    canonicalized contents are equal bucket-for-bucket (up to the
    2⁻⁶⁰ XOR collision bound). At 100 TB each side computes its 64
    rows locally and ships ONLY those — this join never sees data."""
    a = mine.select(
        "bucket",
        F.col("n_rows").alias("n_rows_mine"),
        F.col("digest").alias("digest_mine"),
    )
    b = theirs.select(
        "bucket",
        F.col("n_rows").alias("n_rows_theirs"),
        F.col("digest").alias("digest_theirs"),
    )
    j = a.join(b, "bucket", "full_outer")
    return j.where(
        ~(
            F.col("n_rows_mine").eqNullSafe(F.col("n_rows_theirs"))
            & F.col("digest_mine").eqNullSafe(F.col("digest_theirs"))
        )
    )
