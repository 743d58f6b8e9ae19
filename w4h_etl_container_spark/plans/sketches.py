"""Mergeable sketch operators over ``events`` (SURVEY.md §2.11 extension
surface) — the two sketches a 100 TB profiling pass actually ships:

* **KMV (k-minimum-values)** distinct-count — the mergeable cardinality
  sketch: keep the k smallest distinct hash values per group; the k-th
  smallest estimates the cardinality as ``(k-1) / (kth / 2^60)``.
  Fixed-size state per group regardless of input cardinality — the
  whole point at scale, where ``COUNT(DISTINCT)`` shuffles every
  distinct key.
* **Count-min** heavy-hitter frequency — d×w counter matrix; a key's
  frequency estimate is the MIN over its d bucket counters
  (overestimates only). The sketch is d·w integers TOTAL (here 4×64),
  so the map-side combine collapses any input volume into 256 cells
  before the shuffle.

Both are engine-neutral (md5-keyed, the same ``conv``/nibble idiom the
dedup family uses — textops._nib_sql) so every compared cell is an
integer or an identically-computed IEEE double: full hash oracles.

Reference scope note: the reference pipeline has no sketches; these
extend the engine the same way the corpus/vector operators do
(BASELINE.json extension mandate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from w4h_etl_container_spark.plans.registry import register
from w4h_etl_container_spark.plans.textops import _nib_sql
from w4h_etl_container_spark.session import read_events

# KMV keeps the K smallest distinct 60-bit hashes per group. 2^60 is the
# hash domain (15 md5 hex nibbles); 31 * 2^60 is exact in double (5-bit
# mantissa), so the estimate's float arithmetic is bit-identical across
# engines.
KMV_K = 32
_DOMAIN = float(1 << 60)  # 1152921504606846976.0

# Count-min geometry: d seeded rows × w buckets. 256 total counters —
# the sketch a stream profiler merges across a million partitions.
CMS_D = 4
CMS_W = 64
CMS_TOPN = 10


def _kmv_sql() -> str:
    h = _nib_sql("md5(CAST(user_id AS VARCHAR))", 15)
    return f"""
    WITH hashes AS (
      SELECT DISTINCT event_type, {h} AS h
      FROM events WHERE user_id IS NOT NULL
    ),
    ranked AS (
      SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM hashes
    ),
    mins AS (
      SELECT event_type, COUNT(*) AS n_mins, MAX(h) AS kth_min
      FROM ranked WHERE rn <= {KMV_K} GROUP BY event_type
    ),
    exact AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
      FROM events WHERE user_id IS NOT NULL GROUP BY event_type
    )
    SELECT m.event_type, m.n_mins, m.kth_min,
           FLOOR((CASE WHEN m.n_mins < {KMV_K} THEN CAST(m.n_mins AS DOUBLE)
                       ELSE {KMV_K - 1}.0 * {_DOMAIN!r} / CAST(m.kth_min AS DOUBLE)
                  END) * 1000000.0 + 0.5) / 1000000.0 AS est_users,
           x.exact_users
    FROM mins m JOIN exact x ON m.event_type IS NOT DISTINCT FROM x.event_type
    """


@register(
    "q_kmv_distinct",
    sql=_kmv_sql(),
    survey_ids=("EXT-SKETCH", "AGG-2"),
)
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-user sketch per event_type, with the exact count
    alongside (the accuracy diagnostic a profiler prints): the K=32
    smallest distinct 60-bit md5 hashes per group; if a group yields
    fewer than K distinct hashes the sketch IS the exact set
    (estimate = n_mins), else est = (K-1)·2^60 / kth_min.

    Scale: the heavy reduction is the DISTINCT on (group, hash) — one
    shuffle with map-side partial dedup, exactly what COUNT(DISTINCT)
    costs. The rank step then sorts only the surviving distinct hashes
    inside each group's partition (WindowExec spills, never OOMs); a
    production deployment replaces it with a bounded k-min aggregator
    (same contract, 32 longs of state) and merges sketches across days
    without re-reading them — the mergeability is why KMV beats exact
    distinct at 100 TB. Estimate arithmetic is IEEE-identical across
    engines: 31·2^60 exact in double, one rounding at the long→double
    cast of kth_min, one division."""
    ev = read_events(spark, sf_dir).where(F.col("user_id").isNotNull())
    h = F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    hashes = ev.select("event_type", h.alias("h")).distinct()
    rn = F.row_number().over(Window.partitionBy("event_type").orderBy("h"))
    mins = (
        hashes.withColumn("rn", rn)
        .where(F.col("rn") <= KMV_K)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_mins"), F.max("h").alias("kth_min"))
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    est = F.when(
        F.col("n_mins") < KMV_K, F.col("n_mins").cast("double")
    ).otherwise(F.lit(float(KMV_K - 1)) * F.lit(_DOMAIN) / F.col("kth_min").cast("double"))
    r6 = F.floor(est * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)
    # alias both sides: they share lineage (one events scan), and an
    # unaliased eqNullSafe on same-named columns resolves both legs to
    # the SAME attribute (Spark's "trivially true equals" warning)
    m, x = mins.alias("kmv_m"), exact.alias("kmv_x")
    return (
        m.join(x, F.col("kmv_m.event_type").eqNullSafe(F.col("kmv_x.event_type")))
        .select(
            F.col("kmv_m.event_type").alias("event_type"),
            "n_mins",
            "kth_min",
            r6.alias("est_users"),
            "exact_users",
        )
    )


def _cms_sql() -> str:
    seeds = ", ".join(f"({r})" for r in range(CMS_D))
    def bucket(user: str) -> str:
        md5 = "md5('s' || s.r || ':' || CAST(" + user + " AS VARCHAR))"
        return f"({_nib_sql(md5, 8)}) % {CMS_W}"
    return f"""
    WITH ev AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
    cells AS (
      SELECT s.r, {bucket('ev.user_id')} AS bucket,
             COUNT(*) AS cell_cnt
      FROM ev CROSS JOIN (VALUES {seeds}) s(r)
      GROUP BY 1, 2
    ),
    top AS (
      SELECT user_id, COUNT(*) AS true_cnt FROM ev GROUP BY user_id
      ORDER BY true_cnt DESC, user_id LIMIT {CMS_TOPN}
    )
    SELECT t.user_id, t.true_cnt, CAST(MIN(c.cell_cnt) AS BIGINT) AS cms_cnt
    FROM top t CROSS JOIN (VALUES {seeds}) s(r)
    JOIN cells c
      ON c.r = s.r
     AND c.bucket = {bucket('t.user_id')}
    GROUP BY t.user_id, t.true_cnt
    """


def _cms_bucket(user: F.Column, r: int) -> F.Column:
    seeded = F.concat(F.lit(f"s{r}:"), user.cast("string"))
    return (
        F.conv(F.substring(F.md5(seeded), 1, 8), 16, 10).cast("long") % CMS_W
    )


@register(
    "q_heavy_hitters",
    sql=_cms_sql(),
    survey_ids=("EXT-SKETCH", "AGG-3"),
    gate=False,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min heavy hitters: the 4×64 counter sketch built in ONE
    map-side-combined pass (each event contributes to 4 cells; the
    shuffle moves at most 256 rows per input partition), then the
    top-10 true-frequency users read their estimate as the MIN over
    their 4 cells — the classic ≥-true overestimate bound, visible in
    the output as cms_cnt ≥ true_cnt.

    Scale: the sketch side never grows — 256 cells whatever the input;
    at 100 TB the true-count side is the expensive half (a full
    groupBy), which is exactly the point the sketch makes: a stream
    profiler keeps ONLY the 256 cells and answers point frequency
    queries without the groupBy. The probe joins the top users against
    the broadcast 256-row sketch. Ties at the top-10 boundary break on
    user_id, so the reported set is deterministic in both engines."""
    ev = read_events(spark, sf_dir).where(F.col("user_id").isNotNull())
    u = F.col("user_id")
    cells = (
        ev.select(
            F.posexplode(
                F.array(*[_cms_bucket(u, r) for r in range(CMS_D)])
            ).alias("r", "bucket")
        )
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cell_cnt"))
    )
    top = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.col("true_cnt").desc(), "user_id")
        .limit(CMS_TOPN)
    )
    probes = top.select(
        "user_id",
        "true_cnt",
        F.posexplode(
            F.array(*[_cms_bucket(F.col("user_id"), r) for r in range(CMS_D)])
        ).alias("r", "bucket"),
    )
    return (
        probes.join(F.broadcast(cells), ["r", "bucket"])
        .groupBy("user_id", "true_cnt")
        .agg(F.min("cell_cnt").alias("cms_cnt"))
    )


def _kmv_est_sql(n: str, kth: str) -> str:
    return (
        f"CASE WHEN {n} < {KMV_K} THEN CAST({n} AS DOUBLE) "
        f"ELSE {KMV_K - 1}.0 * {_DOMAIN!r} / CAST({kth} AS DOUBLE) END"
    )


def _kmv_setops_sql() -> str:
    h = _nib_sql("md5(CAST(user_id AS VARCHAR))", 15)
    r6 = lambda x: f"FLOOR(({x}) * 1000000.0 + 0.5) / 1000000.0"  # noqa: E731
    ea, eb = _kmv_est_sql("sa.n", "sa.kth"), _kmv_est_sql("sb.n", "sb.kth")
    eu = _kmv_est_sql("us.nu", "us.kthu")
    return f"""
    WITH hashes AS (
      SELECT DISTINCT event_type, {h} AS hh
      FROM events WHERE user_id IS NOT NULL
    ),
    ranked AS (
      SELECT event_type, hh,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hh) AS rn
      FROM hashes
    ),
    mins AS (SELECT event_type, hh FROM ranked WHERE rn <= {KMV_K}),
    stats AS (
      SELECT event_type, COUNT(*) AS n, MAX(hh) AS kth FROM mins GROUP BY 1
    ),
    upool AS (
      SELECT DISTINCT a.event_type AS ta, b.event_type AS tb, u.hh
      FROM stats a JOIN stats b ON a.event_type < b.event_type
      JOIN mins u ON u.event_type IN (a.event_type, b.event_type)
    ),
    uranked AS (
      SELECT ta, tb, hh,
             ROW_NUMBER() OVER (PARTITION BY ta, tb ORDER BY hh) AS rn
      FROM upool
    ),
    ustats AS (
      SELECT ta, tb, COUNT(*) AS nu, MAX(hh) AS kthu
      FROM uranked WHERE rn <= {KMV_K} GROUP BY 1, 2
    ),
    du AS (
      SELECT DISTINCT event_type, user_id FROM events WHERE user_id IS NOT NULL
    ),
    inter AS (
      SELECT a.event_type AS ta, b.event_type AS tb, COUNT(*) AS cnt
      FROM du a JOIN du b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT us.ta AS type_a, us.tb AS type_b,
           sa.n AS n_a, sb.n AS n_b, us.nu AS n_union,
           {r6(ea)} AS est_a, {r6(eb)} AS est_b, {r6(eu)} AS est_union,
           {r6(f"({ea}) + ({eb}) - ({eu})")} AS est_inter,
           COALESCE(i.cnt, 0) AS exact_inter
    FROM ustats us
    JOIN stats sa ON sa.event_type = us.ta
    JOIN stats sb ON sb.event_type = us.tb
    LEFT JOIN inter i ON i.ta = us.ta AND i.tb = us.tb
    """


@register(
    "q_kmv_setops",
    sql=_kmv_setops_sql(),
    survey_ids=("EXT-SKETCH", "SET-3", "JOIN-1"),
    gate=False,
)
def q_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch SET ALGEBRA — the join-size estimator: for every
    event-type pair, estimate the distinct-user union (k smallest of
    the merged min-sets is itself a valid KMV sketch of A∪B — the
    mergeability theorem) and the intersection by inclusion–exclusion,
    next to the exact overlap as the accuracy diagnostic. This is how
    a planner prices an equi-join between two 100 TB streams from
    2×K longs of state, without scanning either side.

    Spark shape: per-type min-sets collapse to ≤ K·|types| rows, then
    ALL pair math (array_union → sort → slice K) runs on broadcast-
    tiny arrays — the only corpus-scale operators are the same
    (type, hash) DISTINCT the gate sketch already pays for and the
    exact-diagnostic self-join of the distinct (type, user)
    projection. Estimates cross the engine boundary as r6 doubles
    built from IEEE-identical arithmetic (exact (K−1)·2⁶⁰ mantissa,
    one division), combined in fixed left-to-right order."""
    ev = read_events(spark, sf_dir).where(F.col("user_id").isNotNull())
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    hashes = ev.select("event_type", h.alias("hh")).distinct()
    rn = F.row_number().over(Window.partitionBy("event_type").orderBy("hh"))
    mins = hashes.withColumn("rn", rn).where(F.col("rn") <= KMV_K)
    msets = mins.groupBy("event_type").agg(
        F.sort_array(F.collect_list("hh")).alias("mins"),
        F.count(F.lit(1)).alias("n"),
        F.max("hh").alias("kth"),
    )
    a = msets.select(
        F.col("event_type").alias("type_a"),
        F.col("mins").alias("mins_a"),
        F.col("n").alias("n_a"),
        F.col("kth").alias("kth_a"),
    )
    b = msets.select(
        F.col("event_type").alias("type_b"),
        F.col("mins").alias("mins_b"),
        F.col("n").alias("n_b"),
        F.col("kth").alias("kth_b"),
    )
    pairs = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
    u = F.slice(
        F.array_sort(F.array_union(F.col("mins_a"), F.col("mins_b"))),
        1,
        KMV_K,
    )
    pairs = (
        pairs.withColumn("u", u)
        .withColumn("n_union", F.size("u").cast("long"))
        .withColumn("kthu", F.element_at(F.col("u"), F.size("u")))
    )

    def est(n: F.Column, kth: F.Column) -> F.Column:
        return F.when(n < KMV_K, n.cast("double")).otherwise(
            F.lit(float(KMV_K - 1)) * F.lit(_DOMAIN) / kth.cast("double")
        )

    r6 = lambda c: F.floor(c * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)  # noqa: E731
    ea, eb = est(F.col("n_a"), F.col("kth_a")), est(F.col("n_b"), F.col("kth_b"))
    eu = est(F.col("n_union"), F.col("kthu"))

    du = ev.select("event_type", "user_id").distinct()
    da = du.select(F.col("event_type").alias("type_a"), "user_id")
    db = du.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        da.join(db, (da["user_id"] == db["user_id"]) & (F.col("type_a") < F.col("type_b")))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        pairs.join(F.broadcast(inter), ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_union",
            r6(ea).alias("est_a"),
            r6(eb).alias("est_b"),
            r6(eu).alias("est_union"),
            r6(ea + eb - eu).alias("est_inter"),
            F.coalesce(F.col("cnt"), F.lit(0)).alias("exact_inter"),
        )
    )
