"""SparkSession factory.

One place that encodes the engine's execution-model choices (SURVEY.md §4):
AQE on (runtime coalesce + skew-join handling), Arrow on (vectorized
pandas-UDF boundary), UTC-naive timestamps (the reference keeps tz-naive UTC,
``main.py:227,239`` of the reference), and a shuffle-partition count sized for
the local test harness but overridable for cluster runs.

At 100 TB these settings change per-deployment; everything here is plain
Spark conf so a cluster submit can override via ``--conf``.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import SparkSession


def get_spark(app_name: str = "w4h-etl-spark", *, shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``SPARK_GRAFT_CPUS`` sets local parallelism (driver contract);
    ``shuffle_partitions`` defaults to the same so local runs don't create
    thousands of empty tasks. On a real cluster, leave AQE to coalesce.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime shuffle-partition coalescing, skew-join splitting,
        # dynamic broadcast conversion — the 100 TB safety net.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # FAIR task scheduling: a multi-tenant engine runs concurrent
        # queries; FIFO hands every core to the queue-head job even
        # through its low-parallelism stages (a serialized iteration, a
        # 1-task scan), idling the rest — measured 8.1 s vs 10.1 s
        # (cold-vs-warm-JVM, FAIR handicapped) for the concurrent-8
        # declared workload at sf0.1; identical for a single job.
        # The allocation file is load-bearing: without it all jobs share
        # the one "default" pool whose INTRA-pool order is FIFO (only
        # backfill, no fair sharing); the shipped file flips the default
        # pool itself to FAIR so same-pool jobs round-robin tasks.
        .config("spark.scheduler.mode", "FAIR")
        .config(
            "spark.scheduler.allocation.file",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "fairscheduler.xml"),
        )
        # Whole-stage codegen produces ONE processNext() per stage; HotSpot
        # refuses to JIT methods over ~8 KB bytecode (DontCompileHugeMethods),
        # so a kernel-heavy stage (the 210-term UTCI chain) silently runs
        # JVM-interpreted at ~4× cost. Spark's default hugeMethodLimit
        # (65535) is above the JIT limit and never triggers; aligning it
        # with HotSpot makes oversized stages fall back to per-expression
        # codegen (small, JIT-able classes) while every normal stage keeps
        # WSCG. Measured on q_utci sf0.1: 2.1 s → 0.6 s.
        .config("spark.sql.codegen.hugeMethodLimit", "8000")
        # Janino compile results are cached by generated source; the
        # default 100-entry LRU evicts a 50-query workload's stages
        # (~2-4 codegen'd stages each) before they recur. Static conf —
        # applies to the first session in the JVM.
        .config("spark.sql.codegen.cache.maxEntries", "1000")
        # PySpark 4 captures a Python stack trace per DataFrame API call to
        # enrich error origins; for kernel-sized plans (hundreds of Column
        # ops) that costs ~40% of plan construction (measured via cProfile:
        # _capture_call_site + getActiveSession per call). An engine
        # service builds plans programmatically — the enriched origin adds
        # nothing — so it's off here; ad-hoc debugging can re-enable.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # Arrow for any pandas-UDF boundary (kernel parity surface).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # Broadcast threshold comfortably covers the dimension tables and
        # the near-land mask analog (~1M narrow rows).
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # Quieter timestamp semantics: proleptic Gregorian, µs precision.
        .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        # Some fixture generations carry parquet TIMESTAMP(NANOS), which
        # Spark has no native type for — read as long; read_events()
        # dispatches on the observed dtype. Harmless for µs fixtures.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if SparkSession.getActiveSession() is None:
        builder = builder.master(master)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Catalog cache: base DataFrame per (session, parquet path). Creating a
# parquet DataFrame lists the directory and reads footers for the schema on
# the DRIVER — ~80 ms per call here, repeated for every table reference of
# every query. A real engine resolves tables through a catalog that holds
# this metadata once; this cache is that catalog. Weak-keyed by session so
# a stopped session's relations aren't resurrected, and keyed by absolute
# path so different scale factors never alias. Fixture tables are immutable
# for a session's lifetime (the driver contract), so no invalidation.
_TABLE_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[str, object]]" = (
    weakref.WeakKeyDictionary()
)


def read_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one fixture table. Plain parquet scan: schema from footer,
    column pruning + predicate pushdown come free from Catalyst; the base
    relation is catalog-cached per session (driver-side metadata only —
    executors still scan the files per query)."""
    # Defensive: the driver may hand us a session built without our factory;
    # this legacy conf is dynamic, so set it here too (needed for events.ts).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    cache = _TABLE_CACHE.setdefault(spark, {})
    path = table_path(sf_dir, name)
    df = cache.get(path)
    if df is None:
        df = cache[path] = spark.read.parquet(path)
    return df


def parallelize_compute(df, partitions: int | None = None, key: str | None = None):
    """Spread a scan across the cluster BEFORE a compute-heavy projection.

    A parquet scan gets one task per input split — and a single-row-group
    file (small fixtures; any compact input) is ONE split, so a heavy
    kernel chain over it runs on one core no matter the cluster size
    (measured: the 3-kernel thermal suite at sf0.1 ran single-threaded).
    An explicit round-robin ``repartition(n)`` costs one small shuffle of
    the input columns and buys n-way kernel parallelism; the explicit
    count keeps AQE from coalescing it back below the advisory size.
    Use only ahead of expensive per-row compute — plain scans and
    already-shuffling aggregations don't need it.

    Scale guard: the spread is a *parallelism repair*, not a default. A
    real corpus scan at cluster scale already has thousands of splits; a
    round-robin repartition there would be a full shuffle of the input
    columns AND a parallelism ceiling (down to ``defaultParallelism``).
    So we observe the input's split count first (driver-side plan
    inspection — no job) and pass the hint through only when the scan is
    genuinely under-split.

    ``key``: hash-repartition on this (high-cardinality) column instead
    of round-robin. A keyless ``repartition(n)`` first SORTS each input
    partition's row bytes (``spark.sql.execution.sortBeforeRepartition``,
    on since SPARK-23207, so retried tasks reproduce the same
    row-to-partition assignment); hash partitioning is deterministic per
    row and skips that sort entirely — measured 1.26 s → 0.82 s on the
    q_daily_highlow kernel chain at sf0.1, same exchange, same retry
    safety. Pass the table's unique id (user_id, doc_id, …): unique keys
    cannot skew. Callers without a safe key keep round-robin."""
    if partitions is None:
        partitions = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= partitions:
        return df
    if key is not None:
        from pyspark.sql import functions as F

        return df.repartition(partitions, F.col(key))
    return df.repartition(partitions)


def read_events(spark: SparkSession, sf_dir: str):
    """events with ``ts`` as a proper (session-UTC) timestamp.

    The fixture's ``ts`` physical layout has varied across generations:
    TIMESTAMP(NANOS) parquet (read as nanosecond longs under the legacy
    conf) and plain TIMESTAMP(MICROS) (read natively as TIMESTAMP /
    TIMESTAMP_NTZ). Dispatch on the observed Spark dtype so a fixture
    regeneration can't take every events consumer down at analysis time:

    - ``bigint``: ns-epoch longs → floor-divide to µs. Integer ``div``,
      not ``/``: ns epoch values (~1.7e18) exceed double's 2⁵³ exact
      range and float division rounds the microsecond up. Lossless — the
      generator emits µs-resolution instants.
    - any timestamp type (``timestamp`` / ``timestamp_ntz``): cast to
      session-UTC ``timestamp``, matching the prior rounds' schema and
      DuckDB's TIMESTAMP semantics on the same file.

    Ingestion contract: ``ts IS NOT NULL``. The event time is the
    stream's organizing key — every temporal operator (ordering,
    windows, watermarks, as-of) has ENGINE-DEFINED rather than
    query-defined behavior on a null there (Spark sorts nulls first
    where DuckDB sorts them last; ``window(null)`` drops the row where
    ``date_trunc(null)`` groups it), so a null-ts event has no portable
    meaning. Dropped here, exactly as the JSONL boundary quarantines a
    missing required field (hostile-events finding; the fixtures always
    satisfy the contract, so oracles over the raw view agree)."""
    from pyspark.sql import functions as F

    df = _events_ts_normalized(spark, sf_dir)
    return df.where(F.col("ts").isNotNull())


def _events_ts_normalized(spark: SparkSession, sf_dir: str):
    """The raw events table with ``ts`` normalized to session-UTC
    timestamp (the dtype dispatch documented on ``read_events``).
    Shared by the clean view and the quarantine complement so the
    clean ∪ quarantine = raw partition invariant can't drift if the
    dispatch changes (ADVICE r8)."""
    from pyspark.sql import functions as F

    df = read_table(spark, sf_dir, "events")
    ts_dtype = dict(df.dtypes).get("ts", "")
    if ts_dtype == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_dtype != "timestamp":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def read_embeddings(spark: SparkSession, sf_dir: str):
    """embeddings with the vector-ingestion contract enforced:
    ``embedding IS NOT NULL``.

    Distance to a null vector is undefined in every similarity operator
    (and a None array crashes any Arrow kernel's ``np.stack`` outright —
    hostile-embeddings finding, all seven vector queries), so null rows
    drop at the boundary exactly as null event times do in
    ``read_events``. Fixtures always satisfy the contract, so oracles
    over the raw view agree. Per-ELEMENT hygiene (NaN/Inf components)
    stays a query-level concern — the e6 stats kernel NULL-guards those
    and q_ann_lsh's hygiene columns exist to flag them.

    Auditability: rows dropped here are not silent — see
    ``read_embeddings_quarantine`` / ``ingestion_audit`` (the same
    every-row-lands-somewhere invariant the JSONL boundary keeps)."""
    from pyspark.sql import functions as F

    return read_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    )


def read_events_quarantine(spark: SparkSession, sf_dir: str):
    """The events rows ``read_events`` drops (null ``ts`` after the
    dtype dispatch) — the parquet boundary's quarantine view, mirroring
    the JSONL boundary's invariant that every input row lands in
    exactly ONE of (clean, quarantine). ``read_events(...)`` ∪ this
    = the raw table, disjointly (pinned in tests). Derives from the
    same ``_events_ts_normalized`` view as the clean side."""
    from pyspark.sql import functions as F

    return _events_ts_normalized(spark, sf_dir).where(F.col("ts").isNull())


def read_embeddings_quarantine(spark: SparkSession, sf_dir: str):
    """The embeddings rows ``read_embeddings`` drops (null vector) —
    the quarantine complement (see ``read_events_quarantine``)."""
    from pyspark.sql import functions as F

    return read_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNull()
    )


def ingestion_audit(spark: SparkSession, sf_dir: str):
    """One-row-per-contract audit of the parquet ingestion boundary:
    (table, n_total, n_clean, n_quarantined) for every read_* that
    enforces a contract. n_clean + n_quarantined = n_total by
    construction (clean and quarantine are predicate complements over
    the same scan — the metric hook ADVICE asked for: corpus loss at
    the boundary is countable, not silent). One scan per table; the
    counts are cheap aggregate jobs a pipeline run logs once."""
    from functools import reduce

    from pyspark.sql import functions as F

    def audit(name, clean, quarantined):
        return (
            clean.select(F.lit(1).alias("one"))
            .agg(F.count(F.lit(1)).alias("n_clean"))
            .crossJoin(
                quarantined.select(F.lit(1).alias("one"))
                .agg(F.count(F.lit(1)).alias("n_quarantined"))
            )
            .select(
                F.lit(name).alias("table"),
                (F.col("n_clean") + F.col("n_quarantined")).alias("n_total"),
                "n_clean",
                "n_quarantined",
            )
        )

    parts = [
        audit(
            "events",
            read_events(spark, sf_dir),
            read_events_quarantine(spark, sf_dir),
        ),
        audit(
            "embeddings",
            read_embeddings(spark, sf_dir),
            read_embeddings_quarantine(spark, sf_dir),
        ),
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


def read_table_evolved(spark: SparkSession, path: str):
    """Read a parquet dataset whose FILES may carry heterogeneous
    schemas — the operational reality of a long-lived 100 TB table
    (columns get added over ingestion generations).

    ``mergeSchema`` makes Spark reconcile the union schema across ALL
    file footers (older files' missing columns read as NULL) instead of
    trusting one arbitrary footer — without it, whether a late-added
    column is visible depends on WHICH file Spark samples, i.e. on
    directory listing order: a silent, nondeterministic column drop
    (pinned in tests/test_schema_evolution.py). The cost is one footer
    read per file at planning time, which is why it's a separate entry
    point rather than the default ``read_table`` (fixture tables are
    single-generation by contract).

    Type CHANGES across generations raise at read — Spark's parquet
    merge accepts added/removed columns but refuses a changed column
    type, including int32 → int64 widening (pinned in tests): the
    correct loud failure for a drifted table history, where the fix
    is an explicit migration rewrite, not a silent cast."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.option("mergeSchema", "true").parquet(path)


def migrate_table(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    cast_map: dict[str, str],
    strict: bool = True,
) -> dict:
    """The explicit migration rewrite ``read_table_evolved``'s refusal
    prescribes: when a table's generations drifted a column's TYPE, the
    fix is a one-time rewrite under a DECLARED cast map, not a silent
    coerce at read time.

    Each file generation is read with ITS OWN footer schema (per-file
    listing, no mergeSchema — the type conflict that made the merged
    read refuse is exactly why), ``cast_map`` columns are cast with
    ``try_cast``; under ``strict=True`` (default) any value a cast
    NULLs that wasn't NULL before raises with the per-column count —
    a lossy migration must be opted into, never discovered later.
    Generations are unioned by name (missing columns NULL-fill, the
    add-only evolution mergeSchema already accepts) and rewritten to
    ``out_path`` (publish-then-swap, as every rewrite job here).

    Returns {"rows", "files_in", "lossy_nulls": {col: n}} — counts an
    audit can log."""
    import os

    from pyspark.sql import functions as F
    from functools import reduce

    files = [
        os.path.join(in_path, f)
        for f in sorted(os.listdir(in_path))
        if f.endswith(".parquet")
    ]
    if not files:
        raise ValueError(f"migrate_table: no parquet files under {in_path}")

    # group files by their OWN schema so each generation reads natively
    gens: dict[str, list[str]] = {}
    for f in files:
        sch = spark.read.parquet(f).schema.json()
        gens.setdefault(sch, []).append(f)

    all_cols: list[str] = []
    parts = []
    for paths in gens.values():
        df = spark.read.parquet(*paths)
        for c in df.columns:
            if c not in all_cols:
                all_cols.append(c)
        parts.append(df)

    lossy = {c: 0 for c in cast_map}
    casted = []
    for df in parts:
        cols = []
        for c in all_cols:
            if c not in df.columns:
                cols.append(F.lit(None).alias(c))
            elif c in cast_map:
                cols.append(F.col(c).try_cast(cast_map[c]).alias(c))
            else:
                cols.append(F.col(c))
        out = df.select(*cols)
        for c in cast_map:
            if c in df.columns:
                n = df.where(
                    F.col(c).isNotNull()
                    & F.col(c).try_cast(cast_map[c]).isNull()
                ).count()
                lossy[c] += n
        casted.append(out)

    if strict and any(lossy.values()):
        raise ValueError(
            f"migrate_table: lossy casts under strict=True: "
            f"{ {c: n for c, n in lossy.items() if n} } — rerun with "
            f"strict=False to accept NULLing those values"
        )
    merged = reduce(lambda a, b: a.unionByName(b), casted)
    merged.write.mode("overwrite").parquet(out_path)
    n = spark.read.parquet(out_path).count()
    return {"rows": n, "files_in": len(files), "lossy_nulls": lossy}
