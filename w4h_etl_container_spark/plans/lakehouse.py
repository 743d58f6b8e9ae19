"""Lakehouse-layer declared queries — the manifest table
(pipeline/mtable.py) put under the same DuckDB hash oracle as every
relational operator, instead of living on pytest alone.

Each query materializes a REAL mtable in a throwaway directory (create
→ mutate → read back), so what the oracle certifies is the full
copy-on-write cycle: footer/manifest-stats pruning picked the right
files, the anti-join replaced exactly the matched keys, the union
inserted the new ones, and the committed snapshot reads back
row-for-row what a plain SQL rendering of the same upsert states.
The composite-key variant runs on lineitem's REAL primary key
(l_orderkey, l_linenumber) — the table the repo's own DQ report said a
single-column mtable could not upsert (round-11 verdict, closed in
round 12).

Scale note: the queries are self-contained cycles at fixture scale;
the 100 TB behavior (driver I/O O(new files) via manifest-persisted
stats, count-gated key collection, CAS commit) is pinned by
tests/test_mtable.py — here the ORACLE pins the semantics.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from w4h_etl_container_spark.plans.registry import register
from w4h_etl_container_spark.session import read_table


def _scratch_dir(prefix: str) -> str:
    """A throwaway mtable directory that lives until PROCESS exit (not
    function exit): the query can then return the LAZY mtable read --
    no driver-side collect/re-parallelize round-trip (round 13: that
    round-trip was ~half of q_mtable_merge's bench wall at sf0.1) --
    and the driver/oracle harness collects it like any other plan."""
    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


@register(
    "q_mtable_merge",
    sql="""
    WITH base AS (
      SELECT l_orderkey AS okey, l_linenumber AS lineno,
             SUM(l_quantity) AS qty
      FROM lineitem GROUP BY 1, 2
    )
    SELECT okey, lineno,
           CASE WHEN okey % 53 = 0 THEN -5.0 ELSE qty END AS qty
    FROM base
    UNION ALL
    SELECT okey + 100000000 AS okey, lineno, 99.0 AS qty
    FROM base WHERE okey % 211 = 0 AND lineno = 1
    """,
    survey_ids=("STR-1", "EXT-LAKEHOUSE"),
    gate=False,
)
def q_mtable_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPOSITE-KEY MERGE through the manifest table, end to end: a
    key-unique per-(l_orderkey, l_linenumber) quantity rollup (the
    fixture's lineitem repeats ~24% of key pairs, so the upsert
    invariant demands the rollup — quantities are integral doubles,
    making the sum order-independent and oracle-exact) becomes an
    mtable; an update batch rewrites the quantity of every line whose
    order key divides 53 and inserts one synthetic line per 211th
    order; the committed snapshot reads back. The oracle states the
    same upsert as CASE + UNION ALL — hash parity proves replaced rows
    were replaced (not duplicated), untouched rows survived, and
    inserts landed exactly once, through the real create→plan→
    anti-join→commit cycle (manifest-persisted per-file stats prune
    the planning; the collect path's leading-column bisect runs on
    okey). Copy-on-write at fixture scale; driver-safety pinned in
    tests/test_mtable.py."""
    from w4h_etl_container_spark.pipeline.mtable import (
        mtable_create,
        mtable_merge,
        mtable_read,
    )

    li = read_table(spark, sf_dir, "lineitem").groupBy(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("lineno"),
    ).agg(F.sum(F.col("l_quantity").cast("double")).alias("qty"))
    updates = li.where(F.col("okey") % 53 == 0).select(
        "okey", "lineno", F.lit(-5.0).alias("qty")
    ).unionByName(
        li.where((F.col("okey") % 211 == 0) & (F.col("lineno") == 1)).select(
            (F.col("okey") + 100_000_000).alias("okey"),
            "lineno",
            F.lit(99.0).alias("qty"),
        )
    )
    d = _scratch_dir("q-mtable-merge-")
    mtable_create(spark, li.repartition(8, "okey"), d)
    mtable_merge(spark, d, updates, ["okey", "lineno"])
    return mtable_read(spark, d).select("okey", "lineno", "qty")


@register(
    "q_mtable_delete",
    sql="""
    SELECT c_custkey AS ckey, c_mktsegment AS seg,
           CAST(c_acctbal AS DOUBLE) AS bal
    FROM customer WHERE c_custkey % 7 <> 0
    """,
    survey_ids=("STR-1", "EXT-LAKEHOUSE"),
    gate=False,
)
def q_mtable_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed DELETE through the manifest table: customer becomes an
    mtable, every 7th key deletes, the committed snapshot reads back —
    the oracle is the survivor filter. Hash parity proves the range-
    pruned rewrite removed exactly the keyed rows from matched files
    and re-listed every untouched file's rows verbatim."""
    from w4h_etl_container_spark.pipeline.mtable import (
        mtable_create,
        mtable_delete,
        mtable_read,
    )

    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ckey"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").cast("double").alias("bal"),
    )
    victims = cust.where(F.col("ckey") % 7 == 0).select("ckey")
    d = _scratch_dir("q-mtable-delete-")
    mtable_create(spark, cust.repartition(4, "ckey"), d)
    mtable_delete(spark, d, victims, "ckey")
    return mtable_read(spark, d).select("ckey", "seg", "bal")


@register(
    "q_mtable_merge_mor",
    sql="""
    WITH base AS (
      SELECT l_orderkey AS okey, l_linenumber AS lineno,
             SUM(l_quantity) AS qty
      FROM lineitem GROUP BY 1, 2
    )
    SELECT okey, lineno,
           CASE WHEN okey % 53 = 0 THEN -5.0 ELSE qty END AS qty
    FROM base
    UNION ALL
    SELECT okey + 100000000 AS okey, lineno, 99.0 AS qty
    FROM base WHERE okey % 211 = 0 AND lineno = 1
    """,
    survey_ids=("STR-1", "EXT-LAKEHOUSE"),
    gate=False,  # r16 late rotation: 3 rounds green; q_mtable_mv's churn-2
    # commit is now the gate's MOR representative (DV merge+delete)
)
def q_mtable_merge_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``q_mtable_merge``'s exact upsert through the MERGE-ON-READ
    path (``mode='mor'``): the replaced rows shadow into a deletion
    vector, the update batch lands as fresh files, and ZERO matched
    data files are rewritten (asserted on the manifests: the create's
    file list survives verbatim inside the merge's). Same oracle as
    the copy-on-write twin — hash parity across BOTH write paths is
    the strongest statement that DV-shadowed reads and rewritten reads
    are the same table."""
    from w4h_etl_container_spark.pipeline.mtable import (
        mtable_create,
        mtable_merge,
        mtable_read,
    )

    li = read_table(spark, sf_dir, "lineitem").groupBy(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("lineno"),
    ).agg(F.sum(F.col("l_quantity").cast("double")).alias("qty"))
    updates = li.where(F.col("okey") % 53 == 0).select(
        "okey", "lineno", F.lit(-5.0).alias("qty")
    ).unionByName(
        li.where((F.col("okey") % 211 == 0) & (F.col("lineno") == 1)).select(
            (F.col("okey") + 100_000_000).alias("okey"),
            "lineno",
            F.lit(99.0).alias("qty"),
        )
    )
    d = _scratch_dir("q-mtable-merge-mor-")
    man0 = mtable_create(spark, li.repartition(8, "okey"), d)
    man1 = mtable_merge(spark, d, updates, ["okey", "lineno"], mode="mor")
    if man1["files_rewritten"] != 0 or not (
        set(man0["files"]) <= set(man1["files"])
    ):
        raise AssertionError(
            "merge-on-read upsert must not rewrite matched data files"
        )
    return mtable_read(spark, d).select("okey", "lineno", "qty")


@register(
    "q_mtable_delete_mor",
    sql="""
    SELECT c_custkey AS ckey, c_mktsegment AS seg,
           CAST(c_acctbal AS DOUBLE) AS bal
    FROM customer WHERE c_custkey % 7 <> 0 AND c_custkey % 11 <> 0
    """,
    survey_ids=("STR-1", "EXT-LAKEHOUSE"),
    gate=False,
)
def q_mtable_delete_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-ON-READ delete through the manifest table (deletion
    vectors): customer becomes an mtable, every 7th key then every
    11th key deletes with ``mode='mor'`` — two LAYERED deletion
    vectors, ZERO data files rewritten (asserted on the manifests: the
    file list is byte-for-byte the create's) — and the committed
    snapshot reads back through the position anti-join. The oracle is
    the two-survivor filter; hash parity proves the DV read path
    deletes exactly the keyed rows and nothing else, across stacked
    shadows on the same files."""
    from w4h_etl_container_spark.pipeline.mtable import (
        mtable_create,
        mtable_delete,
        mtable_read,
    )

    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ckey"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").cast("double").alias("bal"),
    )
    d = _scratch_dir("q-mtable-delete-mor-")
    man0 = mtable_create(spark, cust.repartition(4, "ckey"), d)
    man1 = mtable_delete(
        spark, d, cust.where(F.col("ckey") % 7 == 0).select("ckey"),
        "ckey", mode="mor",
    )
    man2 = mtable_delete(
        spark, d, cust.where(F.col("ckey") % 11 == 0).select("ckey"),
        "ckey", mode="mor",
    )
    if not (man0["files"] == man1["files"] == man2["files"]):
        raise AssertionError(
            "merge-on-read delete must not touch the data file list"
        )
    return mtable_read(spark, d).select("ckey", "seg", "bal")


@register(
    "q_mtable_changes",
    sql="""
    SELECT c_custkey AS ckey,
           -1.0 AS bal,
           'update' AS _change_type
    FROM customer WHERE c_custkey % 11 = 0 AND c_custkey % 13 <> 0
    UNION ALL
    SELECT c_custkey AS ckey,
           CAST(c_acctbal AS DOUBLE) AS bal,
           'delete' AS _change_type
    FROM customer WHERE c_custkey % 13 = 0
    UNION ALL
    SELECT c_custkey + 10000000 AS ckey,
           99.0 AS bal,
           'insert' AS _change_type
    FROM customer WHERE c_custkey % 101 = 0
    """,
    survey_ids=("STR-1", "EXT-LAKEHOUSE"),
    gate=False,
)
def q_mtable_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level CHANGE FEED across two real commits, hash-checked: a
    customer-keyed mtable takes (v1) an upsert — balances of every 11th
    key rewritten, one insert per 101st key — then (v2) a delete of
    every 13th ORIGINAL key; ``mtable_changes(0, 2)`` must report
    exactly the SQL-stated facts: updates are the 11-divisible keys
    that survived the delete (post-image −1), deletes carry the
    PRE-image balance from version 0 (an updated-then-deleted key —
    11·13 divisors — reports its v0 value: the intermediate v1 file is
    in neither endpoint and therefore invisible, the snapshot-diff
    semantics), inserts are the fresh 101st keys. The feed reads only
    churned files; rewritten-but-unchanged rows cancel in the multiset
    difference and never appear."""
    from w4h_etl_container_spark.pipeline.mtable import (
        mtable_changes,
        mtable_create,
        mtable_delete,
        mtable_merge,
    )

    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ckey"),
        F.col("c_acctbal").cast("double").alias("bal"),
    )
    updates = cust.where(F.col("ckey") % 11 == 0).select(
        "ckey", F.lit(-1.0).alias("bal")
    ).unionByName(
        cust.where(F.col("ckey") % 101 == 0).select(
            (F.col("ckey") + 10_000_000).alias("ckey"), F.lit(99.0).alias("bal")
        )
    )
    dels = cust.where(F.col("ckey") % 13 == 0).select("ckey")
    d = _scratch_dir("q-mtable-changes-")
    mtable_create(spark, cust.repartition(4, "ckey"), d)
    mtable_merge(spark, d, updates, "ckey")
    mtable_delete(spark, d, dels, "ckey")
    return mtable_changes(spark, d, 0, 2, key="ckey").select(
        "ckey", "bal", "_change_type"
    )


@register(
    "q_mtable_bloom_delete",
    sql="""
    SELECT c_custkey AS ckey, CAST(c_acctbal AS DOUBLE) AS bal
    FROM customer
    WHERE c_custkey NOT IN (11, 500, 993)
    """,
    survey_ids=("STR-1", "EXT-LAKEHOUSE"),
    gate=False,
)
def q_mtable_bloom_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point deletes through BLOOM file skipping: customer lands as an
    UNCLUSTERED bloom-indexed mtable (round-robin repartition — every
    file spans the whole key domain, so min/max range pruning matches
    ALL files for any point key), three specific keys delete, and the
    committed snapshot reads back against the survivor SQL. The query
    asserts the planner actually took the bloom path
    (``key_match_path = collect+bloom:N`` with N ≥ 1) AND rewrote
    strictly fewer files than the table holds — on a range-stats-only
    table this exact delete rewrites everything. Hash parity then
    proves skipping never skipped a file it needed."""
    from w4h_etl_container_spark.pipeline.mtable import (
        mtable_create,
        mtable_delete,
        mtable_read,
    )

    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ckey"),
        F.col("c_acctbal").cast("double").alias("bal"),
    )
    d = _scratch_dir("q-mtable-bloom-")
    mtable_create(
        spark, cust.repartition(8), d, bloom_keys=["ckey"], bloom_bits=1 << 14
    )
    man = mtable_delete(
        spark, d,
        spark.createDataFrame([(11,), (500,), (993,)], "ckey long"),
        "ckey",
    )
    if not man["key_match_path"].startswith("collect+bloom:"):
        raise AssertionError(
            f"expected bloom-pruned planning, got {man['key_match_path']!r}"
        )
    if man["files_rewritten"] >= len(man["files"]):
        raise AssertionError("bloom skipping rewrote every file")
    return mtable_read(spark, d).select("ckey", "bal")


@register(
    "q_mtable_partitioned",
    sql="""
    SELECT c_custkey AS ckey, c_mktsegment AS seg,
           CASE WHEN c_custkey % 11 = 0 THEN -1.0
                ELSE CAST(c_acctbal AS DOUBLE) END AS bal
    FROM customer WHERE c_mktsegment <> 'BUILDING'
    """,
    survey_ids=("STR-1", "EXT-LAKEHOUSE"),
    gate=False,  # r16: slot ceded to the SAME-round q_mtable_compact_split
)
def q_mtable_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-14 PARTITION SPEC end to end: customer lands as an mtable
    hive-partitioned by market segment (``partition_by=['seg']`` —
    SURVEY §1.3's date-partition layout rendered on the fixture's
    5-value segment column), one whole partition deletes BY ITS
    PARTITION KEY, and a keyed merge updates every 11th surviving
    customer's balance. The in-query assertion pins the pruning claim:
    the delete's ``files_rewritten`` must equal exactly the doomed
    partition's file count (partition values persist as [v,v] manifest
    stats, so every foreign partition's files are refuted before any
    footer or data byte is read). The oracle states the same
    delete+update as a filter+CASE; hash parity certifies the
    partitioned write→prune→rewrite→read cycle."""
    from w4h_etl_container_spark.pipeline.mtable import (
        mtable_create,
        mtable_delete,
        mtable_merge,
        mtable_read,
        read_manifest,
    )

    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ckey"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").cast("double").alias("bal"),
    )
    d = _scratch_dir("q-mtable-part-")
    mtable_create(spark, cust.repartition(4, "ckey"), d, partition_by=["seg"])
    man0 = read_manifest(d)
    doomed = [f for f in man0["files"] if "seg=BUILDING" in f]
    man1 = mtable_delete(
        spark, d,
        spark.createDataFrame([("BUILDING",)], "seg string"), "seg",
    )
    if man1["files_rewritten"] != len(doomed):
        raise AssertionError(
            f"partition pruning failed: rewrote {man1['files_rewritten']} "
            f"files, expected exactly the {len(doomed)} in seg=BUILDING"
        )
    updates = mtable_read(spark, d).where(F.col("ckey") % 11 == 0).select(
        "ckey", "seg", F.lit(-1.0).alias("bal")
    )
    mtable_merge(spark, d, updates, "ckey")
    return mtable_read(spark, d).select("ckey", "seg", "bal")


@register(
    "q_mtable_checks",
    sql="""
    SELECT c_custkey AS ckey, c_mktsegment AS seg,
           CASE WHEN c_custkey % 11 = 0 THEN 50.0
                ELSE CAST(c_acctbal AS DOUBLE) END AS bal
    FROM customer
    """,
    survey_ids=("STR-1", "EXT-LAKEHOUSE"),
)
def q_mtable_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-15 WRITE-TIME CHECK CONSTRAINTS end to end (Delta table
    constraints — pipeline/mtable.py::_enforce_checks): customer lands
    as an mtable with two installed checks, a VIOLATING merge batch is
    refused loudly (the in-query assertion pins both the refusal and
    that NO version was committed — a half-applied batch would be the
    silent failure mode), then a valid batch updates every 11th
    balance and commits. The oracle states the surviving snapshot as
    one CASE expression: hash parity proves the refused batch left
    zero rows behind and the valid one landed exactly once, through
    the real constraint-scan→refuse→replan→commit cycle."""
    from w4h_etl_container_spark.pipeline.mtable import (
        mtable_create,
        mtable_merge,
        mtable_read,
        read_manifest,
    )

    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ckey"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").cast("double").alias("bal"),
    )
    d = _scratch_dir("q-mtable-checks-")
    mtable_create(
        spark, cust.repartition(4, "ckey"), d,
        checks={"bal_floor": "bal >= -1000.0", "seg_known": "seg IS NOT NULL"},
    )
    bad = cust.where(F.col("ckey") % 5 == 0).select(
        "ckey", "seg", F.lit(-99999.0).alias("bal")
    )
    try:
        mtable_merge(spark, d, bad, "ckey")
        raise AssertionError(
            "CHECK constraint did not refuse the violating batch"
        )
    except ValueError as e:
        if "CHECK constraint" not in str(e):
            raise
    if read_manifest(d)["version"] != 0:
        raise AssertionError(
            "refused batch left a committed version behind"
        )
    good = cust.where(F.col("ckey") % 11 == 0).select(
        "ckey", "seg", F.lit(50.0).alias("bal")
    )
    mtable_merge(spark, d, good, "ckey")
    return mtable_read(spark, d).select("ckey", "seg", "bal")


@register(
    "q_mtable_evolution",
    sql="""
    SELECT c_custkey AS ckey, c_mktsegment AS seg,
           c_nationkey AS nation,
           CASE WHEN c_custkey % 17 = 0 THEN -2.0
                WHEN c_custkey % 13 = 0 THEN -1.0
                ELSE CAST(c_acctbal AS DOUBLE) END AS bal
    FROM customer
    """,
    survey_ids=("STR-1", "EXT-LAKEHOUSE"),
)
def q_mtable_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-15 PARTITION-SPEC EVOLUTION end to end (the Iceberg
    metadata-only spec change — pipeline/mtable.py::
    mtable_set_partitioning): customer lands partitioned by market
    segment, one merge commits under that spec, the table then
    re-partitions by NATION as a metadata-only commit (the in-query
    assertion pins that no data file moved), a second merge lands
    under the new spec, and compaction migrates every row to the
    current spec (the second assertion pins the migrated layout). The
    oracle states the whole history as one CASE expression; hash
    parity certifies reads and rewrites across the spec boundary.
    Mixed-spec PRUNING (a delete keyed on the new partition column
    skipping old- and new-spec files under each file's own spec) is
    pinned by tests/test_mtable.py::TestMtablePartitionSpecEvolution —
    kept out of this cycle to hold the gate wall near the other
    mtable queries'."""
    from w4h_etl_container_spark.pipeline.mtable import (
        mtable_compact,
        mtable_create,
        mtable_merge,
        mtable_read,
        mtable_set_partitioning,
        read_manifest,
    )

    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ckey"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").alias("nation"),
        F.col("c_acctbal").cast("double").alias("bal"),
    )
    d = _scratch_dir("q-mtable-evo-")
    mtable_create(spark, cust.repartition(4, "ckey"), d, partition_by=["seg"])
    upd1 = cust.where(F.col("ckey") % 13 == 0).select(
        "ckey", "seg", "nation", F.lit(-1.0).alias("bal")
    )
    mtable_merge(spark, d, upd1, "ckey")
    man_before = read_manifest(d)
    man_evo = mtable_set_partitioning(spark, d, ["nation"])
    if man_evo["files"] != man_before["files"]:
        raise AssertionError(
            "spec evolution moved data files — it must be metadata-only"
        )
    upd2 = cust.where(F.col("ckey") % 17 == 0).select(
        "ckey", "seg", "nation", F.lit(-2.0).alias("bal")
    )
    mtable_merge(spark, d, upd2, "ckey")
    mtable_compact(spark, d)
    man = read_manifest(d)
    stray = [
        f for f in man["files"] if not f.startswith("data-parts-s1/nation=")
    ]
    if stray:
        raise AssertionError(
            f"compaction left {len(stray)} file(s) under the old spec"
        )
    return mtable_read(spark, d).select("ckey", "seg", "nation", "bal")


@register(
    "q_mtable_evolution_prune",
    sql="""
    SELECT c_custkey AS ckey, c_mktsegment AS seg,
           c_nationkey AS nation, CAST(c_acctbal AS DOUBLE) AS bal
    FROM customer WHERE c_nationkey <> 3
    """,
    survey_ids=("STR-1", "EXT-LAKEHOUSE"),
    gate=False,  # library twin of q_mtable_evolution: the delete leg
)
def q_mtable_evolution_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIXED-SPEC PRUNING under the hash oracle (library tier — the
    delete leg kept out of the gate cycle for wall budget): customer
    lands partitioned by segment, the spec evolves to nation
    (metadata-only), and a delete keyed on the NEW partition column
    must prune per-file under each file's own spec — old seg-spec
    files carry nation in their DATA-BYTE stats, new-spec files in
    their path-borne [v,v] overlay. The committed snapshot hash-equals
    the survivor filter. The in-query assertion pins that the delete
    planned on stats (no unconditional full-table match): at least one
    file survives untouched whenever any post-evolution file's nation
    range excludes 3."""
    from w4h_etl_container_spark.pipeline.mtable import (
        mtable_create,
        mtable_delete,
        mtable_merge,
        mtable_read,
        mtable_set_partitioning,
        read_manifest,
    )

    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ckey"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").alias("nation"),
        F.col("c_acctbal").cast("double").alias("bal"),
    )
    d = _scratch_dir("q-mtable-evoprune-")
    mtable_create(spark, cust.repartition(4, "ckey"), d, partition_by=["seg"])
    mtable_set_partitioning(spark, d, ["nation"])
    # land part of the table under the new spec (an idempotent
    # self-merge of one nation's rows — values unchanged, layout moves)
    moved = cust.where(F.col("nation") % 7 == 2)
    mtable_merge(spark, d, moved, "ckey")
    man = mtable_delete(
        spark, d, spark.createDataFrame([(3,)], "nation int"), "nation"
    )
    if man["files_untouched"] < 1:
        raise AssertionError(
            "mixed-spec delete matched every file — partition stats "
            "did not prune"
        )
    return mtable_read(spark, d).select("ckey", "seg", "nation", "bal")


@register(
    "q_mtable_compact_split",
    sql="""
    SELECT c_custkey AS ckey, c_mktsegment AS seg,
           CASE WHEN c_custkey % 7 = 0 THEN -1.0
                ELSE CAST(c_acctbal AS DOUBLE) END AS bal
    FROM customer
    """,
    survey_ids=("STR-1", "EXT-LAKEHOUSE"),
)
def q_mtable_compact_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-16 TARGET-HONORING partitioned compaction end to end
    (ADVICE r16 closed in-query): customer lands as a segment-
    partitioned mtable, a CoW merge churns every 7th key across all
    partitions, then compaction runs with ``target_bytes`` set to HALF
    the biggest partition's bytes — under the old one-file-per-value
    writer that partition could never split (repeated compaction
    re-coalesced it into one ever-larger file). The in-query
    assertions pin the new behavior: the commit is a compact version,
    the oversized partition emerges in ≥2 files (salted shuffle for
    cross-task parallelism + a maxRecordsPerFile backstop derived
    from the rewrite set's own bytes/row, so the split is
    DETERMINISTIC, not hash-luck), and a second compaction at a
    generous target re-coalesces every value back to exactly one file
    (splitting is target-driven, not sticky). The oracle states the
    churned snapshot as one CASE expression: hash parity proves both
    compactions moved bytes without changing a single row."""
    import os

    from w4h_etl_container_spark.pipeline.mtable import (
        mtable_compact,
        mtable_create,
        mtable_merge,
        mtable_read,
        read_manifest,
    )

    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ckey"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").cast("double").alias("bal"),
    )
    d = _scratch_dir("q-mtable-csplit-")
    mtable_create(spark, cust.repartition(4, "ckey"), d, partition_by=["seg"])
    upd = cust.where(F.col("ckey") % 7 == 0).select(
        "ckey", "seg", F.lit(-1.0).alias("bal")
    )
    mtable_merge(spark, d, upd, "ckey")
    man1 = read_manifest(d)
    sizes: dict[str, int] = {}
    for f in man1["files"]:
        pdir = os.path.dirname(f)
        sizes[pdir] = sizes.get(pdir, 0) + os.path.getsize(os.path.join(d, f))
    biggest = max(sizes, key=lambda k: sizes[k])
    man2 = mtable_compact(spark, d, target_bytes=max(1, sizes[biggest] // 2))
    if man2["op"] != "compact":
        raise AssertionError(f"expected a compact commit, got {man2['op']!r}")
    post: dict[str, int] = {}
    for f in man2["files"]:
        post[os.path.dirname(f)] = post.get(os.path.dirname(f), 0) + 1
    if post.get(biggest, 0) < 2:
        raise AssertionError(
            f"oversized partition {biggest} did not split "
            f"({post.get(biggest, 0)} file(s) at target="
            f"{sizes[biggest] // 2} of {sizes[biggest]} bytes)"
        )
    man3 = mtable_compact(spark, d, target_bytes=1 << 40)
    post3: dict[str, int] = {}
    for f in man3["files"]:
        post3[os.path.dirname(f)] = post3.get(os.path.dirname(f), 0) + 1
    bad = {k: v for k, v in post3.items() if v != 1}
    if bad:
        raise AssertionError(
            f"generous-target re-compaction left multi-file values: {bad}"
        )
    return mtable_read(spark, d).select("ckey", "seg", "bal")


@register(
    "q_mtable_overwrite",
    sql="""
    SELECT c_custkey AS ckey, c_mktsegment AS seg,
           CASE WHEN c_mktsegment = 'BUILDING' THEN -2.0
                ELSE CAST(c_acctbal AS DOUBLE) END AS bal
    FROM customer
    UNION ALL
    SELECT 99000001 AS ckey, 'BUILDING' AS seg, 42.0 AS bal
    """,
    survey_ids=("STR-1", "EXT-LAKEHOUSE"),
)
def q_mtable_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-16 DYNAMIC PARTITION OVERWRITE end to end (Hive INSERT
    OVERWRITE PARTITION / Delta replaceWhere —
    ``mtable_overwrite_partitions``): customer lands as a segment-
    partitioned mtable, then ONE commit atomically replaces the
    BUILDING partition with a reprocessed rendering (every balance
    recomputed to −2, one synthetic late-arriving customer appended) —
    the daily-reprocess primitive. In-query assertions pin the
    partition-pruned plan: exactly the doomed partition's files are
    replaced, every foreign partition's file survives VERBATIM in the
    new manifest (never rewritten — the path-borne [v,v] stats refute
    them before any footer read), and the pre-overwrite version still
    time-travels to the old day. The oracle states the swap as one
    CASE + UNION ALL; hash parity proves readers see the old day or
    the new day, never a mix."""
    from w4h_etl_container_spark.pipeline.mtable import (
        mtable_create,
        mtable_overwrite_partitions,
        mtable_read,
        read_manifest,
    )

    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ckey"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").cast("double").alias("bal"),
    )
    d = _scratch_dir("q-mtable-ow-")
    mtable_create(spark, cust.repartition(4, "ckey"), d, partition_by=["seg"])
    man0 = read_manifest(d)
    foreign = [f for f in man0["files"] if "seg=BUILDING" not in f]
    doomed = [f for f in man0["files"] if "seg=BUILDING" in f]
    reprocessed = cust.where(F.col("seg") == "BUILDING").select(
        "ckey", "seg", F.lit(-2.0).alias("bal")
    ).unionByName(
        spark.createDataFrame(
            [(99_000_001, "BUILDING", 42.0)], "ckey long, seg string, bal double"
        )
    )
    man1 = mtable_overwrite_partitions(spark, d, reprocessed)
    if man1["files_replaced"] != len(doomed):
        raise AssertionError(
            f"overwrite replaced {man1['files_replaced']} files, expected "
            f"exactly the {len(doomed)} in seg=BUILDING"
        )
    if not set(foreign) <= set(man1["files"]):
        raise AssertionError(
            "a foreign partition's file was rewritten by the overwrite"
        )
    n_old = mtable_read(spark, d, version=man0["version"]).where(
        F.col("seg") == "BUILDING"
    ).count()
    if n_old == 0:
        raise AssertionError("time travel to the pre-overwrite day is empty")
    return mtable_read(spark, d).select("ckey", "seg", "bal")


@register(
    "q_mtable_skipread",
    sql="""
    SELECT c_custkey AS ckey, c_mktsegment AS seg,
           CAST(c_acctbal AS DOUBLE) AS bal
    FROM customer
    WHERE c_custkey BETWEEN 200 AND 699
    """,
    survey_ids=("STR-1", "EXT-LAKEHOUSE"),
    gate=False,  # library: the mtable gate class stays at five slots
)
def q_mtable_skipread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-16 DATA-SKIPPING READ under the oracle
    (``mtable_read_pruned``): customer lands as a key-clustered mtable
    (disjoint per-file ranges, like any maintained big table), then a
    range read prunes files AT PLANNING TIME from the manifest's
    per-file stats — the in-query assertion pins that the scan
    actually skipped files (a pruned read that reads everything is a
    filter, not data skipping) — and the survivors' residual filter
    yields exactly the oracle's BETWEEN. Hash parity proves pruning is
    an optimization, never a semantics change."""
    from w4h_etl_container_spark.operators.layout import cluster_by
    from w4h_etl_container_spark.pipeline.mtable import (
        _skip_files,
        mtable_create,
        mtable_read_pruned,
        read_manifest,
    )

    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ckey"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").cast("double").alias("bal"),
    )
    d = _scratch_dir("q-mtable-skip-")
    mtable_create(spark, cluster_by(cust, ["ckey"], n_files=8), d)
    man = read_manifest(d)
    kept, n_stats, _n_bloom = _skip_files(
        spark, d, man, {"ckey": (200, 699)}
    )
    if not (n_stats > 0 and len(kept) < len(man["files"])):
        raise AssertionError(
            f"data skipping skipped nothing ({len(kept)}/{len(man['files'])} "
            "files kept) — the clustered table's stats should refute "
            "out-of-range files"
        )
    return mtable_read_pruned(spark, d, {"ckey": (200, 699)}).select(
        "ckey", "seg", "bal"
    )


@register(
    "q_mtable_mv",
    sql="""
    WITH base AS (
      SELECT c_custkey AS ckey, c_nationkey AS g,
             ROUND(CAST(c_acctbal AS DOUBLE) * 100) AS bal
      FROM customer
    ),
    churn AS (
      SELECT ckey, g,
             CASE WHEN ckey % 53 = 0 THEN bal + 700 ELSE bal END AS bal
      FROM base
      WHERE NOT (ckey % 89 = 0 AND ckey % 53 <> 0)
      UNION ALL
      SELECT ckey + 10000000 AS ckey, g, 9900.0 AS bal
      FROM base WHERE ckey % 211 = 0
    )
    SELECT g,
           COUNT(*) AS n, SUM(bal) AS sb, AVG(bal) AS ab,
           MIN(bal) AS mnb, MAX(bal) AS mxb
    FROM churn GROUP BY 1
    """,
    survey_ids=("STR-1", "AGG-1", "EXT-LAKEHOUSE"),
)
def q_mtable_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-16 INCREMENTAL MATERIALIZED VIEW end to end
    (pipeline/mview.py — the reference's merge-then-reaggregate loop,
    ``main.py:246-276``, generalized): customer (balances in integral
    CENTS, so every sum is order-independent and oracle-exact) becomes
    an mtable; an MV (count/sum/avg/min/max per nation) materializes
    against it; then ONE atomic commit carries all three mutation
    kinds — every 53rd balance updated, a synthetic customer per 211th
    inserted, every (non-updated) 89th deleted — through
    ``mtable_merge(deletes=)`` in MERGE-ON-READ mode (full MERGE INTO:
    zero data files rewritten, pre-images carried by the deletion
    vector). ``mv_refresh`` absorbs that commit from the row-level
    change feed with pre-images: signed deltas maintain count/sum/avg;
    min/max recompute only the groups whose stored extremum a removal
    hit. The oracle restates the history as CASE/UNION/WHERE + one
    GROUP BY: hash parity proves the incremental state equals the
    from-scratch aggregate. In-query assertions pin the metadata: the
    watermark advances WITH the data (same manifest CAS — crash-safe
    by construction) and a refresh against an unchanged base is a
    no-op. 100 TB shape: refresh reads O(churned files), never the
    base; the view commit rewrites only files holding touched groups.
    Multi-window refresh sequences, CoW feeds, and the randomized
    mutation model check live in tests/test_mview.py."""
    from w4h_etl_container_spark.pipeline.mtable import (
        mtable_create,
        mtable_merge,
        mtable_read,
        read_manifest,
    )
    from w4h_etl_container_spark.pipeline.mview import (
        mv_create,
        mv_read,
        mv_refresh,
    )

    base = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ckey"),
        F.col("c_nationkey").alias("g"),
        F.round(F.col("c_acctbal").cast("double") * 100).alias("bal"),
    )
    d = _scratch_dir("q-mtable-mv-base-")
    v = _scratch_dir("q-mtable-mv-view-")
    mtable_create(spark, base.repartition(4, "ckey"), d)
    mv_create(
        spark, v, d,
        group_by="g",
        aggs={
            "n": ("count", "*"),
            "sb": ("sum", "bal"),
            "ab": ("avg", "bal"),
            "mnb": ("min", "bal"),
            "mxb": ("max", "bal"),
        },
        key="ckey",
    )
    cur = mtable_read(spark, d)
    del_pred = (F.col("ckey") % 89 == 0) & (F.col("ckey") % 53 != 0)
    upd = cur.where(F.col("ckey") % 53 == 0).withColumn(
        "bal", F.col("bal") + 700
    )
    ins = (
        cur.where(F.col("ckey") % 211 == 0)
        .withColumn("ckey", F.col("ckey") + 10000000)
        .withColumn("bal", F.lit(9900.0))
    )
    dels = cur.where(del_pred).select("ckey")
    man = mtable_merge(
        spark, d, upd.unionByName(ins), key="ckey", deletes=dels, mode="mor"
    )
    if man["files_rewritten"] != 0:
        raise AssertionError("MOR merge+delete rewrote data files")
    if not (man["n_update_keys"] > 0 and man["n_delete_keys"] > 0):
        raise AssertionError("the atomic commit lost one of its sides")
    rep = mv_refresh(spark, v)
    if read_manifest(v)["mv"]["base_version"] != man["version"]:
        raise AssertionError("view watermark lags the base after refresh")
    if rep["groups_deleted"] != 0 or rep["groups_upserted"] == 0:
        raise AssertionError(f"unexpected refresh shape: {rep}")
    rep2 = mv_refresh(spark, v)
    if rep2["refreshed"]:
        raise AssertionError("refresh against an unchanged base was not a no-op")
    return mv_read(spark, v)


def _mv_kmv_sql() -> str:
    from w4h_etl_container_spark.plans.textops import _nib_sql

    h = _nib_sql("md5(CAST(val AS VARCHAR))", 15)
    return f"""
    WITH base AS (
      SELECT c_custkey AS ckey, c_mktsegment AS g,
             c_custkey % 997 AS val
      FROM customer
    ),
    churn AS (
      SELECT ckey, g,
             CASE WHEN ckey % 31 = 0 THEN val + 100000 ELSE val END AS val
      FROM base
      WHERE NOT (ckey % 73 = 0 AND ckey % 31 <> 0)
    ),
    hashes AS (SELECT DISTINCT g, {h} AS h FROM churn),
    ranked AS (
      SELECT g, h, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS rn
      FROM hashes
    )
    SELECT g, COUNT(*) AS n_mins, MAX(h) AS kth_min,
           FLOOR((CASE WHEN COUNT(*) < 32 THEN CAST(COUNT(*) AS DOUBLE)
                       ELSE 31.0 * 1152921504606846976.0
                            / CAST(MAX(h) AS DOUBLE)
                  END) * 1000000.0 + 0.5) / 1000000.0 AS est
    FROM ranked WHERE rn <= 32 GROUP BY g
    """


@register(
    "q_mtable_mv_kmv",
    sql=_mv_kmv_sql(),
    survey_ids=("STR-1", "AGG-2", "EXT-LAKEHOUSE"),
    gate=False,  # library: the sketch-MV's oracle proof without
    # spending a second gate slot on the MV family
)
def q_mtable_mv_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPROXIMATE COUNT-DISTINCT as a maintainable MV aggregate
    (``("kmv", col)`` in pipeline/mview.py): the stored state is the
    K=32 smallest distinct 60-bit hashes per group — union-maintainable
    (insert batches merge + re-truncate to EXACTLY the from-scratch
    sketch, because k-min is a set operation on a deterministic hash),
    with removals dirtying a group only when the removed hash could
    sit inside the state (≤ its stored maximum, the min/max rule).
    Here: customer's (custkey % 997) values sketch per market segment;
    one atomic merge+delete churns the base; one refresh absorbs it;
    the STORED STATE's (size, max) and the standard estimator are
    hash-checked against DuckDB replaying the identical k-min over the
    post-churn rows — sketch parity, not just estimate parity. The
    rollup-cube view (Druid/Pinot-style) this enables is the 100 TB
    point: distinct-count dashboards refresh from the feed at O(churn)
    instead of re-scanning for COUNT(DISTINCT)."""
    from w4h_etl_container_spark.pipeline.mtable import (
        mtable_create,
        mtable_merge,
        mtable_read,
        read_manifest,
    )
    from w4h_etl_container_spark.pipeline.mview import (
        _KMV_K,
        mv_create,
        mv_refresh,
    )

    base = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ckey"),
        F.col("c_mktsegment").alias("g"),
        (F.col("c_custkey") % 997).alias("val"),
    )
    d = _scratch_dir("q-mv-kmv-base-")
    v = _scratch_dir("q-mv-kmv-view-")
    mtable_create(spark, base.repartition(4, "ckey"), d)
    mv_create(
        spark, v, d, group_by="g", aggs={"du": ("kmv", "val")}, key="ckey"
    )
    cur = mtable_read(spark, d)
    del_pred = (F.col("ckey") % 73 == 0) & (F.col("ckey") % 31 != 0)
    upd = cur.where(F.col("ckey") % 31 == 0).withColumn(
        "val", F.col("val") + 100000
    )
    dels = cur.where(del_pred).select("ckey")
    man = mtable_merge(spark, d, upd, key="ckey", deletes=dels)
    rep = mv_refresh(spark, v)
    if not (rep["refreshed"] and rep["base_version"] == man["version"]):
        raise AssertionError(f"refresh did not track the churn: {rep}")
    if mv_refresh(spark, v)["refreshed"]:
        raise AssertionError("second refresh was not a no-op")
    st = F.col("__kmv_du")
    est = F.when(F.size(st) < _KMV_K, F.size(st).cast("double")).otherwise(
        F.lit(31.0)
        * F.lit(1152921504606846976.0)
        / F.element_at(st, _KMV_K).cast("double")
    )
    return mtable_read(spark, v).select(
        "g",
        F.size(st).cast("long").alias("n_mins"),
        F.element_at(st, F.size(st)).alias("kth_min"),
        (F.floor(est * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)).alias(
            "est"
        ),
    )


@register(
    "q_mv_corpus_profile",
    sql="""
    WITH churn AS (
      SELECT doc_id, lang, source,
             CASE WHEN doc_id % 13 = 0 THEN
                    CASE WHEN n_chars < 100 THEN n_chars ELSE 100 END
                  ELSE n_chars END AS n_chars
      FROM documents
      WHERE NOT (doc_id % 17 = 0 AND doc_id % 13 <> 0)
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS DOUBLE) AS chars_total,
           AVG(n_chars) AS chars_avg, MIN(n_chars) AS chars_min,
           MAX(n_chars) AS chars_max,
           CAST(COUNT(DISTINCT source) AS DOUBLE) AS du_sources
    FROM churn GROUP BY 1
    """,
    survey_ids=("STR-1", "EXT-TEXT", "EXT-LAKEHOUSE"),
    gate=False,  # library: the MV family keeps one gate slot (q_mtable_mv)
)
def q_mv_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MV layer on the TRAINING-DATA tables: a per-language corpus
    dashboard (doc count, char volume, min/avg/max length, distinct
    sources via the kmv sketch — exact here, the fixture has 20
    sources < K=32) materialized over a documents mtable and refreshed
    incrementally through a curation pass — one atomic commit truncates
    every 13th doc to ≤100 chars (quality clip) and deletes every
    (non-clipped) 17th (contamination purge). This is the operational
    shape of corpus curation at 100 TB: the dashboard follows the
    curation sink from the change feed at O(churn), never re-scanning
    the corpus, and COUNT(DISTINCT source) rides a 32-long mergeable
    state instead of a shuffle of source strings."""
    from w4h_etl_container_spark.pipeline.mtable import (
        mtable_create,
        mtable_merge,
        mtable_read,
    )
    from w4h_etl_container_spark.pipeline.mview import (
        mv_create,
        mv_read,
        mv_refresh,
    )

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    d = _scratch_dir("q-mv-corpus-base-")
    v = _scratch_dir("q-mv-corpus-view-")
    mtable_create(spark, docs.repartition(4, "doc_id"), d)
    mv_create(
        spark, v, d,
        group_by="lang",
        aggs={
            "n_docs": ("count", "*"),
            "chars_total": ("sum", "n_chars"),
            "chars_avg": ("avg", "n_chars"),
            "chars_min": ("min", "n_chars"),
            "chars_max": ("max", "n_chars"),
            "du_sources": ("kmv", "source"),
        },
        key="doc_id",
    )
    cur = mtable_read(spark, d)
    del_pred = (F.col("doc_id") % 17 == 0) & (F.col("doc_id") % 13 != 0)
    upd = cur.where(F.col("doc_id") % 13 == 0).withColumn(
        "n_chars", F.least(F.col("n_chars"), F.lit(100))
    )
    dels = cur.where(del_pred).select("doc_id")
    mtable_merge(spark, d, upd, key="doc_id", deletes=dels)
    rep = mv_refresh(spark, v)
    if not rep["refreshed"]:
        raise AssertionError(f"curation churn did not refresh the view: {rep}")
    # DuckDB's SUM(BIGINT) widens past int64; align the sum as double
    return mv_read(spark, v).withColumn(
        "chars_total", F.col("chars_total").cast("double")
    )


@register(
    "q_mtable_drop_column",
    sql="""
    SELECT c_custkey AS ckey, c_mktsegment AS seg,
           CASE WHEN c_custkey % 19 = 0 THEN -7.0
                ELSE CAST(c_acctbal AS DOUBLE) END AS bal
    FROM customer
    """,
    survey_ids=("STR-1", "EXT-LAKEHOUSE"),
    gate=False,  # library
)
def q_mtable_drop_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """METADATA-ONLY COLUMN DROP under the oracle
    (``mtable_drop_columns``): customer lands with an extra name
    column, the drop removes it from the recorded schema without
    touching a data file (in-query assertion pins the identical file
    list), a post-drop merge writes NARROW batches against the old
    wide files, and the committed snapshot reads back exactly the
    oracle's projection — proving the schema-declared read prunes the
    dropped column from pre-drop files while time travel (asserted)
    still sees it at version 0."""
    from w4h_etl_container_spark.pipeline.mtable import (
        mtable_create,
        mtable_drop_columns,
        mtable_merge,
        mtable_read,
        read_manifest,
    )

    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ckey"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").cast("double").alias("bal"),
        F.col("c_name").alias("note"),
    )
    d = _scratch_dir("q-mtable-drop-")
    man0 = mtable_create(spark, cust.repartition(4, "ckey"), d)
    man1 = mtable_drop_columns(spark, d, "note")
    if man1["files"] != man0["files"]:
        raise AssertionError("column drop moved data files")
    if "note" not in mtable_read(spark, d, version=0).columns:
        raise AssertionError("time travel lost the pre-drop schema")
    upd = (
        mtable_read(spark, d)
        .where(F.col("ckey") % 19 == 0)
        .withColumn("bal", F.lit(-7.0))
    )
    mtable_merge(spark, d, upd, key="ckey")
    return mtable_read(spark, d).select("ckey", "seg", "bal")


@register(
    "q_mtable_add_default",
    sql="""
    SELECT c_custkey AS ckey, CAST(c_acctbal AS DOUBLE) AS bal,
           CASE WHEN c_custkey % 23 = 0 THEN NULL
                WHEN c_custkey % 11 = 0 THEN 'gold'
                ELSE 'bronze' END AS tier,
           CASE WHEN c_custkey % 23 = 0 OR c_custkey % 11 = 0
                THEN 99.0 ELSE 10.0 END AS bonus
    FROM customer
    """,
    survey_ids=("STR-1", "EXT-LAKEHOUSE"),
    gate=False,  # library
)
def q_mtable_add_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """METADATA-ONLY ADD COLUMN ... DEFAULT under the oracle
    (``mtable_add_columns``): two columns land on an existing customer
    mtable without touching a file (asserted), pre-add rows read the
    era default, a post-add merge writes real values INCLUDING a real
    NULL tier — which must survive (the era fill applies only to files
    that predate the column, never a read-then-coalesce that would
    overwrite stored NULLs). The oracle restates the final state as
    CASE expressions; time travel to version 0 (asserted) still reads
    the two-column pre-add schema."""
    from w4h_etl_container_spark.pipeline.mtable import (
        mtable_add_columns,
        mtable_create,
        mtable_merge,
        mtable_read,
    )

    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ckey"),
        F.col("c_acctbal").cast("double").alias("bal"),
    )
    d = _scratch_dir("q-mtable-adddef-")
    man0 = mtable_create(spark, cust.repartition(4, "ckey"), d)
    man1 = mtable_add_columns(
        spark, d, {"tier": ("string", "bronze"), "bonus": ("double", 10.0)}
    )
    if man1["files"] != man0["files"]:
        raise AssertionError("ADD COLUMN moved data files")
    if mtable_read(spark, d, version=0).columns != ["ckey", "bal"]:
        raise AssertionError("time travel lost the pre-add schema")
    cur = mtable_read(spark, d)
    upd = cur.where(
        (F.col("ckey") % 23 == 0) | (F.col("ckey") % 11 == 0)
    ).select(
        "ckey",
        "bal",
        F.when(F.col("ckey") % 23 == 0, F.lit(None).cast("string"))
        .otherwise(F.lit("gold"))
        .alias("tier"),
        F.lit(99.0).alias("bonus"),
    )
    mtable_merge(spark, d, upd, key="ckey")
    return mtable_read(spark, d).select("ckey", "bal", "tier", "bonus")


@register(
    "q_mtable_rename",
    sql="""
    SELECT c_custkey AS ckey, c_mktsegment AS seg,
           CASE WHEN c_custkey % 19 = 0 THEN -7.0
                ELSE CAST(c_acctbal AS DOUBLE) END AS balance
    FROM customer
    """,
    survey_ids=("STR-1", "EXT-LAKEHOUSE"),
    gate=False,  # library
)
def q_mtable_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """METADATA-ONLY COLUMN RENAME under the oracle
    (``mtable_rename_column``): customer's balance column renames
    without touching a file (asserted) — pre-rename files keep their
    bytes under the old PHYSICAL name and read through a rename era;
    a post-rename merge writes real files under the new name; the
    committed snapshot hash-matches the oracle's aliased projection.
    Time travel to version 0 (asserted) still reads the old name —
    schemas are per-version facts. The per-file stats translated in
    the rename commit keep planning exact: the merge's pruning ran on
    the NEW name against stats recorded under the old one."""
    from w4h_etl_container_spark.pipeline.mtable import (
        mtable_create,
        mtable_merge,
        mtable_read,
        mtable_rename_column,
    )

    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ckey"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").cast("double").alias("bal"),
    )
    d = _scratch_dir("q-mtable-rename-")
    man0 = mtable_create(spark, cust.repartition(4, "ckey"), d)
    man1 = mtable_rename_column(spark, d, "bal", "balance")
    if man1["files"] != man0["files"]:
        raise AssertionError("RENAME moved data files")
    if mtable_read(spark, d, version=0).columns != ["ckey", "seg", "bal"]:
        raise AssertionError("time travel lost the pre-rename schema")
    cur = mtable_read(spark, d)
    upd = cur.where(F.col("ckey") % 19 == 0).withColumn(
        "balance", F.lit(-7.0)
    )
    mtable_merge(spark, d, upd, key="ckey")
    return mtable_read(spark, d).select("ckey", "seg", "balance")


@register(
    "q_mtable_widen",
    sql="""
    SELECT c_custkey AS ckey,
           CASE WHEN c_custkey % 19 = 0 THEN 10000000000
                ELSE CAST(c_nationkey AS BIGINT) END AS nation
    FROM customer
    """,
    survey_ids=("STR-1", "EXT-LAKEHOUSE"),
    gate=False,  # library
)
def q_mtable_widen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """METADATA-ONLY TYPE WIDENING under the oracle
    (``mtable_widen_column``): customer's nation key lands as INT,
    widens to BIGINT without touching a file (asserted), and a
    post-widen merge writes a value only the wide type can hold
    (10^10 > 2^31). Pre-widen files read through their narrow-era
    cast; time travel to version 0 (asserted) still reads INT —
    schemas, types included, are per-version facts."""
    from w4h_etl_container_spark.pipeline.mtable import (
        mtable_create,
        mtable_merge,
        mtable_read,
        mtable_widen_column,
    )

    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ckey"),
        F.col("c_nationkey").cast("int").alias("nation"),
    )
    d = _scratch_dir("q-mtable-widen-")
    man0 = mtable_create(spark, cust.repartition(4, "ckey"), d)
    man1 = mtable_widen_column(spark, d, "nation", "bigint")
    if man1["files"] != man0["files"]:
        raise AssertionError("WIDEN moved data files")
    v0_type = dict(
        (x.name, x.dataType.simpleString())
        for x in mtable_read(spark, d, version=0).schema
    )["nation"]
    if v0_type != "int":
        raise AssertionError(f"time travel lost the narrow type: {v0_type}")
    cur = mtable_read(spark, d)
    upd = cur.where(F.col("ckey") % 19 == 0).withColumn(
        "nation", F.lit(10_000_000_000).cast("bigint")
    )
    mtable_merge(spark, d, upd, key="ckey")
    return mtable_read(spark, d).select("ckey", "nation")
