"""Similarity-search operators over ``embeddings`` (64-dim float vectors)
— SURVEY.md §2.11 / BASELINE.json north star.

Exactness strategy: dot products and norms are generated as explicit
64-term balanced tree-sums over element references, rendered for both
engines from the same generator — identical operation order → identical
doubles (elements are float32 upcast to double first). Final cosines are
round6'd to absorb ranking-tie noise.

Plan-construction strategy: the generated arithmetic is emitted as *SQL
text* and parsed once per query (``F.expr`` on the Spark side) — building
the same 64-term trees through Column operators costs thousands of py4j
roundtrips (~6 s of pure client-side plan construction for the LSH query;
the parser path is ~50 ms). Both dialects share the generator; only the
list accessor differs (``element_at(e, i)`` vs ``e[i]``).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from w4h_etl_container_spark.kernels import tree_sum
from w4h_etl_container_spark.plans.registry import register
from w4h_etl_container_spark.session import read_table

DIM = 64
TOP_K = 5
N_QUERIES = 8  # vec_id < 8 are the query vectors
N_PLANES = 8


class _S(str):
    """str-wrapper with + meaning SQL addition, for tree_sum."""

    def __add__(self, other):  # type: ignore[override]
        return _S(f"({str(self)} + {str(other)})")


def _elem(dialect: str, arr: str, i: int) -> str:
    """1-based element access in both dialects, upcast to double."""
    if dialect == "spark":
        return f"CAST(element_at({arr}, {i}) AS DOUBLE)"
    return f"CAST({arr}[{i}] AS DOUBLE)"


def _dot(dialect: str, a: str, b: str) -> str:
    return str(tree_sum([_S(f"({_elem(dialect, a, i + 1)} * {_elem(dialect, b, i + 1)})") for i in range(DIM)]))


def _norm(dialect: str, a: str) -> str:
    sq = str(tree_sum([_S(f"({_elem(dialect, a, i + 1)} * {_elem(dialect, a, i + 1)})") for i in range(DIM)]))
    return f"SQRT({sq})"


def _round6(x: str) -> str:
    return f"FLOOR({x} * 1000000.0 + 0.5) / 1000000.0"


# ---------------------------------------------------------------------------
# brute-force cosine top-k
# ---------------------------------------------------------------------------
def _cosine_expr(dialect: str, qa: str, ca: str) -> str:
    return _round6(f"(({_dot(dialect, qa, ca)}) / (({_norm(dialect, qa)}) * ({_norm(dialect, ca)})))")


def _cosine_topk_sql() -> str:
    dot = _dot("duck", "q.embedding", "c.embedding")
    cos6 = _round6(f"(({dot}) / (q.nrm * c.nrm))")
    return f"""
    WITH normed AS (
      SELECT vec_id, embedding, {_norm("duck", "embedding")} AS nrm FROM embeddings
    ), scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             {cos6} AS cosine
      FROM normed q JOIN normed c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    )
    SELECT query_id, cand_id, cosine, rnk FROM (
      SELECT query_id, cand_id, cosine,
             row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rnk
      FROM scored
    ) WHERE rnk <= {TOP_K}
    """


@register("q_cosine_topk", sql=_cosine_topk_sql(), survey_ids=("EXT-SIM",))
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: the exact ANN baseline. Norms are
    precomputed once per vector (n·1 norm evaluations instead of n·q — the
    asymptotic win at corpus scale, and one codegen'd tree instead of
    three); the tiny query set broadcasts against the corpus, so the fact
    side never shuffles; the per-query top-k is a rank-filtered window
    partitioned by query.

    Scale: at 100 TB the corpus side stays partition-local; the rnk≤k
    filter bounds the shuffle to k rows per (query, partition) under AQE.
    The LSH variant (q_ann_lsh) is the sub-linear path."""
    emb = read_table(spark, sf_dir, "embeddings")
    normed = emb.select("vec_id", "embedding", F.expr(_norm("spark", "embedding")).alias("nrm"))
    q = normed.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"), F.col("nrm").alias("qn")
    )
    c = normed.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("ce"), F.col("nrm").alias("cn")
    )
    cos = F.expr(_round6(f"(({_dot('spark', 'qe', 'ce')}) / (qn * cn))"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= TOP_K)


# ---------------------------------------------------------------------------
# LSH bucketing (random hyperplanes) — the scale path
# ---------------------------------------------------------------------------
def _plane(p: int, j: int) -> float:
    """Deterministic pseudo-random hyperplane component: sin(p·97 + j·13).
    Constant-folded to a literal in both engines (no runtime trig)."""
    return math.sin(p * 97.0 + j * 13.0)


def _bucket_expr(dialect: str) -> str:
    dots = []
    for p in range(N_PLANES):
        dots.append(
            str(tree_sum([_S(f"({_elem(dialect, 'embedding', j + 1)} * {_plane(p, j)!r})") for j in range(DIM)]))
        )
    bucket = " + ".join(
        f"(CASE WHEN ({dots[p]}) >= 0.0 THEN {1 << p} ELSE 0 END)" for p in range(N_PLANES)
    )
    return f"CAST({bucket} AS BIGINT)"


@register(
    "q_ann_lsh",
    sql=f"SELECT vec_id, label, {_bucket_expr('duck')} AS bucket FROM embeddings",
    survey_ids=("EXT-SIM",),
)
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH signature: 8 sign bits packed to a bucket id.
    ANN then probes only same-bucket candidates (1/256 of the corpus in
    expectation) — the sub-linear scale path behind q_cosine_topk.

    Hyperplane components are Python-computed literals (both engines see
    identical doubles; no runtime trig). Scale: scan-bound, zero shuffle;
    bucketing by the signature makes the candidate join co-located."""
    emb = read_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", "label", F.expr(_bucket_expr("spark")).alias("bucket"))


# ---------------------------------------------------------------------------
# vector stats (norms / normalized components)
# ---------------------------------------------------------------------------
def _vecstats_exprs(dialect: str) -> tuple[str, str]:
    nrm = _norm(dialect, "embedding")
    unit = f"{_elem(dialect, 'embedding', 1)} / ({nrm})"
    return _round6(nrm), _round6(unit)


_DUCK_NORM, _DUCK_UNIT = _vecstats_exprs("duck")


@register(
    "q_vector_stats",
    sql=f"SELECT vec_id, label, {_DUCK_NORM} AS l2_norm, {_DUCK_UNIT} AS unit_c0 FROM embeddings",
    survey_ids=("EXT-SIM",),
)
def q_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norm and first normalized component — the cheap
    vector-hygiene pass (zero-norm and NaN screening) a pipeline runs
    before any similarity work."""
    emb = read_table(spark, sf_dir, "embeddings")
    s_norm, s_unit = _vecstats_exprs("spark")
    return emb.select(
        "vec_id",
        "label",
        F.expr(s_norm).alias("l2_norm"),
        F.expr(s_unit).alias("unit_c0"),
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-duplicate pairs (LSH candidates → exact verify)
# ---------------------------------------------------------------------------
def _neardup_sql() -> str:
    dot = _dot("duck", "a.embedding", "b.embedding")
    cos6 = _round6(f"(({dot}) / (a.nrm * b.nrm))")
    return f"""
    WITH sig AS (
      SELECT vec_id, embedding, {_bucket_expr('duck')} AS bucket,
             {_norm('duck', 'embedding')} AS nrm
      FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {cos6} AS cosine
    FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    """


@register("q_embed_neardup", sql=_neardup_sql(), survey_ids=("EXT-DEDUP", "EXT-SIM",))
def q_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: the two-stage shape — LSH bucket join
    proposes candidates (1/2⁸ of pairs in expectation), exact cosine
    verifies each. A dedup pass then thresholds `cosine` and keeps
    min(vec_id) per connected component.

    Scale: candidates are same-bucket only — repartitioning by bucket
    co-locates the join; the exact verify touches candidate pairs, never
    n². Norms computed once per vector alongside the signature."""
    emb = read_table(spark, sf_dir, "embeddings")
    sig = emb.select(
        "vec_id",
        "embedding",
        F.expr(_bucket_expr("spark")).alias("bucket"),
        F.expr(_norm("spark", "embedding")).alias("nrm"),
    )
    a = sig.alias("a")
    b = sig.alias("b")
    cos = F.expr(_round6(f"(({_dot('spark', 'a.embedding', 'b.embedding')}) / (a.nrm * b.nrm))"))
    return a.join(
        b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id"))
    ).select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"), cos.alias("cosine"))


# ---------------------------------------------------------------------------
# ANN probe: LSH bucket restriction + in-bucket exact top-k
# ---------------------------------------------------------------------------
def _ann_probe_sql() -> str:
    dot = _dot("duck", "q.embedding", "c.embedding")
    cos6 = _round6(f"(({dot}) / (q.nrm * c.nrm))")
    return f"""
    WITH sig AS (
      SELECT vec_id, embedding, {_bucket_expr('duck')} AS bucket,
             {_norm('duck', 'embedding')} AS nrm
      FROM embeddings
    ), scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id, {cos6} AS cosine
      FROM sig q JOIN sig c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES}
    )
    SELECT query_id, cand_id, cosine, rnk FROM (
      SELECT query_id, cand_id, cosine,
             row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rnk
      FROM scored
    ) WHERE rnk <= {TOP_K}
    """


@register("q_ann_probe", sql=_ann_probe_sql(), survey_ids=("EXT-SIM",))
def q_ann_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete sub-linear ANN query: each query vector probes ONLY its
    own LSH bucket (1/2⁸ of the corpus in expectation) and ranks exact
    cosine inside it — recall trades against the probe fraction (multi-
    probe = also visit adjacent-Hamming buckets; plan shape unchanged).

    Scale: with the corpus repartitioned by bucket this is a co-located
    join touching one partition per query — contrast q_cosine_topk's full
    scan. This is the declared demonstration that the engine's ANN path
    is sub-linear, not just bucketed."""
    emb = read_table(spark, sf_dir, "embeddings")
    sig = emb.select(
        "vec_id",
        "embedding",
        F.expr(_bucket_expr("spark")).alias("bucket"),
        F.expr(_norm("spark", "embedding")).alias("nrm"),
    )
    q = sig.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"),
        F.col("bucket").alias("qb"),
    )
    c = sig.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("ce"),
        F.col("nrm").alias("cn"),
        F.col("bucket").alias("cb"),
    )
    cos = F.expr(_round6(f"(({_dot('spark', 'qe', 'ce')}) / (qn * cn))"))
    scored = (
        c.join(F.broadcast(q), (F.col("cb") == F.col("qb")) & (F.col("cand_id") != F.col("query_id")))
        .select("query_id", "cand_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= TOP_K)
