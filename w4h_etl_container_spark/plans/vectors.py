"""Similarity-search operators over ``embeddings`` (64-dim float vectors)
— SURVEY.md §2.11 / BASELINE.json north star.

Exactness strategy: dot products and norms are generated as explicit
64-term balanced tree-sums over ``element_at`` references, rendered for
both engines from the same generator — identical operation order →
identical doubles (elements are float32 upcast to double first). Final
cosines are round6'd only to absorb sqrt-free library differences (none
expected — sqrt is IEEE-exact — but cheap insurance for ranking ties).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from w4h_etl_container_spark.kernels import tree_sum
from w4h_etl_container_spark.plans.registry import register
from w4h_etl_container_spark.session import read_table

DIM = 64
TOP_K = 5
N_QUERIES = 8  # vec_id < 8 are the query vectors
N_PLANES = 8


def _dot_spark(a: str, b: str) -> Column:
    terms = [
        F.element_at(F.col(a), i + 1).cast("double") * F.element_at(F.col(b), i + 1).cast("double")
        for i in range(DIM)
    ]
    return tree_sum(terms)


def _norm_spark(a: str) -> Column:
    terms = [
        F.element_at(F.col(a), i + 1).cast("double") * F.element_at(F.col(a), i + 1).cast("double")
        for i in range(DIM)
    ]
    return F.sqrt(tree_sum(terms))


class _S(str):
    """Tiny str-wrapper with + for tree_sum over SQL fragments."""

    def __add__(self, other):  # type: ignore[override]
        return _S(f"({str(self)} + {str(other)})")


def _dot_sql(a: str, b: str) -> str:
    terms = [
        _S(f"(CAST({a}[{i + 1}] AS DOUBLE) * CAST({b}[{i + 1}] AS DOUBLE))") for i in range(DIM)
    ]
    return str(tree_sum(terms))


def _norm_sql(a: str) -> str:
    terms = [
        _S(f"(CAST({a}[{i + 1}] AS DOUBLE) * CAST({a}[{i + 1}] AS DOUBLE))") for i in range(DIM)
    ]
    return f"SQRT({tree_sum(terms)})"


_ROUND6 = "FLOOR({x} * 1000000.0 + 0.5) / 1000000.0"


def _round6_spark(x: Column) -> Column:
    return F.floor(x * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


# ---------------------------------------------------------------------------
# brute-force cosine top-k
# ---------------------------------------------------------------------------
def _cosine_topk_sql() -> str:
    dot = _dot_sql("q.embedding", "c.embedding")
    nq, nc = _norm_sql("q.embedding"), _norm_sql("c.embedding")
    cos6 = _ROUND6.format(x=f"(({dot}) / (({nq}) * ({nc})))")
    return f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             {cos6} AS cosine
      FROM embeddings q JOIN embeddings c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    )
    SELECT query_id, cand_id, cosine, rnk FROM (
      SELECT query_id, cand_id, cosine,
             row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rnk
      FROM scored
    ) WHERE rnk <= {TOP_K}
    """


@register("q_cosine_topk", sql=_cosine_topk_sql(), survey_ids=("EXT-SIM",))
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: the exact ANN baseline. The (tiny) query
    set broadcasts against the corpus — the fact side never shuffles; the
    per-query top-k is a rank-filtered window partitioned by query.

    Scale: at 100 TB the corpus side stays partition-local; per-partition
    top-k heaps (TakeOrdered per group via the rnk≤k filter under AQE)
    bound the shuffle to k rows per (query, partition). The IVF/LSH
    variant (q_ann_lsh) is the sub-linear path."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = emb.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("ce"))
    dot = _dot_spark("qe", "ce")
    cos = _round6_spark(dot / (_norm_spark("qe") * _norm_spark("ce")))
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


def _lsh_sql() -> str:
    dots = []
    for p in range(N_PLANES):
        terms = [
            _S(f"(CAST(embedding[{j + 1}] AS DOUBLE) * {_plane(p, j)!r})") for j in range(DIM)
        ]
        dots.append(str(tree_sum(terms)))
    bucket = " + ".join(
        f"(CASE WHEN ({dots[p]}) >= 0.0 THEN {1 << p} ELSE 0 END)" for p in range(N_PLANES)
    )
    return f"SELECT vec_id, label, CAST({bucket} AS BIGINT) AS bucket FROM embeddings"


@register("q_ann_lsh", sql=_lsh_sql(), survey_ids=("EXT-SIM",))
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH signature: 8 sign bits packed to a bucket id.
    ANN then probes only same-bucket candidates (1/256 of the corpus in
    expectation) — the sub-linear scale path behind q_cosine_topk.

    Hyperplane components are Python-computed literals (both engines see
    identical doubles; no runtime trig). Scale: scan-bound, zero shuffle;
    bucketing by the signature makes the candidate join co-located."""
    emb = read_table(spark, sf_dir, "embeddings")
    bucket = None
    for p in range(N_PLANES):
        terms = [
            F.element_at(F.col("embedding"), j + 1).cast("double") * F.lit(_plane(p, j))
            for j in range(DIM)
        ]
        bit = F.when(tree_sum(terms) >= 0.0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return emb.select("vec_id", "label", bucket.cast("long").alias("bucket"))


# ---------------------------------------------------------------------------
# vector stats (norms / normalized components)
# ---------------------------------------------------------------------------
def _vecstats_sql() -> str:
    nrm = _norm_sql("embedding")
    c0 = f"CAST(embedding[1] AS DOUBLE) / ({nrm})"
    return f"""
    SELECT vec_id, label,
           {_ROUND6.format(x=nrm)} AS l2_norm,
           {_ROUND6.format(x=c0)} AS unit_c0
    FROM embeddings
    """


@register("q_vector_stats", sql=_vecstats_sql(), survey_ids=("EXT-SIM",))
def q_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norm and first normalized component — the cheap
    vector-hygiene pass (zero-norm and NaN screening) a pipeline runs
    before any similarity work."""
    emb = read_table(spark, sf_dir, "embeddings")
    nrm = _norm_spark("embedding")
    return emb.select(
        "vec_id",
        "label",
        _round6_spark(nrm).alias("l2_norm"),
        _round6_spark(F.element_at(F.col("embedding"), 1).cast("double") / nrm).alias("unit_c0"),
    )
