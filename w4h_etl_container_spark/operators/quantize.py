"""Int8 scalar quantization for embedding columns (SURVEY.md §2.11 —
the ANN memory-scale path).

A 100 TB embedding corpus is dominated by vector bytes: float32 at
d=768 is 3 KB/vector. Symmetric int8 quantization stores d bytes + one
scale (4× smaller), and candidate scoring becomes an INTEGER dot
product — exact across engines, order-independent, SIMD-friendly — with
the float reconstruction ``scale_a · scale_b · qdot`` applied only to
the scalar result. The standard ANN deployment runs coarse search (IVF
/ LSH buckets — both already in the engine) over quantized vectors and
re-ranks the short candidate list with full-precision dots; the recall
cost of int8 at that stage is negligible (|cos error| ≤ ~2/127 for
unit-ish vectors).

The quantization itself is an Arrow numpy kernel (same rationale as
every vector kernel: dimension-independent plan, no 64 KB codegen
limit); the downstream DOT is native Catalyst HOFs — integer sums are
order-insensitive, so ``aggregate(zip_with(...))`` is safe JVM-side
whole-stage-codegen with no UDF on the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from w4h_etl_container_spark.functions.vectorkernels import make_quantize_udf

_quantize_udf = make_quantize_udf()


def quantize_embeddings(df: DataFrame, col: str = "embedding") -> DataFrame:
    """Add ``q`` (array<long> in [-127, 127] — int8 value range; the
    storage writer casts to tinyint) and ``scale_e6`` (per-vector scale
    in micro-units) alongside the original columns. One Arrow batch
    pass, zero shuffles."""
    st = _quantize_udf(F.col(col))
    return df.withColumn("q", st["q"]).withColumn("scale_e6", st["scale_e6"])


def qdot(a: str | Column, b: str | Column) -> Column:
    """Integer dot product of two quantized vectors — native HOFs, no
    UDF: integer addition is associative, so any fold order is exact."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, t: acc + t
    )


def quantized_cosine_expr(qa: str, qb: str) -> Column:
    """cos ≈ qdot(a,b) / sqrt(qdot(a,a) · qdot(b,b)) — the scales cancel
    in cosine, so ranking needs no float reconstruction at all. All
    three dots are exact integers; the single float sqrt/division at
    the end is one correctly-rounded op per pair."""
    num = qdot(qa, qb).cast("double")
    den = F.sqrt(qdot(qa, qa).cast("double") * qdot(qb, qb).cast("double"))
    return num / den
