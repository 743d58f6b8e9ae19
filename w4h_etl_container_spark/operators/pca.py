"""PCA over embedding columns, Spark-first (SURVEY §2.11 extension
surface: the dimensionality-reduction stage in front of ANN / semantic
dedup — project 64-d vectors to a low-rank basis before LSH bucketing
so the bucket joins carry k floats instead of d).

Split the way the engine splits everything: the UNBOUNDED work (moment
aggregation over the corpus) is one exploded hash aggregate whose
shuffle is d(d+1)/2 rows per partition — the exact plan q_covariance
hash-pins against DuckDB — and the BOUNDED work (eigendecomposition of
the d×d matrix, 2 080 cells) runs on the driver with numpy, the same
bounded-driver-math contract as the chart render and the PQ codebook
trainer. Projection is then an embarrassingly-parallel Arrow kernel
against the broadcast (k×d) basis.

No reference analog (the reference pipeline has no vector stage);
extension mandated by BASELINE.json.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

from w4h_etl_container_spark.functions.vectorkernels import stackf64

# e3 component quantization: squared moments stay deep inside BIGINT
# even for the hostile 1e5-component vectors (e6 would overflow), and
# the declared contract becomes "covariance of the e3-quantized
# matrix" — exact, engine-neutral integers (see plans/vectors.py
# q_covariance, the hash-pinned rendering of this aggregate).
_Q = 1000.0
_LIM = 9.223372036854775e18


def covariance_moments(emb: DataFrame, dim: int) -> DataFrame:
    """Upper-triangle pairwise-complete covariance moments of the
    ``embedding`` column: one row per (i ≤ j) with integer
    (n, Σxy, Σx, Σy) over e3-quantized components and the DECIMAL-
    guarded centered numerator n·Σxy − Σx·Σy.

    Plan: ZERO joins — one HOF builds the d(d+1)/2 product structs per
    row, one explode feeds one hash aggregate; map-side combine
    collapses every partition to ≤ d(d+1)/2 rows before the shuffle,
    so the exchange is O(d²) per partition at ANY corpus size.
    Non-finite components NULL out and drop pairwise."""
    q = F.transform(
        F.col("embedding"),
        lambda x: F.when(
            F.abs(x.cast("double") * F.lit(_Q)) < F.lit(_LIM),
            F.floor(x.cast("double") * F.lit(_Q) + F.lit(0.5)).cast("long"),
        ),
    )
    pairs = F.expr(
        f"""
        flatten(transform(sequence(0, {dim - 1}), i ->
          transform(sequence(i, {dim - 1}), j ->
            named_struct(
              'i', i, 'j', j,
              'v',  CASE WHEN q[i] IS NOT NULL AND q[j] IS NOT NULL
                         THEN q[i] * q[j] END,
              'qa', CASE WHEN q[i] IS NOT NULL AND q[j] IS NOT NULL
                         THEN q[i] END,
              'qb', CASE WHEN q[i] IS NOT NULL AND q[j] IS NOT NULL
                         THEN q[j] END))))
        """
    )
    d38 = "decimal(38,0)"
    return (
        emb.withColumn("q", q)
        .select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.i").alias("i"), F.col("p.j").alias("j"))
        .agg(
            F.count("p.v").alias("n"),
            F.sum("p.v").alias("sxy"),
            F.sum("p.qa").alias("sx"),
            F.sum("p.qb").alias("sy"),
        )
        .select(
            "i",
            "j",
            "n",
            "sxy",
            "sx",
            "sy",
            # stays DECIMAL(38,0): with unit-norm e3-quantized components
            # the n·Σxy term crosses int64 (~9.2e18) at roughly 3e6 rows
            # per cell, so narrowing to BIGINT here would throw under ANSI
            # far below corpus scale (ADVICE r9). Consumers divide by n²
            # as double; 38 digits hold to ~10²⁶ rows per cell.
            (
                F.col("n").cast(d38) * F.col("sxy").cast(d38)
                - F.col("sx").cast(d38) * F.col("sy").cast(d38)
            ).alias("cov_num"),
        )
    )


@dataclass
class PcaModel:
    mean: np.ndarray  # (d,) column means, original units
    components: np.ndarray  # (k, d) orthonormal rows, descending variance
    eigenvalues: np.ndarray  # (k,) explained variance, descending


def fit_pca(emb: DataFrame, dim: int, k: int) -> PcaModel:
    """Fit PCA from the distributed moment aggregate: collect the
    2 080-cell triangle (bounded driver math — O(d²) cells whatever
    the corpus size), assemble the symmetric covariance matrix in
    original units (e3² → divide by 1e6), eigendecompose with
    ``numpy.linalg.eigh``, and keep the top-k rows.

    Determinism: eigh of a symmetric matrix is deterministic per
    LAPACK build; the residual sign freedom is pinned by flipping each
    component so its largest-|.|=coordinate is positive (ties broken by
    the lower index, which argmax already yields)."""
    rows = covariance_moments(emb, dim).collect()
    if not rows:
        raise ValueError("fit_pca: no moment rows (empty embedding input?)")
    cov = np.zeros((dim, dim), dtype=np.float64)
    mean = np.zeros(dim, dtype=np.float64)
    for r in rows:
        i, j, n = r["i"], r["j"], r["n"]
        if n == 0:
            continue
        c = float(r["cov_num"]) / (float(n) * float(n)) / (_Q * _Q)
        cov[i, j] = c
        cov[j, i] = c
        if i == j:
            mean[i] = float(r["sx"]) / (float(n) * _Q)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # (k, d)
    for row in comps:
        if row[np.abs(row).argmax()] < 0:
            row *= -1.0
    return PcaModel(
        mean=mean, components=comps, eigenvalues=np.maximum(vals[order], 0.0)
    )


def make_pca_project_udf(model: PcaModel):
    """Arrow-batched projection kernel: y = (x − mean) @ Vᵀ, float32
    output. The (k×d) basis rides the closure — a broadcast of k·d
    doubles, the only state the projection needs at any scale."""
    mean = model.mean
    comps_t = model.components.T  # (d, k)

    @F.pandas_udf(ArrayType(FloatType()))
    def pca_project(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        y = (stackf64(emb) - mean) @ comps_t
        return pd.Series(list(y.astype(np.float32)))

    return pca_project


def pca_project(emb: DataFrame, model: PcaModel, out_col: str = "reduced") -> DataFrame:
    """Attach the k-dim projection of ``embedding`` as ``out_col``."""
    return emb.withColumn(out_col, make_pca_project_udf(model)("embedding"))
