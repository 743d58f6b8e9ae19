"""IVF index build — the training step behind q_ivf_assign's coarse
quantizer (SURVEY §2.11 / ANN scale path).

``q_ivf_assign`` declares the assignment plan with deterministic literal
centroids so the DuckDB oracle can check it; a real index trains the
centroids first. This module is that trainer: Lloyd's k-means expressed
Spark-natively —

* **assign** step: the same Arrow numpy kernel the declared query uses
  (``vectorkernels.make_ivf_assign_udf``) with the current centroid
  matrix — one scan, no shuffle;
* **update** step: ``posexplode`` the vectors and average per
  (centroid, dimension) — one shuffle of 64·n skinny rows with map-side
  partial aggregation;
* only the k×d centroid matrix (the model, a few KB) ever reaches the
  driver — the data never does. Empty clusters keep their previous
  centroid.

At 100 TB: train on a sample (``sample_fraction``), k ≈ √n centroids,
then one full assignment pass repartitions the corpus by ``centroid_id``
for sub-linear probes (see PERF.md's occupancy math). Each iteration is
one job; distortion is monotonically non-increasing (Lloyd's invariant,
pinned in tests).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from w4h_etl_container_spark.functions.vectorkernels import make_ivf_assign_udf


def init_centroids(emb: DataFrame, k: int) -> np.ndarray:
    """Deterministic seed: the k vectors with the smallest vec_id (a real
    deployment may prefer k-means|| oversampling; the iteration below is
    identical either way)."""
    rows = emb.orderBy("vec_id").limit(k).select("embedding").collect()
    return np.array([r["embedding"] for r in rows], dtype=np.float64)


def assign(emb: DataFrame, centroids: np.ndarray) -> DataFrame:
    """One assignment pass: vec_id, centroid_id, dist2_e6 (micro-units)."""
    udf = make_ivf_assign_udf(centroids)
    return emb.select("vec_id", "embedding", udf("embedding").alias("iv")).select(
        "vec_id", "embedding", "iv.centroid_id", "iv.dist2_e6"
    )


def train_ivf_centroids(
    emb: DataFrame,
    k: int = 4,
    iters: int = 3,
    sample_fraction: float | None = None,
) -> tuple[np.ndarray, list[float]]:
    """Lloyd's k-means over the ``embedding`` column. Returns the trained
    (k, d) centroid matrix and the per-iteration mean distortion (mean
    squared distance, from the assignment's exact micro-unit integers).
    """
    data = emb.select("vec_id", "embedding")
    if sample_fraction is not None:
        data = data.sample(fraction=sample_fraction, seed=42)
    data = data.cache()
    try:
        centroids = init_centroids(data, k)
        d = centroids.shape[1]
        history: list[float] = []
        for _ in range(iters):
            assigned = assign(data, centroids)
            distortion = assigned.agg(F.avg("dist2_e6").alias("m")).collect()[0]["m"] / 1e6
            history.append(float(distortion))
            sums = (
                assigned.select("centroid_id", F.posexplode("embedding").alias("pos", "v"))
                .groupBy("centroid_id", "pos")
                .agg(F.avg(F.col("v").cast("double")).alias("mean_v"))
                .collect()
            )
            new_centroids = centroids.copy()  # empty clusters keep position
            seen = set()
            for r in sums:
                new_centroids[r["centroid_id"], r["pos"]] = r["mean_v"]
                seen.add(r["centroid_id"])
            centroids = new_centroids
        return centroids, history
    finally:
        data.unpersist()


def build_partitioned_index(emb: DataFrame, centroids: np.ndarray) -> DataFrame:
    """The index layout pass: assign every vector and repartition by
    centroid_id so each IVF cell is physically co-located — queries then
    probe only their nearest cells' partitions."""
    return assign(emb, centroids).repartition("centroid_id")


# ---------------------------------------------------------------------------
# PQ codebook training (the production knob behind plans/vectors.py's
# q_pq_codes/q_pq_adc, which declare DETERMINISTIC stand-in codebooks
# so their oracles stay literal): per-subspace Lloyd's k-means, all
# subspaces trained in ONE distributed pass per iteration
# ---------------------------------------------------------------------------
def pq_train(
    emb: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 5,
    sample_fraction: float | None = None,
) -> tuple[np.ndarray, list[float]]:
    """Train (m, k, dsub) PQ codebooks over the ``embedding`` column.
    Returns the codebooks and the per-iteration mean reconstruction
    error (summed over subspaces — Lloyd's guarantees it is monotone
    non-increasing, pinned in tests).

    Distributed shape per iteration: ONE Arrow kernel pass computes all
    m subspace codes (reusing ``make_pq_encode_udf`` with the current
    codebooks), then ONE skinny shuffle of (s, code, dim, value) rows —
    64·n rows regardless of m — feeds the per-(s, code, dim) means;
    only the m·k·dsub codebook matrix (a few KB) reaches the driver.
    Empty codes keep their previous centroid. Init is deterministic:
    the k smallest-vec_id vectors' subvectors per subspace."""
    from w4h_etl_container_spark.functions.vectorkernels import (
        make_pq_adc_udf,
        make_pq_encode_udf,
    )

    data = emb.select("vec_id", "embedding")
    if sample_fraction is not None:
        data = data.sample(fraction=sample_fraction, seed=42)
    data = data.cache()
    try:
        seed_rows = data.orderBy("vec_id").limit(k).select("embedding").collect()
        seed = np.array([r["embedding"] for r in seed_rows], dtype=np.float64)
        d = seed.shape[1]
        if d % m:
            raise ValueError(f"dim {d} not divisible by m={m}")
        dsub = d // m
        codebooks = np.stack(
            [seed[:, s * dsub : (s + 1) * dsub].copy() for s in range(m)]
        )  # (m, k, dsub)
        bits = max(1, (k - 1).bit_length())
        history: list[float] = []
        for _ in range(iters):
            enc = make_pq_encode_udf(codebooks, bits)
            adc = make_pq_adc_udf(codebooks, bits)
            coded = data.select(
                "embedding", enc("embedding").alias("code")
            ).cache()
            err = (
                coded.select(adc("embedding", "code").alias("e"))
                .agg(F.avg(F.col("e").cast("double")).alias("m"))
                .collect()[0]["m"]
                / 1e6
            )
            history.append(float(err))
            # one skinny exchange for ALL subspaces: (s, code_s, dim, x)
            # shiftright() takes only a literal shift — render the
            # variable-shift code extraction as a SQL expression
            sub = coded.select(
                F.posexplode("embedding").alias("pos", "v"), "code"
            ).select(
                F.expr(f"CAST(pos / {dsub} AS INT)").alias("s"),
                (F.col("pos") % dsub).alias("i"),
                F.expr(
                    f"shiftright(code, CAST(pos / {dsub} AS INT) * {bits})"
                    f" & {(1 << bits) - 1}"
                ).alias("j"),
                F.col("v").cast("double").alias("x"),
            )
            means = (
                sub.groupBy("s", "j", "i").agg(F.avg("x").alias("mx")).collect()
            )
            coded.unpersist()
            new_cb = codebooks.copy()
            for r in means:
                new_cb[r["s"], r["j"], r["i"]] = r["mx"]
            codebooks = new_cb
        return codebooks, history
    finally:
        data.unpersist()
