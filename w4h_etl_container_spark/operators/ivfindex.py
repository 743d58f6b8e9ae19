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
