"""Measure the trained IVF-PQ index's recall@10-vs-nprobe curve and
print it as JSON — the retrieval-quality evidence PERF.md records
(r9 verdict task #1).

Two fixtures, deliberately:

* PLANTED (w4h_etl_container_spark.testing.write_planted_embeddings):
  ground truth exists by construction, so recall has a right answer —
  this is the QUALITY claim (high recall at nprobe ≪ n_centroids).
* REAL driver fixture (sf dir argument, default sf0.1): no neighbor
  structure (max pairwise cosine ≈ 0.6 — exact top-k is concentration
  noise), so its curve documents the coverage-vs-probe mechanics and
  the honesty note, not quality.

Usage: python tools/ann_recall_curve.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from w4h_etl_container_spark.pipeline.vectorindex import build_vector_index
    from w4h_etl_container_spark.plans.vectors import ann_recall
    from w4h_etl_container_spark.session import get_spark
    from w4h_etl_container_spark.testing import write_planted_embeddings

    spark = get_spark("ann_recall_curve")
    out = {}

    with tempfile.TemporaryDirectory() as tmp:
        planted_dir = os.path.join(tmp, "planted")
        write_planted_embeddings(planted_dir, n_clusters=16, per_cluster=30)
        idx = os.path.join(tmp, "planted_index")
        man = build_vector_index(
            spark, planted_dir, idx, n_centroids=16, m=8, k=64, iters=3
        )
        out["planted"] = {
            "n_vectors": man["n_vectors"],
            "n_centroids": 16,
            "pq": man["pq"],
            "adc_only": ann_recall(
                spark, planted_dir, idx, nprobes=(1, 2, 4, 8, 16), top_k=10
            ),
            "rerank40": ann_recall(
                spark, planted_dir, idx, nprobes=(1, 2, 4, 8, 16), top_k=10,
                rerank=40,
            ),
        }

        idx2 = os.path.join(tmp, "real_index")
        man2 = build_vector_index(
            spark, sf_dir, idx2, n_centroids=16, m=8, k=64, iters=3
        )
        out["real_fixture"] = {
            "sf_dir": sf_dir,
            "n_vectors": man2["n_vectors"],
            "n_centroids": 16,
            "pq": man2["pq"],
            "adc_only": ann_recall(
                spark, sf_dir, idx2, nprobes=(1, 2, 4, 8, 16), top_k=10
            ),
            "rerank40": ann_recall(
                spark, sf_dir, idx2, nprobes=(1, 2, 4, 8, 16), top_k=10,
                rerank=40,
            ),
        }

    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
