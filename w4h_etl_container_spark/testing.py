"""Synthetic fixtures with PLANTED structure — ground truth by
construction, for claims the driver's uniform-random fixtures cannot
exercise (the r9 verdict's gap: ANN retrieval QUALITY was never
demonstrable because the embeddings fixture has no neighbor structure,
and recall against an arbitrary top-k of noise is meaningless).

Everything here is deterministic (seeded numpy) and written in the
exact physical schema the driver's tables use, so ``session.read_*``
and every declared plan run on a planted directory unchanged.
"""

from __future__ import annotations

import os

import numpy as np


def write_planted_embeddings(
    out_dir: str,
    n_clusters: int = 16,
    per_cluster: int = 30,
    dim: int = 64,
    n_near: int = 10,
    near_sigma: float = 0.05,
    far_sigma: float = 0.6,
    center_scale: float = 10.0,
    seed: int = 7,
) -> dict:
    """Write ``embeddings.parquet`` with a planted neighborhood
    structure and return its ground truth.

    Geometry per cluster c (centers: random gaussian directions scaled
    to ``center_scale``, pairwise ~``center_scale``·√2 apart):

    * 1 ANCHOR vector (the query): the center itself;
    * ``n_near`` NEAR vectors: center + N(0, near_sigma²) — the
      anchor's true nearest neighbors, tightly packed;
    * the rest FAR vectors: center + N(0, far_sigma²) — same cluster,
      an order of magnitude farther out, but still far closer to this
      anchor than to any other cluster.

    The anchor's exact top-``n_near`` by L2 are its NEAR mates with a
    wide margin (anchor→near dist² ≈ near_sigma²·d ≈ 0.16 vs
    anchor→far ≈ far_sigma²·d ≈ 23 vs cross-cluster ≈ 200), so recall
    measured against brute force has a known right answer — and the
    NEAR/FAR gap dwarfs a trained PQ's reconstruction error, so the
    index's retrieval QUALITY (not just its plan) is testable.

    vec_id layout is chosen for the index's deterministic contracts:
    ids 0..n_clusters−1 are the ANCHORS (so ``search_index``'s
    ``vec_id < n_queries`` queries are anchors with known truth, and
    ``init_centroids``' smallest-vec_id seed starts Lloyd's at one
    point per planted cluster — the well-posed training problem);
    cluster c's mates occupy the block n_clusters + c·(per_cluster−1)
    onward, NEAR first. ``label`` = cluster id. Schema matches the
    driver fixture: vec_id int64, embedding list<float>, label int32.

    Returns ``{"anchors": [...], "true_neighbors": {anchor: [...]},
    "n": total}``.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers *= center_scale / np.linalg.norm(centers, axis=1, keepdims=True)

    n_total = n_clusters * per_cluster
    mates = per_cluster - 1
    n_near = min(n_near, mates)  # small clusters: every mate is NEAR
    vecs = np.empty((n_total, dim), dtype=np.float32)
    labels = np.empty(n_total, dtype=np.int32)
    anchors: list[int] = []
    truth: dict[int, list[int]] = {}
    for c in range(n_clusters):
        vecs[c] = centers[c]
        labels[c] = c
        base = n_clusters + c * mates
        near = centers[c] + rng.normal(0.0, near_sigma, (n_near, dim))
        far = centers[c] + rng.normal(0.0, far_sigma, (mates - n_near, dim))
        vecs[base : base + n_near] = near
        vecs[base + n_near : base + mates] = far
        labels[base : base + mates] = c
        anchors.append(c)
        truth[c] = list(range(base, base + n_near))

    table = pa.table(
        {
            "vec_id": pa.array(range(n_total), type=pa.int64()),
            "embedding": pa.array(
                [v for v in vecs], type=pa.list_(pa.float32())
            ),
            "label": pa.array(labels, type=pa.int32()),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(table, os.path.join(out_dir, "embeddings.parquet"))
    return {"anchors": anchors, "true_neighbors": truth, "n": n_total}


def write_planted_documents(
    out_dir: str,
    n_docs: int = 200,
    typo_every: int = 4,
    seed: int = 11,
) -> dict:
    """Write ``documents.parquet`` with PLANTED distance-1 vocabulary
    neighbors — the driver fixture's 31-token vocabulary provably
    contains none (checked exhaustively via deletion buckets), so
    q_typo_pairs is vacuous at every driver scale factor; this fixture
    makes the DECLARED query's non-trivial path executable end-to-end.

    Vocabulary: 40 base words plus, for every 4th word, a planted typo
    form (one char dropped / substituted / appended — each an exact
    edit-distance-1 neighbor). Every document mixes base words with
    occasional typo forms, so both forms clear any frequency cutoff.
    Schema matches the driver fixture: doc_id int64, text, lang,
    source, n_chars.

    Returns {"typo_pairs": [(base, typo)...], "n_docs": n}.
    """
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(seed)
    base = [f"word{i:02d}x" for i in range(40)]
    typos: list[tuple[str, str]] = []
    for i in range(0, 40, typo_every):
        w = base[i]
        kind = i // typo_every % 3
        if kind == 0:
            t = w[:3] + w[4:]  # deletion
        elif kind == 1:
            t = w[:3] + "q" + w[4:]  # substitution
        else:
            t = w + "q"  # insertion
        typos.append((w, t))
    typo_of = dict(typos)

    rows = []
    for d in range(n_docs):
        words = []
        for _ in range(rng.randrange(30, 60)):
            w = rng.choice(base)
            if w in typo_of and rng.random() < 0.3:
                w = typo_of[w]
            words.append(w)
        text = " ".join(words)
        rows.append((d, text, "en", f"src{d % 4}", len(text)))

    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array([r[2] for r in rows]),
            "source": pa.array([r[3] for r in rows]),
            "n_chars": pa.array([r[4] for r in rows], type=pa.int64()),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(table, os.path.join(out_dir, "documents.parquet"))
    return {"typo_pairs": typos, "n_docs": n_docs}
