"""Arrow-vectorized vector-math kernels — the ANN / embedding-dedup hot
path (SURVEY.md §2.11).

Why pandas UDFs here when the rest of the engine is native Column
expressions: a dot product over a d-dim array column rendered as an
expression tree is O(d) generated code per output — at d=64 the single
generated JVM method blows past Janino's 64 KB limit and whole-stage
codegen silently falls back to interpreted evaluation (observed in round
1: 2.2 s Spark vs 0.33 s DuckDB at sf0.01 for the near-dup join). numpy
over Arrow batches is the idiomatic Spark shape for fixed-width vector
math: one columnar transfer per batch, SIMD loops, zero per-row Python —
and it is dimension-independent (d=768 embeddings cost the same plan).

Determinism contract (the DuckDB oracle renders the same math as SQL
text, see plans/vectors.py):

* inputs are float32 upcast to float64 — exact in both engines;
* products / quotients are single IEEE binary64 ops in numpy, the JVM
  and DuckDB alike;
* ``tree_reduce`` reproduces ``kernels.tree_sum``'s balanced pairwise
  addition order bit-for-bit (pair adjacent, carry the odd tail), so
  cross-element sums are bit-identical;
* ``np.sqrt`` / ``np.floor`` are correctly-rounded IEEE ops matching
  ``Math.sqrt`` / SQL FLOOR;

therefore every exported ``*_e6`` integer (``floor(x·1e6 + 0.5)`` in
micro-units) is identical in both engines — integer outputs survive any
downstream float canonicalization.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

_VECSTATS_SCHEMA = StructType(
    [StructField("l2_norm_e6", LongType()), StructField("unit_c0_e6", LongType())]
)
_IVF_SCHEMA = StructType(
    [StructField("centroid_id", LongType()), StructField("dist2_e6", LongType())]
)


def tree_reduce(m: np.ndarray) -> np.ndarray:
    """Balanced pairwise sum along axis 1, in exactly the order of
    ``kernels.tree_sum`` (pairs (0,1),(2,3),…; an odd tail carries)."""
    while m.shape[1] > 1:
        w = m.shape[1]
        even = w - (w % 2)
        s = m[:, 0:even:2] + m[:, 1:even:2]
        if w % 2:
            s = np.concatenate([s, m[:, w - 1 : w]], axis=1)
        m = s
    return m[:, 0]


def stackf64(s: pd.Series) -> np.ndarray:
    """Series of float32 arrays → (n, d) float64 matrix (exact upcast)."""
    if len(s) == 0:
        return np.empty((0, 1), dtype=np.float64)
    return np.stack(s.to_numpy()).astype(np.float64)


def e6(x: np.ndarray) -> pd.arrays.IntegerArray:
    """floor(x·1e6 + 0.5) as NULLABLE int64 — mirrors the oracle's
    guarded CAST(FLOOR(x * 1e6 + 0.5) AS BIGINT). Non-finite inputs
    (0/0 cosine of a zero-norm vector) and values outside int64 yield
    NULL: a bare ``.astype(int64)`` silently wraps NaN to INT64_MIN —
    garbage output from the very hygiene stats meant to CATCH bad
    vectors (hostile-embeddings finding)."""
    y = np.floor(np.asarray(x, dtype=np.float64) * 1e6 + 0.5)
    ok = np.isfinite(y) & (np.abs(y) < 9.223372036854775e18)
    return pd.arrays.IntegerArray(
        np.where(ok, y, 0).astype(np.int64), mask=~ok
    )


def hyperplanes(n_planes: int, dim: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplane matrix (n_planes, dim):
    component (p, j) = sin(p·97 + j·13). Python-level constants — the SQL
    dialect embeds the identical doubles as literals (repr round-trips)."""
    return np.array(
        [[math.sin(p * 97.0 + j * 13.0) for j in range(dim)] for p in range(n_planes)],
        dtype=np.float64,
    )


def ivf_centroids(n_centroids: int, dim: int) -> np.ndarray:
    """Deterministic stand-in centroids (k, j) = cos(k·31 + j·7). A real
    index trains these with k-means over a corpus sample; the assignment
    kernel below is unchanged."""
    return np.array(
        [[math.cos(k * 31.0 + j * 7.0) for j in range(dim)] for k in range(n_centroids)],
        dtype=np.float64,
    )


def make_norm_udf():
    """L2 norm of a float32 vector column, as exact double."""

    @F.pandas_udf(DoubleType())
    def l2_norm(e: pd.Series) -> pd.Series:
        a = stackf64(e)
        return pd.Series(np.sqrt(tree_reduce(a * a)))

    return l2_norm


def make_cosine_e6_udf():
    """cosine(q, c) = dot/(qn·cn) in micro-units, given precomputed norms
    (norms are computed once per vector, not once per pair — the n·1 vs
    n·q asymptotic win at corpus scale)."""

    @F.pandas_udf(LongType())
    def cosine_e6(qe: pd.Series, ce: pd.Series, qn: pd.Series, cn: pd.Series) -> pd.Series:
        a, b = stackf64(qe), stackf64(ce)
        if len(a) == 0:
            return pd.Series([], dtype="int64")
        dot = tree_reduce(a * b)
        cos = dot / (qn.to_numpy(dtype=np.float64) * cn.to_numpy(dtype=np.float64))
        return pd.Series(e6(cos))

    return cosine_e6


def make_dist2_e6_udf():
    """Exact pairwise squared L2 distance ||a − b||² in micro-units —
    the ground-truth metric ADC approximates (same ``tree_reduce``
    summation order as the assign/encode/ADC kernels, so exact and
    approximate distances live on one deterministic arithmetic
    contract). Non-finite inputs NULL out via the e6 guard."""

    @F.pandas_udf(LongType())
    def dist2_e6(ae: pd.Series, be: pd.Series) -> pd.Series:
        a, b = stackf64(ae), stackf64(be)
        if len(a) == 0:
            return pd.Series([], dtype="int64")
        d = a - b
        return pd.Series(e6(tree_reduce(d * d)))

    return dist2_e6


def make_bucket_udf(planes: np.ndarray):
    """Random-hyperplane LSH signature: sign bit per plane packed into a
    bucket id in [0, 2^n_planes)."""

    @F.pandas_udf(LongType())
    def lsh_bucket(emb: pd.Series) -> pd.Series:
        a = stackf64(emb)
        if len(a) == 0:
            return pd.Series([], dtype="int64")
        bucket = np.zeros(len(a), dtype=np.int64)
        for p in range(planes.shape[0]):
            dp = tree_reduce(a * planes[p])
            bucket += (dp >= 0.0).astype(np.int64) << p
        return pd.Series(bucket)

    return lsh_bucket


def make_vecstats_udf():
    """Per-vector hygiene stats: L2 norm and first normalized component,
    both in micro-units."""

    @F.pandas_udf(_VECSTATS_SCHEMA)
    def vec_stats(emb: pd.Series) -> pd.DataFrame:
        a = stackf64(emb)
        if len(a) == 0:
            return pd.DataFrame(
                {"l2_norm_e6": pd.Series([], dtype="int64"), "unit_c0_e6": pd.Series([], dtype="int64")}
            )
        nrm = np.sqrt(tree_reduce(a * a))
        return pd.DataFrame({"l2_norm_e6": e6(nrm), "unit_c0_e6": e6(a[:, 0] / nrm)})

    return vec_stats


def make_ivf_assign_udf(centroids: np.ndarray):
    """IVF coarse quantization: nearest centroid by squared L2, ties to
    the lowest centroid id (strict-< running min, matching the oracle's
    CASE chain)."""

    @F.pandas_udf(_IVF_SCHEMA)
    def ivf_assign(emb: pd.Series) -> pd.DataFrame:
        a = stackf64(emb)
        if len(a) == 0:
            return pd.DataFrame(
                {"centroid_id": pd.Series([], dtype="int64"), "dist2_e6": pd.Series([], dtype="int64")}
            )
        d0 = a - centroids[0]
        best_d = tree_reduce(d0 * d0)
        best_k = np.zeros(len(a), dtype=np.int64)
        for k in range(1, centroids.shape[0]):
            dk = a - centroids[k]
            dist = tree_reduce(dk * dk)
            better = dist < best_d
            best_d = np.where(better, dist, best_d)  # selection only — bit-exact
            best_k = np.where(better, k, best_k)
        return pd.DataFrame({"centroid_id": best_k, "dist2_e6": e6(best_d)})

    return ivf_assign


_QUANT_SCHEMA = StructType(
    [
        StructField("q", ArrayType(LongType())),
        StructField("scale_e6", LongType()),
    ]
)


def make_quantize_udf():
    """Symmetric per-vector int8 scalar quantization — the memory-scale
    path for embedding storage and ANN verify at corpus scale (float32
    d-dim → d bytes + one scale: 4× smaller vectors, integer SIMD dots).

    q_i = floor(x_i / amax · 127 + 0.5) ∈ [-127, 127],
    scale_e6 = floor(amax / 127 · 1e6 + 0.5); an all-zero vector
    quantizes to zeros with scale 0. Every op (abs, max, /, ·, floor)
    is a single correctly-rounded IEEE double op evaluated in the same
    order as the DuckDB twin's list_transform rendering, so the emitted
    INTEGERS are bit-identical across engines (same contract as the
    *_e6 kernels)."""

    @F.pandas_udf(_QUANT_SCHEMA)
    def quantize(emb: pd.Series) -> pd.DataFrame:
        a = stackf64(emb)
        if len(a) == 0:
            return pd.DataFrame(
                {"q": pd.Series([], dtype="object"), "scale_e6": pd.Series([], dtype="int64")}
            )
        amax = np.abs(a).max(axis=1)
        safe = np.where(amax == 0.0, 1.0, amax)
        q = np.floor(a / safe[:, None] * 127.0 + 0.5).astype(np.int64)
        q[amax == 0.0] = 0
        scale = np.floor(amax / 127.0 * 1e6 + 0.5).astype(np.int64)
        return pd.DataFrame({"q": list(q), "scale_e6": scale})

    return quantize


def make_ivf_probe_udf(centroids: np.ndarray, nprobe: int):
    """Multi-probe cell list: the ``nprobe`` nearest centroid ids by
    squared L2, ties to the lowest id (full argsort of the k-row
    distance matrix — k is small by construction; the kernel is
    dimension-independent like every vector kernel here)."""
    k = len(centroids)
    nprobe = min(nprobe, k)

    @F.pandas_udf(ArrayType(LongType()))
    def ivf_probe(emb: pd.Series) -> pd.Series:
        a = stackf64(emb)
        if len(a) == 0:
            return pd.Series([], dtype="object")
        # dist2[i, c] via the same (x - c)^2 tree order as assign
        d2 = np.stack(
            [tree_reduce((a - centroids[c]) * (a - centroids[c])) for c in range(k)], axis=1
        )
        # stable argsort = ties to lowest centroid id
        order = np.argsort(d2, axis=1, kind="stable")[:, :nprobe].astype(np.int64)
        return pd.Series(list(order))

    return ivf_probe


# ---------------------------------------------------------------------------
# Product quantization (IVF-PQ's compression half): m subvector
# codebooks of k centroids; a d-dim float vector becomes m small codes
# packed into ONE int64 (64 float32 dims → 32 bits here: 32× smaller)
# ---------------------------------------------------------------------------
def pq_codebooks(m: int, k: int, dsub: int) -> np.ndarray:
    """Deterministic stand-in codebooks (m, k, dsub): component
    (s, j, i) = sin(s·59 + j·17 + i·5). A real index trains each
    subspace with k-means over a corpus sample (operators/ivfindex.py's
    loop per subspace); encode/ADC below are unchanged. The SQL dialect
    embeds the identical doubles as literals (repr round-trips)."""
    return np.array(
        [
            [[math.sin(s * 59.0 + j * 17.0 + i * 5.0) for i in range(dsub)] for j in range(k)]
            for s in range(m)
        ],
        dtype=np.float64,
    )


def make_pq_encode_udf(codebooks: np.ndarray, bits: int):
    """Packed PQ code per vector: subspace s's nearest-centroid index
    (squared L2, tree-ordered; ties → lowest index, numpy argmin's
    first-occurrence rule = the oracle's list_position-of-min) occupies
    bit window [s·bits, (s+1)·bits)."""
    m, k, dsub = codebooks.shape

    @F.pandas_udf(LongType())
    def pq_encode(e: pd.Series) -> pd.Series:
        x = stackf64(e)
        if x.shape[0] == 0:
            return pd.Series([], dtype="int64")
        packed = np.zeros(x.shape[0], dtype=np.int64)
        for s in range(m):
            xs = x[:, s * dsub : (s + 1) * dsub]
            d = np.empty((x.shape[0], k), dtype=np.float64)
            for j in range(k):
                diff = xs - codebooks[s, j]
                d[:, j] = tree_reduce(diff * diff)
            packed |= np.argmin(d, axis=1).astype(np.int64) << (s * bits)
        return pd.Series(packed)

    return pq_encode


def make_pq_adc_udf(codebooks: np.ndarray, bits: int):
    """Asymmetric distance computation: query stays float, candidate is
    its packed code; approx ||q − x||² = Σ_s ||q_sub − c[s, code_s]||²
    in micro-units. Per-subspace partials AND the cross-subspace total
    both follow the shared tree order, so the generated SQL replays the
    identical doubles."""
    m, k, dsub = codebooks.shape
    mask = (1 << bits) - 1

    @F.pandas_udf(LongType())
    def pq_adc(qe: pd.Series, code: pd.Series) -> pd.Series:
        q = stackf64(qe)
        if q.shape[0] == 0:
            return pd.Series([], dtype="int64")
        c = code.to_numpy(dtype=np.int64)
        partial = np.empty((q.shape[0], m), dtype=np.float64)
        for s in range(m):
            qs = q[:, s * dsub : (s + 1) * dsub]
            cs = (c >> (s * bits)) & mask
            diff = qs - codebooks[s][cs]
            partial[:, s] = tree_reduce(diff * diff)
        return pd.Series(e6(tree_reduce(partial)))

    return pq_adc


def make_project_udf(planes: np.ndarray):
    """Dense random projection (Johnson–Lindenstrauss): e6-quantized
    dot products against each plane, in ``tree_reduce`` order so the
    generated-SQL oracle replays the identical doubles. Output is one
    nullable-int64 column per plane (the e6 hygiene guard NULLs
    non-finite inputs)."""
    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        [StructField(f"r{p}_e6", LongType()) for p in range(planes.shape[0])]
    )

    @F.pandas_udf(schema)
    def project(emb: pd.Series) -> pd.DataFrame:
        a = stackf64(emb)
        out = {}
        for p in range(planes.shape[0]):
            if len(a) == 0:
                out[f"r{p}_e6"] = pd.array([], dtype="Int64")
            else:
                out[f"r{p}_e6"] = e6(tree_reduce(a * planes[p]))
        return pd.DataFrame(out)

    return project
