"""Fuzzy equi-join on string keys — entity resolution's core move
(SURVEY §2.11 extension surface: joining crawled/user-entered records
whose keys differ by a typo).

A naive fuzzy join is the cross product with a levenshtein filter —
O(n·m) and a cluster-killer. The SymSpell/FastSS rendering the engine's
q_typo_pairs already uses generalizes to two tables: two strings are
within edit distance d IFF they share a member of each other's
≤d-deletion neighborhood (delete up to d characters; any edit script of
cost ≤ d normalizes to deletions — a substitution deletes the differing
character on BOTH sides, an insertion deletes it on the longer side —
so a common subsequence reachable by ≤ d deletions per side exists
exactly when distance ≤ d). The candidate set is therefore an
EQUI-join on deletion variants — hash-joinable, pushdown-friendly,
linear in Σ(variant count) — and exact ``levenshtein`` runs on
candidates only.

Implemented depths: d = 1 (1 + L variants per key) and d = 2
(1 + L + L·(L−1)/2 variants — the SymSpell order-2 extension; ~200
variants for a 20-char key, the documented quadratic-in-key-length
trade that buys the next distance tier while staying an equi-join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _variants(col: str, max_dist: int) -> F.Column:
    """The ≤``max_dist``-deletion neighborhood of ``col`` as an array
    (the string itself first; duplicates collapsed — a double letter's
    deletions coincide). Order-1 deletes each position; order-2 deletes
    each position pair i < j (one HOF expression, no UDF)."""
    d1 = (
        f"transform(sequence(1, length({col})), "
        f"i -> concat(substr({col}, 1, i - 1), substr({col}, i + 1)))"
    )
    out = f"array_union(array({col}), {d1})"
    if max_dist >= 2:
        d2 = (
            f"case when length({col}) >= 2 then "
            f"flatten(transform(sequence(1, length({col}) - 1), "
            f"i -> transform(sequence(i + 1, length({col})), "
            f"j -> concat(substr({col}, 1, i - 1), "
            f"substr({col}, i + 1, j - i - 1), substr({col}, j + 1))))) "
            f"else array({col}) end"
        )
        out = f"array_union({out}, {d2})"
    return F.expr(out)


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    max_dist: int = 1,
) -> DataFrame:
    """Inner join of ``left`` and ``right`` on keys within levenshtein
    distance ``max_dist`` (1 or 2 — each depth uses its own deletion-
    neighborhood completeness argument; see module docstring). Output:
    every column of both sides plus ``dist``.

    Plan shape: each side explodes its keys into deletion variants
    (one HOF projection — rows multiply by ~L for d=1, ~L²/2 for d=2),
    the variant equi-join produces candidates (hash join,
    co-partitioned on the variant), DISTINCT key pairs collapse the
    multi-variant matches, and native ``levenshtein`` verifies
    candidates only — never the cross product. Exactly-once per
    matching row pair regardless of how many variants collided. NULL
    keys never match (equi-join semantics).

    At scale: the variant join's fan-out is bounded by key length
    (quadratically at d=2 — size the shuffle for it), and a hot
    variant (many strings sharing a deletion) is an ordinary skewed
    equi-key — AQE skew-split or the salted-join pattern apply
    unchanged, which is the entire point of rendering fuzziness as an
    equi-join."""
    if max_dist not in (1, 2):
        raise ValueError(
            "fuzzy_join: max_dist must be 1 or 2 (deletion-neighborhood "
            "completeness is implemented for d ≤ 2; higher distances "
            "explode variant counts combinatorially)"
        )
    lv = left.select(
        F.col(left_key).alias("_lk"),
        F.explode(_variants(left_key, max_dist)).alias("_v"),
    ).distinct()
    rv = right.select(
        F.col(right_key).alias("_rk"),
        F.explode(_variants(right_key, max_dist)).alias("_v"),
    ).distinct()
    cand = (
        lv.join(rv, "_v")
        .select("_lk", "_rk")
        .distinct()
        .withColumn("dist", F.levenshtein("_lk", "_rk").cast("long"))
        .where(F.col("dist") <= max_dist)
    )
    return (
        left.join(cand, left[left_key] == cand["_lk"])
        .join(right, cand["_rk"] == right[right_key])
        .drop("_lk", "_rk")
    )
