"""Fuzzy equi-join on string keys — entity resolution's core move
(SURVEY §2.11 extension surface: joining crawled/user-entered records
whose keys differ by a typo).

A naive fuzzy join is the cross product with a levenshtein filter —
O(n·m) and a cluster-killer. The SymSpell/FastSS rendering the engine's
q_typo_pairs already uses generalizes to two tables: two strings are
within edit distance 1 IFF they share a member of each other's
1-deletion neighborhood (the string itself + every single-character
deletion), so the candidate set is an EQUI-join on deletion variants —
hash-joinable, pushdown-friendly, linear in (Σ key length) — and exact
``levenshtein`` runs on candidates only. Distance d > 1 composes the
same way with d-deletion neighborhoods (variant count grows
len^d / d!, the documented trade).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _variants(col: str) -> F.Column:
    """The 1-deletion neighborhood of ``col`` as an array (the string
    itself first; duplicates collapsed — a double letter's deletions
    coincide)."""
    return F.expr(
        f"array_union(array({col}), "
        f"transform(sequence(1, length({col})), "
        f"i -> concat(substr({col}, 1, i - 1), substr({col}, i + 1))))"
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    max_dist: int = 1,
) -> DataFrame:
    """Inner join of ``left`` and ``right`` on keys within levenshtein
    distance ``max_dist`` (currently 1 — the deletion-neighborhood
    completeness proof is for d = 1; see module docstring for the d > 1
    generalization). Output: every column of both sides plus ``dist``.

    Plan shape: each side explodes its keys into deletion variants
    (one HOF projection — rows multiply by ~mean key length), the
    variant equi-join produces candidates (hash join, co-partitioned
    on the variant), DISTINCT key pairs collapse the multi-variant
    matches, and native ``levenshtein`` verifies candidates only —
    never the cross product. Exactly-once per matching row pair
    regardless of how many variants collided. NULL keys never match
    (equi-join semantics).

    At scale: the variant join's fan-out is bounded by key length, and
    a hot variant (many strings sharing a deletion) is an ordinary
    skewed equi-key — AQE skew-split or the salted-join pattern apply
    unchanged, which is the entire point of rendering fuzziness as an
    equi-join."""
    if max_dist != 1:
        raise ValueError(
            "fuzzy_join: only max_dist=1 is implemented (deletion-"
            "neighborhood completeness is proven for d=1)"
        )
    lv = left.select(
        F.col(left_key).alias("_lk"), F.explode(_variants(left_key)).alias("_v")
    ).distinct()
    rv = right.select(
        F.col(right_key).alias("_rk"), F.explode(_variants(right_key)).alias("_v")
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
