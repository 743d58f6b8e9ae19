"""Deterministic hash-based sampling (SURVEY.md §2.11 — training-data
pipeline surface).

``df.sample()`` draws from a per-partition RNG: the result changes with
partitioning, task retries, and Spark version — unacceptable when a
training corpus must be re-derivable bit-for-bit from its recipe. The
pipeline answer is THRESHOLD sampling on a keyed hash: a row is in the
sample iff ``hash(salt, key) mod M < rate·M``. Properties that matter at
100 TB:

* **Deterministic & partition-invariant** — membership depends only on
  (salt, key), never on physical layout, executor count, or retries;
  the sample is reproducible on any cluster from the recipe alone.
* **Nested** — for the same salt, sample(10%) ⊆ sample(20%): growing a
  corpus never discards previously selected rows (stable train subsets
  as budgets grow).
* **Embarrassingly parallel** — a per-row filter, pushed into the scan;
  zero shuffles, no RNG state, no driver coordination.
* **Stratified for free** — a per-stratum rate is just a different
  threshold on the same hash (map lookup, still one scan).

Hash renderings mirror the dedup family: md5-slice (bit-identical in
Spark and DuckDB → the pytest twin checks EXACT membership, not a
statistical bound) and a seeded-xxhash64 production twin pinned by
structure parity (identical selection logic, JVM-native hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Threshold denominator: hash buckets in [0, M). 2^24 keeps the whole
# md5-slice arithmetic exact in 32-bit lanes and gives rate resolution
# of ~6e-8 — finer than any corpus recipe specifies.
_M = 1 << 24


def _bucket(key: Column, salt: str) -> Column:
    """Uniform bucket in [0, 2^24) from the first 6 hex digits of
    md5(salt || key) — engine-neutral (DuckDB twin does the same nibble
    arithmetic), uniform because md5 is."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 6), 16, 10
    ).cast("long")


def deterministic_sample(
    df: DataFrame, rate: float, key: str, salt: str = "s0"
) -> DataFrame:
    """Keep rows whose hash bucket falls under ``rate``. Membership is a
    pure function of (salt, row key): reproducible across clusters,
    partitionings, and retries, and nested across rates (see module
    docstring). One codegen'd filter — the scan is the whole cost."""
    return df.where(_bucket(F.col(key), salt) < int(rate * _M))


def stratified_sample(
    df: DataFrame, rates: dict[str, float], stratum: str, key: str, salt: str = "s0"
) -> DataFrame:
    """Per-stratum threshold sampling in ONE scan: the stratum column
    selects its rate via a literal CASE map (absent strata keep nothing);
    the same hash bucket is compared against the selected threshold.
    Rebalancing a skewed corpus (e.g. downsample boilerplate-heavy
    domains) without a groupBy: still a pure filter, zero shuffles."""
    thr = F.lit(-1)
    for s, r in rates.items():
        thr = F.when(F.col(stratum) == s, F.lit(int(r * _M))).otherwise(thr)
    return df.where(_bucket(F.col(key), salt) < thr)


def deterministic_sample_fast(
    df: DataFrame, rate: float, key: str, salt_seed: int = 0
) -> DataFrame:
    """Production rendering: seeded xxhash64 instead of md5 (one JVM
    hash instruction vs a digest + string slice — the same swap as
    ``dedup_exact_fast``). ``pmod`` maps the signed 64-bit hash onto the
    same [0, 2^24) bucket space; selection logic is otherwise identical,
    pinned by structure parity in tests (xxhash64 has no engine-neutral
    DuckDB twin)."""
    bucket = F.pmod(F.xxhash64(F.lit(salt_seed), F.col(key)), F.lit(_M))
    return df.where(bucket < int(rate * _M))


def deterministic_topk_per_group(
    df: DataFrame, k: int, group: str, key: str, salt: str = "s0"
) -> DataFrame:
    """Exactly min(k, |group|) rows per group, chosen by hash order —
    the EXACT-size companion to ``stratified_sample``'s rate-based
    thresholds (eval-set construction wants "2 000 docs per language",
    not "~0.1%"). Selection order is (hash bucket, key): deterministic,
    partition-invariant, and unbiased w.r.t. any data column.

    Shape: one window sort per group (row_number ≤ k). The one-pass
    form here is the correct plan wherever a group fits a task's sort
    buffer; ``deterministic_topk_per_group_refined`` is the same
    selection with the sort bounded for huge groups."""
    w = Window.partitionBy(group).orderBy(_bucket(F.col(key), salt), key)
    return (
        df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k).drop("_rn")
    )


def deterministic_topk_per_group_refined(
    df: DataFrame,
    k: int,
    group: str,
    key: str,
    salt: str = "s0",
    oversample: float = 4.0,
) -> DataFrame:
    """Two-pass rendering of ``deterministic_topk_per_group`` — identical
    rows, but the window sort never sees a full group, so it stays
    correct-and-fast when one group holds billions of rows.

    Pass 1 counts each group (map-side partial agg — tiny output) and
    derives a per-group bucket threshold ``thr = M·oversample·k / n``:
    buckets are uniform on [0, M), so ~``oversample·k`` rows of an
    n-row group land under it. Pass 2 filters to those candidates (the
    threshold table is broadcast — the corpus scan never shuffles) and
    window-sorts only them: per group the exchange + sort handle ~4k
    rows instead of n.

    Exactness is audited, not assumed: rows are ordered by (bucket,
    key) and every non-candidate's bucket exceeds every candidate's, so
    a group's candidate set provably contains its min(k, n) winners iff
    it has ≥ min(k, n) members. Groups failing the audit — binomially
    unlikely at oversample 4, but possible — fall back to their full
    row set for the sort. Both audit tables are per-group aggregates:
    broadcast-size at any corpus scale."""
    bucket = _bucket(F.col(key), salt)
    counts = df.groupBy(group).agg(F.count(F.lit(1)).alias("_n"))
    thresholds = counts.select(
        group,
        "_n",
        F.least(
            F.lit(_M).cast("long"),
            F.ceil(F.lit(float(_M) * oversample * k) / F.col("_n")).cast("long"),
        ).alias("_thr"),
    )
    cand = df.join(F.broadcast(thresholds), group).where(bucket < F.col("_thr"))
    # Audit drives from the FULL group table (left join): a group whose
    # candidate set is empty is the failure mode most in need of rescue
    # and would be invisible to an aggregate over candidates alone.
    cand_counts = cand.groupBy(group).agg(F.count(F.lit(1)).alias("_c"))
    short = (
        thresholds.select(group, "_n")
        .join(cand_counts, group, "left")
        .where(
            F.coalesce(F.col("_c"), F.lit(0)) < F.least(F.lit(k).cast("long"), F.col("_n"))
        )
        .select(group)
    )
    pool = (
        cand.join(F.broadcast(short), group, "left_anti")
        .select(*df.columns)
        .unionByName(df.join(F.broadcast(short), group, "left_semi"))
    )
    w = Window.partitionBy(group).orderBy(_bucket(F.col(key), salt), key)
    return (
        pool.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k).drop("_rn")
    )


def token_budget_sample(
    df: DataFrame,
    budgets: dict[str, int],
    stratum: str,
    key: str,
    weight: str,
    salt: str = "s0",
) -> DataFrame:
    """Fill a per-stratum TOKEN budget (not a row count): keep documents
    in deterministic hash order until the stratum's cumulative weight
    (token count) reaches its budget — the domain-mixing primitive a
    training-data pipeline runs last ("2B tokens of code, 500M of
    forums"), where documents have wildly different lengths and a row
    quota would miss the actual knob.

    A document is kept iff it STARTS inside the budget (cumulative
    weight of hash-order predecessors < budget), so each stratum
    overshoots by at most one document — deterministic, and every
    selection property of the hash-order family holds: membership
    depends only on (salt, key, budgets), growing a budget only ADDS
    documents (the hash order is fixed — the nesting property in the
    budget dimension), and absent strata keep nothing.

    Shape: one window sum per stratum in hash order — one shuffle on
    the stratum key. A stratum far larger than its budget admits the
    same two-pass refinement as ``deterministic_topk_per_group_refined``
    (threshold on the bucket at ~budget/avg_weight · oversample, then
    window only the candidates); one-pass is the correct plan while a
    stratum fits a task's sort buffer."""
    thr = F.lit(None).cast("long")
    for s, b in budgets.items():
        thr = F.when(F.col(stratum) == s, F.lit(int(b))).otherwise(thr)
    w = (
        Window.partitionBy(stratum)
        .orderBy(_bucket(F.col(key), salt), key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(F.col(weight)).over(w), F.lit(0))
    return (
        df.withColumn("_before", before)
        .where(F.col("_before") < thr)
        .drop("_before")
    )


# 60-bit hash domain for the A-ES priority draw (15 md5 nibbles), the
# same domain the KMV sketch uses; (h+1)/2^60 ∈ (0, 1] so ln never
# sees zero.
_DOM60 = float(1 << 60)


def weighted_priority_sample(
    df: DataFrame,
    k: int,
    group: str,
    key: str,
    weight: str,
    salt: str = "w0",
    fanout: int = 64,
) -> DataFrame:
    """Efraimidis–Spirakis (A-ES) weighted sampling WITHOUT replacement:
    per group, the k rows with the largest priority ``u^(1/w)`` — drawn
    deterministically (u from md5(salt:key), so the \"randomness\" is
    reproducible and engine-neutral) — are selected with probability
    proportional to ``weight``, exactly (Efraimidis & Spirakis 2006).
    The hash-ordered samplers above are the uniform special case; this
    is the one a curation pipeline uses to sample documents
    proportional to length/quality score.

    Ranking happens in log space (``ln(u)/w`` is monotone in
    ``u^(1/w)`` for w > 0). The one transcendental, ``ln(u)``, is
    rounded ONCE per distinct key to an e6 integer ``L`` — the same
    per-distinct-value rounding contract BM25 and the unigram LM use —
    and the per-row priority is then EXACT integer arithmetic:
    ``-((-L) * 1e9 div w)`` (positive operands, so truncating and
    flooring division agree across engines). Rounding a per-row
    ``ln(u)/w`` directly would put the boundary on a value of
    magnitude up to ~4e10, where a 1-ulp JVM-vs-libm divergence is
    ~1e-5 of a grid unit per row and flips a rank with probability
    growing in corpus size (ADVICE r9); with the boundary on ``ln(u)``
    alone (|ln(u)| ≤ 41.6 ⇒ divergence ≤ ~1e-8 grid units at e6) the
    fixture's measured minimum margin is >6e-5 — a >10³× safety
    factor, pinned by TestWeightedPrioritySample's margin test. Ties
    on the priority break on ``key``. Rows with weight ≤ 0 (or NULL)
    have zero inclusion probability and are dropped up front.

    Weight typing (ADVICE r10): an INTEGRAL weight column divides the
    e9-scaled numerator directly (full resolution — the token/char
    counts every current caller passes). A FRACTIONAL weight column is
    pre-scaled to the e6 integer grid (``round(w·1e6)`` as divisor,
    e11-scaled numerator so int64 never overflows: |L|·1e11 ≤ 4.2e18),
    so quality scores in (0, 1) keep their proportional inclusion
    instead of truncating to a zero divisor; weights < 5e-7 round to
    grid zero and are dropped with the ≤ 0 rows.

    Scale shape — two-level top-k, no full-group sort: rows first rank
    inside (group, h mod ``fanout``) partitions, so each window task
    sorts ~1/fanout of a group and keeps ≤ k; the global rank then
    sorts only ≤ fanout·k survivors per group. The union of per-salt
    top-ks provably contains the group top-k (any global winner is a
    winner within its own salt bucket), so the two-level result is
    EXACTLY the one-pass result — the identity the oracle pins."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), F.col(key).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    u = (h.cast("double") + F.lit(1.0)) / F.lit(_DOM60)
    # L = round(ln(u)·1e6): the only transcendental rounding, on a value
    # of bounded magnitude (|L| < 4.2e7, so (-L)·1e9 < 4.2e16 ≪ int64)
    lq = F.floor(F.log(u) * F.lit(1e6) + F.lit(0.5)).cast("long")
    integral = dict(df.dtypes).get(weight) in (
        "tinyint", "smallint", "int", "bigint",
    )
    if integral:
        prio = -F.expr(f"((-_lq) * 1000000000L) div CAST(`{weight}` AS BIGINT)")
        kept = df.where(F.col(weight) > 0)
    else:
        prio = -F.expr(
            f"((-_lq) * 100000000000L) div CAST(round(`{weight}` * 1000000) AS BIGINT)"
        )
        kept = df.where(F.expr(f"round(`{weight}` * 1000000)") > 0)
    keyed = (
        kept.withColumn("_lq", lq)
        .withColumn("_prio", prio)
        .drop("_lq")
        .withColumn("_salt", F.pmod(h, F.lit(fanout)))
    )
    local = Window.partitionBy(group, "_salt").orderBy(
        F.col("_prio").desc(), key
    )
    survivors = (
        keyed.withColumn("_lrn", F.row_number().over(local))
        .where(F.col("_lrn") <= k)
        .drop("_lrn", "_salt")
    )
    final = Window.partitionBy(group).orderBy(F.col("_prio").desc(), key)
    return (
        survivors.withColumn("rank", F.row_number().over(final))
        .where(F.col("rank") <= k)
        .drop("_prio")
    )


def token_budget_sample_dynamic(
    df: DataFrame,
    budgets: DataFrame,
    stratum: str,
    key: str,
    weight: str,
    salt: str = "s0",
) -> DataFrame:
    """``token_budget_sample`` with budgets as DATA instead of a
    literal dict — the composition point for computed mixing weights
    (q_source_mix's basis points → per-stratum token budgets). The
    budgets table is stratum-dimensional (broadcast); everything else
    is the same one-window-per-stratum plan, and the same
    keep-iff-starts-inside-budget rule with its ≤1-document overshoot
    and budget-nesting properties. Strata absent from ``budgets``
    keep nothing (inner join semantics — the dict form's NULL
    threshold behaves identically)."""
    w = (
        Window.partitionBy(stratum)
        .orderBy(_bucket(F.col(key), salt), key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(F.col(weight)).over(w), F.lit(0))
    return (
        df.withColumn("_before", before)
        .join(F.broadcast(budgets), stratum)
        .where(F.col("_before") < F.col("budget"))
        .drop("_before", "budget")
    )
