"""Distributed BPE merge training (the missing half of the tokenizer
surface — plans/textops.py stops at pre-tokenization + top-k vocab).

Reference scope note: the reference engine has no tokenizer-training
analog; this is part of the training-data-pipeline extension mandate
(BASELINE.json), so the design target is the published BPE algorithm
(Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare
Words with Subword Units") and the architecture every production
trainer (SentencePiece, HF tokenizers) uses: train on the DISTINCT
word-frequency table, not the corpus.

Spark-first shape:

* ONE corpus-scale aggregation builds (word, freq) — explode the
  pre-token stream, map-side-combined count on a Zipf key. Everything
  after is vocab-bounded (|V| ≈ 10⁶–10⁷ at 100 TB — a few hundred MB
  distributed, trivially), NOT corpus-bounded: a 100 TB corpus and a
  1 GB corpus train at the same per-iteration cost.
* Each merge round: (1) per-word adjacent-pair explode → sum(freq)
  aggregate (map-side combined; overlapping pairs counted, the
  standard convention), (2) a 1-row TakeOrdered argmax to the driver —
  the deterministic convergence-scalar pattern (count DESC, pair
  lexicographic ASC tie-break, so reruns and engines agree), (3) a
  higher-order-function fold rewrites only the words that contain the
  pair (an ``array_contains`` guard skips the rest), (4)
  ``localCheckpoint`` truncates the per-iteration lineage (reliable
  ``checkpoint`` on a cluster) — without it, iteration k re-derives
  all k−1 prior merges and the loop is O(K²).
* The merge table itself is driver-sized state (K rows — like the IVF
  centroids), broadcast into encoders as literals.

Greedy left-to-right merge semantics (the fold): scanning the symbol
array once, replacing the leftmost (a, b) adjacency each time, is
exhaustive for a single pair — merging (a, b)→ab can only create
adjacencies involving ab, which is strictly longer than both a and b,
so no new (a, b) adjacency can appear behind the scan point. The same
argument orders encoding: applying learned merges strictly in rank
order is complete, because any merge consuming a rank-r product has
rank > r by construction.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Merge:
    rank: int
    left: str
    right: str
    count: int

    @property
    def merged(self) -> str:
        return self.left + self.right


def _chars(col) -> Column:
    """Symbol init: one UTF-8 character per symbol (split on the empty
    pattern, which yields the codepoint sequence in both engines)."""
    return F.split(col, "")


def word_counts(d: DataFrame, min_len: int = 1) -> DataFrame:
    """(word, freq) over the BPE pre-token stream — the ONLY
    corpus-scale pass in training. Pre-tokens keep their leading-space
    marker and case (byte-level-BPE convention: ``" the"`` and
    ``"The"`` are distinct words); pure-whitespace runs are dropped
    (they never participate in merges)."""
    from w4h_etl_container_spark.plans.textops import bpe_pretokenize

    toks = bpe_pretokenize(d).select(F.explode("pretokens").alias("word"))
    return (
        toks.where(~F.col("word").rlike(r"^\s+$"))
        .where(F.length("word") >= min_len)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _adjacent_pairs(syms: Column) -> Column:
    """array<struct<a,b>> of adjacent symbol pairs (overlaps included)."""
    return F.arrays_zip(
        F.slice(syms, 1, F.greatest(F.size(syms) - 1, F.lit(0))).alias("a"),
        F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))).alias("b"),
    )


def merge_pair_expr(syms: Column, a: str, b: str, guard: bool = True) -> Column:
    """One greedy left-to-right merge pass of (a, b) → a+b as a fold.

    ``guard=True`` skips the fold for words not containing both symbols
    (the common case — one pair touches few words) at the price of
    referencing ``syms`` five times in the output expression. That is
    right for training, where the expression is applied ONCE to a
    checkpointed column — but chaining K guarded merges (encoding)
    would grow the expression tree as 5^K (measured: OOMs the driver
    at K=10). Chained callers pass ``guard=False``: the fold
    references its input exactly once, so K merges build an O(K)
    tree."""
    merged = a + b
    fold = F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )
    if not guard:
        return fold
    touched = F.array_contains(syms, a) & F.array_contains(syms, b)
    return F.when(touched, fold).otherwise(syms)


def bpe_train(
    words: DataFrame,
    n_merges: int,
    min_count: int = 2,
    end_marker: str | None = None,
) -> list[Merge]:
    """Learn up to ``n_merges`` BPE merges from a (word, freq) table.

    ``end_marker`` appends a word-boundary symbol before training (the
    Sennrich 2016 ``</w>`` convention); ``None`` is the byte-level /
    GPT-2 convention where the leading space IS the boundary. Stops
    early when the best pair's frequency falls below ``min_count``
    (merging hapax adjacencies memorizes the corpus).

    Determinism: argmax tie-break is (count DESC, a ASC, b ASC) — on
    the Sennrich worked example this reproduces the paper's merge
    sequence (pinned in tests against an independent reference
    implementation)."""
    syms_col = _chars(F.col("word"))
    if end_marker is not None:
        syms_col = F.concat(syms_col, F.array(F.lit(end_marker)))
    syms = words.select(
        F.col("freq").cast("long").alias("freq"), syms_col.alias("syms")
    ).localCheckpoint()

    merges: list[Merge] = []
    for rank in range(n_merges):
        top = (
            syms.select("freq", F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_count:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append(Merge(rank=rank, left=a, right=b, count=cnt))
        prev = syms
        syms = syms.select(
            "freq", merge_pair_expr(F.col("syms"), a, b).alias("syms")
        ).localCheckpoint()
        prev.unpersist()
    return merges


def merges_df(spark: SparkSession, merges: list[Merge]) -> DataFrame:
    """The merge table as a DataFrame (rank, left, right, merged, cnt) —
    the declared-query rendering of the trained state."""
    rows = [(m.rank, m.left, m.right, m.merged, m.count) for m in merges]
    return spark.createDataFrame(
        rows, "rank long, left string, right string, merged string, cnt long"
    )


def bpe_encode(d: DataFrame, merges: list[Merge], text_col: str = "text") -> DataFrame:
    """Tokenize documents with a learned merge list, native-HOF path:
    pre-tokenize → chars → apply each merge in rank order (complete, by
    the rank-ordering argument in the module docstring). Expression
    depth grows with K — fine for the K ≤ ~64 this oracle-able path is
    for; larger vocabularies belong on ``bpe_encode_fast`` (same
    output, Arrow-batched)."""
    from w4h_etl_container_spark.plans.textops import _BPE_PAT

    toks = F.regexp_extract_all(
        F.coalesce(F.col(text_col), F.lit("")), F.lit(_BPE_PAT), 0
    )
    enc = F.transform(toks, lambda w: _apply_merges(_chars(w), merges))
    out = d.select(
        "doc_id",
        F.flatten(enc).alias("tokens"),
    )
    return out.withColumn("n_tokens", F.size("tokens").cast("long"))


def _apply_merges(syms: Column, merges: list[Merge]) -> Column:
    for m in merges:
        syms = merge_pair_expr(syms, m.left, m.right, guard=False)
    return syms


def bpe_encode_fast(
    d: DataFrame, merges: list[Merge], text_col: str = "text"
) -> DataFrame:
    """Arrow-batched encoder twin: the merge-rank dict rides the closure
    (driver-sized, like a broadcast), each batch tokenizes in Python —
    the shape a production encoder with a 50k-merge table needs, since
    a 50k-deep HOF chain is not a reasonable expression tree. Exact
    output parity with ``bpe_encode`` is pinned in tests."""
    import re

    import pandas as pd

    from w4h_etl_container_spark.plans.textops import _BPE_PAT

    ranks = {(m.left, m.right): m.rank for m in merges}
    pat = re.compile(_BPE_PAT)

    def encode_word(w: str) -> list[str]:
        syms = list(w)
        while len(syms) > 1:
            best = None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best[0]):
                    best = (r, syms[i], syms[i + 1])
            if best is None:
                break
            _, a, b = best
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    def batch(it):
        for pdf in it:
            toks = pdf[text_col].map(
                lambda t: [
                    s for w in pat.findall(t or "") for s in encode_word(w)
                ]
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "tokens": toks,
                    "n_tokens": toks.map(len).astype("int64"),
                }
            )

    # Derive doc_id's type from the input so a string/int32 corpus key
    # works identically to the native bpe_encode twin (ADVICE r8).
    id_type = d.schema["doc_id"].dataType.simpleString()
    return d.select("doc_id", text_col).mapInPandas(
        batch, f"doc_id {id_type}, tokens array<string>, n_tokens long"
    )
