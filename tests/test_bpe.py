"""BPE merge training (operators/bpe.py): merge-sequence parity against
an independent pure-Python reference of the published algorithm
(Sennrich, Haddow & Birch 2016), including the paper's worked example;
encoder parity (native-HOF vs Arrow-batched vs reference); and the
structural invariants a trainable tokenizer must satisfy."""

from __future__ import annotations

import re
from collections import Counter

import pytest

from w4h_etl_container_spark.operators.bpe import (
    Merge,
    bpe_encode,
    bpe_encode_fast,
    bpe_train,
    merges_df,
    word_counts,
)


# --- independent reference implementation (dict-based, no Spark) -----------
def ref_train(word_freqs: dict[str, int], n_merges: int, min_count: int = 2,
              end_marker: str | None = None) -> list[tuple[str, str, int]]:
    vocab = {}
    for w, f in word_freqs.items():
        syms = tuple(list(w) + ([end_marker] if end_marker else []))
        vocab[syms] = vocab.get(syms, 0) + f
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        # (count DESC, pair ASC) — the operator's deterministic tie-break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        merges.append((a, b, cnt))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    return merges


def ref_encode(word: str, merges: list[tuple[str, str, int]]) -> list[str]:
    syms = list(word)
    for a, b, _ in merges:
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


def _wc_df(spark, freqs: dict[str, int]):
    return spark.createDataFrame(list(freqs.items()), "word string, freq long")


def _as_tuples(merges: list[Merge]) -> list[tuple[str, str, int]]:
    return [(m.left, m.right, m.count) for m in merges]


class TestBpeTrain:
    def test_sennrich_worked_example(self, spark):
        """The BPE paper's worked example: {'low':5, 'lower':2,
        'newest':6, 'widest':3} with </w> markers. Under (count DESC,
        pair ASC) the first merges are (e,s) → (es,t) → (est,</w>),
        matching the published sequence (the paper's own ties resolve
        the same way)."""
        freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
        got = bpe_train(_wc_df(spark, freqs), 6, min_count=2, end_marker="</w>")
        assert [(m.left, m.right) for m in got[:3]] == [
            ("e", "s"),
            ("es", "t"),
            ("est", "</w>"),
        ]
        assert got[0].count == 9  # newest(6) + widest(3)
        assert _as_tuples(got) == ref_train(freqs, 6, 2, end_marker="</w>")

    def test_crafted_corpora_parity(self, spark):
        corpora = [
            {"aaa": 4, "aab": 3, "ba": 2},
            {" the": 10, " then": 4, "the": 2, " them": 1},
            {"ab": 5, "abab": 5, "ababab": 5},
            {"x": 9, "y": 9},  # nothing mergeable
            {"répété": 3, "été": 5, "tété": 2},  # multi-byte chars
            {"中文文本": 4, "文本处理": 3, " 中文": 2},  # CJK + space marker
            {" the": 7, "the,": 3, "?!": 5, " x": 2},  # punct + nbsp
        ]
        for freqs in corpora:
            got = _as_tuples(bpe_train(_wc_df(spark, freqs), 8))
            assert got == ref_train(freqs, 8), freqs

    def test_random_corpora_parity(self, spark):
        """Property: on randomized corpora the distributed trainer and
        the reference dict trainer emit identical merge sequences.
        Drawn per-batch (one Spark round-trip per example keeps the
        property affordable — the TestCurationProperties pattern)."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        words = st.text(alphabet="abcá 字", min_size=1, max_size=7).map(
            lambda s: s.strip() or "a"
        )
        corpus = st.dictionaries(words, st.integers(1, 9), min_size=1, max_size=12)

        @given(corpus)
        @settings(max_examples=8, deadline=None)
        def check(freqs):
            got = _as_tuples(bpe_train(_wc_df(spark, freqs), 6))
            assert got == ref_train(freqs, 6), freqs

        check()

    def test_min_count_stops_early(self, spark):
        freqs = {"ab": 1, "cd": 1}  # every pair is a hapax
        assert bpe_train(_wc_df(spark, freqs), 5, min_count=2) == []

    def test_overlapping_pairs_counted(self, spark):
        # "aaaa" ×1: (a,a) appears 3 times (overlaps included — the
        # standard counting convention)
        got = bpe_train(_wc_df(spark, {"aaaa": 1}), 1, min_count=3)
        assert got and got[0].count == 3

    def test_fixture_corpus_parity(self, spark, sf_dir):
        """End-to-end on the driver fixture: Spark's distributed trainer
        and the reference dict trainer see the identical (word, freq)
        table and must emit the identical merge sequence."""
        from w4h_etl_container_spark.session import read_table

        wc = word_counts(read_table(spark, sf_dir, "documents"))
        freqs = {r["word"]: r["freq"] for r in wc.collect()}
        got = _as_tuples(bpe_train(wc, 25))
        assert got == ref_train(freqs, 25)
        assert len(got) == 25  # the fixture corpus sustains 25 real merges

    def test_merges_df_schema(self, spark):
        df = merges_df(spark, [Merge(0, " t", "h", 7)])
        assert df.columns == ["rank", "left", "right", "merged", "cnt"]
        row = df.collect()[0]
        assert row["merged"] == " th" and row["cnt"] == 7


class TestBpeEncode:
    FREQS = {" the": 8, " then": 3, " there": 2, "the": 2, " т": 1}
    DOCS = [
        (1, "the then there"),
        (2, "then the"),
        (3, ""),
        (4, None),
    ]

    def _merges(self, spark):
        return bpe_train(_wc_df(spark, self.FREQS), 6, min_count=2)

    def test_native_matches_reference(self, spark):
        merges = self._merges(spark)
        d = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        got = {r["doc_id"]: r["tokens"] for r in bpe_encode(d, merges).collect()}
        pat = re.compile(
            r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
        )
        mt = _as_tuples(merges)
        for doc_id, text in self.DOCS:
            expect = [
                s for w in pat.findall(text or "") for s in ref_encode(w, mt)
            ]
            assert got[doc_id] == expect, (doc_id, text)

    def test_fast_twin_exact_parity(self, spark):
        merges = self._merges(spark)
        d = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        slow = {r["doc_id"]: r["tokens"] for r in bpe_encode(d, merges).collect()}
        fast = {
            r["doc_id"]: r["tokens"] for r in bpe_encode_fast(d, merges).collect()
        }
        assert slow == fast

    def test_fast_twin_non_long_doc_id(self, spark):
        # the mapInPandas schema derives doc_id's type from the input
        # (ADVICE r8: a string-keyed corpus must not crash the fast path)
        merges = self._merges(spark)
        d = spark.createDataFrame(
            [(str(i), t) for i, t in self.DOCS], "doc_id string, text string"
        )
        slow = {r["doc_id"]: r["tokens"] for r in bpe_encode(d, merges).collect()}
        fast = {
            r["doc_id"]: r["tokens"] for r in bpe_encode_fast(d, merges).collect()
        }
        assert slow == fast
        assert dict(bpe_encode_fast(d, merges).dtypes)["doc_id"] == "string"

    def test_roundtrip_concat_identity(self, spark):
        # tokens concatenate back to the original text (byte-level BPE
        # invariant: merges never drop or reorder characters)
        merges = self._merges(spark)
        d = spark.createDataFrame(self.DOCS[:2], "doc_id long, text string")
        for r in bpe_encode(d, merges).collect():
            original = dict(self.DOCS)[r["doc_id"]]
            assert "".join(r["tokens"]) == original

    def test_token_count_never_exceeds_chars(self, spark, sf_dir):
        from w4h_etl_container_spark.session import read_table
        from pyspark.sql import functions as F

        d = read_table(spark, sf_dir, "documents").limit(50)
        merges = bpe_train(word_counts(d), 10)
        enc = bpe_encode(d, merges)
        bad = enc.join(d, "doc_id").where(
            F.col("n_tokens") > F.length(F.coalesce("text", F.lit("")))
        )
        assert bad.count() == 0


class TestBpeQuery:
    def test_declared_query_runs(self, spark, sf_dir):
        from w4h_etl_container_spark.plans.registry import load_library

        df = load_library()["q_bpe_merges"].fn(spark, sf_dir)
        rows = df.collect()
        assert len(rows) == 40
        assert [r["rank"] for r in rows] == list(range(40))
        # counts are non-increasing only per-pair availability — but the
        # merged string is always left+right and counts are >= min_count
        assert all(r["merged"] == r["left"] + r["right"] for r in rows)
        assert all(r["cnt"] >= 2 for r in rows)
