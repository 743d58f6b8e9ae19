"""Curation-operator tests (plans/curation.py): crafted-input behavior,
DuckDB parity on the crafted rows (the driver fixture exercises the
no-PII / low-dup path; these pin the non-trivial paths), and the plan
shapes the 100 TB story depends on."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pyspark.sql import functions as F

from w4h_etl_container_spark.plans.curation import (
    _SPAN_W,
    _pii_sql,
    _repetition_sql,
    _span_sql,
    pii_scrub,
    repetition_signals,
    span_dedup,
    span_spans,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _duck(rows, sql):
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    return con.execute(sql).fetchdf()


def _parity(spark_df, duck_df):
    cols = sorted(spark_df.columns)
    s = spark_df.toPandas()[cols].sort_values(cols).reset_index(drop=True)
    d = duck_df[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(s, d, check_dtype=False)


SPAN = " ".join(f"w{i}" for i in range(_SPAN_W))  # one exact 10-word span
FILLER_A = " ".join(f"a{i}" for i in range(_SPAN_W))
FILLER_B = " ".join(f"b{i}" for i in range(_SPAN_W))


class TestSpanDedup:
    def test_first_occurrence_wins_and_rebuild(self, spark):
        rows = [
            (1, f"{FILLER_A} {SPAN}"),  # first occurrence of SPAN (pos 1)
            (2, f"{SPAN} {FILLER_B}"),  # duplicate at pos 0 → cut
            (3, FILLER_B),  # no duplicated span, but FILLER_B dups doc 2's
        ]
        out = {r["doc_id"]: r for r in span_dedup(_docs(spark, rows)).collect()}
        assert out[1]["n_removed"] == 0
        assert out[1]["clean_text"] == f"{FILLER_A} {SPAN}"
        assert out[2]["n_removed"] == 1
        assert out[2]["clean_text"] == FILLER_B  # SPAN cut, filler kept
        # FILLER_B first occurred in doc 2 (doc_id order) → doc 3 loses it
        assert out[3]["n_removed"] == 1
        assert out[3]["clean_text"] == ""  # fully-removed doc still present

    def test_intra_document_duplicates_cut(self, spark):
        rows = [(7, f"{SPAN} {SPAN} {SPAN}")]
        row = span_dedup(_docs(spark, rows)).collect()[0]
        assert row["n_spans"] == 3
        assert row["n_removed"] == 2
        assert row["clean_text"] == SPAN

    def test_no_dup_rebuild_is_normalization_identity(self, spark):
        text = "  one   two three " + " ".join(f"x{i}" for i in range(25))
        row = span_dedup(_docs(spark, [(9, text)])).collect()[0]
        assert row["clean_text"] == " ".join(text.split())
        assert row["n_removed"] == 0

    def test_crafted_duckdb_parity(self, spark):
        rows = [
            (1, f"{FILLER_A} {SPAN}"),
            (2, f"{SPAN} {FILLER_B}"),
            (3, FILLER_B),
            (4, f"{SPAN} {SPAN} short tail words"),
            (5, "tiny"),
        ]
        _parity(span_dedup(_docs(spark, rows)), _duck(rows, _span_sql()))

    def test_dedup_exchange_ships_keys_not_text(self, spark, sf_dir):
        from w4h_etl_container_spark.session import read_table
        from tests.test_plans import optimized_of

        plan = optimized_of(span_dedup(read_table(spark, sf_dir, "documents")))
        # the row_number window runs over the keyed projection: its
        # sort/partition expressions are k1/k2, never the span text
        assert "windowspecdefinition(k1" in plan


class TestRepetitionSignals:
    def test_known_values_degenerate_doc(self, spark):
        # "a b a b a b": 2-grams = [ab, ba, ab, ba, ab] → top count 3
        # 5-grams = [a b a b a, b a b a b] → both unique → dup5 = 0
        rows = [(1, "a b a b a b")]
        row = repetition_signals(_docs(spark, rows)).collect()[0]
        assert row["n_words"] == 6
        assert row["top2_frac"] == pytest.approx(3 * 2 / 6)
        assert row["dup5_frac"] == 0.0

    def test_duplicated_five_grams_counted(self, spark):
        body = "p q r s t"
        rows = [(2, f"{body} {body}")]  # the 5-gram "p q r s t" occurs twice
        row = repetition_signals(_docs(spark, rows)).collect()[0]
        assert row["n_words"] == 10
        # grams5 of the 10-word doc: positions 0..5; "p q r s t" at 0 and 5
        assert row["dup5_frac"] == pytest.approx(2 * 5 / 10)

    def test_short_docs_excluded(self, spark):
        rows = [(3, "one two three four")]  # 4 words < 5
        assert repetition_signals(_docs(spark, rows)).count() == 0

    def test_crafted_duckdb_parity(self, spark):
        rows = [
            (1, "a b a b a b"),
            (2, "p q r s t p q r s t"),
            (3, " ".join(f"u{i}" for i in range(30))),
        ]
        _parity(repetition_signals(_docs(spark, rows)), _duck(rows, _repetition_sql()))


PII_ROWS = [
    (1, "mail bob.smith+x@example.co.uk and alice@test.org now"),
    (2, "server at 10.0.255.3 then call 555-123-4567 or 555.123.4567"),
    (3, "ip 192.168.1.1 is not a phone 123.456.7890 but this is one"),
    (4, "clean document with no sensitive content at all"),
    (5, "digits-in-email x123@y.com then 999-888-7777"),
]


class TestPIIScrub:
    def test_redaction_and_counts(self, spark):
        out = {r["doc_id"]: r for r in pii_scrub(_docs(spark, PII_ROWS)).collect()}
        assert out[1]["n_emails"] == 2
        assert "[EMAIL]" in out[1]["clean_text"] and "@" not in out[1]["clean_text"]
        assert out[2]["n_ips"] == 1 and out[2]["n_phones"] == 2
        assert out[2]["clean_text"] == "server at [IP] then call [PHONE] or [PHONE]"
        assert out[4]["n_emails"] == out[4]["n_ips"] == out[4]["n_phones"] == 0
        assert out[4]["clean_text"] == PII_ROWS[3][1]
        assert out[5]["n_emails"] == 1 and out[5]["n_phones"] == 1

    def test_ip_claimed_before_phone(self, spark):
        # 123.456.7890 is phone-shaped; 192.168.1.1 is a dotted quad.
        # Order contract: the IP pass runs first and must not leave a
        # half-consumed token for the phone pass.
        out = {r["doc_id"]: r for r in pii_scrub(_docs(spark, PII_ROWS)).collect()}
        assert out[3]["n_ips"] == 1
        assert out[3]["n_phones"] == 1
        assert out[3]["clean_text"] == "ip [IP] is not a phone [PHONE] but this is one"

    def test_crafted_duckdb_parity(self, spark):
        _parity(pii_scrub(_docs(spark, PII_ROWS)), _duck(PII_ROWS, _pii_sql()))

    def test_zero_shuffle_plan(self, spark, sf_dir):
        from w4h_etl_container_spark.session import read_table
        from tests.test_plans import plan_of

        p = plan_of(pii_scrub(read_table(spark, sf_dir, "documents")))
        assert "Exchange" not in p  # pure scan-side projection


class TestTextProfileRealText:
    """Regression: text_profile's group-free regex counts
    (n_numericish, punct_ratio) crashed with REGEX_GROUP_INDEX on any
    text containing digits or punctuation — latent, because the driver
    fixture contains neither. Found building pii_scrub (same API
    pitfall); pinned here on text that actually matches."""

    ROWS = [
        (1, "The quick fox, born 1999, jumped; really?! of the 3rd fence.", "en"),
        (2, "der und die das ist 42 mal 7.5% besser!", "de"),
    ]

    def test_digits_and_punctuation_do_not_crash(self, spark):
        from w4h_etl_container_spark.plans.textops import text_profile

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string, lang string")
        out = {r["doc_id"]: r for r in text_profile(df).collect()}
        assert out[1]["n_numericish"] == 2  # 1999, 3rd
        assert out[1]["punct_ratio"] > 0
        assert out[2]["lang_pred"] == "de"

    def test_duckdb_parity_on_real_text(self, spark):
        from w4h_etl_container_spark.plans.textops import _profile_sql, text_profile

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string, lang string")
        con = duckdb.connect()
        con.register(
            "documents", pd.DataFrame(self.ROWS, columns=["doc_id", "text", "lang"])
        )
        _parity(text_profile(df), con.execute(_profile_sql()).fetchdf())


class TestCurationProperties:
    """Property-based invariants over randomized corpora (hypothesis;
    driver-style Spark round-trips are too slow for per-example runs, so
    each property draws a corpus batch and checks it in one job)."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    words = st.lists(
        st.sampled_from([f"w{i}" for i in range(12)]), min_size=0, max_size=45
    )

    @given(st.lists(words, min_size=1, max_size=8))
    @settings(max_examples=12, deadline=None)
    def test_span_dedup_invariants(self, spark, corpora):
        rows = [(i, " ".join(ws)) for i, ws in enumerate(corpora)]
        out = span_dedup(_docs(spark, rows)).collect()
        # every non-empty doc appears exactly once
        expect_ids = {i for i, t in rows if t.strip()}
        assert {r["doc_id"] for r in out} == expect_ids
        distinct_spans = set()
        for r in out:
            ws = rows[r["doc_id"]][1].split()
            spans = [
                " ".join(ws[i * _SPAN_W : (i + 1) * _SPAN_W])
                for i in range((len(ws) + _SPAN_W - 1) // _SPAN_W)
            ]
            assert r["n_spans"] == len(spans)
            assert 0 <= r["n_removed"] <= r["n_spans"]
            distinct_spans.update(spans)
        # THE keep-first postcondition: total survivors == number of
        # distinct spans corpus-wide (exactly one occurrence each)
        total_kept = sum(r["n_spans"] - r["n_removed"] for r in out)
        assert total_kept == len(distinct_spans)

    @given(
        st.lists(
            st.text(
                alphabet="abcDEF0189 .@-\t\n[]()!?ñü中",
                min_size=0,
                max_size=120,
            ),
            min_size=1,
            max_size=10,
        )
    )
    @settings(max_examples=10, deadline=None)
    def test_pii_scrub_idempotent(self, spark, texts):
        rows = [(i, t) for i, t in enumerate(texts)]
        once = pii_scrub(_docs(spark, rows))
        twice = pii_scrub(
            once.select(F.col("doc_id"), F.col("clean_text").alias("text"))
        ).collect()
        by_id = {r["doc_id"]: r for r in once.collect()}
        for r in twice:
            # a second pass finds nothing and changes nothing
            assert r["n_emails"] == r["n_ips"] == r["n_phones"] == 0
            assert r["clean_text"] == by_id[r["doc_id"]]["clean_text"]


class TestUnigramLogprob:
    """Round-8: the vocab join consumes pre-aggregated (doc_id, token, k)
    rows — same integers, smaller and skew-absorbed join input — and the
    libm-boundary risk ADVICE flagged is measured, not assumed."""

    ROWS = [
        (1, "the cat sat on the mat"),
        (2, "the the the the"),
        (3, "unique tokens only here"),
        (4, "   "),
        (5, "cat cat mat"),
    ]

    def test_crafted_duckdb_parity(self, spark):
        from w4h_etl_container_spark.plans.curation import (
            _unigram_sql,
            unigram_logprob,
        )

        _parity(unigram_logprob(_docs(spark, self.ROWS)), _duck(self.ROWS, _unigram_sql()))

    def test_join_input_is_preaggregated(self, spark, sf_dir):
        from w4h_etl_container_spark.plans.curation import unigram_logprob
        from w4h_etl_container_spark.session import read_table
        from tests.test_plans import optimized_of

        plan = optimized_of(unigram_logprob(read_table(spark, sf_dir, "documents")))
        # the (doc_id, token) partial aggregate sits BELOW the vocab
        # join: the join's streamed side is the distinct-per-doc count
        # table, never the raw per-occurrence token stream
        join_at = plan.index("Join")
        assert "Aggregate [doc_id" in plan[join_at:], plan

    def test_boundary_distance_exceeds_libm_band(self, spark, sf_dir):
        """Minimum distance of log2(cnt/tot)·1e6 + 0.5 to an integer
        boundary over EVERY distinct (cnt, tot) of the fixture corpus.
        A cross-engine 1-ulp libm difference moves the product by at
        most ~|log2|·2⁻⁵²·1e6 ≈ 6e-9 for |log2| ≤ 25 — parity is safe
        while the measured minimum stays orders of magnitude above
        that band (docstring contract, quantified)."""
        import math

        from w4h_etl_container_spark.plans.curation import _tokens
        from w4h_etl_container_spark.session import read_table

        d = read_table(spark, sf_dir, "documents")
        toks = d.where(F.length(F.trim("text")) > 0).select(
            F.explode(_tokens()).alias("token")
        )
        counts = [
            r["cnt"]
            for r in toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt")).collect()
        ]
        tot = sum(counts)
        min_dist = 1.0
        for cnt in set(counts):
            x = math.log2(cnt / tot) * 1e6 + 0.5
            min_dist = min(min_dist, abs(x - round(x)))
        # 2-ulp cross-engine band at |log2| ≤ 25 is ~1.2e-8
        assert min_dist > 1e-6, min_dist


class TestSpanSpans:
    def test_span_concat_roundtrip(self, spark):
        text = " ".join(f"t{i}" for i in range(2 * _SPAN_W + 3))
        spans = (
            span_spans(_docs(spark, [(1, text)]))
            .orderBy("pos")
            .agg(F.concat_ws(" ", F.collect_list("span")).alias("t"))
            .collect()[0]["t"]
        )
        assert spans == text
