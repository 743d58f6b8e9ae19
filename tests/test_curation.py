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


class TestLangId:
    """Self-trained trigram language-id (lang_id_ngram): the fixture's
    lang tags are uncorrelated word-soup, so classification QUALITY is
    pinned here on real multilingual text — labeled training rows plus
    held-out unlabeled rows that must classify correctly — while
    cross-engine parity on the fixture rides selfcheck/hostile sweeps."""

    LABELED = [
        (0, "the cat sat on the mat and the dog ran through the garden with the children", "en"),
        (1, "she walked to the market this morning and bought fresh bread with the money", "en"),
        (8, "a quick brown fox jumped over the lazy dog near the old wooden fence", "en"),
        (9, "they watched the evening sky together while the wind moved through the trees", "en"),
        (2, "der Hund lief durch den Garten und die Kinder spielten mit dem Ball im Haus", "de"),
        (3, "die Frau ging am Morgen auf den Markt und kaufte frisches Brot mit dem Geld", "de"),
        (10, "das Wetter war heute schön und wir sind mit den Kindern in den Park gegangen", "de"),
        (11, "er hat das Buch auf den Tisch gelegt und dann das Fenster geöffnet", "de"),
        (4, "le chien courait dans le jardin et les enfants jouaient avec le ballon dans la maison", "fr"),
        (5, "la femme est allée au marché ce matin et elle a acheté du pain frais avec l'argent", "fr"),
        (12, "il a posé le livre sur la table et puis il a ouvert la fenêtre de la chambre", "fr"),
        (13, "nous avons regardé le ciel du soir ensemble pendant que le vent soufflait", "fr"),
        (6, "猫坐在垫子上狗跑过花园孩子们在房子里玩球", "zh"),
        (7, "今天早上她走到市场买了新鲜的面包和一些水果回家做饭", "zh"),
        (14, "天气很好我们带着孩子们去公园散步看到了很多花", "zh"),
        (15, "他把书放在桌子上然后打开了窗户看外面的风景", "zh"),
    ]
    HELD_OUT = [
        (100, "the children played in the garden with the dog and the cat this morning", "en"),
        (101, "die Kinder spielten am Morgen mit dem Hund und der Frau im Garten", "de"),
        (102, "les enfants jouaient dans le jardin avec le chien ce matin", "fr"),
        (103, "孩子们今天早上在花园里和狗一起玩球然后回家吃面包", "zh"),
    ]

    def _df(self, spark):
        rows = [(i, t, l) for i, t, l in self.LABELED] + [
            (i, t, None) for i, t, _ in self.HELD_OUT
        ]
        return spark.createDataFrame(rows, "doc_id long, text string, lang string")

    def test_held_out_documents_classify_correctly(self, spark):
        from w4h_etl_container_spark.plans.curation import lang_id_ngram

        out = {r["doc_id"]: r for r in lang_id_ngram(self._df(spark)).collect()}
        for doc_id, _, expect in self.HELD_OUT:
            assert out[doc_id]["lang_pred"] == expect, (doc_id, out[doc_id])
            assert out[doc_id]["margin_e6"] > 0
        # labeled rows classify as themselves (training self-consistency)
        for doc_id, _, expect in self.LABELED:
            assert out[doc_id]["lang_pred"] == expect, (doc_id, out[doc_id])

    def test_charset_signal_separates_cjk(self, spark):
        from w4h_etl_container_spark.plans.curation import lang_id_ngram

        out = {r["doc_id"]: r for r in lang_id_ngram(self._df(spark)).collect()}
        assert out[6]["ascii_e6"] < 300_000  # CJK body, only pad spaces
        assert out[0]["ascii_e6"] == 1_000_000
        # accented French: high but not pure ASCII
        assert 800_000 < out[5]["ascii_e6"] < 1_000_000

    def test_crafted_duckdb_parity(self, spark):
        from w4h_etl_container_spark.plans.curation import _langid_sql, lang_id_ngram

        rows = [(i, t, l) for i, t, l in self.LABELED] + [
            (i, t, None) for i, t, _ in self.HELD_OUT
        ] + [(200, None, "en"), (201, "", "de"), (202, "   ", None)]
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        con = duckdb.connect()
        con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text", "lang"]))
        _parity(lang_id_ngram(df), con.execute(_langid_sql()).fetchdf())

    def test_mismatch_filter(self, spark):
        from w4h_etl_container_spark.plans.curation import lang_mismatch

        rows = [(i, t, l) for i, t, l in self.LABELED] + [
            # an English document mislabeled as German — the CCNet drop case
            (300, "the quick brown fox jumped over the lazy dog in the garden", "de"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        bad = lang_mismatch(df).collect()
        assert [r["doc_id"] for r in bad] == [300]
        assert bad[0]["lang_pred"] == "en"

    def test_profile_is_topk_capped(self, spark):
        from w4h_etl_container_spark.plans.curation import _LANGID_TOPK, lang_id_ngram
        from tests.test_plans import optimized_of

        plan = optimized_of(lang_id_ngram(self._df(spark)))
        # the Cavnar-Trenkle truncation is in the plan (rank filter at K)
        assert f"<= {_LANGID_TOPK}" in plan or f"{_LANGID_TOPK}" in plan


class TestBigramLogprob:
    def test_phrase_coherence_separates_what_unigram_cannot(self, spark):
        """Two documents with IDENTICAL token multisets — one in the
        corpus-typical phrase order, one scrambled — get the same
        unigram score but different bigram scores (higher for the
        coherent one). This is the whole point of the second gram."""
        from w4h_etl_container_spark.plans.curation import (
            bigram_logprob,
            unigram_logprob,
        )

        phrase = "the cat sat on the mat"
        rows = [
            (1, phrase),
            (2, phrase),
            (3, phrase),
            (10, phrase),  # coherent: corpus-typical order
            (11, "mat the on sat cat the"),  # same tokens, scrambled
        ]
        d = _docs(spark, rows)
        uni = {r["doc_id"]: r["avg_lp"] for r in unigram_logprob(d).collect()}
        assert uni[10] == uni[11]  # unigram is order-blind
        big = {r["doc_id"]: r["avg_lp"] for r in bigram_logprob(d).collect()}
        assert big[10] > big[11]

    def test_short_docs_excluded(self, spark):
        from w4h_etl_container_spark.plans.curation import bigram_logprob

        rows = [(1, "solo"), (2, ""), (3, "two tokens")]
        out = bigram_logprob(_docs(spark, rows)).collect()
        assert {r["doc_id"] for r in out} == {3}
        assert out[0]["n_bigrams"] == 1

    def test_crafted_duckdb_parity(self, spark):
        from w4h_etl_container_spark.plans.curation import _bigram_sql, bigram_logprob

        rows = [
            (1, "a b a b a"),
            (2, "b a b a b"),
            (3, "a a a a"),
            (4, "c d"),
            (5, "  "),
        ]
        _parity(bigram_logprob(_docs(spark, rows)), _duck(rows, _bigram_sql()))


class TestSourceKL:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string, source string")

    def test_outlier_domain_scores_higher(self, spark):
        from w4h_etl_container_spark.plans.curation import source_kl

        rows = [
            (1, "the cat sat on the mat with the dog", "web"),
            (2, "the dog ran to the cat by the mat", "web"),
            (3, "the cat and the dog sat on the mat", "web"),
            # an outlier domain with disjoint vocabulary
            (4, "qq ww ee rr tt yy uu ii oo pp", "spamcorp"),
        ]
        out = {r["source"]: r for r in source_kl(self._df(spark, rows)).collect()}
        assert out["spamcorp"]["kl_bits"] > out["web"]["kl_bits"]
        # KL is nonnegative up to per-term rounding
        for r in out.values():
            assert r["kl_e9"] >= -r["n_distinct"]

    def test_single_source_kl_zero(self, spark):
        from w4h_etl_container_spark.plans.curation import source_kl

        rows = [(1, "alpha beta gamma alpha", "only")]
        row = source_kl(self._df(spark, rows)).collect()[0]
        # p_source == p_corpus exactly → every term log2(1) = 0
        assert row["kl_e9"] == 0

    def test_null_source_is_a_stratum(self, spark):
        from w4h_etl_container_spark.plans.curation import source_kl

        rows = [
            (1, "the cat sat", "web"),
            (2, "unattributed text here", None),
        ]
        out = source_kl(self._df(spark, rows)).collect()
        assert {r["source"] for r in out} == {"web", None}

    def test_crafted_duckdb_parity(self, spark):
        from w4h_etl_container_spark.plans.curation import _source_kl_sql, source_kl

        rows = [
            (1, "a b c a", "x"),
            (2, "a b c d e", "y"),
            (3, "z z z", None),
            (4, "", "x"),
        ]
        sdf = source_kl(self._df(spark, rows))
        con = duckdb.connect()
        con.register(
            "documents", pd.DataFrame(rows, columns=["doc_id", "text", "source"])
        )
        _parity(sdf, con.execute(_source_kl_sql()).fetchdf())


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


class TestSharedRuns:
    """Variable-length exact substring dedup (r9 verdict task #4):
    chain-of-k-grams extents, the q_span_dedup boundary, and DuckDB
    parity on crafted corpora."""

    def _runs(self, spark, rows, **kw):
        from w4h_etl_container_spark.plans.curation import shared_runs

        return sorted(
            tuple(r)
            for r in shared_runs(
                spark.createDataFrame(rows, "doc_id long, text string"), **kw
            ).collect()
        )

    def test_fifty_token_passage_exact_extent(self, spark):
        """Two documents sharing a grid-aligned 50-token passage: the
        10-word span rule fires (removes the later doc's 5 duplicated
        grid cells) AND the chain detector reports the same passage as
        ONE row with span_len exactly 50 — the verdict's 'already
        caught, now measured' case."""
        from w4h_etl_container_spark.plans.curation import span_dedup

        passage = " ".join(f"p{i}" for i in range(50))
        pre = " ".join(f"x{i}" for i in range(10))  # grid-aligned offset
        post = " ".join(f"y{i}" for i in range(11))
        rows = [
            (1, f"{pre} {passage}"),  # passage at tokens 10..59
            (2, f"{passage} {post}"),  # passage at tokens 0..49
        ]
        assert self._runs(spark, rows) == [(1, 2, 10, 0, 50)]
        sd = {r["doc_id"]: r["n_removed"] for r in span_dedup(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()}
        assert sd == {1: 0, 2: 5}  # doc 1 wins first-occurrence per cell

    def test_misaligned_passage_only_chain_detector_sees_it(self, spark):
        """The SAME 50-token passage at a non-multiple-of-10 offset: the
        C4 grid rule goes completely blind (no two grid cells coincide),
        while the chain detector still reports the exact extent — the
        gap this operator exists to close."""
        from w4h_etl_container_spark.plans.curation import span_dedup

        passage = " ".join(f"p{i}" for i in range(50))
        pre = " ".join(f"x{i}" for i in range(7))
        post = " ".join(f"y{i}" for i in range(11))
        rows = [
            (1, f"{pre} {passage}"),  # passage at tokens 7..56
            (2, f"{passage} {post}"),  # passage at tokens 0..49
        ]
        assert self._runs(spark, rows) == [(1, 2, 7, 0, 50)]
        sd = {r["doc_id"]: r["n_removed"] for r in span_dedup(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()}
        assert sd == {1: 0, 2: 0}

    def test_nine_token_overlap_boundary_both_sides(self, spark):
        """The r9 verdict's boundary pin: a 9-token shared run is
        INVISIBLE to the 10-word span grid (no span removed on either
        doc) but measured exactly (span_len=9) by the chain detector
        when min_run allows — and suppressed by the declared query's
        min_run=20 threshold, pinning the reporting cut from both
        sides."""
        from w4h_etl_container_spark.plans.curation import span_dedup

        nine = " ".join(f"s{i}" for i in range(9))
        fill1 = " ".join(f"u{i}" for i in range(12))
        fill2 = " ".join(f"v{i}" for i in range(12))
        rows = [(1, f"{fill1} {nine}"), (2, f"{nine} {fill2}")]
        # 10-word span dedup: blind (the 9 shared tokens never fill a
        # 10-word grid cell in either document)
        sd = {r["doc_id"]: r["n_removed"] for r in span_dedup(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()}
        assert sd == {1: 0, 2: 0}
        # chain detector at min_run=9: exact extent
        assert self._runs(spark, rows, min_run=9) == [(1, 2, 12, 0, 9)]
        # declared threshold (20): suppressed
        assert self._runs(spark, rows) == []
        # resolution floor: a run shorter than k is invisible even at
        # min_run=1 (no k-gram covers it)
        seven = " ".join(f"s{i}" for i in range(7))
        rows7 = [(1, f"{fill1} {seven}"), (2, f"{seven} {fill2}")]
        assert self._runs(spark, rows7, min_run=1) == []

    def test_two_separate_runs_split_islands(self, spark):
        """Two distinct shared passages in one pair (different offsets /
        a gap in the chain) come out as TWO rows with exact extents."""
        p1 = " ".join(f"a{i}" for i in range(22))
        p2 = " ".join(f"b{i}" for i in range(25))
        mid1 = " ".join(f"m{i}" for i in range(9))
        mid2 = " ".join(f"n{i}" for i in range(5))
        rows = [
            (1, f"{p1} {mid1} {p2}"),
            (2, f"{p2} {mid2} {p1}"),
        ]
        # doc1: p1@0, p2@31; doc2: p2@0, p1@30
        assert self._runs(spark, rows) == [(1, 2, 0, 30, 22), (1, 2, 31, 0, 25)]

    def test_identical_docs_full_length_run(self, spark):
        text = " ".join(f"t{i}" for i in range(40))
        rows = [(1, text), (2, text)]
        assert self._runs(spark, rows) == [(1, 2, 0, 0, 40)]

    def test_hostile_inputs(self, spark):
        """Repeated-token documents (every k-gram identical — the
        bucket-cap path), sub-k documents, and empty text neither crash
        nor emit spurious runs."""
        rows = [
            (1, "z " * 30),  # 30 identical tokens
            (2, "z " * 30 + "q"),  # overlapping repeated run + tail
            (3, "a b c"),  # < k tokens
            (4, ""),  # empty
            (5, "one two three four five six seven eight nine"),
        ]
        got = self._runs(spark, rows, min_run=20)
        # docs 1 and 2 share the 30-token 'z' run; the all-equal k-gram
        # bucket makes EVERY offset chain, so maximal islands exist per
        # offset — the longest (offset 0) must be the exact 30
        assert (1, 2, 0, 0, 30) in got
        assert all(r[0] != r[1] for r in got)
        assert not any(3 in r[:2] or 4 in r[:2] or 5 in r[:2] for r in got)

    def test_duckdb_parity_on_crafted_corpus(self, spark):
        from w4h_etl_container_spark.plans.curation import (
            _shared_runs_sql,
            shared_runs,
        )

        p = " ".join(f"c{i}" for i in range(33))
        rows = [
            (1, f"{p} tail1 tail2"),
            (2, f"lead0 {p}"),
            (3, "z " * 25),
            (4, "z " * 26),
            (5, " ".join(f"d{i}" for i in range(30))),
        ]
        _parity(shared_runs(_docs(spark, rows)), _duck(rows, _shared_runs_sql()))


class TestRunDedup:
    """The removal ACTION over shared_runs (Lee et al. 2022 §4) and the
    xxhash64 production twin of the detector."""

    def _dd(self, spark, rows, **kw):
        from w4h_etl_container_spark.plans.curation import run_dedup

        return {
            r["doc_id"]: r
            for r in run_dedup(
                spark.createDataFrame(rows, "doc_id long, text string"), **kw
            ).collect()
        }

    def test_first_occurrence_kept_later_clipped(self, spark):
        p = " ".join(f"p{i}" for i in range(25))
        rows = [
            (1, f"{p} tail1 tail2"),
            (2, f"lead0 {p} endx"),
            (3, "solo words only here"),
        ]
        out = self._dd(spark, rows)
        assert out[1]["n_removed"] == 0
        assert out[1]["clean_text"] == f"{p} tail1 tail2"
        assert out[2]["n_removed"] == 25
        assert out[2]["clean_text"] == "lead0 endx"
        assert out[3]["n_removed"] == 0 and out[3]["clean_text"] == rows[2][1]
        # exact token accounting everywhere
        for r in out.values():
            n_kept = len(r["clean_text"].split()) if r["clean_text"] else 0
            assert r["n_tokens"] == r["n_removed"] + n_kept

    def test_overlapping_runs_remove_union(self, spark):
        """Two runs overlapping in the later doc: coverage is the UNION
        of intervals (no double-count, no gap)."""
        a = [f"a{i}" for i in range(30)]
        # doc 3 contains a[0:22] then a[10:30] back to back: both are
        # runs vs docs 1 and 2; union covers all 42 tokens
        rows = [
            (1, " ".join(a[:22])),
            (2, " ".join(a[10:])),
            (3, " ".join(a[:22] + a[10:])),
        ]
        out = self._dd(spark, rows)
        assert out[1]["n_removed"] == 0
        # doc 2's 20 tokens duplicate doc 1's tail? no - a[10:22] (12
        # tokens) is shared with doc 1, below min_run=20: doc 2 intact
        assert out[2]["n_removed"] == 0
        assert out[3]["n_removed"] == 42 and out[3]["clean_text"] == ""

    def test_fully_dedicated_doc_empty_text(self, spark):
        t = " ".join(f"z{i}" for i in range(21))
        out = self._dd(spark, [(1, t), (2, t)])
        assert out[1]["n_removed"] == 0
        assert out[2]["n_removed"] == 21 and out[2]["clean_text"] == ""

    def test_duckdb_parity_crafted(self, spark):
        from w4h_etl_container_spark.plans.curation import _run_dedup_sql, run_dedup

        p = " ".join(f"c{i}" for i in range(33))
        rows = [
            (1, f"{p} t1 t2"),
            (2, f"l0 {p}"),
            (3, p),
            (4, "short text"),
        ]
        _parity(run_dedup(_docs(spark, rows)), _duck(rows, _run_dedup_sql()))

    def test_fast_twin_row_identical(self, spark, sf_dir):
        from w4h_etl_container_spark.plans.curation import (
            shared_runs,
            shared_runs_fast,
        )
        from w4h_etl_container_spark.session import read_table

        d = read_table(spark, sf_dir, "documents")
        slow = sorted(tuple(r) for r in shared_runs(d).collect())
        fast = sorted(tuple(r) for r in shared_runs_fast(d).collect())
        assert slow == fast and len(slow) > 0


class TestMixSample:
    def test_budget_fill_invariants(self, spark, sf_dir):
        """Every source's selected token mass stays within its computed
        budget plus at most ONE overshooting document, and membership
        is the deterministic hash-order prefix (re-run identical)."""
        from w4h_etl_container_spark.plans.curation import (
            MIX_BUDGET_TOKENS,
            q_mix_sample,
            q_source_mix,
        )

        mix = {r["source"]: r["q_bp"] for r in q_source_mix(spark, sf_dir).collect()}
        out = q_mix_sample(spark, sf_dir).collect()
        per_src: dict = {}
        for r in out:
            per_src.setdefault(r["source"], []).append(r["n_tok"])
        assert set(per_src) <= set(mix)
        for src, toks in per_src.items():
            budget = MIX_BUDGET_TOKENS * mix[src] // 10000
            total = sum(toks)
            # keep-iff-starts-inside: total < budget + the last doc
            assert total - max(toks) < budget <= total or total <= budget
        # deterministic: a second run selects the identical set
        again = {(r["doc_id"]) for r in q_mix_sample(spark, sf_dir).collect()}
        assert again == {r["doc_id"] for r in out}
