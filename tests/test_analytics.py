"""Event-sequence analytics (plans/analytics.py) and BM25 retrieval
(plans/retrieval.py): crafted-input semantics the fixture corpus can't
pin (out-of-order funnels, greedy matching, BM25 vs an independent
scorer), plus plan-shape checks. Oracle hash parity runs in
tools/selfcheck.py like every library query."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F


def _funnel_counts(spark, rows):
    """Run the funnel walk on crafted (user_id, event_type, ts) rows via
    the same expressions as q_funnel (module-level helper copy would be
    indirection for three lines — exercise the declared query instead
    by writing a parquet fixture)."""
    from w4h_etl_container_spark.plans.analytics import FUNNEL_STEPS

    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    arrays = [
        F.array_sort(
            F.collect_list(F.when(F.col("event_type") == s, F.col("ts")))
        ).alias(f"a{i + 1}")
        for i, s in enumerate(FUNNEL_STEPS)
    ]
    per_user = ev.groupBy("user_id").agg(*arrays)

    def first_after(arr, p):
        return F.array_min(F.filter(arr, lambda x: x > p))

    exprs = [F.array_min(F.col("a1"))]
    for i in range(1, len(FUNNEL_STEPS)):
        exprs.append(first_after(F.col(f"a{i + 1}"), exprs[-1]))
    sel = per_user.select(
        *[e.alias(f"t{i + 1}") for i, e in enumerate(exprs)]
    )
    row = sel.agg(
        *[F.count(f"t{i + 1}").alias(f"n{i + 1}") for i in range(len(FUNNEL_STEPS))]
    ).collect()[0]
    return [row[f"n{i + 1}"] for i in range(len(FUNNEL_STEPS))]


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


class TestFunnelSemantics:
    def test_ordered_user_counts_every_step(self, spark):
        rows = [
            (1, "signup", _ts(1)),
            (1, "view", _ts(2)),
            (1, "click", _ts(3)),
            (1, "purchase", _ts(4)),
        ]
        assert _funnel_counts(spark, rows) == [1, 1, 1, 1]

    def test_out_of_order_purchase_does_not_count(self, spark):
        # purchase BEFORE the click chain completes → step 4 unreached
        rows = [
            (1, "signup", _ts(1)),
            (1, "purchase", _ts(2)),
            (1, "view", _ts(3)),
            (1, "click", _ts(4)),
        ]
        assert _funnel_counts(spark, rows) == [1, 1, 1, 0]

    def test_greedy_earliest_match_is_optimal(self, spark):
        # two views: greedy takes the 02:00 one, leaving the 03:00
        # click and 04:00 purchase reachable; matching the later view
        # would still work here, but a LATEST-match strategy would fail
        # when the purchase lands between the views' clicks
        rows = [
            (1, "signup", _ts(1)),
            (1, "view", _ts(2)),
            (1, "view", _ts(5)),
            (1, "click", _ts(3)),
            (1, "purchase", _ts(4)),
        ]
        assert _funnel_counts(spark, rows) == [1, 1, 1, 1]

    def test_equal_timestamps_are_not_strictly_after(self, spark):
        rows = [(1, "signup", _ts(1)), (1, "view", _ts(1))]
        assert _funnel_counts(spark, rows) == [1, 0, 0, 0]

    def test_no_signup_means_no_steps(self, spark):
        rows = [(1, "view", _ts(1)), (1, "click", _ts(2)), (1, "purchase", _ts(3))]
        assert _funnel_counts(spark, rows) == [0, 0, 0, 0]

    def test_declared_query_runs(self, spark, sf_dir):
        from w4h_etl_container_spark.plans.registry import load_library

        out = load_library()["q_funnel"].fn(spark, sf_dir).collect()
        by_step = {r["step"]: r["n_users"] for r in out}
        assert sorted(by_step) == [1, 2, 3, 4]
        # funnel counts are monotone non-increasing by construction
        assert by_step[1] >= by_step[2] >= by_step[3] >= by_step[4]


class TestCohortRetention:
    def test_week0_retention_is_full(self, spark, sf_dir):
        from w4h_etl_container_spark.plans.registry import load_library

        rows = load_library()["q_cohort_retention"].fn(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert 0 <= r["age_weeks"] <= 10
            assert 0 < r["n_active"] <= r["cohort_n"]
            assert r["retention_bp"] == r["n_active"] * 10000 // r["cohort_n"]
            if r["age_weeks"] == 0:
                # every user is active in their own first week
                assert r["n_active"] == r["cohort_n"]
                assert r["retention_bp"] == 10000

    def test_crafted_two_cohorts(self, spark):
        from w4h_etl_container_spark.plans import analytics  # noqa: F401 (registration)

        rows = [
            # cohort of Mon 2024-01-01: u1 active weeks 0 and 1, u2 week 0 only
            (1, dt.datetime(2024, 1, 2, 10)),
            (1, dt.datetime(2024, 1, 9, 10)),
            (2, dt.datetime(2024, 1, 3, 10)),
            # cohort of Mon 2024-01-08: u3
            (3, dt.datetime(2024, 1, 10, 10)),
        ]
        ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
        first = ev.groupBy("user_id").agg(
            F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
        )
        act = (
            ev.join(first, "user_id")
            .select(
                "cohort_week",
                (
                    F.datediff(
                        F.date_trunc("week", F.col("ts")).cast("date"),
                        F.col("cohort_week"),
                    )
                    / 7
                ).cast("int").alias("age_weeks"),
                "user_id",
            )
            .distinct()
        )
        got = {
            (str(r["cohort_week"]), r["age_weeks"]): r["n"]
            for r in act.groupBy("cohort_week", "age_weeks")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == {
            ("2024-01-01", 0): 2,
            ("2024-01-01", 1): 1,
            ("2024-01-08", 0): 1,
        }


def _bm25_reference(docs, queries, k1=1.2, b=0.75):
    """Independent BM25 (textbook form, float throughout) — returns
    {(query_id, doc_id): score}."""
    tok = {d: t.split() for d, t in docs.items()}
    n = len(tok)
    avgdl = sum(len(v) for v in tok.values()) / n
    df = {}
    for toks in tok.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    out = {}
    for qid, terms in queries:
        for d, toks in tok.items():
            s = 0.0
            for t in terms:
                if t not in df:
                    continue
                tf = toks.count(t)
                if tf == 0:
                    continue
                idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
                # mirror the engine's per-term e6 rounding of idf
                idf = math.floor(idf * 1e6 + 0.5) / 1e6
                s += math.floor(
                    idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(toks) / avgdl)) * 1e6 + 0.5
                )
            if s:
                out[(qid, d)] = int(s)
    return out


class TestBm25:
    DOCS = {
        1: "spark query engine runs the query fast",
        2: "customer order merge with customer history",
        3: "window stream window stream window",
        4: "the quick brown fox",
        5: "spark spark spark spark",
    }
    QUERIES = [(1, ("spark", "query")), (2, ("customer", "merge")), (3, ("window",))]

    def _engine_scores(self, spark):
        import w4h_etl_container_spark.plans.retrieval as R

        d = spark.createDataFrame(
            [(i, t) for i, t in self.DOCS.items()], "doc_id long, text string"
        )
        old = R.BM25_QUERIES
        R.BM25_QUERIES = tuple((q, tuple(ts)) for q, ts in self.QUERIES)
        try:
            # rebuild the Spark plan against the patched query set by
            # calling the registered fn on a temp parquet fixture
            import tempfile

            with tempfile.TemporaryDirectory() as td:
                d.write.mode("overwrite").parquet(f"{td}/documents.parquet")
                rows = R.q_bm25(spark, td).collect()
        finally:
            R.BM25_QUERIES = old
        return {(r["query_id"], r["doc_id"]): r["bm25_e6"] for r in rows}

    def test_matches_independent_scorer(self, spark):
        got = self._engine_scores(spark)
        want = _bm25_reference(self.DOCS, self.QUERIES)
        assert got == want

    def test_tf_saturation_beats_naive_tf(self, spark):
        # doc 5 repeats 'spark' 4× but is short; doc 1 has one 'spark'
        # AND two 'query' hits — BM25's saturation + multi-term sum must
        # rank doc 1 over doc 5 for query 1
        got = self._engine_scores(spark)
        assert got[(1, 1)] > got[(1, 5)]

    def test_declared_query_topk_shape(self, spark, sf_dir):
        from w4h_etl_container_spark.plans.registry import load_library
        from w4h_etl_container_spark.plans.retrieval import BM25_TOP_K

        rows = load_library()["q_bm25"].fn(spark, sf_dir).collect()
        assert rows
        per_q = {}
        for r in rows:
            per_q.setdefault(r["query_id"], []).append(r)
        for qid, rs in per_q.items():
            assert len(rs) <= BM25_TOP_K
            ranks = sorted(r["rnk"] for r in rs)
            assert ranks == list(range(1, len(rs) + 1))
            scores = [r["bm25_e6"] for r in sorted(rs, key=lambda r: r["rnk"])]
            assert scores == sorted(scores, reverse=True)

    def test_corpus_scan_joins_are_broadcast(self, spark, sf_dir):
        # the query-terms side must broadcast: the corpus token table
        # never shuffles on the text key for scoring
        from w4h_etl_container_spark.plans.registry import load_library

        plan = load_library()["q_bm25"].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan


class TestCentroidPrune:
    def test_keep_counts_and_rank_shape(self, spark, sf_dir):
        from w4h_etl_container_spark.plans.registry import load_library
        from w4h_etl_container_spark.plans.vectors import CENTROID_KEEP

        rows = load_library()["q_centroid_prune"].fn(spark, sf_dir).collect()
        assert rows
        per_label = {}
        for r in rows:
            per_label.setdefault(r["label"], []).append(r)
        for label, rs in per_label.items():
            ranks = sorted(r["rnk"] for r in rs)
            assert ranks == list(range(1, len(rs) + 1))
            kept = [r for r in rs if r["kept"]]
            assert len(kept) == min(CENTROID_KEEP, len(rs))
            # kept = the FARTHEST from centroid: every kept cos_e6 is <=
            # every dropped cos_e6 (ties broken by rank, so compare via rnk)
            max_kept_rnk = max(r["rnk"] for r in kept)
            assert max_kept_rnk == len(kept)

    def test_vector_at_centroid_ranks_last(self, spark):
        # crafted cluster: three unit vectors and one AT the centroid
        # direction; the centroid-coincident vector has the highest
        # cosine and must be the prune candidate (highest rnk)
        import w4h_etl_container_spark.plans.vectors as V

        base = [0.0] * V.DIM
        def vec(i, x):
            v = list(base); v[0] = x[0]; v[1] = x[1]; return (i, v, 0)

        rows = [
            vec(1, (1.0, 0.2)),
            vec(2, (1.0, -0.2)),
            vec(3, (1.0, 0.0)),   # ≈ the centroid direction
        ]
        import tempfile
        with tempfile.TemporaryDirectory() as td:
            spark.createDataFrame(
                rows, "vec_id long, embedding array<float>, label int"
            ).write.mode("overwrite").parquet(f"{td}/embeddings.parquet")
            out = V.q_centroid_prune(spark, td).collect()
        by_id = {r["vec_id"]: r for r in out}
        assert by_id[3]["rnk"] == 3  # most centroid-like = last kept rank
        assert by_id[3]["cos_e6"] >= by_id[1]["cos_e6"]
        assert by_id[3]["cos_e6"] >= by_id[2]["cos_e6"]


class TestLeakFreeSplit:
    def test_clusters_never_straddle_splits(self, spark, sf_dir):
        from w4h_etl_container_spark.plans.registry import load_library

        rows = load_library()["q_split_leakfree"].fn(spark, sf_dir).collect()
        assert rows
        by_cluster = {}
        for r in rows:
            by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
        # THE invariant: one split per cluster
        assert all(len(s) == 1 for s in by_cluster.values())
        splits = {s for ss in by_cluster.values() for s in ss}
        assert splits <= {"train", "val", "test"}

    def test_every_document_assigned_exactly_once(self, spark, sf_dir):
        import duckdb

        from w4h_etl_container_spark.plans.registry import load_library

        rows = load_library()["q_split_leakfree"].fn(spark, sf_dir).collect()
        ids = [r["doc_id"] for r in rows]
        assert len(ids) == len(set(ids))
        n = duckdb.sql(
            f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/documents.parquet')"
        ).fetchone()[0]
        assert len(ids) == n

    def test_split_proportions_roughly_80_10_10(self, spark, sf_dir):
        from collections import Counter

        from w4h_etl_container_spark.plans.registry import load_library

        rows = load_library()["q_split_leakfree"].fn(spark, sf_dir).collect()
        c = Counter(r["split"] for r in rows)
        total = sum(c.values())
        # small-sample tolerance: the md5 bucket is uniform, the
        # fixture is a few hundred docs
        assert 0.6 < c["train"] / total < 0.95
        assert c["val"] / total < 0.25 and c["test"] / total < 0.25


class TestBm25Boundary:
    def test_idf_boundary_distance_exceeds_libm_band(self, spark, sf_dir):
        """BM25 confines its transcendental (ln) to one e6-rounded value
        per distinct query term — same contract as unigram_logprob.
        Measure the minimum distance of idf(df)·1e6 + 0.5 to an integer
        boundary over the actual fixture document frequencies of every
        BM25 query term; a 2-ulp cross-engine libm band (~1e-8 here)
        must sit orders of magnitude below it."""
        import math

        from w4h_etl_container_spark.plans.retrieval import BM25_QUERIES
        from w4h_etl_container_spark.plans.textops import _tokens
        from w4h_etl_container_spark.session import read_table

        d = read_table(spark, sf_dir, "documents")
        toks = d.where(F.length(F.trim("text")) > 0).select(
            "doc_id", F.explode(_tokens()).alias("token")
        )
        terms = {t for _, ts in BM25_QUERIES for t in ts}
        rows = (
            toks.distinct()
            .where(F.col("token").isin(*terms))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("df"))
            .collect()
        )
        n_docs = toks.select("doc_id").distinct().count()
        assert rows, "no query term present in the fixture corpus"
        min_dist = 1.0
        for r in rows:
            idf = math.log((n_docs - r["df"] + 0.5) / (r["df"] + 0.5) + 1.0)
            x = idf * 1e6 + 0.5
            min_dist = min(min_dist, abs(x - round(x)))
        assert min_dist > 1e-4, min_dist  # band is ~1e-8; 4 orders of margin


class TestPivotAndGapfill:
    def test_pivot_counts_sum_to_events(self, spark, sf_dir):
        from w4h_etl_container_spark.plans.registry import load_library
        from w4h_etl_container_spark.session import read_events

        rows = load_library()["q_pivot"].fn(spark, sf_dir).collect()
        total = sum(
            sum(r[c] for c in r.asDict() if c.startswith("n_")) for r in rows
        )
        assert total == read_events(spark, sf_dir).count()

    def test_gapfill_grid_is_dense_and_filled(self, spark, sf_dir):
        from w4h_etl_container_spark.plans.registry import load_library

        rows = load_library()["q_gapfill"].fn(spark, sf_dir).collect()
        by_user = {}
        for r in rows:
            by_user.setdefault(r["user_id"], []).append(r)
        for u, rs in by_user.items():
            rs.sort(key=lambda r: r["hr"])
            # dense hourly grid: consecutive rows are exactly 1 h apart
            for a, b in zip(rs, rs[1:]):
                assert (b["hr"] - a["hr"]).total_seconds() == 3600, u
            # first row is an observation by construction; forward fill
            # leaves no NULL v_filled anywhere
            assert rs[0]["v_obs"] is not None
            assert all(r["v_filled"] is not None for r in rs)
            # every filled row inherits the previous v_filled
            for a, b in zip(rs, rs[1:]):
                if b["is_filled"]:
                    assert b["v_filled"] == a["v_filled"], u


class TestHistogramAndCorr:
    def test_histogram_counts_cover_all_values(self, spark, sf_dir):
        from w4h_etl_container_spark.plans.registry import load_library
        from w4h_etl_container_spark.session import read_events

        rows = load_library()["q_histogram"].fn(spark, sf_dir).collect()
        assert sum(r["n"] for r in rows) == read_events(spark, sf_dir).where(
            F.col("value").isNotNull()
        ).count()
        for r in rows:
            assert 0 <= r["bucket"] <= 19
            assert r["lo_e6"] <= r["hi_e6"]

    def test_corr_matches_numpy_on_same_quantization(self, spark, sf_dir):
        import numpy as np

        from w4h_etl_container_spark.plans.registry import load_library
        from w4h_etl_container_spark.session import read_events

        got = {
            r["event_type"]: r["corr_e6"]
            for r in load_library()["q_corr"].fn(spark, sf_dir).collect()
        }
        ev = read_events(spark, sf_dir).where(F.col("value").isNotNull())
        raw = ev.select(
            "event_type",
            F.floor(F.col("value") * 1000.0 + 0.5).cast("long").alias("x"),
            F.hour("ts").cast("long").alias("y"),
        ).collect()
        by = {}
        for r in raw:
            by.setdefault(r["event_type"], []).append((r["x"], r["y"]))
        for t, v in by.items():
            xs = np.array([a for a, _ in v], dtype=float)
            ys = np.array([b for _, b in v], dtype=float)
            want = round(float(np.corrcoef(xs, ys)[0, 1]) * 1e6)
            # numpy's accumulation differs; the exact-integer route must
            # land within 1 micro-unit of it
            assert abs(got[t] - want) <= 1, (t, got[t], want)


class TestOutliers:
    def test_hampel_flags_planted_outlier(self, spark):
        import tempfile

        import w4h_etl_container_spark.plans.analytics as A

        rows = [(i, "click", float(100 + (i % 7)), None) for i in range(50)]
        rows.append((99, "click", 10_000.0, None))  # the planted spike
        import datetime as dt
        data = [
            (eid, dt.datetime(2024, 1, 1, 0, 0, eid % 60), 1, et, v, p)
            for eid, et, v, p in rows
        ]
        with tempfile.TemporaryDirectory() as td:
            spark.createDataFrame(
                data,
                "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
            ).write.mode("overwrite").parquet(f"{td}/events.parquet")
            out = A.q_outliers(spark, td).collect()
        flagged = {r["event_id"] for r in out if r["is_outlier"]}
        assert flagged == {99}
        # the median is robust: it sits inside the bulk despite the spike
        med = out[0]["med_e6"]
        assert 100_000_000 <= med <= 107_000_000  # 100.0..107.0 in e6


class TestTypoPairs:
    def test_deletion_neighborhood_is_complete_for_d1(self, spark):
        # crafted vocab exercising all three edit kinds: delete
        # (cat/cart? no - cat/at), insert (cat/cart is d=1? c-a-r-t vs
        # c-a-t = one insert), substitute (cat/car) - plus a d=2 decoy
        # (cat/dog) that must NOT appear
        import tempfile

        import w4h_etl_container_spark.plans.textops as T

        words = ["cat"] * 50 + ["at"] * 40 + ["cart"] * 30 + ["car"] * 20 + ["dog"] * 10
        text = " ".join(words)
        with tempfile.TemporaryDirectory() as td:
            spark.createDataFrame(
                [(1, text, "en", "web", len(text))],
                "doc_id long, text string, lang string, source string, n_chars long",
            ).write.mode("overwrite").parquet(f"{td}/documents.parquet")
            rows = T.q_typo_pairs(spark, td).collect()
        got = {frozenset((r["tok_a"], r["tok_b"])) for r in rows}
        assert {"at", "cat"} in got       # insert/delete
        assert {"car", "cat"} in got      # substitute
        assert {"car", "cart"} in got     # insert at end
        assert {"cat", "cart"} in got     # insert in middle
        assert not any("dog" in p for p in got)
        assert all(r["dist"] == 1 for r in rows)

    def test_fixture_pairs_verified_by_levenshtein(self, spark, sf_dir):
        from w4h_etl_container_spark.plans.registry import load_library

        rows = load_library()["q_typo_pairs"].fn(spark, sf_dir).collect()
        for r in rows:
            assert r["dist"] <= 1
            assert r["tok_a"] < r["tok_b"]

    def test_declared_query_nonvacuous_on_planted_fixture(self, spark, tmp_path):
        """r9 verdict nit: the DRIVER fixture's entire 31-token
        vocabulary provably has no distance-1 pairs (exhaustive
        deletion-bucket check), so q_typo_pairs is vacuous at every
        driver scale factor and its semantics were pinned only by the
        tiny crafted corpus above. This runs the DECLARED query
        end-to-end on the planted-typo fixture (testing.py): every
        planted (base, typo) pair must surface, and the result must
        hash-match the DuckDB oracle on the same parquet — the
        non-trivial path of the declared surface, executed and
        parity-checked."""
        import duckdb

        from w4h_etl_container_spark.plans.registry import load_library
        from w4h_etl_container_spark.testing import write_planted_documents

        d = str(tmp_path / "typodocs")
        truth = write_planted_documents(d)
        q = load_library()["q_typo_pairs"]
        rows = q.fn(spark, d).collect()
        got = {(r["tok_a"], r["tok_b"]) for r in rows}
        for base, typo in truth["typo_pairs"]:
            pair = (min(base, typo), max(base, typo))
            assert pair in got, pair
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
        )
        want = {
            (ta, tb, int(dist), int(ca), int(cb))
            for ta, tb, dist, ca, cb in con.execute(q.sql).fetchall()
        }
        have = {
            (r["tok_a"], r["tok_b"], r["dist"], r["cnt_a"], r["cnt_b"])
            for r in rows
        }
        assert have == want and len(have) > len(truth["typo_pairs"])


class TestProductQuantization:
    def test_crafted_vectors_encode_to_expected_codes(self, spark):
        # vectors placed ON specific subcentroids must encode to those
        # centroid ids (clear margins - no tie/ulp sensitivity)
        import numpy as np

        import w4h_etl_container_spark.plans.vectors as V
        from w4h_etl_container_spark.functions.vectorkernels import pq_codebooks

        cb = pq_codebooks(V.PQ_M, V.PQ_K, V.PQ_DSUB)
        want_codes = [3, 7, 0, 15, 1, 9, 4, 12]
        vec = np.concatenate([cb[s, want_codes[s]] for s in range(V.PQ_M)])
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            spark.createDataFrame(
                [(1, [float(x) for x in vec], 0)],
                "vec_id long, embedding array<float>, label int",
            ).write.mode("overwrite").parquet(f"{td}/embeddings.parquet")
            rows = V.q_pq_codes(spark, td).collect()
        code = rows[0]["code"]
        got = [(code >> (s * V.PQ_BITS)) & 15 for s in range(V.PQ_M)]
        # float32 storage perturbs the vector slightly; the planted
        # centroid must still be nearest in every subspace
        assert got == want_codes

    def test_adc_ranks_self_first_for_exact_centroid_vector(self, spark):
        # a query that IS a codebook point: its own code reconstructs it
        # exactly, so ADC(self) == 0 and it must rank 1
        import numpy as np

        import w4h_etl_container_spark.plans.vectors as V
        from w4h_etl_container_spark.functions.vectorkernels import pq_codebooks

        cb = pq_codebooks(V.PQ_M, V.PQ_K, V.PQ_DSUB)
        q = np.concatenate([cb[s, 2] for s in range(V.PQ_M)])
        rng = np.random.default_rng(5)
        rows = [(0, [float(x) for x in q], 0)] + [
            (i, [float(x) for x in rng.normal(0, 1, 64)], 0) for i in range(1, 30)
        ]
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            spark.createDataFrame(
                rows, "vec_id long, embedding array<float>, label int"
            ).write.mode("overwrite").parquet(f"{td}/embeddings.parquet")
            out = V.q_pq_adc(spark, td).collect()
        q0 = [r for r in out if r["query_id"] == 0]
        top = min(q0, key=lambda r: r["rnk"])
        assert top["cand_id"] == 0 and top["adc_e6"] == 0


class TestPqTraining:
    def test_distortion_monotone_and_beats_standins(self, spark, sf_dir):
        import numpy as np

        from w4h_etl_container_spark.functions.vectorkernels import (
            make_pq_adc_udf,
            make_pq_encode_udf,
            pq_codebooks,
        )
        from w4h_etl_container_spark.operators.ivfindex import pq_train
        from w4h_etl_container_spark.session import read_embeddings

        emb = read_embeddings(spark, sf_dir)
        trained, hist = pq_train(emb, m=8, k=16, iters=4)
        assert trained.shape == (8, 16, 8)
        # Lloyd's invariant: mean reconstruction error never increases
        for a, b in zip(hist, hist[1:]):
            assert b <= a + 1e-9, hist
        # trained codebooks reconstruct the fixture better than the
        # deterministic sin stand-ins (the documented production knob)
        def mean_err(cb):
            enc = make_pq_encode_udf(cb, 4)
            adc = make_pq_adc_udf(cb, 4)
            coded = emb.select("embedding", enc("embedding").alias("code"))
            r = coded.select(adc("embedding", "code").alias("e")).agg(
                F.avg(F.col("e").cast("double"))
            ).collect()[0][0]
            return r / 1e6

        assert mean_err(trained) < mean_err(pq_codebooks(8, 16, 8))

    def test_encode_udf_works_with_trained_codebooks(self, spark, sf_dir):
        from w4h_etl_container_spark.functions.vectorkernels import make_pq_encode_udf
        from w4h_etl_container_spark.operators.ivfindex import pq_train
        from w4h_etl_container_spark.session import read_embeddings

        emb = read_embeddings(spark, sf_dir)
        trained, _ = pq_train(emb, m=8, k=16, iters=1)
        enc = make_pq_encode_udf(trained, 4)
        rows = emb.select(enc("embedding").alias("code")).collect()
        assert all(0 <= r["code"] < (1 << 32) for r in rows)


class TestObservedWrite:
    def test_metrics_computed_in_write_pass(self, spark, sf_dir, tmp_path):
        from w4h_etl_container_spark.operators.gates import observed_write
        from w4h_etl_container_spark.session import read_events

        ev = read_events(spark, sf_dir)
        out = str(tmp_path / "obs")
        m = observed_write(
            ev,
            out,
            metrics={
                "n_rows": F.count(F.lit(1)),
                "n_users": F.approx_count_distinct("user_id"),
                "max_ts": F.max("ts"),
            },
        )
        written = spark.read.parquet(out)
        assert m["n_rows"] == written.count()
        assert m["max_ts"] == written.agg(F.max("ts")).collect()[0][0]
        assert m["n_users"] > 0

    def test_default_metric_is_row_count(self, spark, tmp_path):
        from w4h_etl_container_spark.operators.gates import observed_write

        df = spark.range(123)
        m = observed_write(df, str(tmp_path / "r"))
        assert m == {"n_rows": 123}


class TestRrfFusion:
    def test_rrf_arithmetic_and_arm_flags(self, spark, sf_dir):
        """RRF points are exact integer division (1e9 div (60 + rank));
        a doc surfaced by BOTH arms must carry the sum of its per-arm
        points and outrank any doc with a single equal-rank arm."""
        from w4h_etl_container_spark.plans.retrieval import (
            RRF_K,
            RRF_SCALE,
            q_bm25,
            q_rrf_fusion,
        )

        lex = {
            (r["query_id"], r["doc_id"]): r["rnk"]
            for r in q_bm25(spark, sf_dir).collect()
        }
        out = q_rrf_fusion(spark, sf_dir).collect()
        assert out
        for r in out:
            pts = 0
            key = (r["query_id"], r["doc_id"])
            if r["in_lexical"]:
                pts += RRF_SCALE // (RRF_K + lex[key])
            assert r["in_lexical"] == (key in lex)
            if r["in_vector"]:
                # vector rank is recoverable from the residual points
                resid = r["rrf_e9"] - pts
                vr = round(RRF_SCALE / resid) - RRF_K
                assert 1 <= vr
                assert RRF_SCALE // (RRF_K + vr) == resid
            else:
                assert r["rrf_e9"] == pts
        # per query: ranks are 1..k dense and rrf_e9 non-increasing
        by_q: dict = {}
        for r in out:
            by_q.setdefault(r["query_id"], []).append((r["rnk"], r["rrf_e9"]))
        for q, rows in by_q.items():
            rows.sort()
            assert [rk for rk, _ in rows] == list(range(1, len(rows) + 1))
            vals = [v for _, v in rows]
            assert vals == sorted(vals, reverse=True)

    def test_both_arms_beat_single_arm_at_same_rank(self, spark):
        """Crafted corpus: the same content is the clear winner of both
        arms for the planted query term, so it must fuse to rank 1 with
        both flags set."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq
        import tempfile, os

        from w4h_etl_container_spark.plans.retrieval import (
            BM25_QUERIES,
            q_rrf_fusion,
        )

        qid, terms = BM25_QUERIES[0]
        rng = np.random.default_rng(3)
        texts = []
        n = 40
        for d in range(n):
            body = " ".join(f"f{rng.integers(0, 200)}" for _ in range(40))
            if d == 7:
                body = (" ".join(terms) + " ") * 10 + body  # lexical winner
            texts.append(body)
        with tempfile.TemporaryDirectory() as td:
            pq.write_table(
                pa.table({
                    "doc_id": pa.array(range(n), type=pa.int64()),
                    "text": pa.array(texts),
                    "lang": pa.array(["en"] * n),
                    "source": pa.array(["s"] * n),
                    "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
                }),
                os.path.join(td, "documents.parquet"),
            )
            # embeddings: doc 7 is also the nearest vector to query qid
            vecs = rng.standard_normal((n, 64)).astype(np.float32) * 5
            vecs[7] = vecs[qid] + rng.normal(0, 0.01, 64).astype(np.float32)
            pq.write_table(
                pa.table({
                    "vec_id": pa.array(range(n), type=pa.int64()),
                    "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
                    "label": pa.array([0] * n, type=pa.int32()),
                }),
                os.path.join(td, "embeddings.parquet"),
            )
            rows = [
                r for r in q_rrf_fusion(spark, td).collect()
                if r["query_id"] == qid
            ]
        top = min(rows, key=lambda r: r["rnk"])
        assert top["doc_id"] == 7 and top["in_lexical"] and top["in_vector"]
