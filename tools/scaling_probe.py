"""Corpus-operator scaling probe: time the heavy text operators at 1×
and 10× the sf0.1 corpus and report the growth factor.

The bench fixtures cap documents at 5 000 rows, which leaves the corpus
operators fixed-cost-dominated; this probe synthesizes a 10× corpus
(perturb-duplicated sf0.1 documents with fresh doc_ids and salted
leading tokens so dedup structure stays non-trivial) and checks the
wall-clock growth is ~linear — the 100 TB claim is a plan-shape
argument, but a super-linear blowup at 10× would falsify it early
(exactly how the q_winnow_overlap Generate-inlining cliff was caught).

Usage: python tools/scaling_probe.py  → one JSON line
{"op": {"t1x": s, "t10x": s, "growth": r}, ...} — growth ≲ 12 is the
healthy band (10× data on a machine with fixed parallelism, plus
fixed costs amortizing).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import duckdb

    from pyspark.sql import functions as F

    from w4h_etl_container_spark.session import get_spark, read_table, parallelize_compute
    from w4h_etl_container_spark.operators.bpe import bpe_train, word_counts
    from w4h_etl_container_spark.operators.components import dedup_survivors
    from w4h_etl_container_spark.plans.corpus import q_split_leakfree
    from w4h_etl_container_spark.plans.curation import (
        lang_id_ngram,
        run_dedup,
        shared_runs_fast,
        span_dedup,
        unigram_logprob,
    )
    from w4h_etl_container_spark.plans.retrieval import q_bm25
    from w4h_etl_container_spark.plans.textops import q_typo_pairs
    from w4h_etl_container_spark.plans.textops import (
        minhash_candidates,
        ngram_jaccard_fast,
        winnow_fingerprints,
    )

    spark = get_spark("scaling_probe")
    base_dir = "/root/testdata/sf0.1"
    big_dir = "/tmp/scaling_probe_10x"
    os.makedirs(big_dir, exist_ok=True)
    if not os.path.exists(f"{big_dir}/documents.parquet"):
        con = duckdb.connect()
        copies = " UNION ALL ".join(
            f"SELECT doc_id + {i * 1_000_000} AS doc_id, "
            f"CASE WHEN {i} = 0 THEN text ELSE 'v{i} ' || text END AS text, "
            f"lang, source, n_chars FROM d"
            for i in range(10)
        )
        con.execute(
            f"CREATE VIEW d AS SELECT * FROM '{base_dir}/documents.parquet'"
        )
        con.execute(
            f"COPY ({copies}) TO '{big_dir}/documents.parquet' (FORMAT PARQUET)"
        )

    def t(fn) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return round(best, 3)

    def ops(sf_dir):
        docs = read_table(spark, sf_dir, "documents")
        spread = parallelize_compute(docs)
        return {
            "span_dedup": lambda: span_dedup(docs).foreach(lambda r: None),
            "winnow": lambda: winnow_fingerprints(spread).foreach(lambda r: None),
            "minhash_candidates": lambda: minhash_candidates(spread).foreach(
                lambda r: None
            ),
            "ngram_jaccard_fast": lambda: ngram_jaccard_fast(docs).foreach(
                lambda r: None
            ),
            "dedup_survivors": lambda: dedup_survivors(
                docs, minhash_candidates(spread)
            ).foreach(lambda r: None),
            # round-8 operators
            "lang_id": lambda: lang_id_ngram(docs).foreach(lambda r: None),
            "unigram_logprob": lambda: unigram_logprob(docs).foreach(
                lambda r: None
            ),
            # BPE: word_counts is the ONLY corpus-scale pass; the merge
            # loop is vocab-bounded, so 5-merge training should grow
            # FAR sub-linearly at 10× corpus (the architecture claim,
            # measured)
            "bpe_word_counts": lambda: word_counts(docs).foreach(lambda r: None),
            "bpe_train_5": lambda: bpe_train(word_counts(docs), 5),
            # round-9 operators (documents-scale): BM25 rides the same
            # (doc, token) count table; the split rides minhash + CC;
            # typo pairs are VOCAB-bounded after the count — the
            # architecture claim is ~flat growth past the counting pass
            "bm25": lambda: q_bm25(spark, sf_dir).foreach(lambda r: None),
            "split_leakfree": lambda: q_split_leakfree(spark, sf_dir).foreach(
                lambda r: None
            ),
            "typo_pairs": lambda: q_typo_pairs(spark, sf_dir).foreach(
                lambda r: None
            ),
            # round-10 operators: the substring-dedup chain family —
            # bucket-capped k-gram inverted index, so growth must stay
            # in the linear band like the other posting-list operators
            "shared_runs_fast": lambda: shared_runs_fast(docs).foreach(
                lambda r: None
            ),
            "run_dedup": lambda: run_dedup(docs).foreach(lambda r: None),
        }

    small, big = ops(base_dir), ops(big_dir)
    out = {}
    for name in small:
        t1 = t(small[name])
        t10 = t(big[name])
        out[name] = {"t1x": t1, "t10x": t10, "growth": round(t10 / max(t1, 1e-9), 2)}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
