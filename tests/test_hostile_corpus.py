"""Hostile-corpus parity sweep: every documents-only declared query runs
on a crafted corpus of engine-differentiating text — BMP unicode
(accents, CJK), tabs/newlines, punctuation, digits, empty and
one-word documents, heavy repetition — and must match DuckDB exactly.

The driver fixture is ASCII word-soup, which masks real cross-engine
divergence; this corpus has already caught three shipped bugs:
`regexp_extract_all`'s group-1 default (crash on first matching row),
Java-vs-RE2 `\\b` semantics around non-ASCII letters (RE2 finds
`\\band\\b` INSIDE "ñandú"), and empty-document chunk rows ('' vs
NULL). Known documented limit, deliberately NOT in this corpus:
non-BMP codepoints (emoji) — Spark `length()` counts UTF-16 code units
while DuckDB counts codepoints, so length-derived columns diverge
there by definition of the two engines' string models.
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from w4h_etl_container_spark.plans.registry import load_library

TEXTS = [
    "The quick brown fox; jumped over 1999 dogs?! Really, truly.",
    "naïve café déjà-vu — ñandú über straße",
    "中文 文本 处理 测试 中文 文本 再来 一次 中文 文本",
    "tab\tseparated\twords and\nnewline split lines here",
    "x",
    "",
    "  leading and trailing   spaces  ",
    "repeat me repeat me repeat me repeat me repeat me",
    "MiXeD CaSe THE the The of OF and AND to TO is IS",
    "digits 123 456.789 12.34.56.78 and a1b2c3 mix",
]

# every declared query whose oracle reads ONLY the documents table
DOC_ONLY_QUERIES = [
    "q_text_profile",
    "q_dedup_exact",
    "q_minhash_lsh",
    "q_ngram_jaccard",
    "q_simhash",
    "q_winnow",
    "q_token_vocab",
    "q_chunks",
    "q_span_dedup",
    "q_repetition",
    "q_pii_scrub",
    "q_decontaminate",
    "q_winnow_overlap",
    "q_dedup_survivors",
    "q_sample_strat",
    "q_budget_sample",
    "q_frame_sample",
    "q_quality_flags",
    "q_media_features",
    "q_unigram_logprob",
    "q_langid",
    "q_curated_corpus",
    "q_bpe_pairs",
    "q_bigram_logprob",
    "q_source_kl",
    "q_incremental_dedup",
    "q_bm25",
    "q_normalize",
    "q_source_mix",
    "q_typo_pairs",
    "q_quality_deciles",
    "q_reservoir",
    "q_simhash_pairs",
    "q_dedup_rate",
    "q_shared_runs",
    "q_run_dedup",
    "q_media_metadata",
    "q_mix_sample",
    "q_contrastive_pairs",
]


@pytest.fixture(scope="module")
def hostile_dir(tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("hostile"))
    rows = [
        (i, t, "en" if i % 2 == 0 else "de", "web" if i % 3 else "books", len(t))
        for i, t in enumerate(TEXTS)
    ]
    # null text (out-of-JSONL-contract data arriving via parquet): every
    # query must null-propagate or filter it identically to DuckDB —
    # caught a len(None) crash in the frame-sampling kernel
    rows.append((len(TEXTS), None, "en", "web", 0))
    # null dimension columns (lang/source are OPTIONAL per the JSONL
    # contract): probed parity-clean across all 20 documents queries —
    # null strata fall outside every CASE threshold identically, null
    # grouping keys group identically
    rows.append((len(TEXTS) + 1, "a document with a null language tag", None, "web", 35))
    rows.append((len(TEXTS) + 2, "a document with a null source tag", "en", None, 33))
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(os.path.join(d, "documents.parquet"), index=False)
    return d


@pytest.fixture(scope="module")
def duck(hostile_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{hostile_dir}/documents.parquet'"
    )
    return con


@pytest.mark.parametrize("name", DOC_ONLY_QUERIES)
def test_hostile_parity(spark, hostile_dir, duck, name):
    q = load_library()[name]
    assert q.sql is not None, f"{name} lost its oracle"
    sdf = q.fn(spark, hostile_dir).toPandas()
    ddf = duck.execute(q.sql).fetchdf()
    cols = sorted(sdf.columns)
    assert cols == sorted(ddf.columns), (cols, sorted(ddf.columns))
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    d = ddf[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(s, d, check_dtype=False)


# ---------------------------------------------------------------------------
# hostile embeddings: zero vector (0/0 cosine), magnitude extremes within
# the e6 fixed-point domain, exact duplicates, antipodes. Out of contract
# (documented): |component|·1e6 beyond int64 — the e6 representation's
# own range; both engines now yield NULL for non-finite/overflow stats
# (pre-fix, numpy silently wrapped the zero-vector's NaN to INT64_MIN).
# ---------------------------------------------------------------------------
EMB_QUERIES = [
    "q_ann_lsh",
    "q_quantize",
    "q_cosine_topk",
    "q_embed_neardup",
    "q_ann_probe",
    "q_ivf_assign",
    "q_semantic_survivors",
    "q_pq_codes",
    "q_pq_adc",
    "q_ivfpq",
    "q_centroid_prune",
    "q_covariance",
    "q_rand_proj",
]


@pytest.fixture(scope="module")
def hostile_emb_dir(tmp_path_factory) -> str:
    import numpy as np

    d = str(tmp_path_factory.mktemp("hostile_emb"))
    rng = np.random.default_rng(3)
    vecs = []
    for i in range(20):
        v = rng.normal(size=64).astype("float32")
        vecs.append((i, [float(x) for x in v], i % 3))
    vecs.append((20, [0.0] * 64, 0))  # zero vector: 0/0 unit component
    vecs.append((21, [1e5] * 64, 1))  # large but inside the e6 domain
    vecs.append((22, [1e-30] * 64, 2))  # tiny magnitude
    vecs.append((23, vecs[0][1], 0))  # exact duplicate of vec 0
    vecs.append((24, [-float(x) for x in vecs[0][1]], 1))  # antipode
    # null embedding: dropped at the read_embeddings ingestion boundary
    # (distance to a null vector is undefined; a None array crashed every
    # Arrow kernel's np.stack before the contract existed)
    vecs.append((25, None, 2))
    pd.DataFrame(vecs, columns=["vec_id", "embedding", "label"]).to_parquet(
        os.path.join(d, "embeddings.parquet"), index=False
    )
    return d


@pytest.fixture(scope="module")
def duck_emb(hostile_emb_dir):
    con = duckdb.connect()
    # the oracle view models the INGESTED relation (see
    # session.read_embeddings); driver fixtures have no null vectors, so
    # the driver's raw views and this filtered view are the same there
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{hostile_emb_dir}/embeddings.parquet' WHERE embedding IS NOT NULL"
    )
    return con


@pytest.mark.parametrize("name", EMB_QUERIES)
def test_hostile_embeddings_parity(spark, hostile_emb_dir, duck_emb, name):
    import decimal

    q = load_library()[name]
    sdf = q.fn(spark, hostile_emb_dir).toPandas()
    ddf = duck_emb.execute(q.sql).fetchdf()
    cols = sorted(sdf.columns)
    assert cols == sorted(ddf.columns), (cols, sorted(ddf.columns))
    # DECIMAL(38,0) columns (q_covariance's cov_num): Spark's toPandas
    # keeps exact decimal.Decimal objects while DuckDB's fetchdf narrows
    # to float64 — same values, representations diverge past 2^53.
    # Normalize Decimals to float on the Spark side, exactly as the
    # driver's canonicalizer does (repr(float(Decimal))).
    for c in cols:
        col = sdf[c].dropna()
        if sdf[c].dtype == object and len(col) and isinstance(
            col.iloc[0], decimal.Decimal
        ):
            sdf[c] = sdf[c].astype("float64")
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    d = ddf[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(s, d, check_dtype=False)


def test_zero_vector_stats_are_null_not_wrapped(spark, hostile_emb_dir):
    """The pre-fix behavior: numpy astype(int64) wrapped the zero
    vector's NaN unit component to INT64_MIN — silent garbage from the
    hygiene stat whose whole job is flagging such vectors."""
    q = load_library()["q_ann_lsh"]
    row = (
        q.fn(spark, hostile_emb_dir)
        .where("vec_id = 20")
        .collect()[0]
    )
    assert row["l2_norm_e6"] == 0
    assert row["unit_c0_e6"] is None


def test_embeddings_quarantine_partitions_raw(spark, hostile_emb_dir):
    """ADVICE r7: null-vector drops at the embeddings boundary are
    auditable (complement view + count), not silent."""
    from w4h_etl_container_spark.session import (
        read_embeddings,
        read_embeddings_quarantine,
        read_table,
    )

    raw = read_table(spark, hostile_emb_dir, "embeddings")
    clean = read_embeddings(spark, hostile_emb_dir)
    quar = read_embeddings_quarantine(spark, hostile_emb_dir)
    assert quar.count() == 1
    assert clean.count() + quar.count() == raw.count()
    assert clean.select("vec_id").intersect(quar.select("vec_id")).count() == 0


def test_ingestion_audit_on_driver_fixture(spark, sf_dir):
    """The audit table over the clean driver fixture: totals match the
    raw tables, zero quarantined (the fixtures honor the contracts)."""
    from w4h_etl_container_spark.session import ingestion_audit, read_table

    rows = {r["table"]: r for r in ingestion_audit(spark, sf_dir).collect()}
    assert set(rows) == {"events", "embeddings"}
    for t, r in rows.items():
        assert r["n_quarantined"] == 0
        assert r["n_total"] == r["n_clean"] == read_table(spark, sf_dir, t).count()
