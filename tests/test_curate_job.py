"""Curation job (pipeline/curate.py): artifact consistency, curated ⊆
input, layout of the published corpus, and rerun determinism. The
stage semantics are oracle-checked elsewhere (COVERAGE.md); these pin
the composition + publication layer."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq

from w4h_etl_container_spark.pipeline.curate import run_curation
from w4h_etl_container_spark.session import read_table


def test_curation_job_artifacts(spark, sf_dir, tmp_path):
    out = str(tmp_path / "curated")
    manifest = run_curation(spark, sf_dir, out, n_merges=10, n_corpus_files=4)

    # manifest file matches the returned dict
    with open(os.path.join(out, "MANIFEST.json")) as f:
        assert json.load(f) == manifest

    docs = read_table(spark, sf_dir, "documents")
    corpus = spark.read.parquet(manifest["artifacts"]["corpus"])
    decisions = spark.read.parquet(manifest["artifacts"]["decisions"])

    # counts agree across artifacts and with the manifest
    assert manifest["input_docs"] == docs.count()
    assert manifest["decided_docs"] == decisions.count()
    assert manifest["curated_docs"] == corpus.count()
    assert corpus.count() == decisions.where("curated").count()
    assert 0 < corpus.count() < docs.count()  # the gates actually cut

    # curated ⊆ input, schema preserved
    assert sorted(corpus.columns) == sorted(docs.columns)
    extra = corpus.select("doc_id").exceptAll(docs.select("doc_id"))
    assert extra.count() == 0

    # every decision column is a real verdict (no nulls in the booleans)
    for c in ("keep_quality", "is_canonical", "lang_ok", "curated"):
        assert decisions.where(f"{c} IS NULL").count() == 0

    # the published corpus is doc_id-clustered: per-file ranges disjoint
    cdir = manifest["artifacts"]["corpus"]
    ranges = []
    for fn in sorted(os.listdir(cdir)):
        if not fn.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(cdir, fn)).metadata
        idx = md.schema.to_arrow_schema().get_field_index("doc_id")
        stats = [md.row_group(i).column(idx).statistics for i in range(md.num_row_groups)]
        if stats:
            ranges.append((min(s.min for s in stats), max(s.max for s in stats)))
    ranges.sort()
    assert len(ranges) >= 2
    for (_, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2

    # tokenizer artifact: rank-ordered merges
    merges = spark.read.parquet(manifest["artifacts"]["bpe_merges"])
    rows = merges.orderBy("rank").collect()
    assert [r["rank"] for r in rows] == list(range(manifest["n_merges"]))

    # quality report: first-fail attribution sums to the total drop
    qr = spark.read.parquet(manifest["artifacts"]["quality_report"]).collect()[0]
    firsts = sum(v for k, v in qr.asDict().items() if k.startswith("n_first_"))
    assert firsts == qr["n_docs"] - qr["n_kept"]

    # mixing weights: probabilities renormalize to ~10000 bp (floor
    # division loses < 1 bp per source) and every source appears once
    mix = spark.read.parquet(manifest["artifacts"]["source_mix"]).collect()
    srcs = [r["source"] for r in mix]
    assert len(srcs) == len(set(srcs))
    total_bp = sum(r["q_bp"] for r in mix)
    assert 10000 - len(mix) <= total_bp <= 10000

    # splits: every input doc assigned exactly once, clusters never
    # straddle the boundary
    splits = spark.read.parquet(manifest["artifacts"]["splits"]).collect()
    assert len(splits) == manifest["input_docs"]
    # observed per-artifact counts (computed inside the write jobs)
    # agree with the written data
    for name, n in manifest["artifact_rows"].items():
        assert n == spark.read.parquet(manifest["artifacts"][name]).count(), name
    assert manifest["artifact_rows"]["splits"] == manifest["input_docs"]
    assert len({r["doc_id"] for r in splits}) == len(splits)
    per_cluster = {}
    for r in splits:
        per_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(v) == 1 for v in per_cluster.values())


def test_curation_job_rerun_deterministic(spark, sf_dir, tmp_path):
    out = str(tmp_path / "curated2")
    m1 = run_curation(spark, sf_dir, out, n_merges=5, n_corpus_files=2)
    m2 = run_curation(spark, sf_dir, out, n_merges=5, n_corpus_files=2)
    assert m1 == m2  # overwrite-idempotent, fully deterministic
