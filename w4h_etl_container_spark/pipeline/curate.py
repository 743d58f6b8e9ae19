"""The corpus-curation JOB: one entry point that runs the whole
curation surface over a documents fixture and writes the artifact set a
training run consumes — the reference's job architecture (discover →
compute → publish artifacts → record state, ``main.py`` top-level)
applied to the engine's LLM-pipeline extension stage.

Artifacts written under ``out_dir`` (all parquet, all overwrite-
idempotent; MANIFEST.json records the row counts so a rerun is
verifiable without re-reading the data):

* ``corpus/``     — the curated documents (every gate passed), laid out
                    with ``cluster_by(doc_id)`` so downstream id-range
                    scans prune files;
* ``decisions/``  — the per-document decision table (q_curated_corpus):
                    keep_quality ∧ is_canonical ∧ lang_ok, with the
                    per-gate verdicts for auditability;
* ``quality_report/`` — per-rule loss attribution (one fixed-width row);
* ``source_kl/``  — the domain-mixing KL table;
* ``source_mix/`` — the α=0.5 temperature mixing weights (round 9);
* ``splits/``     — leakage-free train/val/test assignment per doc
                    (q_split_leakfree: hashed on the near-dup cluster);
* ``bpe_merges/`` — the trained tokenizer merge table.

Every stage is individually oracle-checked (COVERAGE.md); this module
adds only composition + publication, so its tests pin artifact
CONSISTENCY (counts agree across artifacts, curated ⊆ input, reruns
are byte-stable in row counts), not recomputed semantics.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from w4h_etl_container_spark.operators.gates import observed_write
from w4h_etl_container_spark.operators.layout import cluster_by
from w4h_etl_container_spark.session import read_table


def run_curation(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_merges: int = 40,
    n_corpus_files: int | None = 8,
) -> dict:
    """Run the curation job; return the manifest dict (also written to
    ``out_dir/MANIFEST.json``)."""
    from w4h_etl_container_spark.operators.bpe import bpe_train, merges_df, word_counts
    from w4h_etl_container_spark.plans.curation import (
        q_curated_corpus,
        q_source_kl,
        q_source_mix,
    )
    from w4h_etl_container_spark.plans.textops import quality_report

    docs = read_table(spark, sf_dir, "documents")

    decisions = q_curated_corpus(spark, sf_dir)
    # the decision table is consumed three times below (write, corpus
    # join, manifest counts) and its lineage contains the full langid +
    # dedup subtrees — materialize once (reliable checkpoint on a
    # cluster)
    decisions = decisions.localCheckpoint()
    dec_path = os.path.join(out_dir, "decisions")
    decisions.write.mode("overwrite").parquet(dec_path)

    curated_ids = decisions.where(F.col("curated")).select("doc_id")
    corpus = docs.join(curated_ids, "doc_id")
    corpus_path = os.path.join(out_dir, "corpus")
    cluster_by(corpus, ["doc_id"], n_files=n_corpus_files).write.mode(
        "overwrite"
    ).parquet(corpus_path)

    # report/mix/split artifacts: row counts fold into each write job
    # (observed_write) so the manifest's per-artifact counts cost zero
    # extra scans
    artifact_rows = {}
    qr_path = os.path.join(out_dir, "quality_report")
    artifact_rows["quality_report"] = observed_write(
        quality_report(docs.where(F.length("text") > 0)), qr_path
    )["n_rows"]

    kl_path = os.path.join(out_dir, "source_kl")
    artifact_rows["source_kl"] = observed_write(q_source_kl(spark, sf_dir), kl_path)[
        "n_rows"
    ]

    # the α=0.5 temperature mixing table (q_source_mix) — the weights a
    # downstream token_budget_sample consumes to set per-source budgets
    mix_path = os.path.join(out_dir, "source_mix")
    artifact_rows["source_mix"] = observed_write(q_source_mix(spark, sf_dir), mix_path)[
        "n_rows"
    ]

    # leakage-free splits: near-dup clusters never straddle the
    # train/val/test boundary (plans/corpus.py::q_split_leakfree)
    from w4h_etl_container_spark.plans.corpus import q_split_leakfree

    splits_path = os.path.join(out_dir, "splits")
    artifact_rows["splits"] = observed_write(
        q_split_leakfree(spark, sf_dir), splits_path
    )["n_rows"]

    merges_path = os.path.join(out_dir, "bpe_merges")
    merges = bpe_train(word_counts(docs), n_merges)
    merges_df(spark, merges).write.mode("overwrite").parquet(merges_path)

    manifest = {
        "input_docs": docs.count(),
        "decided_docs": decisions.count(),
        "curated_docs": int(
            decisions.agg(F.sum(F.col("curated").cast("long"))).collect()[0][0] or 0
        ),
        "n_merges": len(merges),
        "artifact_rows": {k: int(v) for k, v in sorted(artifact_rows.items())},
        "artifacts": {
            "corpus": corpus_path,
            "decisions": dec_path,
            "quality_report": qr_path,
            "source_kl": kl_path,
            "source_mix": mix_path,
            "splits": splits_path,
            "bpe_merges": merges_path,
        },
    }
    with open(os.path.join(out_dir, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest
