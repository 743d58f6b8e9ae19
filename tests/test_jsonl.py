"""JSONL ingestion boundary (sources/jsonl.py): the clean/quarantine
split contract on a crafted corpus shard with every failure class."""

from __future__ import annotations

import gzip
import os

import pytest

from w4h_etl_container_spark.sources.jsonl import read_documents_jsonl

GOOD_1 = '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}'
GOOD_2 = '{"doc_id": 2, "text": "", "lang": "de", "source": "books"}'  # empty text is data
GOOD_3 = '{"doc_id": 3, "text": "no dims"}'  # optional columns absent
BAD_JSON = "this is not json {"
BAD_TYPE = '{"doc_id": "abc", "text": "typed wrong"}'  # coercion failure
NO_ID = '{"text": "an orphan line"}'
NO_TEXT = '{"doc_id": 9, "lang": "en"}'

LINES = [GOOD_1, GOOD_2, "", GOOD_3, BAD_JSON, BAD_TYPE, NO_ID, NO_TEXT, "   "]


@pytest.fixture(scope="module")
def shard(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("jsonl")
    p = os.path.join(d, "part-000.jsonl")
    with open(p, "w") as f:
        f.write("\n".join(LINES) + "\n")
    return p


class TestJsonlIngestion:
    def test_clean_rows_and_derived_n_chars(self, spark, shard):
        clean, _ = read_documents_jsonl(spark, shard)
        rows = {r["doc_id"]: r for r in clean.collect()}
        assert set(rows) == {1, 2, 3}
        assert rows[1]["lang"] == "en" and rows[1]["n_chars"] == len("hello world")
        assert rows[2]["text"] == "" and rows[2]["n_chars"] == 0
        assert rows[3]["lang"] is None and rows[3]["source"] is None
        assert clean.columns == ["doc_id", "text", "lang", "source", "n_chars"]

    def test_quarantine_reasons_and_raw_lines(self, spark, shard):
        _, quar = read_documents_jsonl(spark, shard)
        by_raw = {r["raw"]: r["reason"] for r in quar.collect()}
        assert by_raw[BAD_JSON] == "malformed_json"
        assert by_raw[BAD_TYPE] == "malformed_json"  # coercion failure is corruption
        assert by_raw[NO_ID] == "missing_doc_id"
        assert by_raw[NO_TEXT] == "missing_text"
        assert len(by_raw) == 4

    def test_every_line_lands_exactly_once(self, spark, shard):
        clean, quar = read_documents_jsonl(spark, shard)
        n_nonblank = sum(1 for l in LINES if l.strip())
        assert clean.count() + quar.count() == n_nonblank

    def test_gzip_shard_reads_identically(self, spark, tmp_path):
        p = str(tmp_path / "part-000.jsonl.gz")
        with gzip.open(p, "wt") as f:
            f.write("\n".join(LINES) + "\n")
        clean, quar = read_documents_jsonl(spark, p)
        assert {r["doc_id"] for r in clean.collect()} == {1, 2, 3}
        assert quar.count() == 4

    def test_schema_is_pinned_not_inferred(self, spark, tmp_path):
        # an all-string shard must NOT flip doc_id's type — the declared
        # schema wins and the offending rows quarantine instead
        p = str(tmp_path / "drift.jsonl")
        with open(p, "w") as f:
            f.write('{"doc_id": "10", "text": "stringly shard"}\n')
        clean, quar = read_documents_jsonl(spark, p)
        assert dict(clean.dtypes)["doc_id"] == "bigint"
        assert clean.count() == 0 and quar.count() == 1

    def test_single_scan_two_filters(self, spark, shard):
        clean, quar = read_documents_jsonl(spark, shard)
        for df in (clean, quar):
            p = df._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in p  # scan-side projection + filter only
