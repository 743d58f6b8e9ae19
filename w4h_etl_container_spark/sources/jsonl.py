"""JSONL corpus ingestion boundary (SURVEY §2.1 extension): raw
line-delimited JSON → the `documents` schema, with a quarantine
contract instead of silent drops.

Web-scale text corpora arrive as JSONL (one document object per line —
the Common Crawl / RedPajama / Dolma distribution format). The naive
``spark.read.json(path)`` has two production failure modes this
boundary closes:

1. **Silent schema drift** — json inference widens or re-types columns
   per batch (an all-null shard turns ``doc_id`` into string). The
   reader pins the explicit documents schema; nothing is inferred.
2. **Silent corruption loss** — malformed lines vanish under the
   default PERMISSIVE mode unless the corrupt-record column is wired
   up (and direct filters on it hit Spark's raw-file query
   restriction), while FAILFAST kills a 100 TB job for one bad line.
   The reader goes ``spark.read.text`` → ``from_json`` with an
   explicit corrupt-record field — measured behavior: malformed JSON
   AND type-coercion failures (e.g. a string where ``doc_id``'s long
   should be) both set it — and splits into (clean, quarantine).
   Every input line lands in exactly one output, so ingestion is
   auditable and re-runnable, and the quarantine carries the exact
   raw line for repair-and-replay.

Scale: text scan + from_json is a per-line streaming parse over file
splits — no inference pass, no driver materialization, one scan feeding
both outputs as complementary filters. gzip'd JSONL (the common
distribution form) is NOT splittable — one file maps to one task, so
corpus distributions shard into many ~100 MB-1 GB files; the reader
takes a glob and inherits that file-level parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

_CORRUPT = "_corrupt_record"

# the documents-table contract (TESTDATA.md): doc_id and text are
# required; lang/source are optional dimension columns; n_chars is
# derived, never trusted from the wire (a stale producer-side count is
# a classic poisoned column)
DOCUMENTS_WIRE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField(_CORRUPT, StringType()),
    ]
)


def read_documents_jsonl(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Parse a JSONL documents corpus into (clean, quarantine).

    ``clean``: (doc_id, text, lang, source, n_chars) — rows whose line
    parsed at the declared types AND carried the required fields;
    ``n_chars`` is recomputed from ``text``.
    ``quarantine``: (raw, reason) — the untouched input line for every
    rejected row with the first failed contract rule
    (``malformed_json`` / ``missing_doc_id`` / ``missing_text``).

    Every input line appears in exactly one output (audit invariant,
    pinned in tests); blank lines are skipped as line-format framing,
    not data. Both sides come off ONE text scan as complementary
    filters on the same parsed projection."""
    lines = spark.read.text(path).where(F.length(F.trim("value")) > 0)
    parsed = lines.select(
        F.col("value").alias("raw"),
        F.from_json(
            "value",
            DOCUMENTS_WIRE_SCHEMA,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
        ).alias("j"),
    )
    reason = (
        F.when(F.col(f"j.{_CORRUPT}").isNotNull() | F.col("j").isNull(), F.lit("malformed_json"))
        .when(F.col("j.doc_id").isNull(), F.lit("missing_doc_id"))
        .when(F.col("j.text").isNull(), F.lit("missing_text"))
    )
    flagged = parsed.select("raw", "j", reason.alias("reason"))
    clean = flagged.where(F.col("reason").isNull()).select(
        F.col("j.doc_id").alias("doc_id"),
        F.col("j.text").alias("text"),
        F.col("j.lang").alias("lang"),
        F.col("j.source").alias("source"),
        F.length("j.text").cast("long").alias("n_chars"),
    )
    quarantine = flagged.where(F.col("reason").isNotNull()).select("raw", "reason")
    return clean, quarantine
