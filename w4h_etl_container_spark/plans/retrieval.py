"""Full-text retrieval scoring over ``documents`` — BM25 (Robertson/
Spärck Jones probabilistic ranking; the Okapi BM25 form every search
engine and RAG retriever uses). SURVEY.md §2.11 extension surface: a
training-data pipeline needs lexical retrieval both for
decontamination-by-query (find the training docs a benchmark question
would retrieve) and for quality-targeted sampling.

Exactness discipline (the ``unigram_logprob`` contract): the only
transcendental — idf = ln((N − df + ½)/(df + ½) + 1) — is rounded to an
e6 micro-unit integer PER DISTINCT TERM (vocab-sized surface, ≤2-ulp
boundary risk quantified in plans/curation.py); the tf normalization is
a fixed-shape rational double expression evaluated identically by both
engines from identical integer inputs; each (doc, term) contribution is
e6-rounded and everything after is integer arithmetic, so per-document
sums are order-free and bit-equal across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from w4h_etl_container_spark.plans.registry import register
from w4h_etl_container_spark.plans.textops import _TOKENS_SQL, _tokens
from w4h_etl_container_spark.session import read_table

# Okapi defaults (Robertson et al., TREC-3).
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 10

# The benchmark query set: tiny, broadcast everywhere. Terms drawn from
# the fixture corpus's vocabulary so the ranking is non-degenerate.
BM25_QUERIES: tuple[tuple[int, tuple[str, ...]], ...] = (
    (1, ("spark", "query")),
    (2, ("customer", "order", "merge")),
    (3, ("window", "stream")),
)


def _bm25_sql() -> str:
    qrows = ", ".join(
        f"({qid}, '{t}')" for qid, terms in BM25_QUERIES for t in terms
    )
    # tf normalization: identical textual form to the Spark expression
    # below — same IEEE evaluation order, deterministic across engines.
    tf_norm = (
        f"(CAST(k AS DOUBLE) * {BM25_K1 + 1.0!r}) / "
        f"(CAST(k AS DOUBLE) + {BM25_K1!r} * "
        f"({1.0 - BM25_B!r} + {BM25_B!r} * (CAST(dl AS DOUBLE) / avgdl)))"
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKENS_SQL}) AS token
      FROM documents WHERE length(trim(text)) > 0
    ), tf AS (
      SELECT doc_id, token, COUNT(*) AS k FROM toks GROUP BY doc_id, token
    ), dl AS (
      SELECT doc_id, SUM(k) AS dl FROM tf GROUP BY doc_id
    ), scalars AS (
      SELECT (SELECT COUNT(*) FROM dl) AS n_docs,
             (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) FROM dl) AS avgdl
    ), qterms(query_id, term) AS (VALUES {qrows}),
    df AS (
      SELECT token, COUNT(*) AS df FROM tf GROUP BY token
    ), qidf AS (
      SELECT q.query_id, q.term,
             CAST(FLOOR(ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                           / (CAST(df AS DOUBLE) + 0.5) + 1.0)
                        * 1000000.0 + 0.5) AS BIGINT) AS idf_e6
      FROM qterms q JOIN df ON df.token = q.term, scalars
    ), contrib AS (
      SELECT qi.query_id, tf.doc_id,
             CAST(FLOOR((CAST(qi.idf_e6 AS DOUBLE) / 1000000.0)
                        * ({tf_norm}) * 1000000.0 + 0.5) AS BIGINT) AS c_e6
      FROM tf
      JOIN qidf qi ON qi.term = tf.token
      JOIN dl USING (doc_id), scalars
    ), scored AS (
      SELECT query_id, doc_id, CAST(SUM(c_e6) AS BIGINT) AS bm25_e6
      FROM contrib GROUP BY query_id, doc_id
    ), ranked AS (
      SELECT query_id, doc_id, bm25_e6,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY bm25_e6 DESC, doc_id) AS rnk
      FROM scored
    )
    SELECT query_id, doc_id, bm25_e6, rnk
    FROM ranked WHERE rnk <= {BM25_TOP_K}
    """


@register(
    "q_bm25",
    sql=_bm25_sql(),
    survey_ids=("EXT-TEXT", "EXT-SIM"),
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval for a broadcast query set (module
    docstring): per (query, doc) score = Σ_terms idf·tf_norm in exact
    e6 micro-units, top-``BM25_TOP_K`` docs per query with a
    deterministic doc_id tie-break.

    Scale shape: the corpus-side work is the SAME (doc, token) count
    table the unigram/vocab operators build (one explode + map-side
    combined aggregate). The query set joins as a broadcast against
    the token-count table — the corpus never shuffles on a text key
    for the scoring; only (query_id, doc_id) partial scores (≤ q·n
    rows of 3 integers, and only for docs containing ≥1 query term)
    reach the final aggregate. The per-query top-k is a rank-filtered
    window on a tiny key domain (q partitions). An inverted-index
    materialization would add nothing here: the broadcast semi-join IS
    the index probe, fused into the scan."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.where(F.length(F.trim("text")) > 0).select(
        "doc_id", F.explode(_tokens()).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("k"))
    dl = tf.groupBy("doc_id").agg(F.sum("k").alias("dl"))
    scalars = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    qterms = spark.createDataFrame(
        [(qid, t) for qid, terms in BM25_QUERIES for t in terms],
        "query_id int, term string",
    )
    df_t = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    qidf = (
        qterms.join(df_t, qterms.term == df_t.token)
        .crossJoin(F.broadcast(scalars))
        .select(
            "query_id",
            "term",
            F.floor(
                F.log(
                    (F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5))
                    / (F.col("df").cast("double") + F.lit(0.5))
                    + F.lit(1.0)
                )
                * F.lit(1000000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("idf_e6"),
        )
    )
    tf_norm = (
        F.col("k").cast("double") * F.lit(BM25_K1 + 1.0)
    ) / (
        F.col("k").cast("double")
        + F.lit(BM25_K1)
        * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * (F.col("dl").cast("double") / F.col("avgdl")))
    )
    contrib = (
        tf.join(F.broadcast(qidf), tf.token == qidf.term)
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(scalars))
        .select(
            "query_id",
            "doc_id",
            F.floor(
                (F.col("idf_e6").cast("double") / F.lit(1000000.0))
                * tf_norm
                * F.lit(1000000.0)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("c_e6"),
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.sum("c_e6").alias("bm25_e6")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25_e6").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= BM25_TOP_K)
        .select("query_id", "doc_id", "bm25_e6", "rnk")
    )
