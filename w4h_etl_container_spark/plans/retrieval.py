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


def _bm25_ctes() -> str:
    """WITH-body fragment ending at the ``bm25_ranked`` CTE
    (query_id, doc_id, bm25_e6, rnk ≤ BM25_TOP_K) — shared by the
    q_bm25 oracle and the q_rrf_fusion oracle so the lexical arm's
    scoring cannot drift between them."""
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
    return f"""toks AS (
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
    ), bm25_scored AS (
      SELECT query_id, doc_id, CAST(SUM(c_e6) AS BIGINT) AS bm25_e6
      FROM contrib GROUP BY query_id, doc_id
    ), bm25_ranked AS (
      SELECT query_id, doc_id, bm25_e6, rnk FROM (
        SELECT query_id, doc_id, bm25_e6,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY bm25_e6 DESC, doc_id) AS rnk
        FROM bm25_scored
      ) WHERE rnk <= {BM25_TOP_K}
    )"""


def _bm25_sql() -> str:
    return f"""
    WITH {_bm25_ctes()}
    SELECT query_id, doc_id, bm25_e6, rnk FROM bm25_ranked
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

    Scale shape (round-11 rework): the query terms are a FIXED literal
    set, so the whole corpus side is ONE explode + ONE map-side
    combined groupBy(doc_id) computing doc length and a conditional
    count per query term — no corpus-wide (doc, token) table, no
    shuffle on a text key, ever. That per-doc table feeds (a) the
    1-row corpus stats / per-term document frequencies (global agg)
    and (b) the (doc, term, k) unpivot restricted to k > 0 — AQE
    reuses the shuffle between the two consumers; the unpivot output
    is only docs containing ≥1 query term. idf joins as a ≤|terms|-row
    broadcast; only (query_id, doc_id) integer partials reach the
    final aggregate, and the per-query top-k is a rank-filtered window
    on a tiny key domain (q partitions). The OLD shape built the full
    corpus (doc, token) count table and consumed it three times (tf →
    dl, df, contrib — three tokenize passes); measured at sf0.1 this
    cut 1.31 s → 1.01 s same-boot, and the gap widens with corpus
    volume (BENCH_10X). For standing query workloads the
    materialized inverted index (pipeline/textindex.py) is the
    serving path; this is the from-scratch scoring."""
    terms = sorted({t for _, ts in BM25_QUERIES for t in ts})
    nt = len(terms)
    d = read_table(spark, sf_dir, "documents")
    toks = d.where(F.length(F.trim("text")) > 0).select(
        "doc_id", F.explode(_tokens()).alias("token")
    )
    per_doc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.count(F.when(F.col("token") == t, 1)).alias(f"k_{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.count(F.when(F.col(f"k_{i}") > 0, 1)).alias(f"df_{i}")
            for i in range(nt)
        ],
    )
    idf_stack = ", ".join(f"'{t}', df_{i}" for i, t in enumerate(terms))
    idf = stats.selectExpr(
        "n_docs", "avgdl", f"stack({nt}, {idf_stack}) AS (term, df)"
    ).select(
        "term",
        "avgdl",
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
    qterms = spark.createDataFrame(
        [(qid, t) for qid, ts in BM25_QUERIES for t in ts],
        "query_id int, term string",
    )
    qidf = qterms.join(idf, "term")
    k_stack = ", ".join(f"'{t}', k_{i}" for i, t in enumerate(terms))
    doc_term = per_doc.selectExpr(
        "doc_id", "dl", f"stack({nt}, {k_stack}) AS (term, k)"
    ).where(F.col("k") > 0)
    tf_norm = (
        F.col("k").cast("double") * F.lit(BM25_K1 + 1.0)
    ) / (
        F.col("k").cast("double")
        + F.lit(BM25_K1)
        * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * (F.col("dl").cast("double") / F.col("avgdl")))
    )
    contrib = doc_term.join(F.broadcast(qidf), "term").select(
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


# ---------------------------------------------------------------------------
# EXT-SIM / EXT-TEXT — hybrid retrieval fusion: reciprocal-rank fusion
# (Cormack, Clarke & Buettcher, SIGIR 2009) of the lexical BM25 arm and
# the exact-cosine vector arm — the standard RAG hybrid-retrieval shape
# ---------------------------------------------------------------------------
RRF_K = 60  # the SIGIR-2009 damping constant
RRF_SCALE = 1_000_000_000  # contribution = RRF_SCALE div (RRF_K + rank)
RRF_TOP = 10


def _rrf_fusion_sql() -> str:
    from w4h_etl_container_spark.plans.vectors import _dot, _e6, _norm

    qids = ", ".join(str(qid) for qid, _ in BM25_QUERIES)
    dot = _dot("duck", "q.embedding", "c.embedding")
    cos6 = _e6(f"(({dot}) / (q.nrm * c.nrm))")
    return f"""
    WITH {_bm25_ctes()},
    normed AS (
      SELECT vec_id, embedding, {_norm("duck", "embedding")} AS nrm
      FROM embeddings
    ),
    vec_scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS doc_id, {cos6} AS cosine_e6
      FROM normed q JOIN normed c
        ON q.vec_id IN ({qids}) AND c.vec_id <> q.vec_id
    ),
    vec_ranked AS (
      SELECT query_id, doc_id, rnk FROM (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine_e6 DESC, doc_id) AS rnk
        FROM vec_scored
      ) WHERE rnk <= {RRF_TOP}
    ),
    contribs AS (
      SELECT query_id, doc_id,
             {RRF_SCALE} // ({RRF_K} + rnk) AS pts, 1 AS lex, 0 AS vec
      FROM bm25_ranked
      UNION ALL
      SELECT query_id, doc_id,
             {RRF_SCALE} // ({RRF_K} + rnk) AS pts, 0 AS lex, 1 AS vec
      FROM vec_ranked
    ),
    fused AS (
      SELECT query_id, doc_id,
             CAST(SUM(pts) AS BIGINT) AS rrf_e9,
             (SUM(lex) > 0) AS in_lexical,
             (SUM(vec) > 0) AS in_vector
      FROM contribs GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, rrf_e9, in_lexical, in_vector, rnk FROM (
      SELECT query_id, doc_id, rrf_e9, in_lexical, in_vector,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY rrf_e9 DESC, doc_id) AS rnk
      FROM fused
    ) WHERE rnk <= {RRF_TOP}
    """


@register(
    "q_rrf_fusion",
    sql=_rrf_fusion_sql(),
    survey_ids=("EXT-SIM", "EXT-TEXT"),
)
def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of the BM25 lexical arm
    (q_bm25's exact top-10) and the exact-cosine vector arm over the
    same query ids (``embeddings.vec_id`` is the embedding of
    ``documents.doc_id`` — the fixtures share one id space). Fusion is
    rank-only (RRF's point): per arm a doc earns
    ``RRF_SCALE div (60 + rank)`` — INTEGER division of integer rank,
    exact and engine-neutral, no float reciprocal — and arms sum.
    Output marks which arm(s) surfaced each doc; ties break on doc_id.

    Scale shape: fusion consumes arm OUTPUTS (≤ queries × top_k rows
    each — bounded regardless of corpus size), so the whole operator
    costs one tiny union + groupBy on top of whatever the arms cost;
    the arms themselves are the declared scale paths (BM25's broadcast
    probe / the ANN index for the vector arm in production — the exact
    cosine arm here is the declared-exact baseline, same contract as
    q_cosine_topk)."""
    from w4h_etl_container_spark.functions.vectorkernels import (
        make_cosine_e6_udf,
        make_norm_udf,
    )
    from w4h_etl_container_spark.session import read_embeddings

    lex = q_bm25(spark, sf_dir).select(
        "query_id", "doc_id", F.col("rnk").alias("lex_rnk")
    )

    qids = [qid for qid, _ in BM25_QUERIES]
    emb = read_embeddings(spark, sf_dir)
    norm_udf = make_norm_udf()
    normed = emb.select("vec_id", "embedding", norm_udf("embedding").alias("nrm"))
    qv = normed.where(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("nrm").alias("qn"),
    )
    cos_udf = make_cosine_e6_udf()
    vec_scored = (
        normed.join(
            F.broadcast(qv), F.col("vec_id") != F.col("query_id")
        )
        .select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            cos_udf("qe", "embedding", "qn", "nrm").alias("cosine_e6"),
        )
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.col("cosine_e6").desc(), "doc_id"
    )
    vec = (
        vec_scored.withColumn("vec_rnk", F.row_number().over(wv))
        .where(F.col("vec_rnk") <= RRF_TOP)
        .select("query_id", "doc_id", "vec_rnk")
    )

    pts = lambda rnk: F.expr(f"{RRF_SCALE}L div ({RRF_K} + {rnk})")  # noqa: E731
    contribs = lex.select(
        "query_id",
        "doc_id",
        pts("lex_rnk").alias("pts"),
        F.lit(1).alias("lex"),
        F.lit(0).alias("vec"),
    ).unionByName(
        vec.select(
            "query_id",
            "doc_id",
            pts("vec_rnk").alias("pts"),
            F.lit(0).alias("lex"),
            F.lit(1).alias("vec"),
        )
    )
    fused = contribs.groupBy("query_id", "doc_id").agg(
        F.sum("pts").cast("long").alias("rrf_e9"),
        (F.sum("lex") > 0).alias("in_lexical"),
        (F.sum("vec") > 0).alias("in_vector"),
    )
    wf = Window.partitionBy("query_id").orderBy(F.col("rrf_e9").desc(), "doc_id")
    return (
        fused.withColumn("rnk", F.row_number().over(wf))
        .where(F.col("rnk") <= RRF_TOP)
        .select("query_id", "doc_id", "rrf_e9", "in_lexical", "in_vector", "rnk")
    )
