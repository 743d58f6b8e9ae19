"""Corpus-curation operators: cross-document span dedup, repetition
signals, PII scrubbing (SURVEY.md §2.11 extension surface).

Three text-rewrite / text-audit operators every large-scale training-data
pipeline runs between raw ingestion and tokenization:

* **span dedup** — the C4 / RefinedWeb rule: any fixed-width word span
  occurring more than once in the corpus keeps exactly ONE occurrence
  (the first in (doc_id, pos) order) and every other occurrence is cut
  from its document. Catches boilerplate shared across pages that
  whole-document fingerprints (q_dedup_exact) and document-level MinHash
  (q_minhash_lsh) cannot see, without winnowing's candidate-pair stage.
* **repetition signals** — the Gopher repetition heuristics (Rae et al.
  2021 §A1.1): fraction of words covered by the most frequent 2-gram and
  by duplicated 5-grams. High values mark machine-generated / template
  text; the quality-filter chain consumes them as plain columns.
* **PII scrub** — regex redaction of emails, IPv4 addresses and phone
  numbers with per-document match counts, applied in a documented order
  on the evolving text so counts are unambiguous.

All three are library-tier declared queries with exact DuckDB oracles
(`q_span_dedup`, `q_repetition`, `q_pii_scrub`); crafted-input parity
and behavior tests live in tests/test_curation.py (the driver fixture
contains no PII, so the scrub's non-trivial path is pinned there).

Reference: the reference pipeline (main.py) has no corpus stage; these
derive from the BASELINE.json extension mandate, matching the published
procedures cited above.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from w4h_etl_container_spark.plans.registry import register
from w4h_etl_container_spark.plans.textops import _TOKENS_SQL, _tokens
from w4h_etl_container_spark.session import read_table

_HEXD = "0123456789abcdef"


def _nib_at(expr: str, start: int, n_hex: int) -> str:
    """DuckDB hex→int over ``n_hex`` hex chars of ``expr`` starting at
    1-based ``start`` (DuckDB has no hex→int builtin; the Spark twin is
    ``conv(substring(x, start, n_hex), 16, 10)`` — same integer by
    construction)."""
    return " + ".join(
        f"(instr('{_HEXD}', substr({expr}, {start + p}, 1)) - 1) * {16 ** (n_hex - 1 - p)}"
        for p in range(n_hex)
    )


# ---------------------------------------------------------------------------
# EXT-DEDUP — cross-document span dedup (C4 §2.2 / RefinedWeb line dedup)
# ---------------------------------------------------------------------------
_SPAN_W = 10  # words per non-overlapping span (C4 uses three sentences)


def span_spans(d: DataFrame, w: int = _SPAN_W) -> DataFrame:
    """(doc_id, pos, span, n_spans) — each document cut into
    non-overlapping ``w``-word spans (last span may be shorter). Pure
    projection + posexplode: zero shuffles. Re-joining the spans of one
    document with single spaces in pos order reproduces its
    whitespace-normalized text — the invariant span_dedup's rebuild
    relies on (pinned in tests)."""
    ws = _tokens()
    n_spans = F.floor((F.size("ws") + w - 1) / w).cast("long")
    return (
        d.where(F.length(F.trim("text")) > 0)
        .select("doc_id", ws.alias("ws"))
        .select("doc_id", "ws", n_spans.alias("n_spans"))
        .select(
            "doc_id",
            "n_spans",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.col("n_spans") - 1),
                    lambda i: F.concat_ws(" ", F.slice("ws", i * w + 1, w)),
                )
            ).alias("pos", "span"),
        )
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "span", "n_spans")
    )


def span_dedup(d: DataFrame, w: int = _SPAN_W) -> DataFrame:
    """C4-style cross-document span dedup: every distinct ``w``-word
    span keeps its first occurrence in (doc_id, pos) order; all other
    occurrences (across OR within documents) are removed, and each
    document's text is rebuilt from its surviving spans.

    Returns (doc_id, n_spans, n_removed, clean_text).

    Scale shape (100 TB): the duplicate-detection exchange never ships
    text — spans are keyed by two md5-derived int64s (120 bits total;
    the `row_number` window shuffles 32 bytes/row: k1, k2, doc_id, pos).
    The removal list (doc_id, pos) is the DUPLICATE occurrences only —
    a few percent of spans on a typical web corpus — so the flag join
    back onto the span table is AQE-broadcastable; the rebuild is the
    one unavoidable full-text shuffle (groupBy doc_id), which any
    text-rewrite operator pays exactly once. Nothing is all-pairs.

    Engine-neutral keys: both engines key on the identical md5-nibble
    integers, so results match bit-for-bit; a 120-bit key collision
    (which would remove one unique span occurrence) is ~2⁻⁶⁰ even at
    10¹² spans. Production can swap xxhash64(span)+xxhash64(reverse)
    for the md5 pair — one line, same plan shape.

    Precondition: ``doc_id`` is unique (the documents table's key —
    TESTDATA.md). Under key duplication the keep-first order
    (doc_id, pos) has ties, so "first occurrence" is ill-defined in ANY
    engine and the per-document rebuild would interleave two bodies;
    probed: the other 19 documents queries are duplicate-id-agnostic,
    this operator is the one that semantically requires the key."""
    spans = span_spans(d, w)
    h = F.md5("span")
    keyed = spans.select(
        "doc_id",
        "pos",
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long").alias("k1"),
        F.conv(F.substring(h, 16, 15), 16, 10).cast("long").alias("k2"),
    )
    rn = F.row_number().over(
        Window.partitionBy("k1", "k2").orderBy("doc_id", "pos")
    )
    removals = (
        keyed.withColumn("rn", rn)
        .where(F.col("rn") > 1)
        .select("doc_id", "pos", F.lit(True).alias("removed"))
    )
    # left join (not anti): a document whose EVERY span was removed must
    # still appear in the output, with empty clean_text
    flagged = spans.join(removals, ["doc_id", "pos"], "left").withColumn(
        "removed", F.coalesce("removed", F.lit(False))
    )
    return flagged.groupBy("doc_id").agg(
        F.first("n_spans").alias("n_spans"),
        F.sum(F.col("removed").cast("long")).alias("n_removed"),
        F.concat_ws(
            " ",
            F.transform(
                F.filter(
                    F.array_sort(F.collect_list(F.struct("pos", "span", "removed"))),
                    lambda x: ~x["removed"],
                ),
                lambda x: x["span"],
            ),
        ).alias("clean_text"),
    )


def _span_sql(w: int = _SPAN_W) -> str:
    k1 = _nib_at("h", 1, 15)
    k2 = _nib_at("h", 16, 15)
    return f"""
    WITH words AS (
      SELECT doc_id, {_TOKENS_SQL} AS ws
      FROM documents WHERE length(trim(text)) > 0
    ), spans AS (
      SELECT doc_id,
             CAST(i AS BIGINT) AS pos,
             array_to_string(list_slice(ws, CAST(i * {w} + 1 AS INTEGER), CAST(i * {w} + {w} AS INTEGER)), ' ') AS span,
             CAST((len(ws) + {w - 1}) // {w} AS BIGINT) AS n_spans
      FROM words, LATERAL (SELECT unnest(range(0, (len(ws) + {w - 1}) // {w})) AS i) t
    ), keyed AS (
      SELECT doc_id, pos, span, n_spans, md5(span) AS h FROM spans
    ), flagged AS (
      SELECT doc_id, pos, span, n_spans,
             row_number() OVER (PARTITION BY ({k1}), ({k2}) ORDER BY doc_id, pos) AS rn
      FROM keyed
    )
    SELECT doc_id,
           MAX(n_spans) AS n_spans,
           MAX(n_spans) - COUNT(*) FILTER (WHERE rn = 1) AS n_removed,
           COALESCE(string_agg(span, ' ' ORDER BY pos) FILTER (WHERE rn = 1), '') AS clean_text
    FROM flagged
    GROUP BY doc_id
    """


@register("q_span_dedup", sql=_span_sql(), survey_ids=("EXT-DEDUP", "EXT-TEXT"), gate=False)
def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document span dedup over `documents` (``span_dedup``): each
    10-word span keeps its first (doc_id, pos) occurrence corpus-wide;
    documents are rebuilt from surviving spans with removal counts.

    Library tier: the dedup exchange ships int64 keys, the removal set
    joins back AQE-broadcastable, one full-text rebuild shuffle —
    plan and rebuild-invariant pinned in TestSpanDedup."""
    return span_dedup(read_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# EXT-TEXT — Gopher repetition signals (Rae et al. 2021, §A1.1)
# ---------------------------------------------------------------------------
_REP_MIN_WORDS = 5  # docs shorter than the longest gram are excluded


def repetition_signals(d: DataFrame) -> DataFrame:
    """Per-document repetition heuristics over word n-grams:

    * ``top2_frac`` — words covered by the most frequent 2-gram:
      ``max_count(2gram) * 2 / n_words`` (overlapping grams, so values
      can exceed 1 on degenerate ababab text — a feature: those are
      exactly the documents the filter should catch);
    * ``dup5_frac`` — words covered by duplicated 5-grams:
      ``sum(count * 5 where count > 1) / n_words``.

    Returns (doc_id, n_words, top2_frac, dup5_frac) for documents with
    at least ``_REP_MIN_WORDS`` words (shorter docs have no 5-gram and
    are the length filter's job, not this one's).

    Scale shape: both gram sizes ride ONE exploded stream; the count
    aggregate on (doc_id, n, gram) takes map-side partials (Zipf-skewed
    grams combine before the exchange), the per-(doc, n) reduction is
    over the already-aggregated counts, and the final per-doc pivot is
    a conditional aggregate over ≤2 rows per document. All integer
    counts; the divisions are exact-integer-to-double, so both engines
    produce bit-identical doubles."""
    words = (
        d.select("doc_id", _tokens().alias("ws"))
        .where(F.size("ws") >= _REP_MIN_WORDS)
        .select("doc_id", "ws", F.size("ws").cast("long").alias("n_words"))
    )

    def grams(n: int):
        return F.transform(
            F.sequence(F.lit(0), F.size("ws") - n),
            lambda i: F.struct(
                F.lit(n).alias("n"),
                F.concat_ws(" ", F.slice("ws", i + 1, n)).alias("gram"),
            ),
        )

    exploded = words.select(
        "doc_id",
        "n_words",
        F.explode(F.concat(grams(2), grams(5))).alias("g"),
    ).select("doc_id", "n_words", F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
    counts = exploded.groupBy("doc_id", "n", "gram").agg(
        F.first("n_words").alias("n_words"), F.count(F.lit(1)).alias("c")
    )
    per_n = counts.groupBy("doc_id", "n").agg(
        F.first("n_words").alias("n_words"),
        F.max("c").alias("max_c"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))).alias("dup_c"),
    )
    return per_n.groupBy("doc_id").agg(
        F.first("n_words").alias("n_words"),
        (
            F.max(F.when(F.col("n") == 2, F.col("max_c"))).cast("double")
            * 2
            / F.first("n_words")
        ).alias("top2_frac"),
        (
            F.max(F.when(F.col("n") == 5, F.col("dup_c"))).cast("double")
            * 5
            / F.first("n_words")
        ).alias("dup5_frac"),
    )


def _repetition_sql() -> str:
    return f"""
    WITH words AS (
      SELECT doc_id, {_TOKENS_SQL} AS ws FROM documents
    ), sized AS (
      SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n_words
      FROM words WHERE len(ws) >= {_REP_MIN_WORDS}
    ), g AS (
      SELECT doc_id, n_words, 2 AS n,
             ws[CAST(i AS INTEGER)] || ' ' || ws[CAST(i + 1 AS INTEGER)] AS gram
      FROM sized, LATERAL (SELECT unnest(range(1, len(ws) - 2 + 2)) AS i) t
      UNION ALL
      SELECT doc_id, n_words, 5 AS n,
             array_to_string(list_slice(ws, CAST(i AS INTEGER), CAST(i + 4 AS INTEGER)), ' ') AS gram
      FROM sized, LATERAL (SELECT unnest(range(1, len(ws) - 5 + 2)) AS i) t
    ), counts AS (
      SELECT doc_id, n, gram, MAX(n_words) AS n_words, COUNT(*) AS c
      FROM g GROUP BY doc_id, n, gram
    ), per_n AS (
      SELECT doc_id, n, MAX(n_words) AS n_words, MAX(c) AS max_c,
             SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_c
      FROM counts GROUP BY doc_id, n
    )
    SELECT doc_id,
           MAX(n_words) AS n_words,
           CAST(MAX(CASE WHEN n = 2 THEN max_c END) AS DOUBLE) * 2 / MAX(n_words) AS top2_frac,
           CAST(MAX(CASE WHEN n = 5 THEN dup_c END) AS DOUBLE) * 5 / MAX(n_words) AS dup5_frac
    FROM per_n
    GROUP BY doc_id
    """


@register("q_repetition", sql=_repetition_sql(), survey_ids=("EXT-TEXT",), gate=False)
def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition signals over `documents`
    (``repetition_signals``): most-frequent-2-gram coverage and
    duplicated-5-gram coverage per document, the standard
    machine-generated-text detectors consumed by the quality-filter
    chain.

    Library tier: one exploded stream for both gram sizes, map-side
    combined counts, integer-exact doubles — parity and known-value
    cases in TestRepetitionSignals."""
    return repetition_signals(read_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# EXT-TEXT — PII scrubbing (redaction + audit counts)
# ---------------------------------------------------------------------------
# RE2-and-Java-compatible patterns (no lookaround, no backrefs): both
# engines support \b, \d and bounded repetition identically.
_PII_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"


def pii_scrub(d: DataFrame) -> DataFrame:
    """Regex PII redaction with audit counts: emails → ``[EMAIL]``, then
    IPv4 addresses → ``[IP]``, then NNN-NNN-NNNN / NNN.NNN.NNNN phone
    numbers → ``[PHONE]``, each pattern counted and replaced on the text
    AS LEFT by the previous pattern (order is part of the contract —
    e.g. digits inside an email are gone before the phone pass, and the
    IP pass runs before the phone pass so dotted quads are never
    half-claimed as dotted phone numbers).

    Returns (doc_id, n_emails, n_ips, n_phones, clean_text).

    Scale: three codegen'd regex projections in one scan — zero
    shuffles, zero UDFs, embarrassingly parallel. The patterns are
    RE2/Java-portable by construction (no lookaround), which is what
    makes the DuckDB oracle exact."""
    t0 = F.col("text")
    t1 = F.regexp_replace(t0, _PII_EMAIL, "[EMAIL]")
    t2 = F.regexp_replace(t1, _PII_IP, "[IP]")
    t3 = F.regexp_replace(t2, _PII_PHONE, "[PHONE]")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(t0, F.lit(_PII_EMAIL), 0)).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(t1, F.lit(_PII_IP), 0)).cast("long").alias("n_ips"),
        F.size(F.regexp_extract_all(t2, F.lit(_PII_PHONE), 0)).cast("long").alias("n_phones"),
        t3.alias("clean_text"),
    )


def _pii_sql() -> str:
    email, ip, phone = _PII_EMAIL, _PII_IP, _PII_PHONE
    return f"""
    WITH s AS (
      SELECT doc_id,
             text AS t0,
             regexp_replace(text, '{email}', '[EMAIL]', 'g') AS t1
      FROM documents
    ), s2 AS (
      SELECT doc_id, t0, t1, regexp_replace(t1, '{ip}', '[IP]', 'g') AS t2
      FROM s
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t0, '{email}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t1, '{ip}')) AS BIGINT) AS n_ips,
           CAST(len(regexp_extract_all(t2, '{phone}')) AS BIGINT) AS n_phones,
           regexp_replace(t2, '{phone}', '[PHONE]', 'g') AS clean_text
    FROM s2
    """


@register("q_pii_scrub", sql=_pii_sql(), survey_ids=("EXT-TEXT",), gate=False)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction audit over `documents` (``pii_scrub``). The driver
    fixture contains no PII, so the oracle here pins the no-op path
    (counts 0, text unchanged); the planted-PII path — every pattern,
    the application order, and cross-engine regex agreement — is pinned
    on crafted rows in TestPIIScrub.

    Library tier: three regex projections in one scan, zero shuffles."""
    return pii_scrub(read_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# EXT-TEXT — unigram log-probability scoring (perplexity-style filter)
# ---------------------------------------------------------------------------
def unigram_logprob(d: DataFrame) -> DataFrame:
    """Per-document average unigram log2-probability under the corpus's
    OWN empirical token distribution — the perplexity-style quality
    signal (CCNet / Wenzek et al. 2020 filter by LM perplexity; the
    unigram self-model is its zero-dependency core: documents of
    corpus-typical vocabulary score high, outlier/garbage tokens drag
    the average down). Higher (less negative) = more typical.

    Returns (doc_id, n_tokens, sum_lp_e6, avg_lp) where ``sum_lp_e6``
    is the exact integer sum of per-token micro-unit log-probs and
    ``avg_lp`` = sum_lp_e6 / n_tokens / 1e6.

    Exactness discipline: floating point enters ONLY per distinct
    (count, total) pair — log2(cnt/total) is rounded to an e6 integer
    per token, and everything after is integer arithmetic, so the
    per-document sums are order-independent and bit-equal across
    engines (the same transcendental-rounding contract the solar
    kernels use; a float sum of logs would diverge on accumulation
    order).

    Residual cross-engine risk, quantified: the JVM's StrictMath.log
    and DuckDB's libm log are each correctly-rounded to ≤1 ulp, so
    log2(cnt/tot)·1e6 computed by the two engines can differ by at
    most ~2 ulp ≈ |x|·2⁻⁵²·1e6 ≈ 5e-9 e6-units for |log2| ≤ 25. A
    parity break therefore needs some (cnt, tot) pair to land within
    that band of a .5 rounding boundary — probability ≈ 1e-8 per
    distinct vocab entry under a uniform-fraction model, i.e. one
    expected collision per ~1e8-entry vocab (natural-language vocabs
    are ~1e6). TestUnigramBoundary measures the actual minimum
    boundary distance on the fixture corpus (≫ the 2-ulp band) so a
    fixture drift toward the boundary fails loudly rather than as a
    mystery hash mismatch. Callers needing certainty at any vocab
    size should materialize the (cnt, tot)→lp_e6 lookup from one
    engine and feed it to both.

    Scale: one explode → token-count aggregate (map-side combined,
    Zipf skew absorbed), one scalar total, one hash join of the
    PER-DOCUMENT token counts against the corpus count table, one
    per-doc integer aggregate. The join input is pre-aggregated to
    distinct-per-doc tokens — (doc_id, token, k) — BEFORE the vocab
    join: at corpus scale the naive rendering shuffles one row per
    token OCCURRENCE on a Zipf-skewed key whenever the vocab doesn't
    broadcast, while the pre-aggregate absorbs the skew in a map-side
    combine and shrinks the join input by the corpus's mean
    within-document token multiplicity. sum(lp·k) ≡ per-occurrence
    sum exactly (integer arithmetic — no float reassociation), so the
    result is bit-identical to the per-occurrence oracle rendering."""
    toks = (
        d.where(F.length(F.trim("text")) > 0)
        .select("doc_id", F.explode(_tokens()).alias("token"))
    )
    doc_counts = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("k"))
    counts = doc_counts.groupBy("token").agg(F.sum("k").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("tot"))
    lp_e6 = F.floor(
        F.log2(F.col("cnt").cast("double") / F.col("tot").cast("double"))
        * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("long")
    scored = doc_counts.join(counts, "token").crossJoin(F.broadcast(total)).select(
        "doc_id", "k", lp_e6.alias("lp_e6")
    )
    return scored.groupBy("doc_id").agg(
        F.sum("k").alias("n_tokens"),
        F.sum(F.col("lp_e6") * F.col("k")).alias("sum_lp_e6"),
        (
            F.sum(F.col("lp_e6") * F.col("k")).cast("double")
            / F.sum("k").cast("double")
            / F.lit(1000000.0)
        ).alias("avg_lp"),
    )


def _unigram_sql() -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKENS_SQL}) AS token
      FROM documents WHERE length(trim(text)) > 0
    ), counts AS (
      SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token
    ), total AS (
      SELECT SUM(cnt) AS tot FROM counts
    ), scored AS (
      SELECT t.doc_id,
             CAST(FLOOR(log2(CAST(c.cnt AS DOUBLE) / CAST(tot AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS lp_e6
      FROM toks t JOIN counts c USING (token), total
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           -- DuckDB SUM(BIGINT) widens to HUGEINT, which pandas floats
           -- (the round-2 canonicalizer drift) — cast back
           CAST(SUM(lp_e6) AS BIGINT) AS sum_lp_e6,
           CAST(SUM(lp_e6) AS DOUBLE) / COUNT(*) / 1000000.0 AS avg_lp
    FROM scored
    GROUP BY doc_id
    """


# ---------------------------------------------------------------------------
# EXT-TEXT — language identification (self-trained char-trigram profiles)
# ---------------------------------------------------------------------------
_LANGID_TOPK = 300  # Cavnar-Trenkle profile size (top trigrams per language)


def lang_id_ngram(d: DataFrame) -> DataFrame:
    """Character-trigram language identification — the zero-dependency
    core of the CCNet langid stage (Wenzek et al. 2020 run fastText
    here; the character-n-gram-profile method itself is Cavnar &
    Trenkle 1994, with rank-distance swapped for the same add-one
    smoothed log-probability scoring the unigram quality model uses,
    so the whole thing stays native-column and integer-exact).

    Self-trained: per-language trigram profiles come from the corpus's
    OWN labeled rows (``lang IS NOT NULL``); every document — labeled
    or not — is then scored against every profile and arg-maxed. This
    is the real production shape: label a seed slice, classify the
    rest, then filter on disagreement (``lang_mismatch``).

    Returns (doc_id, lang, lang_pred, best_lp_e6, margin_e6,
    n_trigrams, ascii_e6):

    * ``lang_pred`` — argmax language (tie-break: score DESC, language
      DESC — Spark's struct max and the oracle's window agree exactly);
    * ``best_lp_e6``/``margin_e6`` — winning score and its lead over
      the runner-up (NULL with one profile), integer micro-log2 units;
    * ``ascii_e6`` — printable-ASCII character ratio ×1e6 (the charset
      signal: CJK/Cyrillic documents separate on this column alone).

    Exactness discipline = unigram_logprob's: log2 enters once per
    distinct (cnt, tot+V) pair, is e6-integer rounded, and every
    document aggregate after that is integer arithmetic — order-free
    and engine-neutral (same libm-boundary contract, quantified
    there).

    Scale: the trigram stream is the widest intermediate (~len(text)
    rows/doc — the shingle family's shape); it feeds ONE per-doc-trigram
    partial aggregate and ONE per-language profile aggregate (both
    map-side combined, Zipf skew absorbed). The profile is
    alphabet-bounded (|Σ|³·L rows — broadcast at any corpus size), the
    per-doc × language cross is L-bounded, and the final argmax is a
    tiny struct-max aggregate. No corpus-scale shuffle wider than the
    (doc_id, tg) count table."""
    nrm = F.concat(
        F.lit(" "),
        F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")),
        F.lit(" "),
    )
    base = (
        d.where(F.length(F.trim("text")) > 0)
        .select("doc_id", "lang", nrm.alias("nrm"))
    )
    tgs = base.select(
        "doc_id",
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("nrm") - 2),
                lambda i: F.substring(F.col("nrm"), i, F.lit(3)),
            )
        ).alias("tg"),
    )
    # ONE evaluation of the corpus-wide trigram explode: both consumers
    # (the per-doc count table and the training profile) derive from
    # the same (doc_id, lang, tg) aggregate, so the widest stream in
    # the operator is exploded and map-side-combined once (AQE reuses
    # the exchange) and the profile aggregation's input shrinks from
    # trigram OCCURRENCES to distinct-per-doc trigrams — the same
    # pre-aggregation move as unigram_logprob. Measured at the 10×
    # probe: 11.8× growth → ~6× (tools/scaling_probe.py).
    dtg_full = tgs.groupBy("doc_id", "lang", "tg").agg(
        F.count(F.lit(1)).alias("k")
    )
    dtg = dtg_full.select("doc_id", "tg", "k")
    # Profiles keep each language's TOP-K trigrams (Cavnar-Trenkle's
    # profile truncation, deterministic tie-break) — besides matching
    # the published method, equal-size profiles kill the smoothing
    # artifact where a small training corpus's flatter unseen penalty
    # out-scores a large one on out-of-profile documents.
    raw_train = (
        dtg_full.where(F.col("lang").isNotNull())
        .groupBy(F.col("lang").alias("cl"), "tg")
        .agg(F.sum("k").alias("cnt"))
    )
    w_prof = Window.partitionBy("cl").orderBy(F.col("cnt").desc(), F.col("tg"))
    train = (
        raw_train.withColumn("rk", F.row_number().over(w_prof))
        .where(F.col("rk") <= _LANGID_TOPK)
        .drop("rk")
    )
    tot = train.groupBy("cl").agg(F.sum("cnt").alias("tot"))
    vd = train.agg(F.countDistinct("tg").alias("v"))

    def lp(num, den):
        return F.floor(
            F.log2(num.cast("double") / den.cast("double")) * F.lit(1000000.0)
            + F.lit(0.5)
        ).cast("long")

    profile = (
        train.join(tot, "cl")
        .crossJoin(F.broadcast(vd))
        .select("cl", "tg", lp(F.col("cnt") + 1, F.col("tot") + F.col("v")).alias("lp_e6"))
    )
    unseen = tot.crossJoin(F.broadcast(vd)).select(
        "cl", lp(F.lit(1), F.col("tot") + F.col("v")).alias("unseen_e6")
    )
    known = dtg.join(profile, "tg").groupBy("doc_id", "cl").agg(
        F.sum(F.col("k") * F.col("lp_e6")).alias("s_known"),
        F.sum("k").alias("k_known"),
    )
    doc_tot = base.select(
        "doc_id",
        "lang",
        (F.length("nrm") - 2).cast("long").alias("n_trigrams"),
        F.floor(
            (F.length("nrm") - F.length(F.regexp_replace("nrm", "[ -~]", "")))
            * F.lit(1000000.0)
            / F.length("nrm")
        )
        .cast("long")
        .alias("ascii_e6"),
    )
    scored = (
        doc_tot.crossJoin(F.broadcast(unseen))
        .join(known, ["doc_id", "cl"], "left")
        .select(
            "doc_id",
            "lang",
            "cl",
            "n_trigrams",
            "ascii_e6",
            (
                F.coalesce(F.col("s_known"), F.lit(0))
                + (F.col("n_trigrams") - F.coalesce(F.col("k_known"), F.lit(0)))
                * F.col("unseen_e6")
            ).alias("score_e6"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.first("lang").alias("lang"),
        F.max(F.struct("score_e6", "cl")).alias("_b"),
        F.sort_array(F.collect_list("score_e6"), asc=False).alias("_ss"),
        F.first("n_trigrams").alias("n_trigrams"),
        F.first("ascii_e6").alias("ascii_e6"),
    ).select(
        "doc_id",
        "lang",
        F.col("_b.cl").alias("lang_pred"),
        F.col("_b.score_e6").alias("best_lp_e6"),
        (F.col("_b.score_e6") - F.try_element_at("_ss", F.lit(2))).alias("margin_e6"),
        "n_trigrams",
        "ascii_e6",
    )


def lang_mismatch(d: DataFrame) -> DataFrame:
    """Documents whose predicted language disagrees with the wire tag —
    the CCNet-style drop/requeue set (an unlabeled document never
    mismatches; it has nothing to disagree with)."""
    scored = lang_id_ngram(d)
    return scored.where(
        F.col("lang").isNotNull() & (F.col("lang_pred") != F.col("lang"))
    )


def _langid_sql() -> str:
    return r"""
    WITH base AS (
      SELECT doc_id, lang,
             ' ' || lower(regexp_replace(trim(text), '\s+', ' ', 'g')) || ' ' AS nrm
      FROM documents WHERE length(trim(text)) > 0
    ), tgs AS (
      SELECT doc_id, lang, substr(nrm, CAST(i AS INTEGER), 3) AS tg
      FROM base, LATERAL (SELECT unnest(generate_series(1, length(nrm) - 2)) AS i) t
    ), dtg AS (
      SELECT doc_id, tg, COUNT(*) AS k FROM tgs GROUP BY 1, 2
    ), raw_train AS (
      SELECT lang AS cl, tg, COUNT(*) AS cnt FROM tgs WHERE lang IS NOT NULL GROUP BY 1, 2
    ), train AS (
      SELECT cl, tg, cnt FROM (
        SELECT *, row_number() OVER (PARTITION BY cl ORDER BY cnt DESC, tg) AS rk
        FROM raw_train
      ) WHERE rk <= {topk}
    ), tot AS (
      SELECT cl, SUM(cnt) AS tot FROM train GROUP BY 1
    ), vd AS (
      SELECT COUNT(DISTINCT tg) AS v FROM train
    ), profile AS (
      SELECT cl, tg,
             CAST(FLOOR(log2(CAST(cnt + 1 AS DOUBLE) / CAST(tot + v AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS lp_e6
      FROM train JOIN tot USING (cl), vd
    ), unseen AS (
      SELECT cl,
             CAST(FLOOR(log2(1.0 / CAST(tot + v AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS unseen_e6
      FROM tot, vd
    ), known AS (
      SELECT d.doc_id, p.cl, SUM(d.k * p.lp_e6) AS s_known, SUM(d.k) AS k_known
      FROM dtg d JOIN profile p USING (tg) GROUP BY 1, 2
    ), doc_tot AS (
      SELECT doc_id, lang, CAST(length(nrm) - 2 AS BIGINT) AS n_trigrams,
             CAST(FLOOR((length(nrm) - length(regexp_replace(nrm, '[ -~]', '', 'g'))) * 1000000.0 / length(nrm)) AS BIGINT) AS ascii_e6
      FROM base
    ), scored AS (
      -- CAST: DuckDB SUM(BIGINT) widens to HUGEINT, which pandas
      -- floats (the canonicalizer drift the unigram oracle documents)
      SELECT t.doc_id, t.lang, u.cl, t.n_trigrams, t.ascii_e6,
             CAST(COALESCE(k.s_known, 0)
                  + (t.n_trigrams - COALESCE(k.k_known, 0)) * u.unseen_e6
                  AS BIGINT) AS score_e6
      FROM doc_tot t CROSS JOIN unseen u
      LEFT JOIN known k ON k.doc_id = t.doc_id AND k.cl = u.cl
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score_e6 DESC, cl DESC) AS rk
      FROM scored
    )
    SELECT doc_id,
           MAX(CASE WHEN rk = 1 THEN lang END) AS lang,
           MAX(CASE WHEN rk = 1 THEN cl END) AS lang_pred,
           MAX(CASE WHEN rk = 1 THEN score_e6 END) AS best_lp_e6,
           MAX(CASE WHEN rk = 1 THEN score_e6 END)
             - MAX(CASE WHEN rk = 2 THEN score_e6 END) AS margin_e6,
           MAX(CASE WHEN rk = 1 THEN n_trigrams END) AS n_trigrams,
           MAX(CASE WHEN rk = 1 THEN ascii_e6 END) AS ascii_e6
    FROM ranked GROUP BY doc_id
    """.replace("{topk}", str(_LANGID_TOPK))


@register("q_langid", sql=_langid_sql(), survey_ids=("EXT-TEXT",), gate=False)
def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language identification over `documents` (``lang_id_ngram``):
    self-trained character-trigram profiles, integer micro-log2
    scoring, charset signal, deterministic argmax.

    Library tier: hash-checked against the DuckDB oracle in selfcheck
    and on the hostile corpus (CJK, accents, null lang/text rows)."""
    return lang_id_ngram(read_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# EXT-TEXT — interpolated bigram log-probability (the LM step past unigram)
# ---------------------------------------------------------------------------
_BIGRAM_LAMBDA = 0.9  # weight on the conditional bigram term


def bigram_logprob(d: DataFrame) -> DataFrame:
    """Per-document average INTERPOLATED bigram log2-probability under
    the corpus's own counts — one rung up the CCNet ladder from
    ``unigram_logprob`` (their production scorer is a 5-gram KenLM;
    Jelinek-Mercer interpolation λ·P(w₂|w₁) + (1−λ)·P(w₂) is that
    model family's zero-dependency two-gram core, and the signal
    separates phrase-coherent text from bag-of-frequent-words text the
    unigram model scores identically).

    Returns (doc_id, n_bigrams, sum_lp_e6, avg_lp) over documents with
    ≥ 2 tokens. Exactness discipline = unigram_logprob's: float enters
    once per distinct (c₁₂, c₁, c₂, N) tuple — both engines evaluate
    the identical IEEE expression λ·(c₁₂/c₁) + (1−λ)·(c₂/N), round its
    log2 to an e6 integer, and aggregate in integers (same quantified
    libm-boundary contract).

    Scale: the bigram occurrence stream pre-aggregates to
    distinct-per-doc (w₁, w₂, k) BEFORE any join (the r8 unigram
    lesson); the profile join is ONE join because c₁/c₂/N enrich the
    corpus-bound bigram vocab table, not the occurrence stream."""
    base = d.where(F.length(F.trim("text")) > 0).select("doc_id", _tokens().alias("ws"))
    base = base.where(F.size("ws") >= 2)
    bigrams = base.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("ws", 1, F.size("ws") - 1).alias("w1"),
                F.slice("ws", 2, F.size("ws") - 1).alias("w2"),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    doc_big = bigrams.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("k"))
    c12 = doc_big.groupBy("w1", "w2").agg(F.sum("k").alias("c12"))
    # unigram counts from the SAME stream: c(w1) over bigram positions
    # plus each doc's last token — spelled as plain token counts
    unis = base.select("doc_id", F.explode("ws").alias("w"))
    c_uni = unis.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    total = c_uni.agg(F.sum("c").alias("n_total"))
    prof = (
        c12.join(c_uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(c_uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(total))
    )
    lam = F.lit(_BIGRAM_LAMBDA)
    p = lam * (F.col("c12").cast("double") / F.col("c1").cast("double")) + (
        F.lit(1.0) - lam
    ) * (F.col("c2").cast("double") / F.col("n_total").cast("double"))
    prof = prof.select(
        "w1",
        "w2",
        F.floor(F.log2(p) * F.lit(1000000.0) + F.lit(0.5)).cast("long").alias("lp_e6"),
    )
    scored = doc_big.join(prof, ["w1", "w2"]).groupBy("doc_id").agg(
        F.sum("k").alias("n_bigrams"),
        F.sum(F.col("lp_e6") * F.col("k")).alias("sum_lp_e6"),
        (
            F.sum(F.col("lp_e6") * F.col("k")).cast("double")
            / F.sum("k").cast("double")
            / F.lit(1000000.0)
        ).alias("avg_lp"),
    )
    return scored


def _bigram_sql() -> str:
    lam = repr(_BIGRAM_LAMBDA)
    return f"""
    WITH base AS (
      SELECT doc_id, {_TOKENS_SQL} AS ws FROM documents
      WHERE length(trim(text)) > 0 AND len({_TOKENS_SQL}) >= 2
    ), bigrams AS (
      SELECT doc_id, ws[CAST(i AS INTEGER)] AS w1, ws[CAST(i AS INTEGER) + 1] AS w2
      FROM base, LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i) t
    ), doc_big AS (
      SELECT doc_id, w1, w2, COUNT(*) AS k FROM bigrams GROUP BY 1, 2, 3
    ), c12 AS (
      SELECT w1, w2, CAST(SUM(k) AS BIGINT) AS c12 FROM doc_big GROUP BY 1, 2
    ), unis AS (
      SELECT unnest(ws) AS w FROM base
    ), c_uni AS (
      SELECT w, COUNT(*) AS c FROM unis GROUP BY w
    ), total AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM c_uni
    ), prof AS (
      SELECT c12.w1, c12.w2,
             CAST(FLOOR(log2(
               {lam} * (CAST(c12 AS DOUBLE) / CAST(u1.c AS DOUBLE))
               + (1.0 - {lam}) * (CAST(u2.c AS DOUBLE) / CAST(n_total AS DOUBLE))
             ) * 1000000.0 + 0.5) AS BIGINT) AS lp_e6
      FROM c12
      JOIN c_uni u1 ON u1.w = c12.w1
      JOIN c_uni u2 ON u2.w = c12.w2, total
    )
    SELECT d.doc_id,
           CAST(SUM(d.k) AS BIGINT) AS n_bigrams,
           CAST(SUM(p.lp_e6 * d.k) AS BIGINT) AS sum_lp_e6,
           CAST(SUM(p.lp_e6 * d.k) AS DOUBLE) / SUM(d.k) / 1000000.0 AS avg_lp
    FROM doc_big d JOIN prof p ON p.w1 = d.w1 AND p.w2 = d.w2
    GROUP BY d.doc_id
    """


@register("q_bigram_logprob", sql=_bigram_sql(), survey_ids=("EXT-TEXT",), gate=False)
def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram LM quality scoring over `documents`
    (``bigram_logprob``) — phrase-coherence signal the unigram scorer
    cannot see, under the same integer-exact cross-engine contract."""
    return bigram_logprob(read_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# EXT-TEXT — per-source KL divergence (domain-mixing signal)
# ---------------------------------------------------------------------------
def source_kl(d: DataFrame) -> DataFrame:
    """Per-source KL divergence KL(p_source ‖ p_corpus) over the token
    distributions — the scalar behind data-mixing decisions (how far a
    domain's language sits from the mixture; DoReMi-family reweighting
    and the classic Moore-Lewis domain filter both start from exactly
    this quantity). Low KL = corpus-typical source; high KL = outlier
    domain worth up/down-weighting deliberately.

    Returns (source, n_tokens, n_distinct, kl_e9, kl_bits) — sources
    including NULL (unattributed documents are a stratum too).

    Exactness: each term p_s(w)·log2(p_s(w)/q(w)) is computed once per
    distinct (c_sw, c_s, c_w, N) tuple in identical IEEE double
    arithmetic on both engines, rounded to an e9 integer (KL terms are
    tiny — e9 keeps the sum faithful at vocab scale while int64 holds
    |V|·30e9 comfortably), then summed in integers: order-free and
    engine-neutral. ``kl_bits`` = kl_e9/1e9 is the human rendering.
    KL ≥ 0 up to per-term rounding (±0.5e-9 each).

    Scale: ONE (source, token) map-side-combined aggregate (the only
    corpus-scale shuffle), a vocab-bound join against corpus counts,
    and a sources-bound final sum."""
    toks = (
        d.where(F.length(F.trim("text")) > 0)
        .select("source", F.explode(_tokens()).alias("w"))
    )
    c_sw = toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c_sw"))
    c_s = c_sw.groupBy("source").agg(F.sum("c_sw").alias("c_s"))
    c_w = c_sw.groupBy("w").agg(F.sum("c_sw").alias("c_w"))
    n = c_w.agg(F.sum("c_w").alias("n_total"))
    # null-safe source join: NULL is a real stratum (unattributed
    # documents); a plain equi-join would silently drop it
    cs2 = c_s.withColumnRenamed("source", "_src")
    term = (
        c_sw.join(cs2, F.col("source").eqNullSafe(F.col("_src")))
        .drop("_src")
        .join(c_w, "w")
        .crossJoin(F.broadcast(n))
    )
    p_s = F.col("c_sw").cast("double") / F.col("c_s").cast("double")
    q = F.col("c_w").cast("double") / F.col("n_total").cast("double")
    t_e9 = F.floor(p_s * F.log2(p_s / q) * F.lit(1e9) + F.lit(0.5)).cast("long")
    return (
        term.select("source", t_e9.alias("t"), "c_sw")
        .groupBy("source")
        .agg(
            F.sum("c_sw").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum("t").alias("kl_e9"),
            (F.sum("t").cast("double") / F.lit(1e9)).alias("kl_bits"),
        )
    )


def _source_kl_sql() -> str:
    return f"""
    WITH toks AS (
      SELECT source, unnest({_TOKENS_SQL}) AS w
      FROM documents WHERE length(trim(text)) > 0
    ), c_sw AS (
      SELECT source, w, COUNT(*) AS c_sw FROM toks GROUP BY 1, 2
    ), c_s AS (
      SELECT source, CAST(SUM(c_sw) AS BIGINT) AS c_s FROM c_sw GROUP BY 1
    ), c_w AS (
      SELECT w, CAST(SUM(c_sw) AS BIGINT) AS c_w FROM c_sw GROUP BY 1
    ), n AS (
      SELECT CAST(SUM(c_w) AS BIGINT) AS n_total FROM c_w
    ), term AS (
      SELECT t.source, t.c_sw,
             CAST(FLOOR(
               (CAST(t.c_sw AS DOUBLE) / CAST(s.c_s AS DOUBLE))
               * log2((CAST(t.c_sw AS DOUBLE) / CAST(s.c_s AS DOUBLE))
                      / (CAST(w.c_w AS DOUBLE) / CAST(n_total AS DOUBLE)))
               * 1000000000.0 + 0.5) AS BIGINT) AS t_e9
      FROM c_sw t
      JOIN c_s s ON s.source IS NOT DISTINCT FROM t.source
      JOIN c_w w ON w.w = t.w, n
    )
    SELECT source,
           CAST(SUM(c_sw) AS BIGINT) AS n_tokens,
           COUNT(*) AS n_distinct,
           CAST(SUM(t_e9) AS BIGINT) AS kl_e9,
           CAST(SUM(t_e9) AS DOUBLE) / 1000000000.0 AS kl_bits
    FROM term GROUP BY source
    """


@register("q_source_kl", sql=_source_kl_sql(), survey_ids=("EXT-TEXT",), gate=False)
def q_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing KL table over `documents` (``source_kl``): per
    source, the token-distribution divergence from the corpus mixture,
    integer-exact cross-engine. Feeds source up/down-weighting next to
    ``source_curation_report``'s keep/drop verdicts."""
    return source_kl(read_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# EXT-TEXT / EXT-DEDUP — the end-to-end curation gate as ONE decision table
# ---------------------------------------------------------------------------
def _curated_sql() -> str:
    from w4h_etl_container_spark.plans.corpus import _quality_flags_sql
    from w4h_etl_container_spark.plans.textops import DEDUP_EXACT_SQL

    return f"""
    WITH q AS ({_quality_flags_sql()}),
         dd AS ({DEDUP_EXACT_SQL}),
         li AS ({_langid_sql()})
    SELECT q.doc_id,
           dd.n_copies,
           q.keep AS keep_quality,
           (dd.doc_id = dd.canonical_id) AS is_canonical,
           li.lang,
           li.lang_pred,
           (li.lang IS NULL OR li.lang_pred = li.lang) AS lang_ok,
           (q.keep AND dd.doc_id = dd.canonical_id
             AND (li.lang IS NULL OR li.lang_pred = li.lang)) AS curated
    FROM q
    JOIN dd ON q.doc_id = dd.doc_id
    JOIN li ON q.doc_id = li.doc_id
    """


@register(
    "q_curated_corpus",
    sql=_curated_sql(),
    survey_ids=("EXT-TEXT", "EXT-DEDUP"),
    gate=False,
)
def q_curated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation gate as one per-document decision table —
    the row a real pipeline writes next to its filtered corpus:

    * ``keep_quality`` — every Gopher/C4-family rule passes
      (``quality_flags``; rules-as-data, one QUALITY_RULES dict renders
      both engines);
    * ``is_canonical`` — the document is its exact-dup cluster's
      min-doc_id representative (``q_dedup_exact``'s shared SQL);
    * ``lang_ok`` — the trigram classifier agrees with the wire
      language tag, vacuously true for unlabeled docs
      (``lang_id_ngram``);
    * ``curated`` — the conjunction: the document enters the training
      corpus.

    Universe: documents with non-blank text (the langid stage's
    domain — a whitespace-only doc has no language and fails
    ``too_few_tokens`` anyway).

    Composition discipline: every stage is individually hash-green
    against its own oracle, and THIS query re-renders the same three
    subqueries as CTEs in both engines — so the composed decision is
    exactly as trustworthy as its parts (no re-implementation, no
    drift surface).

    Scale: three 1:1 joins on doc_id over stages that are each one
    scan + one bounded shuffle (profile: zero shuffles; dedup: one
    fingerprint window; langid: the trigram aggregates) — the join
    keys are the natural partitioning, so AQE co-locates them."""
    from w4h_etl_container_spark.plans.textops import q_dedup_exact, quality_flags

    d = read_table(spark, sf_dir, "documents")
    q = quality_flags(d.where(F.length("text") > 0)).select(
        "doc_id", F.col("keep").alias("keep_quality")
    )
    dd = q_dedup_exact(spark, sf_dir).select(
        "doc_id",
        "n_copies",
        (F.col("doc_id") == F.col("canonical_id")).alias("is_canonical"),
    )
    li = lang_id_ngram(d).select("doc_id", "lang", "lang_pred")
    lang_ok = F.col("lang").isNull() | (F.col("lang_pred") == F.col("lang"))
    return (
        q.join(dd, "doc_id")
        .join(li, "doc_id")
        .select(
            "doc_id",
            "n_copies",
            "keep_quality",
            "is_canonical",
            "lang",
            "lang_pred",
            lang_ok.alias("lang_ok"),
            (F.col("keep_quality") & F.col("is_canonical") & lang_ok).alias(
                "curated"
            ),
        )
    )


@register("q_unigram_logprob", sql=_unigram_sql(), survey_ids=("EXT-TEXT",), gate=False)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality scoring over `documents`
    (``unigram_logprob``): per-document average unigram log2-prob under
    the corpus's own token distribution — the quality-filter chain's
    language-model signal without a model dependency.

    Library tier: per-token e6-integer rounding makes the document
    aggregate exact-integer (order-free, engine-neutral); plan = one
    count aggregate + one token join + one per-doc aggregate."""
    return unigram_logprob(read_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Temperature-smoothed source mixing (the multinomial-sampling weights
# of XLM-R / GPT-3 §2.2: w_i ∝ p_i^α with α = 0.5 up-weights the tail
# so small high-quality domains aren't drowned by web crawl)
# ---------------------------------------------------------------------------
MIX_ALPHA_IS_HALF = True  # α = 0.5 — exactly sqrt, which IEEE-754 rounds
# correctly in every conforming engine (unlike pow(x, 0.3), which has no
# correctness guarantee and would need the e6-per-distinct-value contract)


def _source_mix_sql() -> str:
    return f"""
    WITH toks AS (
      SELECT source, CAST(len({_TOKENS_SQL}) AS BIGINT) AS n_tok
      FROM documents WHERE length(trim(text)) > 0
    ), per_source AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS n_tokens
      FROM toks GROUP BY source
    ), total AS (
      SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot FROM per_source
    ), weighted AS (
      SELECT source, n_docs, n_tokens,
             (n_tokens * 1000000) // tot AS p_e6,
             CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE))
                        * 1000000.0 + 0.5) AS BIGINT) AS w_e6
      FROM per_source, total
    ), norm AS (
      SELECT CAST(SUM(w_e6) AS BIGINT) AS sum_w FROM weighted
    )
    SELECT source, n_docs, n_tokens, p_e6, w_e6,
           (w_e6 * 10000) // sum_w AS q_bp
    FROM weighted, norm
    """


@register(
    "q_source_mix",
    sql=_source_mix_sql(),
    survey_ids=("EXT-TEXT",),
    gate=False,
)
def q_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing weights per source: token share p, α=0.5
    temperature-smoothed weight w ∝ √p, and the renormalized sampling
    probability in basis points — the table a corpus-mixing job feeds
    to ``token_budget_sample`` to set per-source budgets.

    Exactness: p_e6 and q_bp are pure integer arithmetic; the ONE
    float step (√p) is IEEE-correctly-rounded in both engines (α=0.5
    is chosen for exactly this — an arbitrary exponent would need the
    per-distinct-value e6 lookup contract), then e6-rounded before the
    integer renormalization, so the basis points are order-free.

    Scale: one projection + one map-side-combined aggregate per
    source, two 1-row scalars — nothing wider than the source
    dimension ever shuffles."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.where(F.length(F.trim("text")) > 0).select(
        "source", F.size(_tokens()).cast("long").alias("n_tok")
    )
    per_source = toks.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("n_tokens")
    )
    total = per_source.agg(F.sum("n_tokens").alias("tot"))
    weighted = per_source.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.expr("n_tokens * 1000000 div tot").alias("p_e6"),
        F.floor(
            F.sqrt(F.col("n_tokens").cast("double") / F.col("tot").cast("double"))
            * F.lit(1000000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("w_e6"),
    )
    norm = weighted.agg(F.sum("w_e6").alias("sum_w"))
    return weighted.crossJoin(F.broadcast(norm)).select(
        "source",
        "n_docs",
        "n_tokens",
        "p_e6",
        "w_e6",
        F.expr("w_e6 * 10000 div sum_w").alias("q_bp"),
    )


# ---------------------------------------------------------------------------
# Text normalization (the pre-dedup canonical form: control strip,
# typographic quote/dash folding, ASCII case folding, whitespace
# collapse — C4/RefinedWeb normalize before fingerprinting so that
# byte-level noise doesn't defeat exact dedup)
# ---------------------------------------------------------------------------
_CTRL_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"
_QUOTES_FROM = "“”‘’–—"
_QUOTES_TO = "\"\"''--"
_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_LOWER = "abcdefghijklmnopqrstuvwxyz"


def _normalize_sql() -> str:
    # the exact same four steps, same order; ASCII-only case fold via
    # translate keeps the oracle exact where lower() would hit
    # locale-dependent unicode case law (İ, ß) between JVM and utf8proc
    step = f"regexp_replace(text, '{_CTRL_RE}', '', 'g')"
    step = f"translate({step}, '{_QUOTES_FROM}', '{_QUOTES_TO.replace(chr(39), chr(39) * 2)}')"
    step = f"translate({step}, '{_UPPER}', '{_LOWER}')"
    step = f"trim(regexp_replace({step}, '\\s+', ' ', 'g'))"
    return f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_raw,
           CAST(length({step}) AS BIGINT) AS n_norm,
           CAST(len(regexp_extract_all(text, '\\s{{2,}}')) AS BIGINT) AS n_ws_runs,
           md5({step}) AS norm_md5
    FROM documents WHERE text IS NOT NULL
    """


@register(
    "q_normalize",
    sql=_normalize_sql(),
    survey_ids=("EXT-TEXT",),
    gate=False,
)
def q_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization per document: strip C0/DEL control
    characters (tab/newline survive into the whitespace collapse),
    fold typographic quotes/dashes to ASCII, ASCII-only case fold
    (``translate`` — full unicode ``lower()`` is locale law that JVM
    and utf8proc disagree on for İ/ß-class characters), collapse
    whitespace runs, trim. Emits before/after lengths, the collapsed
    run count, and the md5 of the canonical form (the dedup key
    ``q_dedup_exact`` would consume).

    Scale: four codegen'd string projections, zero shuffles, zero
    UDFs. The md5 is computed on the UTF-8 bytes in both engines."""
    d = read_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    step = F.regexp_replace(F.col("text"), _CTRL_RE, "")
    step = F.translate(step, _QUOTES_FROM, _QUOTES_TO)
    step = F.translate(step, _UPPER, _LOWER)
    step = F.trim(F.regexp_replace(step, r"\s+", " "))
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_raw"),
        F.length(step).cast("long").alias("n_norm"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\s{2,}"), 0))
        .cast("long")
        .alias("n_ws_runs"),
        F.md5(step.cast("binary")).alias("norm_md5"),
    )


# ---------------------------------------------------------------------------
# Quality deciles: bucket documents by their LM quality score — the
# table a filter-threshold or curriculum schedule is tuned against
# ---------------------------------------------------------------------------
def _quality_deciles_sql() -> str:
    probs = ", ".join(str((i + 1) / 10.0) for i in range(9))
    bucket = " + ".join(f"CAST(avg_lp > c[{i + 1}] AS INT)" for i in range(9))
    return f"""
    WITH u AS ({_unigram_sql()}),
    cuts AS (
      SELECT quantile_cont(avg_lp, [{probs}]) AS c FROM u
    )
    SELECT doc_id, n_tokens, sum_lp_e6, 1 + {bucket} AS q_decile
    FROM u, cuts
    """


@register(
    "q_quality_deciles",
    sql=_quality_deciles_sql(),
    survey_ids=("EXT-TEXT", "AGG-6"),
    gate=False,
)
def q_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile bucketing of the unigram quality score (`q_unigram_logprob`'s
    avg log2-prob): decile 10 = most corpus-typical documents. Buckets
    come from the nine decile CUTOFFS compared per row — the same
    no-global-window discipline as q_rfm; ties at a cutoff share a
    bucket. The compared cells are the exact integers (n_tokens,
    sum_lp_e6) plus the bucket — avg_lp itself stays internal, so no
    raw float crosses the engine boundary here at all.

    Scale: the unigram scorer's existing shape + ONE 1-row cutoff
    aggregate broadcast back; a filter threshold ("drop the bottom
    decile") becomes a pushed-down comparison, not a sort."""
    u = unigram_logprob(read_table(spark, sf_dir, "documents"))
    cuts = u.agg(
        F.expr(
            "percentile(avg_lp, array(" + ", ".join(str((i + 1) / 10.0) for i in range(9)) + "))"
        ).alias("c")
    )
    b = F.lit(1)
    for i in range(9):
        b = b + (F.col("avg_lp") > F.element_at(F.col("c"), i + 1)).cast("int")
    return (
        u.crossJoin(F.broadcast(cuts))
        .select("doc_id", "n_tokens", "sum_lp_e6", b.alias("q_decile"))
    )


# ---------------------------------------------------------------------------
# EXT-DEDUP — exact SUBSTRING-level dedup at variable span length (the
# suffix-array dedup mode of Lee et al. 2022, "Deduplicating Training
# Data Makes Language Models Better", rendered distributed): maximal
# shared token runs between document pairs, found as constant-offset
# CHAINS of matching k-gram hashes and measured EXACTLY. q_span_dedup
# covers the fixed 10-word C4 rule and winnowing covers local
# similarity; this is the remaining mode — variable-length exact
# duplication with per-span extents, the hardest dedup gap the r9
# verdict named.
# ---------------------------------------------------------------------------
_RUN_K = 8  # token k-gram length: runs >= K are found with EXACT extents
_RUN_CAP = 50  # k-gram bucket occupancy cap (quadratic-pair bound)
_MIN_RUN = 20  # report shared runs of at least this many tokens


def shared_runs(
    d: DataFrame, k: int = _RUN_K, cap: int = _RUN_CAP, min_run: int = _MIN_RUN
) -> DataFrame:
    """(doc_a, doc_b, start_a, start_b, span_len): every maximal run of
    ``span_len ≥ min_run`` consecutive tokens shared verbatim between
    two documents, with 0-based token offsets in each.

    Why a suffix array isn't the distributed rendering: the classic
    construction is a global sort of all suffixes — a single data
    structure over the corpus. The same detection decomposes into
    embarrassingly-shuffleable pieces: a token run of length L shared
    at (a@i, b@j) is EXACTLY a chain of L−k+1 consecutive matching
    k-grams at constant offset i−j, so (1) hash every token k-gram
    (60-bit md5-nibble ints — engine-neutral, 8-byte exchange keys),
    (2) invert to per-hash occurrence lists with occupancy in
    [2, cap] (the same quadratic-blowup bound every operator in this
    family carries — boilerplate grams are dropped, never expanded),
    (3) expand in-bucket cross-document occurrence pairs JVM-side,
    (4) group by (pair, offset) and split each group into maximal
    consecutive-position islands with the gaps-and-islands trick
    (pos − row_number is constant exactly within a run), (5) a run of
    m chained k-grams is a shared span of exactly m + k − 1 tokens.

    Exactness contract: spans of length ≥ k are reported with EXACT
    extents (the chain sees every position of the run); shared spans
    shorter than k are invisible (no k-gram covers them) — k is the
    detection resolution, min_run the reporting threshold. The
    occupancy cap has a second-order effect the cap always has in
    this family, stated for honesty: a gram shared by > cap documents
    drops, so a run CONTAINING boilerplate grams loses those chain
    links and reports as fragments (or, under min_run, not at all) —
    boilerplate-heavy passages are q_span_dedup/q_dedup_exact
    territory; this operator's domain is the pairwise-rare shared
    passage. Hash collisions (~n²·2⁻⁶¹ at 60 bits) are the usual
    negligible, engine-identical caveat.

    Scale shape: the inverted index is ONE groupBy on int64 keys with
    map-side combine; posting lists are cap-bounded so the pair
    expansion is O(cap²) per gram worst-case, never corpus-quadratic;
    the island window partitions on (doc_a, doc_b, offset) — bounded
    by the shorter document's length, no global window anywhere. The
    widest exchange ships (long, long, int, int) pair anchors, linear
    in the number of genuinely-shared grams."""
    return _runs_from_grams(_run_grams(d, k), k, cap, min_run)


def shared_runs_fast(
    d: DataFrame, k: int = _RUN_K, cap: int = _RUN_CAP, min_run: int = _MIN_RUN
) -> DataFrame:
    """The PRODUCTION rendering of ``shared_runs``: xxhash64 k-gram
    keys (JVM-native, no hex detour — the ``dedup_exact_fast`` trade)
    over the same back end, so bucket/chain/island semantics cannot
    drift from the oracle-checked path. Result parity with
    ``shared_runs`` is pinned in tests (identical rows — the outputs
    carry no hash, only positions and extents)."""
    return _runs_from_grams(_run_grams(d, k, fast=True), k, cap, min_run)


def _run_grams(d: DataFrame, k: int, fast: bool = False) -> DataFrame:
    """(doc_id, pos, gh): every token k-gram's 0-based position and
    64-bit-int hash — md5-nibble (engine-neutral, oracle path) or
    xxhash64 (production path)."""
    gram = f"array_join(slice(ws, i, {k}), ' ')"
    h = (
        f"xxhash64({gram})"
        if fast
        else f"conv(substring(md5({gram}), 1, 15), 16, 10)"
    )
    toks = d.select("doc_id", _tokens().alias("ws")).where(F.size("ws") >= k)
    return toks.select(
        "doc_id",
        F.posexplode(
            F.expr(f"transform(sequence(1, size(ws) - {k} + 1), i -> {h})")
        ).alias("pos", "ghs"),
    ).select("doc_id", "pos", F.col("ghs").cast("long").alias("gh"))


def _runs_from_grams(grams: DataFrame, k: int, cap: int, min_run: int) -> DataFrame:
    buckets = (
        grams.groupBy("gh")
        .agg(F.sort_array(F.collect_set(F.struct("doc_id", "pos"))).alias("occ"))
        .where((F.size("occ") >= 2) & (F.size("occ") <= cap))
    )
    # occ is sorted by (doc_id, pos), so i < j implies doc_a <= doc_b and
    # the cross-document filter <> is equivalent to strict <
    pairs = buckets.select(
        F.explode(
            F.expr(
                """
                flatten(transform(sequence(0, size(occ) - 2), i ->
                  filter(transform(sequence(i + 1, size(occ) - 1), j ->
                    struct(occ[i].doc_id AS doc_a, occ[i].pos AS pos_a,
                           occ[j].doc_id AS doc_b, occ[j].pos AS pos_b)),
                    p -> p.doc_a <> p.doc_b)))
                """
            )
        ).alias("p")
    ).select("p.doc_a", "p.pos_a", "p.doc_b", "p.pos_b")
    anch = pairs.select(
        "doc_a", "doc_b", (F.col("pos_a") - F.col("pos_b")).alias("offs"), "pos_a"
    )
    w = Window.partitionBy("doc_a", "doc_b", "offs").orderBy("pos_a")
    isl = anch.withColumn("island", F.col("pos_a") - F.row_number().over(w))
    return (
        isl.groupBy("doc_a", "doc_b", "offs", "island")
        .agg(
            F.min("pos_a").alias("start_a"),
            (F.count(F.lit(1)) + F.lit(k - 1)).alias("span_len"),
        )
        .select(
            "doc_a",
            "doc_b",
            "start_a",
            (F.col("start_a") - F.col("offs")).alias("start_b"),
            "span_len",
        )
        .where(F.col("span_len") >= min_run)
    )


def _shared_runs_ctes(
    k: int = _RUN_K, cap: int = _RUN_CAP, min_run: int = _MIN_RUN
) -> str:
    """WITH-body fragment ending at the ``found`` CTE (doc_a, doc_b,
    start_a, start_b, span_len) — shared by the q_shared_runs oracle
    and the q_run_dedup oracle so their chain semantics cannot drift
    (the minhash_cands_ctes pattern)."""
    from w4h_etl_container_spark.plans.textops import _nib_sql

    gh = _nib_sql(f"md5(array_to_string(ws[i:i+{k - 1}], ' '))", 15)
    return f"""toks AS (SELECT doc_id, {_TOKENS_SQL} AS ws FROM documents),
    grams AS (
      SELECT doc_id, i - 1 AS pos, ({gh}) AS gh
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ws) - {k} + 1)) AS i) t
      WHERE len(ws) >= {k}
    ),
    occ AS (SELECT gh FROM grams GROUP BY gh HAVING COUNT(*) BETWEEN 2 AND {cap}),
    pairs AS (
      SELECT a.doc_id AS doc_a, a.pos AS pos_a, b.doc_id AS doc_b, b.pos AS pos_b
      FROM grams a JOIN grams b ON a.gh = b.gh AND a.doc_id < b.doc_id
      JOIN occ kk ON a.gh = kk.gh
    ),
    isl AS (
      SELECT doc_a, doc_b, pos_a - pos_b AS offs, pos_a,
             pos_a - ROW_NUMBER() OVER (
               PARTITION BY doc_a, doc_b, pos_a - pos_b ORDER BY pos_a
             ) AS island
      FROM pairs
    ),
    runs AS (
      SELECT doc_a, doc_b, offs, island,
             MIN(pos_a) AS start_a, COUNT(*) + {k} - 1 AS span_len
      FROM isl GROUP BY 1, 2, 3, 4
    ),
    found AS (
      SELECT doc_a, doc_b, start_a, start_a - offs AS start_b, span_len
      FROM runs WHERE span_len >= {min_run}
    )"""


def _shared_runs_sql(k: int = _RUN_K, cap: int = _RUN_CAP, min_run: int = _MIN_RUN) -> str:
    return f"""
    WITH {_shared_runs_ctes(k, cap, min_run)}
    SELECT doc_a, doc_b, start_a, start_b, span_len FROM found
    """


@register(
    "q_shared_runs",
    sql=_shared_runs_sql(),
    survey_ids=("EXT-DEDUP",),
)
def q_shared_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variable-length exact substring dedup over `documents`
    (``shared_runs``): maximal verbatim token runs ≥ 20 between
    document pairs with exact extents — the Lee et al. 2022 dedup mode
    q_span_dedup's fixed 10-word grid cannot express (a 50-token shared
    passage is ONE row with span_len=50 here, vs up to 5 grid-aligned
    span hits there, and a 19-token run below this threshold is still
    measured exactly by the operator form). The oracle spells the
    identical chain-and-islands arithmetic as a self-join + window;
    boundary semantics (k-resolution visibility, grid-vs-exact
    extents) are pinned in tests/test_curation.py on crafted corpora."""
    return shared_runs(read_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# EXT-DEDUP — the REMOVAL action over shared_runs (Lee et al. 2022 §4:
# delete all but one occurrence of each duplicated substring): clip the
# later document's copy of every reported run and rebuild its text
# ---------------------------------------------------------------------------
def run_dedup(
    d: DataFrame, k: int = _RUN_K, cap: int = _RUN_CAP, min_run: int = _MIN_RUN
) -> DataFrame:
    """(doc_id, n_tokens, n_removed, clean_text): every document with
    the token ranges covered by LATER-document copies of shared runs
    removed (first occurrence wins — doc_a < doc_b keeps doc_a whole,
    the span-dedup convention), text rebuilt from surviving tokens.

    Coverage, not interval algebra: a token is removed iff ANY reported
    run covers it, so overlapping intervals need no merge pass — the
    per-document interval list (bounded by candidate volume, which the
    bucket cap bounds) rides a collect_list into ONE array column and
    an ``exists()`` HOF tests each position during the rebuild. One
    extra exchange beyond shared_runs (the per-doc interval groupBy);
    the rebuild itself is embarrassingly parallel."""
    runs = shared_runs(d, k, cap, min_run)
    # NULL text normalizes to an empty token list (n_tokens 0, clean ''),
    # so every input document appears in the output exactly once —
    # hostile-corpus contract, mirrored by the oracle's COALESCE
    ws = F.coalesce(_tokens(), F.array().cast("array<string>"))
    ivs = (
        runs.select(
            F.col("doc_b").alias("doc_id"),
            F.col("start_b").alias("s"),
            (F.col("start_b") + F.col("span_len")).alias("e"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("s", "e")).alias("ivs"))
    )
    toks = d.select("doc_id", ws.alias("ws"))
    return (
        toks.join(ivs, "doc_id", "left")
        .withColumn(
            "kept",
            # filter's two-arg lambda gives (element, 0-based index) —
            # no positional ws[p] access, so the empty array needs no
            # special case (sequence(0, size-1) would DESCEND on an
            # empty ws: sequence(0, -1) = [0, -1] — hostile finding)
            F.expr(
                "filter(ws, (x, p) ->"
                " ivs IS NULL OR NOT exists(ivs, iv -> p >= iv.s AND p < iv.e))"
            ),
        )
        .select(
            "doc_id",
            F.size("ws").cast("long").alias("n_tokens"),
            (F.size("ws") - F.size("kept")).cast("long").alias("n_removed"),
            F.array_join("kept", " ").alias("clean_text"),
        )
    )


def _run_dedup_sql(
    k: int = _RUN_K, cap: int = _RUN_CAP, min_run: int = _MIN_RUN
) -> str:
    return f"""
    WITH {_shared_runs_ctes(k, cap, min_run)},
    rem AS (
      SELECT DISTINCT doc_b AS doc_id, start_b AS s, start_b + span_len AS e
      FROM found
    ),
    ivmap AS (
      SELECT doc_id, list(s ORDER BY s, e) AS ss, list(e ORDER BY s, e) AS ee
      FROM rem GROUP BY doc_id
    ),
    alltoks AS (SELECT doc_id, COALESCE({_TOKENS_SQL}, []) AS ws FROM documents)
    SELECT doc_id,
           CAST(len(ws) AS BIGINT) AS n_tokens,
           CAST(len(ws) - len(kept) AS BIGINT) AS n_removed,
           COALESCE(array_to_string(list_transform(kept, i -> ws[i]), ' '), '')
             AS clean_text
    FROM (
      SELECT a.doc_id, ws,
             list_filter(range(1, len(ws) + 1), i ->
               ss IS NULL OR len(list_filter(range(1, len(ss) + 1),
                             j -> i - 1 >= ss[j] AND i - 1 < ee[j])) = 0) AS kept
      FROM alltoks a LEFT JOIN ivmap m ON a.doc_id = m.doc_id
    ) x
    """


@register(
    "q_run_dedup",
    sql=_run_dedup_sql(),
    survey_ids=("EXT-DEDUP",),
    gate=False,
)
def q_run_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-dedup as an ACTION (``run_dedup``): documents with
    later-occurrence copies of every ≥20-token shared run clipped and
    text rebuilt — Lee et al. 2022's removal step composed onto
    q_shared_runs' detection (same chain CTEs in the oracle, so the
    two declared queries cannot drift). Spark rebuild is one
    exists()-guarded HOF per document against a broadcastable per-doc
    interval list; every document survives with exact token
    accounting (n_tokens = n_removed + |rebuilt|, pinned in tests)."""
    return run_dedup(read_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# EXT-SAMPLE / EXT-TEXT — mix EXECUTION: the temperature-smoothed
# weights (q_source_mix) applied as per-source token budgets and
# filled deterministically (token_budget_sample_dynamic) — the
# composed "build me a 20k-token corpus at the α=0.5 mix" step
# ---------------------------------------------------------------------------
MIX_BUDGET_TOKENS = 20_000


def _mix_sample_sql(total: int = MIX_BUDGET_TOKENS) -> str:
    bucket = _nib_at("md5('s0' || CAST(doc_id AS VARCHAR))", 1, 6)
    return f"""
    WITH toks AS (
      SELECT doc_id, source, CAST(len({_TOKENS_SQL}) AS BIGINT) AS n_tok
      FROM documents WHERE length(trim(text)) > 0
    ), per_source AS (
      SELECT source, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
      FROM toks GROUP BY source
    ), total AS (
      SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot FROM per_source
    ), weighted AS (
      SELECT source,
             CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE))
                        * 1000000.0 + 0.5) AS BIGINT) AS w_e6
      FROM per_source, total
    ), norm AS (
      SELECT CAST(SUM(w_e6) AS BIGINT) AS sum_w FROM weighted
    ), budgets AS (
      SELECT source, ({total} * ((w_e6 * 10000) // sum_w)) // 10000 AS budget
      FROM weighted, norm
    ), cum AS (
      SELECT t.doc_id, t.source, t.n_tok,
             COALESCE(SUM(t.n_tok) OVER (
               PARTITION BY t.source ORDER BY ({bucket}), t.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS before
      FROM toks t
    )
    SELECT c.doc_id, c.source, c.n_tok
    FROM cum c JOIN budgets b ON c.source = b.source
    WHERE c.before < b.budget
    """


@register(
    "q_mix_sample",
    sql=_mix_sample_sql(),
    survey_ids=("EXT-SAMPLE", "EXT-TEXT"),
    gate=False,
)
def q_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing EXECUTION end-to-end: per-source α=0.5 smoothed
    weights → basis points → integer token budgets out of
    ``MIX_BUDGET_TOKENS`` → deterministic hash-order budget fill
    (``token_budget_sample_dynamic``). The output IS the mixed
    training subset: membership a pure function of (salt, doc_id,
    corpus statistics), each source overshooting its budget by at
    most one document — the q_source_mix table made actionable
    instead of advisory.

    Scale: the weights side is two source-dimensional aggregates and
    two 1-row scalars (all broadcast); the fill is one window sum per
    source — exactly q_budget_sample's shape with the budget CASE map
    replaced by a broadcast join on computed budgets."""
    from w4h_etl_container_spark.operators.sampling import (
        token_budget_sample_dynamic,
    )

    d = read_table(spark, sf_dir, "documents")
    toks = d.where(F.length(F.trim("text")) > 0).select(
        "doc_id", "source", F.size(_tokens()).cast("long").alias("n_tok")
    )
    per_source = toks.groupBy("source").agg(F.sum("n_tok").alias("n_tokens"))
    total = per_source.agg(F.sum("n_tokens").alias("tot"))
    weighted = per_source.crossJoin(F.broadcast(total)).select(
        "source",
        F.floor(
            F.sqrt(F.col("n_tokens").cast("double") / F.col("tot").cast("double"))
            * F.lit(1000000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("w_e6"),
    )
    norm = weighted.agg(F.sum("w_e6").alias("sum_w"))
    budgets = weighted.crossJoin(F.broadcast(norm)).select(
        "source",
        F.expr(
            f"({MIX_BUDGET_TOKENS} * (w_e6 * 10000 div sum_w)) div 10000"
        ).alias("budget"),
    )
    return token_budget_sample_dynamic(
        toks, budgets, "source", "doc_id", "n_tok"
    ).select("doc_id", "source", "n_tok")
