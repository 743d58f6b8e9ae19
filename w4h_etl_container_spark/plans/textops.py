"""Text-analysis and deduplication operators over ``documents``
(SURVEY.md §2.11 / BASELINE.json north star: LLM-training-data pipeline).

Design: everything is native Column expressions (split / explode / md5 /
higher-order array functions) — no Python UDFs — so the same plans run
unchanged against a 100 TB corpus. Oracle-checked hash functions are
md5-based because md5 is bit-identical in both Spark and DuckDB (one
digest per input, sliced into lanes where several hash slots are needed);
the xxhash64 production twins (``dedup_exact_fast``,
``minhash_candidates_fast``) run the same plan shapes on JVM-native
64-bit hashes and are pinned by pytest parity instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from w4h_etl_container_spark.plans.registry import register
from w4h_etl_container_spark.session import parallelize_compute, read_table

# Word tokens: split on whitespace runs after trim. Both engines treat the
# regex identically (Java regex vs RE2 agree on \s+).
_TOKENS_SQL = r"string_split_regex(trim(text), '\s+')"


def _tokens():
    return F.split(F.trim(F.col("text")), r"\s+")


def _nib_sql(expr: str, n_hex: int) -> str:
    """DuckDB hex→int nibble arithmetic over the first ``n_hex`` hex
    chars of ``expr`` (DuckDB has no hex→int builtin; the Spark twin is
    ``conv(substring(..., 1, n_hex), 16, 10)`` — same integer by
    construction). Shared rendering with the winnow/sampling oracles."""
    return " + ".join(
        f"(instr('0123456789abcdef', substr({expr}, {p + 1}, 1)) - 1) * {16 ** (n_hex - 1 - p)}"
        for p in range(n_hex)
    )


# ---------------------------------------------------------------------------
# text profiling: token stats + quality scores + language ID in one scan
# ---------------------------------------------------------------------------
# Marker WORDS, counted by whitespace-token membership (after lowering
# and stripping non-alphanumeric edges) — NOT by `\b`-anchored regex:
# Java's \b treats accented letters as word characters while RE2's \b is
# ASCII-only, so boundary-anchored counting diverges between the engines
# on any non-ASCII text (hostile-corpus finding: RE2 sees `\band\b`
# INSIDE "ñandú"). Token membership is engine-neutral by construction
# and also the more faithful rendering of what language-ID actually
# scores (word occurrences, not substring boundaries).
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
}
_STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "to", "in")
# anchored edge-strip (no \b anywhere): lower + drop non-alphanumeric
# ASCII runs at token edges, so "the," counts and "café" never matches
_EDGE_STRIP = r"^[^a-z0-9]+|[^a-z0-9]+$"


def _sql_word_count(words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return (
        f"len(list_filter({_TOKENS_SQL}, t -> list_contains([{lst}], "
        f"regexp_replace(lower(t), '{_EDGE_STRIP}', '', 'g'))))"
    )


def _profile_sql() -> str:
    scores = ",\n           ".join(
        f"CAST({_sql_word_count(ws)} AS BIGINT) AS score_{lang}"
        for lang, ws in _LANG_MARKERS.items()
    )
    return f"""
    WITH scored AS (
      SELECT doc_id, lang,
           CAST(len({_TOKENS_SQL}) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+\\d|\\d+')) AS BIGINT) AS n_numericish,
           CAST(length(text) AS DOUBLE) / CAST(len({_TOKENS_SQL}) AS DOUBLE) AS avg_token_len,
           CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
             / CAST(length(text) AS DOUBLE) AS punct_ratio,
           CAST({_sql_word_count(_STOPWORDS)} AS DOUBLE)
             / CAST(len({_TOKENS_SQL}) AS DOUBLE) AS stopword_ratio,
           {scores}
      FROM documents
      WHERE length(text) > 0
    )
    SELECT doc_id, lang, n_tokens, n_chars, n_numericish,
           avg_token_len, punct_ratio, stopword_ratio,
           score_en, score_es, score_de, score_fr,
           CASE
             WHEN score_en >= score_es AND score_en >= score_de AND score_en >= score_fr THEN 'en'
             WHEN score_es >= score_de AND score_es >= score_fr THEN 'es'
             WHEN score_de >= score_fr THEN 'de'
             ELSE 'fr'
           END AS lang_pred
    FROM scored
    """


@register(
    "q_text_profile",
    sql=_profile_sql(),
    survey_ids=("EXT-TEXT",),
    gate=False,  # round 15: ceded its slot to q_mtable_evolution —
    # EXT-TEXT keeps gate twins q_token_vocab, q_chunks, q_bm25
)
def q_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-document text-analysis profile in ONE scan — exactly how a
    corpus pipeline runs it (each document is read once, every cheap
    heuristic comes out together):

    * token counting — whitespace tokenizer + numeric-ish token tally
      (the BPE-precursor stats);
    * quality scoring — length, mean token length, punctuation density,
      stopword ratio (exact-integer counts divided as doubles →
      bit-equal across engines);
    * language ID — stopword-marker counts per language with a
      deterministic priority arg-max (a real pipeline swaps in character
      n-gram profiles; the operator shape — score vector + arg-max — is
      identical).

    Pure per-row expressions: embarrassingly parallel, scan-bound at
    100 TB, zero shuffles."""
    d = read_table(spark, sf_dir, "documents").where(F.length("text") > 0)
    return text_profile(d)


def text_profile(d: DataFrame) -> DataFrame:
    """Library form of the profile (the declared query body — shared so
    the quality-filter chain composes on the exact oracle-checked
    expressions rather than a drifting copy)."""
    n_tok = F.size(_tokens()).cast("double")
    n_chr = F.length("text").cast("double")

    def word_count(words: tuple[str, ...]):
        vocab = F.array(*[F.lit(w) for w in words])
        return F.size(
            F.filter(
                _tokens(),
                lambda t: F.array_contains(
                    vocab, F.regexp_replace(F.lower(t), _EDGE_STRIP, "")
                ),
            )
        )

    scores = {lang: word_count(ws).cast("long") for lang, ws in _LANG_MARKERS.items()}
    df = d.select(
        "doc_id",
        "lang",
        n_tok.cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        # idx=0 (whole match) is REQUIRED on group-free patterns: the
        # Spark default idx=1 raises REGEX_GROUP_INDEX on the first row
        # that actually matches (latent on digit-free fixture text)
        F.size(F.regexp_extract_all("text", F.lit(r"[a-zA-Z]+\d|\d+"), 0)).cast("long").alias("n_numericish"),
        (n_chr / n_tok).alias("avg_token_len"),
        (F.size(F.regexp_extract_all("text", F.lit(r"[.,;:!?]"), 0)).cast("double") / n_chr).alias(
            "punct_ratio"
        ),
        (word_count(_STOPWORDS).cast("double") / n_tok).alias("stopword_ratio"),
        *[scores[l].alias(f"score_{l}") for l in _LANG_MARKERS],
    )
    pred = (
        F.when(
            (F.col("score_en") >= F.col("score_es"))
            & (F.col("score_en") >= F.col("score_de"))
            & (F.col("score_en") >= F.col("score_fr")),
            F.lit("en"),
        )
        .when(
            (F.col("score_es") >= F.col("score_de")) & (F.col("score_es") >= F.col("score_fr")),
            F.lit("es"),
        )
        .when(F.col("score_de") >= F.col("score_fr"), F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return df.withColumn("lang_pred", pred)


# ---------------------------------------------------------------------------
# exact deduplication (content fingerprint → per-doc canonical mapping)
# ---------------------------------------------------------------------------
# One copy of the oracle SQL: the gate query AND the round-8 curated-corpus
# composition both consume it, so the fingerprint definition cannot drift.
DEDUP_EXACT_SQL = r"""
    SELECT doc_id,
           fingerprint,
           min(doc_id) OVER (PARTITION BY fingerprint) AS canonical_id,
           COUNT(*) OVER (PARTITION BY fingerprint) AS n_copies
    FROM (
      SELECT doc_id,
             md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fingerprint
      FROM documents
    )
    """


@register(
    "q_dedup_exact",
    sql=DEDUP_EXACT_SQL,
    survey_ids=("EXT-DEDUP",),
    gate=False,  # round 15: ceded its slot to q_mtable_checks — the
    # longest-soaked EXT-DEDUP entry; seven EXT-DEDUP gate twins remain
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup, per-document view: content fingerprint (md5 of
    whitespace-normalized lowercased text — engine-neutral; Spark-side
    production swaps in xxhash64, 1 line) plus each document's canonical
    representative = the smallest doc_id sharing its fingerprint
    (deterministic — ``dropDuplicates`` keeps an arbitrary row, so the
    engine uses min-over-fingerprint instead). ``doc_id =
    canonical_id`` selects survivors; the rest are the drop list — the
    actionable dedup output.

    Scale: one shuffle on the 16-byte fingerprint (the window and any
    follow-up aggregate share it); fingerprint groups are tiny so the
    window state is bounded."""
    d = read_table(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    w = Window.partitionBy("fingerprint")
    return (
        d.select("doc_id", F.md5(norm).alias("fingerprint"))
        .withColumn("canonical_id", F.min("doc_id").over(w))
        .withColumn("n_copies", F.count(F.lit(1)).over(w))
    )


# ---------------------------------------------------------------------------
# EXT-DEDUP — incremental dedup (new batch vs corpus history)
# ---------------------------------------------------------------------------
def content_fingerprints(d: DataFrame) -> DataFrame:
    """(doc_id, fingerprint) — the exact-dedup content key, factored out
    so batch and history sides cannot drift."""
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    return d.select("doc_id", F.md5(norm).alias("fingerprint"))


def incremental_dedup(batch: DataFrame, history_fp: DataFrame) -> DataFrame:
    """Deduplicate a NEW document batch against corpus history — the
    shape a continuously-ingesting 100 TB pipeline actually runs: the
    already-curated corpus is never recomputed; only its fingerprint
    set meets the incoming batch.

    ``batch``: documents (doc_id, text, …); ``history_fp``: one column
    ``fingerprint`` (the running store the job appends survivors to).

    Returns per-batch-document verdicts: (doc_id, fingerprint,
    dup_vs_history, dup_in_batch, keep) with keep = not seen before
    AND first (min doc_id) among in-batch copies.

    Scale: ONE shuffle on the 16-byte fingerprint serves both the
    in-batch window and the history join (same key); the history side
    arrives pre-distinct and joins as a hash join — at 10^12-doc
    history that side is a bucketed/Bloom-backed table, and the LEFT
    join here is exactly the probe the storage layer optimizes. No
    batch-vs-batch or history-vs-history work ever happens."""
    fp = content_fingerprints(batch)
    w = Window.partitionBy("fingerprint")
    flagged = fp.withColumn("_first", F.min("doc_id").over(w))
    hist = history_fp.select("fingerprint").distinct().withColumn(
        "_seen", F.lit(True)
    )
    out = (
        flagged.join(hist, "fingerprint", "left")
        .select(
            "doc_id",
            "fingerprint",
            F.coalesce(F.col("_seen"), F.lit(False)).alias("dup_vs_history"),
            (F.col("doc_id") != F.col("_first")).alias("dup_in_batch"),
        )
        .withColumn(
            "keep", ~F.col("dup_vs_history") & ~F.col("dup_in_batch")
        )
    )
    return out


_INC_SPLIT = 2  # fixture split: even doc_ids play "history", odd "new batch"


def _incremental_sql() -> str:
    return rf"""
    WITH fp AS (
      SELECT doc_id,
             md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fingerprint
      FROM documents
    ), hist AS (
      SELECT DISTINCT fingerprint FROM fp WHERE doc_id % {_INC_SPLIT} = 0
    ), batch AS (
      SELECT doc_id, fingerprint,
             min(doc_id) OVER (PARTITION BY fingerprint) AS first_id
      FROM fp WHERE doc_id % {_INC_SPLIT} = 1
    )
    SELECT b.doc_id, b.fingerprint,
           (h.fingerprint IS NOT NULL) AS dup_vs_history,
           (b.doc_id <> b.first_id) AS dup_in_batch,
           (h.fingerprint IS NULL AND b.doc_id = b.first_id) AS keep
    FROM batch b LEFT JOIN hist h ON h.fingerprint = b.fingerprint
    """


@register("q_incremental_dedup", sql=_incremental_sql(), survey_ids=("EXT-DEDUP",))
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup under the hash oracle: the fixture splits by
    doc_id parity — even ids play the already-ingested history, odd ids
    the incoming batch (``incremental_dedup``). Library tier; the
    operational loop (append survivors' fingerprints back to history)
    is the one-line consumer of ``keep``."""
    d = read_table(spark, sf_dir, "documents")
    batch = d.where(F.col("doc_id") % _INC_SPLIT == 1)
    history = content_fingerprints(d.where(F.col("doc_id") % _INC_SPLIT == 0))
    return incremental_dedup(batch, history.select("fingerprint"))


# ---------------------------------------------------------------------------
# MinHash + LSH near-duplicate candidates
# ---------------------------------------------------------------------------
_N_HASHES = 8  # 4 bands × 2 rows
_N_BANDS = 4
# Bucket occupancy cap: a (band, bandkey) bucket with more than this many
# documents (boilerplate-heavy corpora) would expand quadratically; capped
# buckets are dropped entirely — candidates lost there reappear via the
# doc pair's OTHER bands (the whole point of banding). Enforced in the
# plan AND the oracle, exactly like the shingle _DF_CAP.
_BUCKET_CAP = 64


def minhash_cands_ctes() -> str:
    """WITH-body fragment ending at the ``cands`` CTE (distinct candidate
    (doc_a, doc_b) pairs) — shared by the q_minhash_lsh oracle here and
    the q_dedup_survivors oracle (plans/corpus.py), so the two oracles'
    candidate semantics cannot drift."""
    # one md5 per (doc, shingle); signature slot i = min over the 4-hex-char
    # slice [4i, 4i+4) — lexicographic min on hex == numeric min on the
    # 16-bit value, and both engines slice the identical digest
    sig_cols = ",\n             ".join(
        f"min(substr(h, {4 * i + 1}, 4)) AS h{i}" for i in range(_N_HASHES)
    )
    band_selects = "\n      UNION ALL\n      ".join(
        f"SELECT doc_id, {b} AS band, h{2*b} || h{2*b+1} AS bkey FROM sigs"
        for b in range(_N_BANDS)
    )
    return f"""words AS (
      SELECT doc_id, {_TOKENS_SQL} AS ws FROM documents
    ), shingles AS (
      SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
      FROM words, LATERAL (SELECT unnest(generate_series(1, len(ws) - 2)) AS i) t
    ), sigs AS (
      SELECT doc_id,
             {sig_cols}
      FROM (SELECT doc_id, md5(sh) AS h FROM shingles) GROUP BY doc_id
    ), bands AS (
      {band_selects}
    ), buckets AS (
      SELECT band, bkey FROM bands GROUP BY band, bkey
      HAVING COUNT(*) >= 2 AND COUNT(*) <= {_BUCKET_CAP}
    ), cands AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
      JOIN buckets k ON a.band = k.band AND a.bkey = k.bkey
    )"""


def _minhash_sql() -> str:
    return f"""
    WITH {minhash_cands_ctes()}
    SELECT doc_a, doc_b,
           levenshtein(substr(da.text, 1, 30), substr(db.text, 1, 30)) AS prefix_editdist
    FROM cands
    JOIN documents da ON da.doc_id = doc_a
    JOIN documents db ON db.doc_id = doc_b
    """


def dedup_exact_fast(d: DataFrame) -> DataFrame:
    """The PRODUCTION rendering of exact dedup: xxhash64 fingerprint
    (JVM-native, ~10× faster than md5's hex string path, 8-byte key
    instead of 32) — same normalize → fingerprint → min-over-group plan
    as the declared q_dedup_exact, which keeps md5 only because the
    oracle needs an engine-neutral hash. Pinned equivalent in tests:
    identical group structure (same canonical sets), different key
    encoding."""
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    w = Window.partitionBy("fingerprint")
    return (
        d.select("doc_id", F.xxhash64(norm).alias("fingerprint"))
        .withColumn("canonical_id", F.min("doc_id").over(w))
        .withColumn("n_copies", F.count(F.lit(1)).over(w))
    )


def _shingle_sets(d: DataFrame) -> DataFrame:
    """Word-trigram shingle occurrences per document — the shared front
    end of every near-dup operator (MinHash slow/fast, n-gram Jaccard):
    one tokenize → higher-order-function shingling → explode.

    Deliberately NOT deduplicated: every consumer is
    duplicate-insensitive (MinHash signatures are min-aggregates;
    Jaccard posting lists are ``collect_set``), so the set semantics the
    oracle spells with SELECT DISTINCT hold while the engine skips the
    dedup's full-width exchange — each pipeline pays ONE shuffle (its
    own aggregation) instead of two. At 100 TB the dropped shuffle is
    the widest intermediate in the whole dedup family."""
    words = d.select("doc_id", _tokens().alias("ws"))
    return words.where(F.size("ws") >= 3).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("ws") - 3),
                lambda i: F.concat_ws(" ", F.col("ws")[i], F.col("ws")[i + 1], F.col("ws")[i + 2]),
            )
        ).alias("sh"),
    )


# In-bucket pair expansion over a sorted doc-id array: all (i < j) pairs,
# JVM-side, no self-join (a self-join would re-evaluate the whole
# shingle→signature subtree on both sides). The pair is packed into ONE
# 64-bit word (doc_a in the high half) instead of a struct: the
# downstream distinct/groupBy then shuffles and hashes a single long —
# measured 23% off the Jaccard pair aggregation. Contract: doc ids fit
# 31 bits (the id-compaction a corpus-scale dedup pipeline maintains
# anyway — 2^31 docs ≈ 50 KB/doc at 100 TB); swap back to a
# struct(x, y) expansion for wider id spaces.
_PAIR_EXPAND = (
    "flatten(transform(ds, (x, i) -> "
    "transform(slice(ds, i + 2, size(ds) - i - 1), y -> shiftleft(x, 32) + y)))"
)



def _unpack_pairs(df: DataFrame, pk: str = "pk") -> DataFrame:
    """Unpack the 64-bit pair key into (doc_a, doc_b) columns."""
    return df.select(
        F.shiftright(pk, 32).alias("doc_a"),
        F.expr(f"{pk} & 4294967295").alias("doc_b"),
        *[c for c in df.columns if c != pk],
    )


def _banded_pairs(
    sigs: DataFrame, n_hashes: int, n_bands: int, bucket_cap: int, bkey_expr
) -> DataFrame:
    """Shared LSH back end (one copy for the md5 and xxhash64 front ends,
    so bucket-cap semantics cannot drift between them): signature columns
    ``h0..h{n-1}`` → ``stack`` into (band, bkey) rows in one projection →
    per-(band, bkey) sorted doc sets with occupancy in [2, bucket_cap] →
    in-bucket pair expansion → distinct (doc_a, doc_b). ``bkey_expr``
    renders a band's slot columns into its key SQL (hex concat for md5
    slices; ','-joined decimal for xxhash64 lanes)."""
    rows_per_band = n_hashes // n_bands
    assert rows_per_band * n_bands == n_hashes
    stack_args = ", ".join(
        f"{b}L, {bkey_expr([f'h{b * rows_per_band + r}' for r in range(rows_per_band)])}"
        for b in range(n_bands)
    )
    bands = sigs.selectExpr("doc_id", f"stack({n_bands}, {stack_args}) AS (band, bkey)")
    buckets = (
        bands.groupBy("band", "bkey")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ds"))
        .where((F.size("ds") >= 2) & (F.size("ds") <= bucket_cap))
    )
    return _unpack_pairs(
        buckets.select(F.explode(F.expr(_PAIR_EXPAND)).alias("pk")).distinct()
    )


def minhash_candidates(
    d: DataFrame,
    n_hashes: int = _N_HASHES,
    n_bands: int = _N_BANDS,
    bucket_cap: int = _BUCKET_CAP,
) -> DataFrame:
    """Parameterized MinHash+LSH candidate generator: word 3-gram
    shingles → ``n_hashes`` MinHash signatures → ``n_bands`` bands of
    ``n_hashes // n_bands`` → per-(band, bucket) doc sets (occupancy
    between 2 and ``bucket_cap``) → in-bucket pair expansion → distinct
    (doc_a, doc_b) pairs. Production scale swaps 8/4 for 128/16 via
    ``minhash_candidates_fast`` (seeded xxhash64) without changing the
    plan shape; fewer rows per band → higher recall (candidates at r
    rows/band are a superset of those at any multiple of r — the S-curve
    lever, pinned in tests).

    Plan shape: ONE md5 per distinct (doc, shingle) — signature slot i
    is the min over the digest's 4-hex-char slice [4i, 4i+4)
    (lexicographic min on hex == numeric min on the 16-bit value; both
    engines slice the identical digest), so the hash cost is 1/n_hashes
    of the naive per-slot rehash. Limit of the slice trick: 16-bit lanes
    saturate on very shingle-heavy documents (as a doc's shingle count
    approaches 2^16 every lane's min tends to 0, degenerating ALL its
    band keys at once, and pairs lost to the bucket cap then have no
    distinct other band to reappear in) — large-document corpora belong
    on ``minhash_candidates_fast``'s 64-bit lanes, where saturation
    needs ~2^64 shingles. Shared back end ``_banded_pairs`` caps bucket
    occupancy (enforced here AND in the oracle): per-bucket pair blowup
    is quadratic, so a boilerplate-heavy corpus can't detonate one
    bucket, and true near-dups dropped there still pair in their other,
    less-common bands."""
    assert 4 * n_hashes <= 32, "slice-derived signatures need n_hashes ≤ 8; use the xxhash64 variant"
    # slots as 16-bit INTEGERS, not 4-char hex strings (r10): each pair
    # of slots rides one conv() of an 8-hex-char digest slice, split by
    # shift/mod — numeric min over a fixed-width hex slice is the same
    # order as lexicographic min (the oracle's min(substr(...))), the
    # aggregation state shrinks from 8 strings to 8 ints, and the band
    # keys downstream group on ints (bucket keys are engine-INTERNAL —
    # only the resulting pairs cross to the oracle, so the two engines
    # may key their buckets differently as long as the grouping is
    # equivalent, which slot-value identity guarantees; slot equality
    # vs the hex rendering is pinned in tests). Measured: sigs stage
    # 0.97 → 0.83 s at sf0.1.
    hashed = _shingle_sets(d).select("doc_id", F.md5("sh").alias("h"))
    words = hashed.select(
        "doc_id",
        *[
            F.conv(F.substring("h", 8 * g + 1, 8), 16, 10)
            .cast("long")
            .alias(f"w{g}")
            for g in range((n_hashes + 1) // 2)
        ],
    )
    aggs = []
    for i in range(n_hashes):
        g, hi = divmod(i, 2)
        slot = (
            F.shiftright(F.col(f"w{g}"), 16) if hi == 0 else F.col(f"w{g}") % 65536
        )
        aggs.append(F.min(slot.cast("int")).alias(f"h{i}"))
    sigs = words.groupBy("doc_id").agg(*aggs)
    return _banded_pairs(
        sigs, n_hashes, n_bands, bucket_cap, lambda slots: f"concat_ws(',', {', '.join(slots)})"
    )


def minhash_candidates_fast(
    d: DataFrame,
    n_hashes: int = 128,
    n_bands: int = 16,
    bucket_cap: int = _BUCKET_CAP,
) -> DataFrame:
    """The PRODUCTION MinHash path: ``n_hashes`` seeded xxhash64 slots
    (JVM-native 64-bit lanes, no hex strings — each slot hashes (seed_i,
    shingle) in one pass) at full 128/16 scale, feeding the same
    ``_banded_pairs`` back end as the oracle-checked
    ``minhash_candidates``. xxhash64 has no engine-neutral DuckDB twin,
    so this variant is pinned by pytest recall-parity on planted
    near-dups instead of the hash gate
    (tests/test_operators.py::TestMinHashFastPath)."""
    sigs = _shingle_sets(d).groupBy("doc_id").agg(
        *[F.min(F.xxhash64(F.lit(i), F.col("sh"))).alias(f"h{i}") for i in range(n_hashes)]
    )
    return _banded_pairs(
        sigs, n_hashes, n_bands, bucket_cap, lambda slots: f"concat_ws(',', {', '.join(slots)})"
    )


@register("q_minhash_lsh", sql=_minhash_sql(), survey_ids=("EXT-DEDUP",))
def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates WITH the fuzzy-verify stage: word
    3-gram shingles → ONE md5 per shingle fanned into 8 slice-derived
    MinHash signatures (engine-neutral) → 4 bands of 2 → capped
    (band, bandkey) buckets → distinct candidate pairs → Levenshtein
    distance between the pair's 30-char prefixes (the O(len²)
    exact-verification primitive, run ONLY on candidate pairs — never
    the cross product; both engines implement the same DP).

    Scale: the classic linear-in-corpus shape — shingling and signature
    aggregation are one groupBy(doc) pass; candidates come only from
    same-bucket pairs with bucket occupancy capped at 64 (= _BUCKET_CAP;
    never n², even on boilerplate corpora); the verify joins the tiny
    candidate set back to documents (broadcast of the pairs at real
    scale). Production swaps to 128 hashes / 16 bands of seeded xxhash64
    via ``minhash_candidates_fast`` — same plan shape, pytest
    recall-parity instead of the SQL oracle.
    """
    d = read_table(spark, sf_dir, "documents")
    # per-shingle md5 is kernel-grade compute on a one-split input —
    # spread the signature stage (same trade as q_winnow; measured
    # 1.06 → 0.67 s for the candidate subtree at sf0.1)
    cands = minhash_candidates(parallelize_compute(d, key="doc_id"), _N_HASHES, _N_BANDS)
    da = d.select(F.col("doc_id").alias("da_id"), F.substring("text", 1, 30).alias("pa"))
    db = d.select(F.col("doc_id").alias("db_id"), F.substring("text", 1, 30).alias("pb"))
    return (
        cands.join(da, F.col("doc_a") == F.col("da_id"))
        .join(db, F.col("doc_b") == F.col("db_id"))
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("pa", "pb").cast("long").alias("prefix_editdist"),
        )
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard similarity (verification pass for candidate pairs)
# ---------------------------------------------------------------------------
_DF_CAP = 100  # drop shingles present in more than this many documents

# below this much LOCAL scanned input, re-evaluating the shingle subtree
# beats materializing the posting table (see _jaccard_from_shingles)
_BARRIER_MIN_BYTES = 64 << 20


def _small_local_scan(df: DataFrame) -> bool:
    """True iff every scan leaf under ``df`` is a local file and their
    total size is under ``_BARRIER_MIN_BYTES``. Non-local URIs (object
    stores) and any stat failure report False — unknown size defaults
    to the barrier, the safe direction at scale."""
    import os
    from urllib.parse import urlparse

    try:
        files = df.inputFiles()
        total = 0
        for f in files:
            u = urlparse(f)
            if u.scheme not in ("", "file"):
                return False
            total += os.path.getsize(u.path)
        return total < _BARRIER_MIN_BYTES
    except Exception:
        return False


@register(
    "q_ngram_jaccard",
    sql=f"""
    WITH words AS (
      SELECT doc_id, {_TOKENS_SQL} AS ws FROM documents
    ), hashed AS (
      SELECT DISTINCT doc_id,
             substr(md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]), 1, 15) AS h
      FROM words, LATERAL (SELECT unnest(generate_series(1, len(ws) - 2)) AS i) t
    ), all_shingles AS (
      SELECT doc_id, ({_nib_sql('h', 15)}) AS sh FROM hashed
    ), shingles AS (
      SELECT doc_id, sh FROM (
        SELECT doc_id, sh, COUNT(*) OVER (PARTITION BY sh) AS df FROM all_shingles
      ) WHERE df <= {_DF_CAP}
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id
    ), common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM shingles a JOIN shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(n_common AS DOUBLE) /
             CAST(sa.n + sb.n - n_common AS DOUBLE) AS jaccard,
           n_common
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / CAST(sa.n + sb.n - n_common AS DOUBLE) >= 0.1
    """,
    survey_ids=("EXT-DEDUP",),
    gate=False,
)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-trigram Jaccard similarity for pairs sharing ≥1 (rare) shingle,
    kept at ≥ 0.1 — the exact verification stage behind MinHash candidates.

    Scale: the inverted index materializes only pairs that actually share
    a shingle, not n² — one groupBy(sh) builds the posting lists, whose
    size IS the document frequency, so shingles with df > 100 (_DF_CAP) are
    dropped by a length filter (on this corpus the cap cuts 36M to ~1M
    candidate pairs; Jaccard is then computed on the capped sets
    consistently) and per-shingle pairs expand JVM-side from the list —
    hot-shingle blowup is quadratic per posting list, which the cap
    bounds. No self-join, so the shingle subtree is never re-evaluated.

    Volume asymptote (measured, BENCH_10X r13): the pair exchange is
    the dominant stage and grows ~quadratically while posting-list
    occupancy approaches the DF cap — the vs-oracle ratio transiently
    RISES 1.0→1.7 between 1× and 10×. Past the cap the over-occupied
    shingles drop and the pair volume flattens: at 100× Spark measures
    ~0.2× the embedded oracle (8.5 s vs 42 s), absolutely FASTER than
    its own 10× wall. The cap is the self-limiting mechanism, not a
    lost-coverage knob: dedup candidates above the cap are exactly the
    boilerplate shingles MinHash banding also saturates on.

    Since round 7 the gate rendering keys the index on 60-bit md5-nibble
    integers — ``conv(substring(md5(sh), 1, 15), 16, 10)`` / the oracle's
    instr() arithmetic, the same engine-neutral hex→int both the winnow
    and sampling oracles pin — so the widest exchange in the plan (the
    posting-list groupBy) ships 8-byte longs instead of ~25-byte shingle
    strings. Collision risk at 60 bits is n²·2⁻⁶¹ — absent at any
    realistic shingle count, and identical in both engines anyway (same
    md5 prefix). ``ngram_jaccard_fast`` remains the pure-production twin
    (xxhash64, no hex detour), result-parity-pinned in pytest."""
    d = read_table(spark, sf_dir, "documents")
    # per-shingle md5 over a one-split fixture scan is kernel-grade
    # compute — spread it (guarded; no-op once the scan has real splits)
    keyed = _shingle_sets(parallelize_compute(d, key="doc_id")).select(
        "doc_id", F.conv(F.substring(F.md5("sh"), 1, 15), 16, 10).cast("long").alias("sh")
    )
    # inverted index in ONE groupBy(sh): the posting list's size IS the
    # document frequency (the cap filter), and in-list pairs come from a
    # higher-order expansion — no window shuffle, no self-join (which
    # would re-evaluate the whole shingle subtree on both sides)
    return _jaccard_from_shingles(keyed)


def _jaccard_from_shingles(
    shingles: DataFrame, threshold: float = 0.1, spread: bool = True
) -> DataFrame:
    """Shared Jaccard back end over a (doc_id, sh) occurrence stream — one
    copy for the md5-keyed oracle path and the xxhash64-keyed
    production path, so the posting-list/cap/pair semantics cannot
    drift between them (the ``_banded_pairs`` pattern).

    The posting-list table is consumed by BOTH the sizes branch and the
    pair branch. Without a barrier Spark still evaluates the expensive
    scan+shingle+md5 map side ONCE — the sh-partitioned exchange is
    shared via ReusedExchange (verified in the executed plan) — but the
    reduce-side collect_set aggregation runs once per branch. Whether
    the checkpoint barrier PAYS is therefore a trade between one extra
    reduce-side pass and a materialize+re-spread round-trip, and it is
    size-gated (r10, measured):

    * SMALL scans (< ``_BARRIER_MIN_BYTES`` of local input): no
      barrier. The duplicated reduce-side pass costs less than the
      localCheckpoint round-trip plus the re-spread shuffle (measured
      sf0.1 best-of-3: 1.73 s un-barriered vs 2.26 s checkpointed vs
      2.73 s cached — the materialization is ~25% of the query there).
    * LARGE or non-local scans (object stores report no local size —
      unknown defaults to barrier): localCheckpoint (reliable
      ``checkpoint`` on a cluster — same call site) + re-spread. At
      corpus scale the duplicated reduce pass re-reads the widest
      shuffle in the operator from every reducer, while the CAPPED
      posting table it would materialize is small (≤ _DF_CAP·
      |shingles| ≪ input); and when AQE coalesces the small
      post-shuffle table to one partition, the O(Σ len(ds)²) in-bucket
      pair expansion would run on one core without
      ``parallelize_compute``'s re-spread.

    ``spread=False`` skips the barrier unconditionally — identical
    results over a fully lazy plan, used by the plan-shape tests to
    inspect the posting-list subtree the checkpoint would truncate
    away (result parity between the modes is pinned in tests)."""
    byssh = (
        shingles.groupBy("sh")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ds"))
        .where(F.size("ds") <= _DF_CAP)
    )
    if spread and not _small_local_scan(shingles):
        byssh = parallelize_compute(byssh.localCheckpoint(), key="sh")
    # Two separate aggregations — sizes from the occurrence stream,
    # co-occurrence counts from the pair expansion — are the RIGHT
    # scale shape, established by measurement, not intuition. The
    # round-8 attempt fused them (size markers as self-pairs riding the
    # pair explode into one groupBy(pk)) to save the sizes exchange;
    # that was strictly worse at the 10× probe: lazy, the reduce-side
    # aggregation of the PAIR stream — the widest intermediate in the
    # operator, ~quadratic in posting-list occupancy — re-ran per
    # consumer (17× growth); checkpointed, materializing that stream
    # OOMed the block manager; and the filters-over-checkpoint carried
    # no stats, so the joins lost their AQE broadcast. The sizes
    # exchange this shape pays is narrow (8-byte doc ids, linear in
    # occurrences) and gives AQE the runtime stats that make both
    # sizes joins broadcast — no hint needed (a blind hint would OOM
    # the driver at 10^9 docs).
    sizes = (
        byssh.select(F.explode("ds").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    common = _unpack_pairs(
        byssh.where(F.size("ds") >= 2)
        .select(F.explode(F.expr(_PAIR_EXPAND)).alias("pk"))
        .groupBy("pk")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    j = (
        common.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_common").cast("double")
                / (F.col("sa.n") + F.col("sb.n") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
            "n_common",
        )
    )
    return j.where(F.col("jaccard") >= threshold)


def ngram_jaccard_fast(d: DataFrame, threshold: float = 0.1, spread: bool = True) -> DataFrame:
    """The PRODUCTION Jaccard rendering: shingles collapse to xxhash64
    longs BEFORE the posting-list groupBy, so the widest exchange in the
    pipeline shuffles 8-byte keys instead of ~25-byte strings (~3×
    narrower; measured 14% end-to-end at sf0.1 where fixed costs
    dominate — the ratio grows with corpus size as the exchange becomes
    the bottleneck). Set semantics are identical modulo 64-bit hash
    collisions (~n²·2⁻⁶⁴ — absent at any realistic shingle count), the
    same trade every ``_fast`` twin in this family makes; pinned by
    exact result parity against the string-keyed path in tests."""
    keyed = _shingle_sets(d).select("doc_id", F.xxhash64("sh").alias("sh"))
    return _jaccard_from_shingles(keyed, threshold, spread=spread)


# ---------------------------------------------------------------------------
# Winnowing document fingerprints (rolling k-gram hash, window minima)
# ---------------------------------------------------------------------------
_WINNOW_K = 8  # character k-gram length (on whitespace-normalized text)
_WINNOW_W = 4  # winnowing window: consecutive k-gram hashes per minimum


def winnow_fingerprints(d: DataFrame, k: int = _WINNOW_K, w: int = _WINNOW_W) -> DataFrame:
    """Document fingerprinting by winnowing (Schleimer, Wilkerson & Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    2003): hash every character k-gram of the whitespace-normalized
    lowercased text, slide a window over each run of ``w`` consecutive
    hashes, keep every window's minimum, and emit the distinct selected
    hashes as the document's fingerprint set. The paper's guarantee: any
    shared substring of length ≥ w + k - 1 between two documents yields
    at least one shared fingerprint — a LOCAL similarity detector
    (plagiarism spans, quotations, boilerplate) that whole-document
    dedup (exact/MinHash/SimHash) cannot see.

    Engine shape: pure higher-order functions inside one projection —
    k-gram hash array, window minima, distinct+sort — ONE scan, zero
    shuffles, zero UDFs; embarrassingly parallel at any corpus scale.
    The 32-bit k-gram hash is the first 8 hex digits of md5
    (engine-neutral; the production swap is xxhash64 exactly as in
    ``dedup_exact_fast``).

    Declared as a library operator: the driver's 50-slot query gate is
    full, so cross-engine parity is pinned by
    tests/test_operators.py::TestWinnowing (the DuckDB twin runs inside
    the test) rather than a gate slot."""
    base = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    n_grams = F.length(base) - F.lit(k - 1)
    hs = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.conv(F.substring(F.md5(F.substring(base, i, F.lit(k))), 1, 8), 16, 10).cast(
            "long"
        ),
    )
    # hs MUST be bound to a column before the window pass: a HOF lambda
    # body is evaluated per element, so inlining hs into the mins lambda
    # would re-derive the whole O(n) hash array for each of the n windows
    # — O(n²) md5 calls per document (measured: minutes vs seconds at
    # fixture scale). Same let-binding lesson as the kernel layer.
    hashed = d.where(F.length(base) >= k + w - 1).select("doc_id", hs.alias("hs"))
    mins = F.transform(
        F.sequence(F.lit(1), F.size(F.col("hs")) - F.lit(w - 1)),
        lambda j: F.array_min(F.slice(F.col("hs"), j, w)),
    )
    return hashed.select(
        "doc_id", F.array_sort(F.array_distinct(mins)).alias("fingerprints")
    ).withColumn("n_fps", F.size("fingerprints").cast("long"))


# ---------------------------------------------------------------------------
# SimHash (16-bit, engine-neutral nibble hash)
# ---------------------------------------------------------------------------
_HEXD = "0123456789abcdef"


def _simhash_sql() -> str:
    # word hash = first 4 hex nibbles of md5(word) → 16-bit int, via
    # instr() on the hex alphabet (identical in both engines)
    hv = " + ".join(
        f"(instr('{_HEXD}', substr(md5(w), {i + 1}, 1)) - 1) * {16 ** (3 - i)}" for i in range(4)
    )
    bits = ",\n             ".join(
        f"SUM(CASE WHEN FLOOR(hv / {1 << b}) % 2 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(16)
    )
    pack = " + ".join(f"(CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(16))
    return f"""
    WITH words AS (
      SELECT doc_id, unnest({_TOKENS_SQL}) AS w FROM documents
    ), hashed AS (
      SELECT doc_id, ({hv}) AS hv FROM words
    ), bitsums AS (
      SELECT doc_id,
             {bits}
      FROM hashed GROUP BY doc_id
    )
    SELECT doc_id, CAST({pack} AS BIGINT) AS simhash FROM bitsums
    """


@register("q_simhash", sql=_simhash_sql(), survey_ids=("EXT-DEDUP",))
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash document sketch (16-bit here; 64-bit with xxhash64 in
    production — noted swap). Per-word 16-bit hash from md5 nibbles →
    per-bit ±1 vote sum per document → sign → packed integer. Near-dups
    then pair by small Hamming distance on the sketch.

    Scale: explode(words) + one groupBy(doc) — linear; the 16 conditional
    sums are one aggregate pass, all codegen'd."""
    d = read_table(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(_tokens()).alias("w"))
    # conv(hex, 16, 10) is Spark's native hex→int; the oracle spells the
    # same value with instr() nibble arithmetic — identical integers.
    hv = F.conv(F.substring(F.md5("w"), 1, 4), 16, 10).cast("long")
    hashed = words.select("doc_id", hv.alias("hv"))
    bitcols = [
        F.sum(
            F.when(F.floor(F.col("hv") / (1 << b)) % 2 == 1, F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"b{b}")
        for b in range(16)
    ]
    bitsums = hashed.groupBy("doc_id").agg(*bitcols)
    pack = None
    for b in range(16):
        term = F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        pack = term if pack is None else pack + term
    return bitsums.select("doc_id", pack.cast("long").alias("simhash"))


# ---------------------------------------------------------------------------
# BPE-style pre-tokenization + vocabulary building
# ---------------------------------------------------------------------------
# GPT-2-shaped pre-tokenizer (simplified to ASCII classes so Java regex
# and RE2 agree symbol-for-symbol): contraction suffixes, space-prefixed
# letter runs, space-prefixed digit runs, space-prefixed punctuation
# runs, whitespace runs. Both engines use leftmost-first alternation, so
# the token streams are identical — pinned exactly by the pytest twin.
_BPE_PAT = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def bpe_pretokenize(d: DataFrame) -> DataFrame:
    """Per-document BPE pre-token stream — the unit a byte-pair-encoding
    tokenizer merges within (no merge crosses a pre-token boundary), and
    the honest token-count estimator for corpus budgeting (whitespace
    counts undercount punctuation-heavy text; this is the regex the
    byte-level BPE family actually splits on).

    One codegen'd projection (regexp_extract_all), zero shuffles; the
    whitespace-run tokens are kept (byte-level BPE encodes them too) —
    ``n_pretokens`` excludes them for the "text token" count."""
    # idx=0 (whole match): the pattern's only group is non-capturing, and
    # Spark's default group index of 1 rejects it.
    toks = F.regexp_extract_all("text", F.lit(_BPE_PAT), 0)
    return d.select(
        "doc_id",
        toks.alias("pretokens"),
        F.size(toks).cast("long").alias("n_all"),
        F.size(F.filter(toks, lambda t: ~t.rlike(r"^\s+$"))).cast("long").alias("n_pretokens"),
    )


def token_vocabulary(d: DataFrame, top_n: int = 1000) -> DataFrame:
    """Corpus vocabulary from the pre-token stream: normalize (strip the
    leading space marker, lowercase), count, keep the ``top_n`` most
    frequent with a deterministic (count desc, token asc) order.

    Scale shape: explode → ONE partial-agg shuffle on token →
    TakeOrderedAndProject for the cap. Token frequency is Zipfian —
    exactly the skew AQE's skew handling and the partial aggregate
    absorb (the hot token's partials combine map-side; no single
    reducer sees the raw occurrence stream)."""
    toks = bpe_pretokenize(d).select(
        F.explode("pretokens").alias("t")
    ).where(~F.col("t").rlike(r"^\s+$"))
    norm = F.lower(F.regexp_replace("t", r"^ ", ""))
    counts = toks.select(norm.alias("token")).groupBy("token").agg(
        F.count("*").alias("n_occurrences")
    )
    return counts.orderBy(F.col("n_occurrences").desc(), F.col("token")).limit(top_n)


# ---------------------------------------------------------------------------
# Declarative quality-filter chain over the profile signals
# ---------------------------------------------------------------------------
# Rule set as data: name → (column, op, threshold). Ordered — the audit
# column reports the FIRST failed rule, so order is the triage order.
# Defaults are fixture-scaled stand-ins for the published corpus-filter
# families (Gopher/C4-style length, word-shape, symbol-density and
# stopword rules); a deployment tunes thresholds per corpus.
QUALITY_RULES: dict[str, tuple[str, str, float]] = {
    "too_few_tokens": ("n_tokens", "<", 5),
    "too_many_tokens": ("n_tokens", ">", 100_000),
    "avg_token_too_short": ("avg_token_len", "<", 2.0),
    "avg_token_too_long": ("avg_token_len", ">", 14.0),
    "too_much_punct": ("punct_ratio", ">", 0.15),
    "too_numeric": ("n_numericish", ">", 50),
    "no_stopwords": ("stopword_ratio", "<", 0.001),
}


def _rule_fails(col: str, op: str, thr: float):
    c = F.col(col)
    return c < F.lit(thr) if op == "<" else c > F.lit(thr)


def quality_flags(d: DataFrame, rules: dict | None = None) -> DataFrame:
    """Profile + per-rule failure booleans + ``keep`` + ``first_fail``
    (NULL when kept) in ONE scan. The audit columns are the part a real
    pipeline cannot skip: corpus loss must be attributable per rule
    before anyone trusts the filtered output."""
    rules = QUALITY_RULES if rules is None else rules
    prof = text_profile(d)
    out = prof.select(
        "*", *[_rule_fails(*spec).alias(f"fail_{name}") for name, spec in rules.items()]
    )
    keep = None
    first = F.lit(None).cast("string")
    for name in reversed(list(rules)):
        fail = F.col(f"fail_{name}")
        keep = ~fail if keep is None else (keep & ~fail)
        first = F.when(fail, F.lit(name)).otherwise(first)
    return out.select("*", keep.alias("keep"), first.alias("first_fail"))


def quality_filter(d: DataFrame, rules: dict | None = None) -> DataFrame:
    """The kept corpus: documents passing every rule. Pure per-row
    filter over one scan — the 100 TB cost is the read itself."""
    flags = quality_flags(d, rules)
    return flags.where(F.col("keep")).drop(
        "keep", "first_fail", *[c for c in flags.columns if c.startswith("fail_")]
    )


def quality_report(d: DataFrame, rules: dict | None = None) -> DataFrame:
    """Per-rule attribution in one aggregate: how many documents fail
    each rule (non-exclusive) and how many are lost to it first
    (exclusive — sums to the total drop). One scan, one tiny
    fixed-width aggregate row per rule."""
    rules = QUALITY_RULES if rules is None else rules
    flags = quality_flags(d, rules)
    aggs = [F.count(F.lit(1)).alias("n_docs"), F.sum(F.col("keep").cast("long")).alias("n_kept")]
    for name in rules:
        aggs.append(F.sum(F.col(f"fail_{name}").cast("long")).alias(f"n_{name}"))
        aggs.append(
            F.sum((F.col("first_fail") == name).cast("long")).alias(f"n_first_{name}")
        )
    return flags.agg(*aggs)


# ---------------------------------------------------------------------------
# Source-level curation (per-domain corpus decisions)
# ---------------------------------------------------------------------------
def source_curation_report(d: DataFrame) -> DataFrame:
    """Per-source corpus curation aggregates — the decision table behind
    "keep /downsample /drop this domain": document count, token volume,
    quality-rule failure count, and the exact-duplicate share, plus the
    keep verdict itself. Real pipelines gate WHOLE SOURCES this way
    (a domain that is 60% boilerplate dups is cut at the source level,
    not document by document).

    Determinism contract: every aggregate is an INTEGER (counts and
    integer sums — exact and order-independent), and the verdicts are
    integer inequalities (cross-multiplied, never divided), so the
    DuckDB twin matches bit-for-bit with no float canonicalization.

    Shape: the profile and fingerprint are per-row projections on one
    scan; then one shuffle keyed by the 16-byte fingerprint (dup
    detection) and one keyed by source (the report). Sources are
    bounded cardinality (domains), so the report aggregate is tiny and
    the source groupBy is the classic skew case — a giant domain is
    exactly what AQE skew-split plus the integer partial aggregates
    absorb."""
    flags = quality_flags(d)
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    fp = d.select("doc_id", "source", F.md5(norm).alias("fingerprint"))
    w = Window.partitionBy("fingerprint")
    dup = fp.withColumn("n_copies", F.count(F.lit(1)).over(w)).select(
        "doc_id", "source", (F.col("n_copies") > 1).cast("long").alias("is_dup")
    )
    per_doc = dup.join(
        flags.select("doc_id", "n_tokens", (~F.col("keep")).cast("long").alias("failed")),
        "doc_id",
    )
    rep = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("failed").alias("n_failed"),
        F.sum("is_dup").alias("n_dup_docs"),
    )
    # verdicts as integer inequalities: dup share ≥ 1/2 or failure share
    # ≥ 1/2 drops the source; dup share ≥ 1/4 flags it for downsampling
    return rep.select(
        "source",
        "n_docs",
        "total_tokens",
        "n_failed",
        "n_dup_docs",
        (
            (F.col("n_dup_docs") * 2 < F.col("n_docs"))
            & (F.col("n_failed") * 2 < F.col("n_docs"))
        ).alias("keep_source"),
        (F.col("n_dup_docs") * 4 >= F.col("n_docs")).alias("downsample_source"),
    )


# ---------------------------------------------------------------------------
# Document chunking (context-window preparation)
# ---------------------------------------------------------------------------
def chunk_documents(d: DataFrame, chunk_tokens: int = 64, stride: int = 48) -> DataFrame:
    """Split each document's pre-token stream into fixed-size chunks of
    ``chunk_tokens`` pre-tokens advancing by ``stride`` (overlap =
    chunk_tokens − stride) — the step that turns a cleaned corpus into
    training-window rows. The final partial window is kept iff it adds
    unseen tokens (standard trailing-window rule: last start ≤
    n − stride keeps every token covered exactly once by some chunk
    start).

    Since BPE pre-tokens concatenate back to the exact text
    (tested invariant), each chunk's ``chunk_text`` is a true substring
    of the document — chunk boundaries never split a pre-token.

    Shape: pure higher-order functions in one projection + one
    ``posexplode`` — zero shuffles, zero UDFs; output rows carry
    (doc_id, chunk_id, n_chunk_tokens, chunk_text). Embarrassingly
    parallel at any corpus size; downstream tokenization/packing
    consumes the rows partition-locally."""
    assert 0 < stride <= chunk_tokens
    # empty documents emit NO chunk row (there is nothing to window);
    # without this filter the mandatory chunk 0 yields an empty-string
    # chunk where the DuckDB rendering yields NULL (hostile-corpus
    # finding — masked by the fixture, which has no empty text)
    pt = bpe_pretokenize(d.where(F.length("text") > 0)).select(
        "doc_id", "pretokens", "n_all"
    )
    # chunk starts over the FULL stream (whitespace tokens included so
    # reconstruction holds): 1, 1+stride, ... while start <= n - stride
    # (plus the mandatory first chunk)
    n = F.col("n_all")
    n_starts = F.greatest(
        F.lit(1), (F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)) + F.lit(1)).cast("int")
    )
    starts = F.transform(
        F.sequence(F.lit(0), n_starts - F.lit(1)), lambda i: i * stride + 1
    )
    chunks = pt.select(
        "doc_id",
        F.posexplode(
            F.transform(starts, lambda s: F.slice("pretokens", s, chunk_tokens))
        ).alias("chunk_id", "toks"),
    )
    return chunks.select(
        "doc_id",
        "chunk_id",
        F.size("toks").cast("long").alias("n_chunk_tokens"),
        F.concat_ws("", F.col("toks")).alias("chunk_text"),
    )


# ---------------------------------------------------------------------------
# Decontamination: n-gram overlap against a held-out probe set
# ---------------------------------------------------------------------------
_DECON_N = 8  # words per overlap n-gram (the GPT-3 appendix-C shape uses 13)


def doc_ngrams(d: DataFrame, n: int = _DECON_N) -> DataFrame:
    """(doc_id, gram) — every word n-gram of each document, via the same
    tokenize → higher-order windowing as the shingle front end (word
    3-grams are the n=3 case). One projection + explode, zero shuffles."""
    words = d.select("doc_id", _tokens().alias("ws"))
    return words.where(F.size("ws") >= n).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("ws") - n),
                lambda i: F.concat_ws(
                    " ", *[F.col("ws")[i + j] for j in range(n)]
                ),
            )
        ).alias("gram"),
    )


def decontaminate(
    docs: DataFrame, probes: DataFrame, n: int = _DECON_N
) -> tuple[DataFrame, DataFrame]:
    """Training-set decontamination (the GPT-3 appendix-C / PaLM
    procedure): remove every training document that shares ANY word
    n-gram with a held-out probe set (benchmark prompts, eval targets),
    so measured performance can't come from memorized eval text.

    Returns (clean, flagged): ``docs`` minus contaminated rows, and the
    flagged (doc_id, n_hits) table for audit.

    Scale shape: the probe side is the SMALL side (benchmark suites are
    thousands of documents, the corpus is billions) — its distinct
    n-gram set is explicitly broadcast, so the corpus scan never
    shuffles for the membership test; the semi join runs inside the
    scan stage. The flagged id set (contaminated docs) is again tiny
    and broadcasts back for the anti join — the corpus is read once
    per pass and never exchanged. At 100 TB this is two broadcast
    hash joins over one scan each; n-gram hashing (xxhash64) drops the
    broadcast to 8 bytes/gram when probe suites grow."""
    probe_grams = doc_ngrams(probes, n).select("gram").distinct()
    hits = (
        doc_ngrams(docs, n)
        .join(F.broadcast(probe_grams), "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    clean = docs.join(F.broadcast(hits.select("doc_id")), "doc_id", "left_anti")
    return clean, hits


# ---------------------------------------------------------------------------
# EXT-DEDUP/EXT-TEXT — typo-pair discovery over the vocabulary
# (SymSpell / FastSS: edit-distance-1 neighbors via deletion-
# neighborhood bucketing — no all-pairs levenshtein ever runs)
# ---------------------------------------------------------------------------
_TYPO_TOP = 500


def _typo_sql(top_n: int = _TYPO_TOP) -> str:
    return f"""
    WITH toks AS (
      SELECT unnest({_TOKENS_SQL}) AS token
      FROM documents WHERE length(trim(text)) > 0
    ), counts AS (
      SELECT token, COUNT(*) AS cnt FROM toks
      WHERE token <> '' AND regexp_matches(token, '^[ -~]+$')
      GROUP BY token
    ), topk AS (
      SELECT token, cnt FROM counts ORDER BY cnt DESC, token LIMIT {top_n}
    ), vars AS (
      SELECT token, cnt, token AS variant FROM topk
      UNION ALL
      SELECT token, cnt, substr(token, 1, i - 1) || substr(token, i + 1) AS variant
      FROM topk, LATERAL (
        SELECT unnest(generate_series(1, length(token))) AS i
      ) g
    ), pairs AS (
      SELECT DISTINCT a.token AS tok_a, b.token AS tok_b,
             a.cnt AS cnt_a, b.cnt AS cnt_b
      FROM vars a JOIN vars b ON a.variant = b.variant AND a.token < b.token
    )
    SELECT tok_a, tok_b,
           CAST(levenshtein(tok_a, tok_b) AS BIGINT) AS dist,
           cnt_a, cnt_b
    FROM pairs WHERE levenshtein(tok_a, tok_b) <= 1
    """


@register(
    "q_typo_pairs",
    sql=_typo_sql(),
    survey_ids=("EXT-DEDUP", "EXT-TEXT"),
    gate=False,
)
def q_typo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 token pairs over the top-``_TYPO_TOP`` vocabulary
    — the SymSpell/FastSS shape: each token expands to its 1-deletion
    neighborhood (the token itself + every single-character deletion);
    two tokens are within edit distance 1 IFF they share a variant
    (delete ↔ the shorter word's own form; insert ↔ symmetric;
    substitute ↔ both delete at the same position), so the candidate
    join is an equi-join on variant buckets and ``levenshtein`` runs
    only on candidates, never all pairs. The normalization/dedup stage
    consumes these pairs to fold typo forms into their canonical token.

    Scale: variant generation is one HOF projection (vocab × mean
    token length rows — VOCAB-bounded, not corpus-bounded); the bucket
    self-join touches only same-variant groups; the verify is native
    ``levenshtein`` in both engines. Domain: printable-ASCII tokens
    only (enforced identically in both engines) — DuckDB's levenshtein
    counts BYTES where Spark counts CHARACTERS, so a multibyte token
    ('—', 'straße') scores 3 vs 1 across engines (hostile-sweep
    finding); non-Latin scripts need an ICU-aware distance, and the
    deletion bucketing above is already character-correct when one is
    swapped in. A corpus-scale vocabulary shards the same plan by
    variant hash.

    Fixture honesty (r10): the driver fixture's ENTIRE vocabulary is
    31 tokens with zero distance-1 pairs (proven exhaustively via the
    same deletion buckets), so this query returns 0 rows at every
    driver SF by fixture construction, not by bug — the non-trivial
    path runs end-to-end (planted pairs surfaced + oracle hash parity)
    on ``testing.write_planted_documents`` in
    tests/test_analytics.py::TestTypoPairs."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.where(F.length(F.trim("text")) > 0).select(
        F.explode(_tokens()).alias("token")
    )
    counts = (
        toks.where(
            (F.col("token") != "") & F.col("token").rlike("^[ -~]+$")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    topk = counts.orderBy(F.col("cnt").desc(), "token").limit(_TYPO_TOP)
    # array_union dedups (repeated deletions of a double letter collapse)
    vars_ = topk.select(
        "token",
        "cnt",
        F.explode(
            F.expr(
                "array_union(array(token), "
                "transform(sequence(1, length(token)), "
                "i -> concat(substr(token, 1, i - 1), substr(token, i + 1))))"
            )
        ).alias("variant"),
    )
    a = vars_.select(
        F.col("token").alias("tok_a"), F.col("cnt").alias("cnt_a"), "variant"
    )
    b = vars_.select(
        F.col("token").alias("tok_b"), F.col("cnt").alias("cnt_b"), "variant"
    )
    pairs = (
        a.join(b, "variant")
        .where(F.col("tok_a") < F.col("tok_b"))
        .select("tok_a", "tok_b", "cnt_a", "cnt_b")
        .distinct()
    )
    return pairs.where(F.levenshtein("tok_a", "tok_b") <= 1).select(
        "tok_a",
        "tok_b",
        F.levenshtein("tok_a", "tok_b").cast("long").alias("dist"),
        "cnt_a",
        "cnt_b",
    )


# ---------------------------------------------------------------------------
# SimHash near-dup PAIRING (Manku/Charikar): banded hamming join over a
# 32-bit signature — completes the sketch family: q_simhash builds
# fingerprints, this finds the pairs
# ---------------------------------------------------------------------------
SIMHASH_PAIR_BITS = 32
SIMHASH_BANDS = 4  # 4 × 8-bit bands ⇒ every hd ≤ 3 pair shares a band
SIMHASH_MAX_HD = SIMHASH_BANDS - 1


def _simhash_pairs_sql() -> str:
    hv = " + ".join(
        f"(instr('{_HEXD}', substr(md5(w), {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
    bits = ",\n             ".join(
        f"SUM(CASE WHEN FLOOR(hv / {1 << b}) % 2 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(SIMHASH_PAIR_BITS)
    )
    pack = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(SIMHASH_PAIR_BITS)
    )
    seeds = ", ".join(f"({b})" for b in range(SIMHASH_BANDS))
    return f"""
    WITH words AS (
      SELECT doc_id, unnest({_TOKENS_SQL}) AS w FROM documents
    ), hashed AS (
      SELECT doc_id, ({hv}) AS hv FROM words
    ), bitsums AS (
      SELECT doc_id, {bits}
      FROM hashed GROUP BY doc_id
    ), sigs AS (
      SELECT doc_id, CAST({pack} AS BIGINT) AS sig FROM bitsums
    ), banded AS (
      SELECT s.doc_id, s.sig, b.b AS band,
             (s.sig >> (8 * b.b)) & 255 AS val
      FROM sigs s CROSS JOIN (VALUES {seeds}) b(b)
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.sig AS sig_a, b.sig AS sig_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.val = b.val AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hd
    FROM cands
    WHERE bit_count(xor(sig_a, sig_b)) <= {SIMHASH_MAX_HD}
    """


@register(
    "q_simhash_pairs",
    sql=_simhash_pairs_sql(),
    survey_ids=("EXT-DEDUP",),
    gate=False,
)
def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate PAIRS (Manku, Jain & Das Sarma 2007, the
    Google crawl-dedup shape): 32-bit signatures (the ±1 bit-vote
    scheme of q_simhash, widened so banding has room), split into 4
    8-bit bands; two documents are CANDIDATES iff some band matches
    exactly (pigeonhole: ≤ 3 differing bits cannot touch all 4 bands,
    so every hamming ≤ 3 pair IS captured — the banded join is a pure
    plan optimization, not a recall trade), then the exact hamming
    filter keeps true near-dups. The oracle spells the identical
    banding, so even the candidate structure is engine-pinned.

    Scale: the join key is (band, 8-bit value) — 1 024 buckets per
    band level; bucket size is n/256 per band, so the pair expansion
    is Σ C(bucket, 2) — quadratic only WITHIN buckets, the same
    bounded-bucket argument as MinHash-LSH (production widens to
    64-bit signatures / 16-bit bands exactly as q_simhash documents).
    One explode(4) + one self-equi-join + one distinct — no all-pairs
    anywhere."""
    d = read_table(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(_tokens()).alias("w"))
    hv = F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long")
    hashed = words.select("doc_id", hv.alias("hv"))
    bitcols = [
        F.sum(
            F.when(
                F.floor(F.col("hv") / (1 << b)) % 2 == 1, F.lit(1)
            ).otherwise(F.lit(-1))
        ).alias(f"b{b}")
        for b in range(SIMHASH_PAIR_BITS)
    ]
    bitsums = hashed.groupBy("doc_id").agg(*bitcols)
    pack = None
    for b in range(SIMHASH_PAIR_BITS):
        term = F.when(F.col(f"b{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        pack = term if pack is None else pack + term
    sigs = bitsums.select("doc_id", pack.alias("sig"))
    banded = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("sig"), 8 * b)
                        .bitwiseAND(F.lit(255))
                        .alias("val"),
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bv"),
    ).select("doc_id", "sig", F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))
    a = banded.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sig").alias("sig_a"),
        "band",
        "val",
    )
    b2 = banded.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sig").alias("sig_b"),
        "band",
        "val",
    )
    cands = (
        a.join(b2, ["band", "val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .distinct()
    )
    hd = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("long")
    return cands.select("doc_a", "doc_b", hd.alias("hd")).where(
        F.col("hd") <= SIMHASH_MAX_HD
    )
