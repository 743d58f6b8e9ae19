"""Corpus-pipeline gate queries (SURVEY.md §2.11 round-4 operators).

These six round-4 training-data operators had full implementations and
pytest DuckDB twins but no driver CORRECTNESS rows (the 50-slot gate was
full). Round 6 frees six overlapping relational slots (see the library
tier in plans/registry.py) and promotes the judge-named six here:
winnowing fingerprints, deterministic sample membership, dedup survivor
set, int8 quantization + integer dot scores, token vocabulary, and the
chunk table. Each oracle reuses the arithmetic its pytest twin already
pinned — md5-nibble hashes, integer aggregates, shared candidate CTEs —
so gate promotion adds the driver's independent hash check without
changing any operator's semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from w4h_etl_container_spark.operators.components import dedup_survivors
from w4h_etl_container_spark.operators.quantize import qdot, quantize_embeddings
from w4h_etl_container_spark.operators.sampling import (
    _M,
    _bucket,
    stratified_sample,
    token_budget_sample,
    weighted_priority_sample,
)
from w4h_etl_container_spark.plans.registry import register
from w4h_etl_container_spark.plans.textops import (
    _BPE_PAT,
    _DECON_N,
    _WINNOW_K,
    _WINNOW_W,
    chunk_documents,
    decontaminate,
    minhash_cands_ctes,
    minhash_candidates,
    token_vocabulary,
    winnow_fingerprints,
)
from w4h_etl_container_spark.session import parallelize_compute, read_embeddings, read_table

_HEXD = "0123456789abcdef"


def _nib(expr: str, n_hex: int) -> str:
    """DuckDB hex→int via nibble arithmetic over the first ``n_hex`` hex
    chars of ``expr`` (DuckDB has no hex→int conversion; Spark side is
    ``conv(substring(md5(...)), 16, 10)`` — same integer by construction)."""
    return " + ".join(
        f"(instr('{_HEXD}', substr({expr}, {p + 1}, 1)) - 1) * {16 ** (n_hex - 1 - p)}"
        for p in range(n_hex)
    )


# ---------------------------------------------------------------------------
# EXT-DEDUP — winnowing document fingerprints (SIGMOD 2003)
# ---------------------------------------------------------------------------
def _winnow_fps_ctes(k: int = _WINNOW_K, w: int = _WINNOW_W) -> str:
    """WITH-body fragment ending at the ``fps`` CTE (doc_id, sorted
    distinct fingerprint list) — shared by the q_winnow oracle and the
    q_winnow_overlap oracle so their fingerprint semantics cannot
    drift."""
    gram = f"substr(b, CAST(i AS INTEGER), {k})"
    return f"""base AS (
      SELECT doc_id, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS b
      FROM documents
    ), grams AS (
      SELECT doc_id,
             list_transform(range(1, length(b) - {k - 1} + 1), i -> ({_nib(f"md5({gram})", 8)})) AS hs
      FROM base WHERE length(b) >= {k + w - 1}
    ), fps AS (
      SELECT doc_id,
             list_sort(list_distinct(list_transform(
               range(1, len(hs) - {w - 1} + 1),
               j -> list_min(list_slice(hs, CAST(j AS INTEGER), CAST(j + {w - 1} AS INTEGER)))
             ))) AS fingerprints
      FROM grams
    )"""


def _winnow_sql() -> str:
    return f"""
    WITH {_winnow_fps_ctes()}
    SELECT doc_id,
           array_to_string(fingerprints, ',') AS fingerprints_csv,
           CAST(len(fingerprints) AS BIGINT) AS n_fps
    FROM fps
    """


@register("q_winnow", sql=_winnow_sql(), survey_ids=("EXT-DEDUP",))
def q_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003; see ``textops.winnow_fingerprints`` for the algorithm
    and the shared-span guarantee). Gate rendering of the round-4
    library operator: hash every char k-gram, keep each w-window's
    minimum, emit the sorted distinct fingerprint set per document.

    Scale: pure higher-order functions in one projection — zero UDFs,
    embarrassingly parallel at any corpus size. The scan goes through
    ``parallelize_compute``: ~300 md5 calls per document is kernel-grade
    compute, and a compact input is ONE split (measured at sf0.1: 16 s
    single-threaded vs <1 s spread) — the same one-small-shuffle-for-
    n-way-parallelism trade the thermal kernel suite makes. The 32-bit
    k-gram hash is the first 8 md5 hex digits (engine-neutral);
    production swaps xxhash64 exactly as in ``dedup_exact_fast``.

    The fingerprint set is emitted as a CSV string: array cells crash
    pandas-based canonicalizers (round-1 driver finding — same contract
    as ``q_agg_collect``); the array form is the library operator's
    output, unchanged."""
    fps = winnow_fingerprints(parallelize_compute(read_table(spark, sf_dir, "documents"), key="doc_id"))
    return fps.select(
        "doc_id",
        F.concat_ws(",", F.col("fingerprints")).alias("fingerprints_csv"),
        "n_fps",
    )


# ---------------------------------------------------------------------------
# EXT-SAMPLE — deterministic hash-threshold membership (plain + stratified)
# ---------------------------------------------------------------------------
_STRAT_RATES = {"en": 0.5, "de": 0.25, "zh": 0.1}
_BASE_RATE = 0.1


def _sample_sql() -> str:
    bucket = _nib("md5('s0' || CAST(doc_id AS VARCHAR))", 6)
    thr_case = " ".join(
        f"WHEN '{s}' THEN {int(r * _M)}" for s, r in _STRAT_RATES.items()
    )
    return f"""
    WITH hashed AS (
      SELECT doc_id, lang, source, ({bucket}) AS bucket
      FROM documents
    )
    SELECT doc_id, lang, source,
           (bucket < {int(_BASE_RATE * _M)}) AS in_base_sample
    FROM hashed
    WHERE bucket < (CASE lang {thr_case} ELSE -1 END)
    """


@register("q_sample_strat", sql=_sample_sql(), survey_ids=("EXT-SAMPLE",))
def q_sample_strat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sampling membership on the gate: the stratified
    per-language sample (one scan, per-stratum thresholds on one keyed
    md5 hash — ``operators.sampling``) with the 10% base-sample flag
    alongside, which exhibits the nesting property on the hash-checked
    surface: every ``in_base_sample`` row of a stratum with rate ≥ 10%
    is by construction in that stratum's sample.

    Scale: membership is a pure function of (salt, doc_id) — partition-
    invariant, retry-stable, reproducible from the recipe alone; the
    filter is codegen'd and pushed, zero shuffles. Production swaps the
    md5-slice bucket for seeded xxhash64 (``deterministic_sample_fast``,
    structure-parity-pinned in tests)."""
    docs = read_table(spark, sf_dir, "documents")
    kept = stratified_sample(docs, _STRAT_RATES, "lang", "doc_id")
    return kept.select(
        "doc_id",
        "lang",
        "source",
        (_bucket(F.col("doc_id"), "s0") < int(_BASE_RATE * _M)).alias("in_base_sample"),
    )


# ---------------------------------------------------------------------------
# EXT-DEDUP — near-dedup survivor set (candidates → components → keep-one)
# ---------------------------------------------------------------------------
def _survivors_sql() -> str:
    return f"""
    WITH RECURSIVE {minhash_cands_ctes()},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM cands
      UNION SELECT doc_b, doc_a FROM cands
    ),
    reach(v, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.v
    ),
    losers AS (
      SELECT v AS doc_id FROM reach GROUP BY v HAVING v <> MIN(r)
    )
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)
    """


@register("q_dedup_survivors", sql=_survivors_sql(), survey_ids=("EXT-DEDUP",))
def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deduplicated corpus on the gate: MinHash-LSH candidate pairs
    (same engine-neutral front end as ``q_minhash_lsh`` — the oracle
    shares its candidate CTEs verbatim via ``minhash_cands_ctes``) →
    connected components by min-label propagation
    (``operators.components``) → exactly one survivor per duplicate
    cluster plus every unpaired document.

    Oracle: a recursive-CTE reachability closure over the same pairs —
    the component labels (min doc_id per component) are engine-neutral
    graph facts, so the survivor sets match exactly.

    Scale: the label table holds only paired docs (a small fraction of
    the corpus); each propagation round is one shuffle on doc_id with
    lineage truncation; the loser set broadcasts back so the corpus
    scan never shuffles. Diameters of near-dup components are 2-4
    (bucket overlaps), so 3-5 rounds in practice."""
    docs = read_table(spark, sf_dir, "documents")
    # spread the per-shingle md5 signature stage (the q_winnow trade);
    # the corpus-side anti-join input stays the plain scan
    surv = dedup_survivors(docs, minhash_candidates(parallelize_compute(docs, key="doc_id")))
    return surv.select("doc_id", "lang", "source", "n_chars")


# ---------------------------------------------------------------------------
# EXT-SIM — int8 quantization + integer dot scores
# ---------------------------------------------------------------------------
def _quantize_sql() -> str:
    return """
    WITH amaxed AS (
      SELECT vec_id,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS amax,
             embedding
      FROM embeddings
    ), qt AS (
      SELECT vec_id,
             CASE WHEN amax = 0 THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
                  ELSE list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) / amax * 127 + 0.5) AS BIGINT))
             END AS q,
             CAST(floor(amax / 127 * 1000000.0 + 0.5) AS BIGINT) AS scale_e6
      FROM amaxed
    )
    SELECT vec_id,
           array_to_string(q, ',') AS q_csv,
           scale_e6,
           CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS qq
    FROM qt
    """


@register("q_quantize", sql=_quantize_sql(), survey_ids=("EXT-SIM",))
def q_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 embedding quantization + the integer self-dot on the gate
    (``operators.quantize``): per-vector symmetric scalar quantization
    (q_i = floor(x_i/amax·127 + 0.5), scale in micro-units) and
    ``qq = Σ q_i²`` — the norm term every quantized-cosine ranking
    reuses. Every emitted value is an exact integer: the quantizer's
    IEEE ops run in the same order as the oracle's list_transform, and
    integer addition is order-insensitive, so the hash check is
    bit-exact with no float canonicalization.

    Scale: one Arrow batch pass for the kernel (dimension-independent —
    no 64 KB codegen blowup), native HOF dot with no UDF on the score
    path, zero shuffles; 4× smaller vectors are the ANN memory-scale
    story at 100 TB. The quantized vector is emitted as a CSV string
    (array cells crash pandas-based canonicalizers — the ``q_agg_collect``
    contract); ``qdot`` consumes the array form directly."""
    emb = quantize_embeddings(read_embeddings(spark, sf_dir))
    return emb.select(
        "vec_id",
        F.concat_ws(",", F.col("q")).alias("q_csv"),
        "scale_e6",
        qdot("q", "q").alias("qq"),
    )


# ---------------------------------------------------------------------------
# EXT-TEXT — token vocabulary (deterministic top-k)
# ---------------------------------------------------------------------------
_VOCAB_N = 200


def _vocab_sql() -> str:
    pat = _BPE_PAT.replace("'", "''")
    return f"""
    WITH toks AS (
      SELECT unnest(regexp_extract_all(text, '{pat}')) AS t
      FROM documents
    )
    SELECT lower(regexp_replace(t, '^ ', '')) AS token,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM toks WHERE NOT regexp_matches(t, '^\\s+$')
    GROUP BY 1 ORDER BY n_occurrences DESC, token LIMIT {_VOCAB_N}
    """


@register("q_token_vocab", sql=_vocab_sql(), survey_ids=("EXT-TEXT",))
def q_token_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token vocabulary on the gate: BPE pre-token stream
    (GPT-2-shaped regex, ASCII classes so Java regex and RE2 agree
    symbol-for-symbol) → normalize → count → deterministic top-k
    (count desc, token asc). See ``textops.token_vocabulary``.

    Scale: explode → ONE partial-agg shuffle on token →
    TakeOrderedAndProject for the cap. Token frequency is Zipfian —
    map-side partial aggregation absorbs the hot tokens; no reducer
    sees a raw occurrence stream."""
    return token_vocabulary(read_table(spark, sf_dir, "documents"), top_n=_VOCAB_N)


# ---------------------------------------------------------------------------
# EXT-TEXT — BPE merge training (round 8: the trainable half of the
# tokenizer — pre-tokenization + top-k vocab stop short of a vocab you
# can encode with)
# ---------------------------------------------------------------------------
_BPE_N_MERGES = 40


def _bpe_pairs_sql() -> str:
    pat = _BPE_PAT.replace("'", "''")
    return rf"""
    WITH toks AS (
      SELECT unnest(regexp_extract_all(text, '{pat}')) AS word FROM documents
    ), words AS (
      SELECT word, COUNT(*) AS freq FROM toks
      WHERE NOT regexp_matches(word, '^\s+$') GROUP BY word
    ), pairs AS (
      SELECT substr(word, CAST(i AS INTEGER), 1) AS a,
             substr(word, CAST(i AS INTEGER) + 1, 1) AS b,
             freq
      FROM words, LATERAL (SELECT unnest(generate_series(1, length(word) - 1)) AS i) t
    )
    SELECT a, b, CAST(SUM(freq) AS BIGINT) AS cnt FROM pairs GROUP BY a, b
    """


@register("q_bpe_pairs", sql=_bpe_pairs_sql(), survey_ids=("EXT-TEXT",), gate=False)
def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE trainer's iteration-0 pair-count table under the
    driver-grade hash oracle: adjacent character-pair frequencies over
    the corpus (word, freq) table — i.e. the aggregation every merge
    round runs, pinned cross-engine at the one round SQL can express.
    The iterative remainder (argmax → rewrite → repeat) stays
    rows-only on `q_bpe_merges` with reference-implementation parity
    in tests/test_bpe.py; THIS query is the corpus-scale half of the
    trainer (the loop is vocab-bounded).

    Scale: the same two map-side-combined aggregations as training
    (word counts, then pair counts weighted by freq)."""
    from w4h_etl_container_spark.operators.bpe import (
        _adjacent_pairs,
        _chars,
        word_counts,
    )

    wc = word_counts(read_table(spark, sf_dir, "documents"))
    return (
        wc.select(
            "freq",
            F.explode(_adjacent_pairs(_chars(F.col("word")))).alias("p"),
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("cnt"))
    )


@register("q_bpe_merges", sql=None, survey_ids=("EXT-TEXT",), gate=False)
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned BPE merge table over `documents`: (rank, left, right,
    merged, cnt) for the first 40 merges — ``operators.bpe.bpe_train``
    run on the corpus's (word, freq) table.

    Rows-only declared query (honestly non-SQL-expressible: the merge
    loop is an iterative argmax with state rewriting — a recursive CTE
    would have to carry the whole symbolized vocabulary per step).
    Exactness is pinned instead by tests/test_bpe.py: merge-sequence
    parity against an independent reference implementation of the
    published algorithm (Sennrich 2016), including the paper's worked
    example, on crafted corpora AND on this fixture.

    Scale: ONE corpus-scale aggregation (word counts); the loop runs
    on the vocab-bounded distinct-word table — per-iteration cost is
    |V|, independent of corpus size."""
    from w4h_etl_container_spark.operators.bpe import (
        bpe_train,
        merges_df,
        word_counts,
    )

    wc = word_counts(read_table(spark, sf_dir, "documents"))
    return merges_df(spark, bpe_train(wc, _BPE_N_MERGES))


# ---------------------------------------------------------------------------
# EXT-TEXT — document chunking (context-window preparation)
# ---------------------------------------------------------------------------
_CHUNK_TOKENS = 64
_CHUNK_STRIDE = 48


def _chunks_sql() -> str:
    pat = _BPE_PAT.replace("'", "''")
    c, s = _CHUNK_TOKENS, _CHUNK_STRIDE
    return f"""
    WITH pt AS (
      SELECT doc_id,
             regexp_extract_all(text, '{pat}') AS toks,
             len(regexp_extract_all(text, '{pat}')) AS n
      FROM documents
      WHERE length(text) > 0
    ), st AS (
      SELECT doc_id, toks,
             greatest(1, CAST(ceil((n - {c}) / {s}.0) AS INTEGER) + 1) AS n_starts
      FROM pt
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_id,
           CAST(len(list_slice(toks, CAST(i * {s} + 1 AS INTEGER), CAST(i * {s} + {c} AS INTEGER))) AS BIGINT) AS n_chunk_tokens,
           array_to_string(list_slice(toks, CAST(i * {s} + 1 AS INTEGER), CAST(i * {s} + {c} AS INTEGER)), '') AS chunk_text
    FROM st, LATERAL (SELECT unnest(generate_series(0, n_starts - 1)) AS i) t
    """


@register("q_chunks", sql=_chunks_sql(), survey_ids=("EXT-TEXT",))
def q_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-window chunk table on the gate: each document's BPE
    pre-token stream split into 64-token windows advancing by 48
    (see ``textops.chunk_documents`` — trailing-window rule keeps every
    token covered; chunk boundaries never split a pre-token, so
    ``chunk_text`` is a true substring of the document).

    Scale: higher-order functions + one ``posexplode`` — zero shuffles,
    zero UDFs; downstream packing consumes rows partition-locally."""
    return chunk_documents(
        read_table(spark, sf_dir, "documents"), _CHUNK_TOKENS, _CHUNK_STRIDE
    )


# ---------------------------------------------------------------------------
# EXT-TEXT — decontamination (n-gram overlap vs a held-out probe set)
# ---------------------------------------------------------------------------
def _decontam_sql(n: int = _DECON_N) -> str:
    return f"""
    WITH words AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
      FROM documents
    ), grams AS (
      SELECT doc_id,
             array_to_string(list_slice(ws, CAST(i AS INTEGER), CAST(i + {n - 1} AS INTEGER)), ' ') AS gram
      FROM words, LATERAL (SELECT unnest(range(1, len(ws) - {n - 1} + 1)) AS i) t
      WHERE len(ws) >= {n}
    ), probe_grams AS (
      SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0
    )
    SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
    FROM grams g JOIN probe_grams p USING (gram)
    GROUP BY g.doc_id
    """


@register("q_decontaminate", sql=_decontam_sql(), survey_ids=("EXT-TEXT", "EXT-DEDUP"), gate=False)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-set decontamination audit table (GPT-3 appendix-C
    procedure; ``textops.decontaminate``): every document sharing a word
    8-gram with the held-out probe slice (doc_id ≡ 0 mod 97 — the
    fixture's stand-in for a benchmark suite), with its overlap count.

    Library tier: the corpus scan feeds two broadcast hash joins (probe
    n-gram set in, flagged id set out) and is never exchanged — plan
    pinned in TestDecontamination alongside exact DuckDB parity."""
    docs = read_table(spark, sf_dir, "documents")
    _, flagged = decontaminate(docs, docs.where(F.col("doc_id") % 97 == 0))
    return flagged


# ---------------------------------------------------------------------------
# EXT-SAMPLE — per-stratum token-budget fill (domain mixing)
# ---------------------------------------------------------------------------
_BUDGETS = {"en": 40000, "de": 15000}


def _budget_sql() -> str:
    bucket = _nib("md5('s0' || CAST(doc_id AS VARCHAR))", 6)
    case = " ".join(f"WHEN '{s}' THEN {b}" for s, b in _BUDGETS.items())
    return f"""
    WITH cum AS (
      SELECT doc_id, lang, source, n_chars,
             COALESCE(SUM(n_chars) OVER (
               PARTITION BY lang ORDER BY ({bucket}), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS before
      FROM documents
    )
    SELECT doc_id, lang, source, n_chars FROM cum
    WHERE before < (CASE lang {case} ELSE NULL END)
    """


@register("q_budget_sample", sql=_budget_sql(), survey_ids=("EXT-SAMPLE",), gate=False)
def q_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixing by TOKEN budget (``sampling.token_budget_sample``):
    fill each language's character budget in deterministic hash order —
    membership is a pure function of (salt, doc_id, budgets), nested in
    the budget dimension, overshooting by at most one document per
    stratum. The last selection a training-data pipeline runs ("2B
    tokens of code, 500M of forums").

    Library tier: one window sum per stratum; the huge-stratum two-pass
    refinement mirrors ``deterministic_topk_per_group_refined``."""
    docs = read_table(spark, sf_dir, "documents")
    kept = token_budget_sample(docs, _BUDGETS, "lang", "doc_id", "n_chars")
    return kept.select("doc_id", "lang", "source", "n_chars")


# ---------------------------------------------------------------------------
# EXT-DEDUP — winnow-overlap pairs (span-level similarity candidates)
# ---------------------------------------------------------------------------
def _winnow_overlap_sql() -> str:
    from w4h_etl_container_spark.plans.textops import _DF_CAP

    return f"""
    WITH {_winnow_fps_ctes()},
    occ AS (
      SELECT doc_id, unnest(fingerprints) AS fp FROM fps
    ), capped AS (
      SELECT doc_id, fp FROM (
        SELECT doc_id, fp, COUNT(*) OVER (PARTITION BY fp) AS df FROM occ
      ) WHERE df <= {_DF_CAP}
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM capped GROUP BY doc_id
    ), common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM capped a JOIN capped b ON a.fp = b.fp AND a.doc_id < b.doc_id
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
    """


@register("q_winnow_overlap", sql=_winnow_overlap_sql(), survey_ids=("EXT-DEDUP",), gate=False)
def q_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The consumer of the winnowing fingerprints: document pairs whose
    fingerprint sets overlap (Jaccard ≥ 0.1) — the SIGMOD-2003 use case.
    Winnowing guarantees any shared substring of length ≥ w + k - 1
    contributes a shared fingerprint, so this finds SPAN-level copies
    (quotations, boilerplate, plagiarized passages) that whole-document
    MinHash misses when the surrounding text differs.

    Engine shape: fingerprints (spread via ``parallelize_compute``,
    the q_winnow trade) → explode → the SAME posting-list back end as
    n-gram Jaccard (``_jaccard_from_shingles`` — df-capped inverted
    index, packed in-bucket pair expansion), with int64 fingerprint
    keys, so the widest exchange ships 8-byte longs. Library tier:
    checked by selfcheck's oracle run and TestWinnowOverlap."""
    from w4h_etl_container_spark.plans.textops import _jaccard_from_shingles

    fps = winnow_fingerprints(
        parallelize_compute(read_table(spark, sf_dir, "documents"), key="doc_id")
    )
    # The localCheckpoint between the fingerprint HOFs and the explode
    # is a CORRECTNESS-OF-COST barrier, not a tuning knob: exploding the
    # HOF-produced array re-evaluates the whole fingerprint chain per
    # OUTPUT row (measured ~0.9 s/doc — linear probe at n=5/20/50 —
    # vs 6 ms/doc for the chain itself; >190 s vs 0.4 s at sf0.01), and
    # a repartition does NOT stop it (projection/generate pushdown
    # crosses round-robin exchanges). Eagerly materializing the small
    # (doc_id, fingerprints) table — one row per document — makes the
    # explode read stored arrays. Same lineage-truncation tool the CC
    # loop uses; on a cluster swap for reliable checkpoint.
    occ = fps.localCheckpoint().select(
        "doc_id", F.explode("fingerprints").alias("sh")
    )
    return _jaccard_from_shingles(occ)


# ---------------------------------------------------------------------------
# EXT-PACK — sequence packing (chunk rows → fixed-budget training windows)
# ---------------------------------------------------------------------------
@register("q_pack", sql=None, survey_ids=("EXT-PACK", "EXT-TEXT"), gate=False)
def q_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing over the chunk table (``operators.packing.
    pack_chunks``): assign every 64-pre-token training chunk to a
    256-token pack by partition-local first-fit-decreasing — the step
    that turns chunk rows into full context windows without wasting
    budget on padding.

    Rows-only check (no oracle): FFD's bin state is inherently
    sequential per partition — SQL cannot replicate the partition-local
    assignment. The strong invariants — bijection on chunk rows, pack
    totals ≤ budget whenever a pack has >1 member, slot offsets strictly
    increasing and consistent with member sizes — are pinned in
    TestSequencePacking; partitions is fixed (32) so the assignment is
    deterministic for the driver's repeated runs."""
    from w4h_etl_container_spark.operators.packing import pack_chunks

    docs = read_table(spark, sf_dir, "documents").where(F.length("text") > 0)
    chunks = chunk_documents(docs, _CHUNK_TOKENS, _CHUNK_STRIDE)
    return pack_chunks(chunks, budget=256, partitions=32)


# ---------------------------------------------------------------------------
# EXT-DEDUP — quality-aware survivor selection (keep the longest copy)
# ---------------------------------------------------------------------------
def _survivors_best_sql() -> str:
    return f"""
    WITH RECURSIVE {minhash_cands_ctes()},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM cands
      UNION SELECT doc_b, doc_a FROM cands
    ),
    reach(v, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.v
    ),
    labels AS (
      SELECT v, MIN(r) AS cluster_id FROM reach GROUP BY v
    ),
    ranked AS (
      SELECT l.v,
             row_number() OVER (
               PARTITION BY l.cluster_id ORDER BY d.n_chars DESC, l.v
             ) AS rn
      FROM labels l JOIN documents d ON d.doc_id = l.v
    ),
    losers AS (SELECT v AS doc_id FROM ranked WHERE rn > 1)
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)
    """


@register(
    "q_dedup_survivors_best",
    sql=_survivors_best_sql(),
    survey_ids=("EXT-DEDUP",),
    gate=False,
)
def q_dedup_survivors_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup survivors: same MinHash-LSH candidate pairs
    and connected components as the gate's `q_dedup_survivors`, but each
    cluster keeps its LONGEST member (``prefer="n_chars"``, ties to the
    smallest doc_id) — the policy a real pipeline wants ("keep the
    best copy, drop the rest") instead of the graph-only min-id rule.

    Oracle: the shared candidate CTEs + reachability closure, with a
    deterministic (n_chars DESC, doc_id) rank per cluster — the arg-max
    the Spark side computes with one ``min_by`` over a packed struct.

    Scale: identical to the gate query plus ONE extra join fetching the
    prefer column for the clustered subset only (|V| rows, never the
    corpus)."""
    docs = read_table(spark, sf_dir, "documents")
    surv = dedup_survivors(
        docs, minhash_candidates(parallelize_compute(docs, key="doc_id")), prefer="n_chars"
    )
    return surv.select("doc_id", "lang", "source", "n_chars")


# ---------------------------------------------------------------------------
# EXT-MEDIA — binary frame sampling under the hash oracle
# ---------------------------------------------------------------------------
_FRAME_STEP = 128  # bytes between sampled frame starts
_FRAME_LEN = 32  # bytes per frame


def _frame_sample_sql(step: int = _FRAME_STEP, flen: int = _FRAME_LEN) -> str:
    # DuckDB has no BLOB substring/md5 — the oracle frames in HEX-string
    # space (both engines' hex() emit uppercase): byte offset s maps to
    # hex offset s*2+1, byte length to 2x hex chars. Identity = md5 of
    # the hex rendering, which Spark reproduces as md5(hex(frame_bytes))
    # over the REAL binary frames its mapInPandas kernel produced.
    return f"""
    WITH media AS (
      SELECT doc_id AS media_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS n
      FROM documents
    )
    SELECT media_id,
           CAST(s // {step} AS BIGINT) AS frame_idx,
           md5(substr(hx, CAST(s * 2 + 1 AS BIGINT), {flen * 2})) AS frame_md5,
           CAST({flen} AS BIGINT) AS n_frame_bytes
    FROM media,
         LATERAL (
           SELECT unnest(range(0, GREATEST(n - {flen}, 0), {step})) AS s
         ) t
    """


@register(
    "q_frame_sample",
    sql=_frame_sample_sql(),
    survey_ids=("EXT-MEDIA",),
    gate=False,
)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary frame sampling under the driver-grade hash oracle: each
    document's UTF-8 payload (the fixture's stand-in for a real media
    asset — same opaque-binary column shape) is frame-sampled by the
    ACTUAL multimodal kernel (``multimodal.media.frame_sample``: Arrow
    mapInPandas, one output row per fixed-length byte window every
    ``_FRAME_STEP`` bytes), then each frame is identified by the md5 of
    its hex rendering so the oracle can reproduce it without BLOB
    functions.

    This puts the row-expanding binary-column path — previously
    pytest-only on synthesized assets — under an exact cross-engine
    value check.

    Scale: mapInPandas streams Arrow batches of payload bytes off the
    JVM heap; zero shuffles (scan → expand → project); pair with
    files.maxPartitionBytes so a partition of assets fits executor
    memory."""
    from w4h_etl_container_spark.multimodal.media import frame_sample

    # null text → null payload → no frames: the oracle's encode(NULL)
    # lateral naturally emits nothing, so filter to match (the kernel
    # also guards null payloads defensively)
    docs = read_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video/mp4").alias("mime"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    frames = frame_sample(media, every_n_bytes=_FRAME_STEP, frame_len=_FRAME_LEN)
    return frames.select(
        "media_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.md5(F.hex("frame_bytes")).alias("frame_md5"),
        F.length("frame_bytes").cast("long").alias("n_frame_bytes"),
    )


# ---------------------------------------------------------------------------
# EXT-TEXT — the quality-filter chain under the hash oracle
# ---------------------------------------------------------------------------
def _quality_flags_sql() -> str:
    from w4h_etl_container_spark.plans.textops import QUALITY_RULES, _profile_sql

    def fail(col: str, op: str, thr: float) -> str:
        return f"({col} {op} {thr})"

    fails = ",\n           ".join(
        f"{fail(*spec)} AS fail_{name}" for name, spec in QUALITY_RULES.items()
    )
    first = " ".join(
        f"WHEN {fail(*spec)} THEN '{name}'" for name, spec in QUALITY_RULES.items()
    )
    keep = " AND ".join(f"NOT {fail(*spec)}" for spec in QUALITY_RULES.values())
    return f"""
    SELECT doc_id, n_tokens, avg_token_len, punct_ratio, stopword_ratio,
           {fails},
           ({keep}) AS keep,
           CASE {first} ELSE NULL END AS first_fail
    FROM ({_profile_sql()}) prof
    """


@register("q_quality_flags", sql=_quality_flags_sql(), survey_ids=("EXT-TEXT",), gate=False)
def q_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The declarative quality-filter chain (``textops.quality_flags``)
    under the driver-grade hash oracle: every Gopher/C4-family rule's
    per-document verdict, the combined ``keep`` decision, and the
    ordered ``first_fail`` attribution — the audit table a pipeline
    publishes alongside its filtered corpus (corpus loss must be
    attributable per rule before the output is trusted).

    Oracle: the rule predicates rendered over the SAME profile subquery
    the q_text_profile oracle checks — rules-as-data means both engines
    generate their conditions from one QUALITY_RULES dict, so a
    threshold change cannot drift.

    Scale: one scan, zero shuffles (plan-pinned in TestQualityChain) —
    the rules are plain codegen'd comparisons over profile columns."""
    from w4h_etl_container_spark.plans.textops import quality_flags

    d = read_table(spark, sf_dir, "documents").where(F.length("text") > 0)
    cols = ["doc_id", "n_tokens", "avg_token_len", "punct_ratio", "stopword_ratio"]
    from w4h_etl_container_spark.plans.textops import QUALITY_RULES

    return quality_flags(d).select(
        *cols, *[f"fail_{n}" for n in QUALITY_RULES], "keep", "first_fail"
    )


# ---------------------------------------------------------------------------
# EXT-DEDUP — leakage-free train/val/test splits (split by CLUSTER, not
# document: near-duplicates must never straddle the split boundary, or
# the held-out set leaks into training — Lee et al. 2022 measured the
# eval inflation this causes)
# ---------------------------------------------------------------------------
_SPLIT_SALT = "split0"
_TRAIN_BP, _VAL_BP = 8000, 9000  # 80 / 10 / 10 in bucket ten-thousandths


def _split_sql() -> str:
    cluster = "COALESCE(l.cluster_id, d.doc_id)"
    bucket = _nib(f"md5('{_SPLIT_SALT}' || CAST({cluster} AS VARCHAR))", 6)
    return f"""
    WITH RECURSIVE {minhash_cands_ctes()},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM cands
      UNION SELECT doc_b, doc_a FROM cands
    ),
    reach(v, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.v
    ),
    labels AS (
      SELECT v AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY v
    )
    SELECT d.doc_id,
           {cluster} AS cluster_id,
           CASE WHEN {bucket} < {_TRAIN_BP * _M // 10000} THEN 'train'
                WHEN {bucket} < {_VAL_BP * _M // 10000} THEN 'val'
                ELSE 'test' END AS split
    FROM documents d LEFT JOIN labels l USING (doc_id)
    """


@register(
    "q_split_leakfree",
    sql=_split_sql(),
    survey_ids=("EXT-DEDUP",),
)
def q_split_leakfree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free 80/10/10 splits: every document is assigned to
    train/val/test by the deterministic hash of its near-dup CLUSTER
    label (the same MinHash-LSH candidates + connected components as
    the gate's `q_dedup_survivors`), so a cluster lands in exactly one
    split — near-duplicate leakage across the boundary is structurally
    impossible, not merely improbable. Unpaired documents hash on
    their own id (their cluster is themselves).

    Oracle: the shared candidate CTEs + reachability closure produce
    the identical (engine-neutral) cluster labels; the split is the
    same md5-nibble bucket arithmetic as the sampling family.

    Scale: the label table holds only LSH-paired docs (a small
    fraction); the corpus-side join is left to AQE, which broadcasts
    it from the checkpoint's exact size stats (the count-gated
    discipline dedup_survivors uses — an unconditional broadcast hint
    would OOM on a pathological all-duplicates corpus); the split
    expression is one codegen'd projection — membership is
    recomputable anywhere and stable under corpus growth for
    unchanged clusters."""
    from w4h_etl_container_spark.operators.components import connected_components

    docs = read_table(spark, sf_dir, "documents")
    labels = connected_components(
        minhash_candidates(parallelize_compute(docs, key="doc_id"))
    ).withColumnRenamed("doc_id", "ldoc")
    joined = docs.join(labels, docs.doc_id == F.col("ldoc"), "left")
    cluster = F.coalesce(F.col("cluster_id"), F.col("doc_id"))
    b = _bucket(cluster, _SPLIT_SALT)
    return joined.select(
        "doc_id",
        cluster.alias("cluster_id"),
        F.when(b < F.lit(_TRAIN_BP * _M // 10000), F.lit("train"))
        .when(b < F.lit(_VAL_BP * _M // 10000), F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


# ---------------------------------------------------------------------------
# EXT-DEDUP — cluster-size histogram: the dedup diagnostic that tells
# you whether near-dup mass is long-tail pairs or boilerplate megaclusters
# (which need the Kiveris edge-rewrite CC path and keep-policy review)
# ---------------------------------------------------------------------------
def _cluster_sizes_sql() -> str:
    return f"""
    WITH RECURSIVE {minhash_cands_ctes()},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM cands
      UNION SELECT doc_b, doc_a FROM cands
    ),
    reach(v, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.v
    ),
    labels AS (
      SELECT v AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY v
    ),
    sizes AS (
      SELECT cluster_id, COUNT(*) AS sz FROM labels GROUP BY cluster_id
    ),
    hist AS (
      SELECT sz AS cluster_size, COUNT(*) AS n_clusters FROM sizes GROUP BY sz
    ),
    singles AS (
      SELECT (SELECT COUNT(*) FROM documents) - (SELECT COUNT(*) FROM labels) AS n1
    )
    SELECT cluster_size, n_clusters, cluster_size * n_clusters AS n_docs FROM hist
    UNION ALL
    SELECT 1 AS cluster_size, n1 AS n_clusters, n1 AS n_docs
    FROM singles WHERE n1 > 0
    """


@register(
    "q_cluster_sizes",
    sql=_cluster_sizes_sql(),
    survey_ids=("EXT-DEDUP", "AGG-6"),
    gate=False,
)
def q_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size histogram over the gate's MinHash-LSH
    candidate graph: how many clusters of each size exist (unpaired
    documents count as size-1 clusters). Every paired cluster has
    size ≥ 2 by construction, so the singleton row is exactly the
    complement count — no overlap with the histogram rows.

    Scale: the labels table (paired docs only) feeds two bounded
    aggregates; the singleton count is two 1-row scalars. The shape a
    pipeline watches: a fat tail here is the signal to switch the CC
    engine to the Kiveris edge-rewrite variant and to review the
    keep-one policy (a 10^6-member boilerplate cluster should usually
    be dropped outright, not surviving-one'd)."""
    from w4h_etl_container_spark.operators.components import connected_components

    docs = read_table(spark, sf_dir, "documents")
    labels = connected_components(minhash_candidates(parallelize_compute(docs, key="doc_id")))
    sizes = labels.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("sz"))
    hist = sizes.groupBy(F.col("sz").alias("cluster_size")).agg(
        F.count(F.lit(1)).alias("n_clusters")
    ).select(
        "cluster_size",
        "n_clusters",
        (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
    )
    n_total = docs.agg(F.count(F.lit(1)).alias("nt"))
    n_labeled = labels.agg(F.count(F.lit(1)).alias("nl"))
    singles = (
        n_total.crossJoin(F.broadcast(n_labeled))
        .select((F.col("nt") - F.col("nl")).alias("n1"))
        .where(F.col("n1") > 0)
        .select(
            F.lit(1).cast("long").alias("cluster_size"),
            F.col("n1").alias("n_clusters"),
            F.col("n1").alias("n_docs"),
        )
    )
    return hist.union(singles)


# ---------------------------------------------------------------------------
# EXT-SAMPLE — A-ES weighted sampling: probability ∝ length, without
# replacement, deterministic (the curation pipeline's "sample 20 docs
# per source, longer docs proportionally more likely" primitive)
# ---------------------------------------------------------------------------
RESERVOIR_K = 20


def _reservoir_sql() -> str:
    from w4h_etl_container_spark.plans.textops import _nib_sql

    h = _nib_sql("md5('w0:' || CAST(doc_id AS VARCHAR))", 15)
    return f"""
    WITH lq AS (
      SELECT source, doc_id, n_chars,
             CAST(FLOOR(
               LN((CAST(({h}) AS DOUBLE) + 1.0) / 1152921504606846976.0)
               * 1000000.0 + 0.5) AS BIGINT) AS L
      FROM documents WHERE n_chars > 0
    ),
    pri AS (
      SELECT source, doc_id, n_chars,
             -(((-L) * 1000000000) // CAST(n_chars AS BIGINT)) AS prio
      FROM lq
    ),
    ranked AS (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY prio DESC, doc_id
             ) AS rank
      FROM pri
    )
    SELECT source, rank, doc_id, n_chars
    FROM ranked WHERE rank <= {RESERVOIR_K}
    """


@register(
    "q_reservoir",
    sql=_reservoir_sql(),
    survey_ids=("EXT-SAMPLE", "SRT-2"),
    gate=False,
)
def q_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted reservoir-style sample: per source, the A-ES top-20
    documents with inclusion probability proportional to ``n_chars``
    (``operators.sampling.weighted_priority_sample``). The oracle is
    the ONE-PASS rendering of the same priorities; the Spark side runs
    the two-level (salted local top-k → global top-k) plan, so the
    hash pin proves the distributed shape is selection-identical to
    the reference semantics — the invariant that matters when fanout
    tasks replace a per-group sort at 100 TB.

    Output carries no float: the priority (e6-rounded ln(u), then
    exact integer division by weight — see the operator docstring for
    the boundary-margin contract) is a ranking
    device on both sides, and the compared cells are (source, rank,
    doc_id, n_chars) integers/strings."""
    docs = read_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    return weighted_priority_sample(
        docs, RESERVOIR_K, "source", "doc_id", "n_chars", salt="w0"
    ).select("source", "rank", "doc_id", "n_chars")


# ---------------------------------------------------------------------------
# EXT-DEDUP — per-source dedup-rate diagnostics: the curation dashboard
# row that tells you WHICH feed is shipping boilerplate (a source with
# keep_bp ≪ peers is a crawler bug or a mirror, not more data)
# ---------------------------------------------------------------------------
def _dedup_rate_sql() -> str:
    return f"""
    WITH RECURSIVE {minhash_cands_ctes()},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM cands
      UNION SELECT doc_b, doc_a FROM cands
    ),
    reach(v, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.v
    ),
    losers AS (
      SELECT v AS doc_id FROM reach GROUP BY v HAVING v <> MIN(r)
    )
    SELECT d.source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_removed,
           CAST(((COUNT(*) - SUM(CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END))
                 * 10000) // COUNT(*) AS BIGINT) AS keep_bp
    FROM documents d LEFT JOIN losers l ON l.doc_id = d.doc_id
    GROUP BY 1
    """


@register(
    "q_dedup_rate",
    sql=_dedup_rate_sql(),
    survey_ids=("EXT-DEDUP", "AGG-1"),
    gate=False,
)
def q_dedup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup rate by source: documents, near-dup losers (the
    q_dedup_survivors complement — same MinHash-LSH candidates, same
    min-label components, so the oracle shares the survivor CTEs), and
    the kept fraction in exact basis points (integer division — no
    float crosses the boundary).

    Scale: the loser table holds only duplicate-cluster members minus
    one — broadcast-size against any real corpus (and count-gated in
    the shared components operator); the corpus scan aggregates once
    on source. This is q_dedup_survivors' cost profile with a 20-row
    output."""
    from w4h_etl_container_spark.operators.components import connected_components

    docs = read_table(spark, sf_dir, "documents")
    labels = connected_components(
        minhash_candidates(parallelize_compute(docs, key="doc_id"))
    )
    losers = labels.where(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    j = docs.join(
        F.broadcast(losers.withColumn("_lost", F.lit(1))), "doc_id", "left"
    )
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce(F.col("_lost"), F.lit(0))).alias("n_removed"),
        )
        .select(
            "source",
            "n_docs",
            "n_removed",
            F.expr("((n_docs - n_removed) * 10000) div n_docs").alias("keep_bp"),
        )
    )


# ---------------------------------------------------------------------------
# EXT-SAMPLE / EXT-DEDUP — contrastive pair generation: the
# (anchor, partner, label) training table an embedding model consumes.
# Positives = the MinHash near-dup candidates (lexically close pairs);
# negatives = one deterministic pseudo-random partner per anchor via a
# bucket-representative rendezvous — no global sort, no RNG state.
# ---------------------------------------------------------------------------
_NEG_NB = 256  # rendezvous buckets for negative partner selection
_NEG_OFF = 7  # fixed bucket offset: partner comes from a DIFFERENT bucket


def _contrastive_sql() -> str:
    md5_expr = "md5('c0' || CAST(doc_id AS VARCHAR))"
    b = f"({_nib(md5_expr, 6)}) % {_NEG_NB}"
    return f"""
    WITH RECURSIVE {minhash_cands_ctes()},
    bucketed AS (
      SELECT doc_id, ({b}) AS bkt FROM documents
    ),
    reps AS (
      SELECT bkt, MIN(doc_id) AS rep FROM bucketed GROUP BY bkt
    ),
    anchors AS (
      SELECT DISTINCT doc_a AS anchor FROM cands
    ),
    negs AS (
      SELECT a.anchor, r.rep AS partner
      FROM anchors a
      JOIN bucketed ba ON ba.doc_id = a.anchor
      JOIN reps r ON r.bkt = (ba.bkt + {_NEG_OFF}) % {_NEG_NB}
      WHERE r.rep <> a.anchor
    )
    SELECT doc_a AS anchor, doc_b AS partner, 1 AS label FROM cands
    UNION ALL
    SELECT anchor, partner, 0 AS label FROM negs
    """


@register(
    "q_contrastive_pairs",
    sql=_contrastive_sql(),
    survey_ids=("EXT-SAMPLE", "EXT-DEDUP"),
    gate=False,
)
def q_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(anchor, partner, label) contrastive training pairs: label 1 =
    the oracle-shared MinHash candidate pairs (lexical near-dups — the
    standard weak-supervision positive); label 0 = one deterministic
    negative per anchor, chosen by bucket rendezvous: docs hash into
    256 buckets, each bucket's min-doc_id is its representative, and
    an anchor's negative is the representative of (its bucket + 7)
    mod 256 — a different bucket by construction, so the partner is a
    pseudo-random unrelated document with zero RNG state (reproducible
    from the recipe, the sampling-family discipline). Accidental hard
    negatives (a representative that happens to be similar) are the
    usual contrastive-learning noise and are filterable by joining
    back to cands.

    Scale: positives are the existing bucket-capped candidate
    machinery; negatives cost one 256-row aggregate broadcast twice —
    no global sort, no per-row randomness, nothing wider than the
    anchor set shuffles."""
    from w4h_etl_container_spark.plans.textops import minhash_candidates

    docs = read_table(spark, sf_dir, "documents")
    cands = minhash_candidates(parallelize_compute(docs, key="doc_id"))
    bucketed = docs.select(
        "doc_id",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("c0"), F.col("doc_id").cast("string"))),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("long")
            % _NEG_NB
        ).alias("bkt"),
    )
    reps = bucketed.groupBy("bkt").agg(F.min("doc_id").alias("rep"))
    anchors = cands.select(F.col("doc_a").alias("anchor")).distinct()
    negs = (
        anchors.join(bucketed, anchors.anchor == bucketed.doc_id)
        .select("anchor", ((F.col("bkt") + _NEG_OFF) % _NEG_NB).alias("nbkt"))
        .join(F.broadcast(reps), F.col("nbkt") == F.col("bkt"))
        .where(F.col("rep") != F.col("anchor"))
        .select("anchor", F.col("rep").alias("partner"))
    )
    pos = cands.select(
        F.col("doc_a").alias("anchor"),
        F.col("doc_b").alias("partner"),
        F.lit(1).alias("label"),
    )
    return pos.unionByName(
        negs.select("anchor", "partner", F.lit(0).alias("label"))
    )


def _epoch_shards_sql() -> str:
    from w4h_etl_container_spark.plans.textops import _nib_sql

    nib = _nib_sql("hh", 4)
    return f"""
    WITH h AS (
      SELECT doc_id, md5('epoch7:' || CAST(doc_id AS VARCHAR)) AS hh
      FROM documents
    )
    SELECT doc_id,
           CAST(({nib}) % 8 AS INTEGER) AS shard,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY ({nib}) % 8 ORDER BY hh, doc_id
           ) AS BIGINT) AS pos
    FROM h
    """


@register(
    "q_epoch_shards",
    sql=_epoch_shards_sql(),
    survey_ids=("EXT-SAMPLE",),
    gate=False,
)
def q_epoch_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic EPOCH SHUFFLE + SHARD ASSIGNMENT — the step that
    turns a curated corpus into training input: every document gets a
    pseudorandom but REPRODUCIBLE position for epoch e by hashing
    ``'epoch{e}:' || doc_id`` (an epoch-seeded md5 — engine-neutral, so
    the oracle replays it bit-for-bit), a shard = hash % n_shards, and
    a within-shard position = rank of the hash. Different epochs
    permute independently; re-running an epoch reproduces it exactly
    (the determinism every resumable training job needs — no stored
    permutation table, no RNG state).

    Scale: one hash projection (no data movement) + one shuffle on the
    shard id; the per-shard ORDER BY sorts n/n_shards rows inside each
    writer task — exactly the work writing shuffled shards requires,
    with no global sort and no driver-side permutation. n_shards
    scales to the fleet (1024 shards → 1024-task epochs); the hash
    keys are 4 hex nibbles here for the oracle's nibble arithmetic —
    the production twin is xxhash64(seed, doc_id) with the identical
    plan shape."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    h = F.md5(F.concat(F.lit("epoch7:"), F.col("doc_id").cast("string")))
    from pyspark.sql import Window

    d = docs.select(
        "doc_id",
        h.alias("hh"),
        F.pmod(F.conv(F.substring(h, 1, 4), 16, 10).cast("long"), F.lit(8))
        .cast("int")
        .alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("hh", "doc_id")
    return d.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )
