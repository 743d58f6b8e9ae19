"""Declared-query registry.

Every implemented operator from SURVEY.md §2 registers here as a named
query: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL can
express it) the equivalent DuckDB oracle SQL. ``__spark_entry__.py`` exposes
this registry to the driver's correctness gate.

Column-name parity rule: every computed/aggregate column is aliased to the
same name in the Spark plan and the oracle SQL (the driver sorts columns by
name before value-hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None → rows-only check
    survey_ids: tuple[str, ...] = ()
    doc: str = ""


QUERIES: dict[str, Query] = {}

# Library tier: fully-implemented declared queries kept OFF the driver's
# gate (the gate caps at 50 rows; overlapping relational shapes ceded
# their slots to the round-4 corpus-pipeline operators; round 10
# rotated five relational shapes out for the round-9 additions; round
# 13 rotated seven floor-class twins out — q_agg_daily, q_agg_distinct,
# q_join_merge, q_win_funcs, q_top_customers, q_sf_datetime,
# q_stream_session, each with a gate twin still covering its SURVEY
# shape — so the driver hash-checks the newest, least-soaked code:
# q_mtable_merge, q_mtable_changes, q_mtable_delete_mor, q_png_decode,
# q_gif_decode, q_fuzzy_join, q_shared_runs. Round 14 continued the
# policy: q_percentile (AGG-6 twin q_agg_rollup stays), q_cosine_topk
# (EXT-SIM covered by q_ann_lsh/q_ann_probe/q_embed_neardup/
# q_quantize), q_media_features (EXT-MEDIA now gate-covered by four
# real decoders), and q_ngram_jaccard (EXT-DEDUP's most-soaked entry;
# its multi-tier crossover rows stay in bench10x) ceded their slots to
# the round-13 operators the gate had never hash-checked:
# q_mtable_merge_mor, q_mtable_bloom_delete, q_jpeg_decode,
# q_mp4_extract — and, breaking the gate-lags-a-round pattern both
# verdicts flagged, the SAME-round q_mtable_partitioned took
# q_stream_tumbling's slot (STR-5 keeps gate twins q_stream_dedup and
# q_sessionize). Round 15 continued: the SAME-round q_mtable_checks
# (write-time constraints) and q_mtable_evolution (partition-spec
# evolution + migration compaction) took the slots of q_dedup_exact
# (longest-soaked EXT-DEDUP entry; seven gate twins remain) and
# q_text_profile (EXT-TEXT keeps q_token_vocab/q_chunks/q_bm25).
# Round 16 rebalanced the category mix the r15 verdict flagged (eight
# mtable write-cycles were 47% of the sequential bench wall against
# trivial SELECT oracles): the four most-soaked cycles —
# q_mtable_merge, q_mtable_changes, q_mtable_delete_mor,
# q_mtable_bloom_delete (all ≥2 rounds hash-green; EXT-LAKEHOUSE keeps
# gate reps q_mtable_checks/q_mtable_evolution/q_mtable_partitioned/
# q_mtable_merge_mor) — ceded their slots to four never-gate-checked
# operators with real oracles: q_attribution (JOIN-4 interval join),
# q_scd2 (WIN-3/EXT-DQ interval build), q_rrf_fusion (EXT-SIM hybrid
# retrieval), q_incremental_dedup (EXT-DEDUP history-vs-batch) — and
# the SAME-round q_mtable_compact_split (target-honoring partitioned
# compaction, the r16 ADVICE fix, in-query split/re-coalesce
# assertions) took q_mtable_partitioned's slot (its spec shape stays
# gate-covered by q_mtable_evolution's mixed-spec cycle), and the
# SAME-round q_mtable_overwrite (dynamic partition overwrite with
# foreign-partition inode pins) took q_ann_lsh's (EXT-SIM keeps gate
# reps q_ann_probe / q_embed_neardup / q_quantize). Late r16: the
# SAME-round q_mtable_mv (incremental materialized view over the
# pre-image change feed; its churn-2 commit is an atomic MOR
# merge+delete, keeping a DV write cycle on the gate) took
# q_mtable_merge_mor's slot (three rounds hash-green).
# Library queries keep their oracle SQL and stay pinned by the pytest
# plan-shape and selfcheck-library suites — same code path, one
# registry flag.
LIBRARY: dict[str, Query] = {}


def register(
    name: str,
    sql: str | None = None,
    survey_ids: tuple[str, ...] = (),
    doc: str = "",
    gate: bool = True,
):
    """Decorator registering a declared query under ``name``.

    ``gate=False`` registers into the library tier: runnable and
    oracle-checked in tests, but not occupying one of the driver's 50
    CORRECTNESS slots."""

    def deco(fn):
        if name in QUERIES or name in LIBRARY:
            # a duplicate would let load_library() silently shadow the
            # gate entry — tests would then validate a different plan
            # than the one the driver hash-checks
            raise ValueError(f"query {name!r} already registered")
        target = QUERIES if gate else LIBRARY
        target[name] = Query(name=name, fn=fn, sql=sql, survey_ids=survey_ids, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def _import_plans() -> None:
    from w4h_etl_container_spark.plans import (  # noqa: F401
        relational,
        weather,
        textops,
        vectors,
        eventsops,
        extended,
        multimodalops,
        corpus,
        curation,
        analytics,
        retrieval,
        sketches,
        graph,
        quality,
        lakehouse,
    )


def load_all() -> dict[str, Query]:
    """Import every plan module (side effect: registration) and return the
    gate registry — the queries the driver hash-checks."""
    _import_plans()
    return QUERIES


def load_library() -> dict[str, Query]:
    """Gate queries plus the off-gate library tier (for tests and ad-hoc
    use). Names are disjoint between tiers."""
    _import_plans()
    return {**QUERIES, **LIBRARY}
