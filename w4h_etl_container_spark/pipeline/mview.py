"""Incremental MATERIALIZED VIEWS over manifest tables — the layer
that turns "recompute the aggregate nightly" into "apply the change
feed" (reference parity: the job's whole merge-then-reaggregate loop,
`main.py:246-276` + `main.py:341-407`, is a hand-rolled single-view
refresh; here it is a general operator).

A view is ``SELECT group_by..., aggs... FROM base [WHERE filter]
GROUP BY group_by`` materialized as its OWN manifest table keyed on
the group columns, plus metadata — the definition, the base table
path, and the base VERSION the stored rows reflect — recorded in the
view table's committed manifest. Refresh reads the base's row-level
change feed in its COUNTED form (``mtable._changes_counted`` — one row
per changed row-value with signed multiplicity ``_mt_d``; the r17 fold:
the classification window and its explode that
``mtable_changes(pre_images=True)`` layers on top are pure overhead for
an algebraic consumer) between the recorded version and the base's
current version and applies it algebraically:

* ``count`` / ``sum`` / ``avg`` are self-maintainable: every counted
  feed row contributes a SIGNED delta weighted by its multiplicity
  (+d for rows appearing d more times, −d for rows removed d times);
  one ``groupBy`` over the feed — which
  is O(churned rows), never O(base) — yields per-group deltas that add
  onto the stored state. ``avg`` stores (sum, count) and divides at
  read time, so it stays exact whenever the sum is.
* ``min`` / ``max`` are self-maintainable on the INSERT side
  (``least``/``greatest`` against the stored value) but not under
  removals: a removed value that ties the stored extremum makes the
  group DIRTY, and dirty groups alone are recomputed from the base
  snapshot with a key semi-join (partition/stats pruning applies when
  the base is clustered by the group key). This is the standard MV
  treatment (Larson & Zhou, "Efficient Maintenance of Materialized
  Outer-Join Views", and every production MV engine): deletes against
  extrema need the base, everything else needs only the delta.

The refresh is ONE atomic commit on the view table: changed groups
upsert, vanished groups delete (``mtable_merge(deletes=...)``), and
the new base watermark rides the same manifest (``extra_meta``) — a
crash either publishes all of it or none, so a replayed refresh is
impossible by construction (it would see the already-advanced
watermark and no-op).

100 TB shape: refresh cost is O(churned files of the base) for the
feed scan + O(touched groups) for the view commit. The view never
rescans the base except for min/max dirty groups, and the commit
rewrites only the view files holding touched groups.
"""

from __future__ import annotations

import json
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from w4h_etl_container_spark.pipeline.mtable import (
    _carry_schema,
    _persist_no_aqe,
    _plan_no_aqe,
    _write_manifest,
    mtable_create,
    mtable_merge,
    mtable_read,
    read_manifest,
)

_FNS = ("count", "sum", "avg", "min", "max", "kmv")

#: KMV approximate-distinct state size and hash domain (matches
#: plans/sketches.py): the K smallest DISTINCT 60-bit hashes of the
#: column. K-min sets are UNION-maintainable — merging an insert
#: batch's k-min set into the stored one and re-truncating gives
#: exactly the from-scratch sketch (deterministic hash ⇒ incremental
#: ≡ recompute, bit for bit) — so the sketch refreshes like sum, and
#: only REMOVALS whose hash could sit inside the state (≤ the stored
#: maximum) dirty the group, exactly the min/max rule.
_KMV_K = 32
_KMV_DOMAIN = float(1 << 60)


def _kmv_hash(col: str):
    """60-bit md5-derived hash of the column's string form (same form
    as plans/sketches.py so estimates agree across the repo)."""
    return F.conv(
        F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10
    ).cast("long")

#: dirty min/max groups at or under this count recompute through a
#: data-skipping read (per-column IN-list pruning) instead of a full
#: base scan; the cap bounds the driver-side key collect, not
#: correctness (above it, the semi-join against the full read is the
#: same result)
_DIRTY_PRUNE_CAP = 64

#: Touched-group counts at or under this collect the refresh's merged
#: state frame to the driver ONCE (it is already materialized in the
#: cache by the classification job, and each stored state row is
#: bounded: group tuple + numeric sums/counts + ≤32-long kmv arrays) —
#: the upsert batch, the vanished-key set and the dirty-key set then
#: plan as LocalRelations: the dirty-key collect job disappears, the
#: view commit's planner/broadcast builds run driver-side with zero
#: Spark jobs, and Catalyst plans tiny local trees instead of the full
#: feed DAG for every commit action (r18). Above the cap the
#: distributed path runs unchanged — the cap bounds driver bytes, not
#: correctness.
_LOCAL_COMMIT_ROWS = 8192

#: mv_create sizes the state write as ceil(groups / this) files (capped
#: at session parallelism): view state rows are compact (group tuple +
#: numeric sums + ≤32-long kmv arrays ≈ 100-200 B), so ~2M rows ≈ a
#: few-hundred-MB parquet file — the guide's target band. Without it
#: the state's groupBy leaves shuffle-partition-many near-empty files
#: and every refresh commit pays per-file planning/rewrites forever.
_STATE_ROWS_PER_FILE = 2_000_000


def _norm_spec(group_by, aggs) -> tuple[list[str], dict[str, tuple[str, str]]]:
    gb = [group_by] if isinstance(group_by, str) else list(group_by)
    if not gb:
        raise ValueError("mview: group_by must name at least one column")
    norm: dict[str, tuple[str, str]] = {}
    for out, (fn, col) in aggs.items():
        if fn not in _FNS:
            raise ValueError(f"mview: unsupported aggregate {fn!r} (have {_FNS})")
        if fn != "count" and col == "*":
            raise ValueError(f"mview: {fn}(*) is not an aggregate; name a column")
        if out in gb:
            raise ValueError(f"mview: output {out!r} collides with a group column")
        norm[out] = (fn, col)
    if not norm:
        raise ValueError("mview: at least one aggregate is required")
    return gb, norm


def _state_aggs(aggs: dict[str, tuple[str, str]]) -> list:
    """The stored-state aggregate expressions for a FULL compute (create
    and dirty-group recompute share them)."""
    exprs = [F.count(F.lit(1)).alias("__rows")]
    for out, (fn, col) in aggs.items():
        if fn == "count":
            src = F.lit(1) if col == "*" else F.col(col)
            exprs.append(F.count(src).alias(f"__s_{out}"))
        elif fn in ("sum", "avg"):
            exprs.append(F.sum(col).alias(f"__s_{out}"))
            exprs.append(F.count(col).alias(f"__n_{out}"))
        elif fn == "min":
            exprs.append(F.min(col).alias(f"__v_{out}"))
        elif fn == "max":
            exprs.append(F.max(col).alias(f"__v_{out}"))
        else:  # kmv
            # the K smallest DISTINCT hashes; collect_set skips NULLs.
            # Scale note: collect_set materializes the group's full
            # distinct hash set before the slice — a production
            # deployment swaps in a bounded k-min aggregator (same
            # 32-long contract); the STATE and its maintenance algebra
            # are identical either way.
            # canonical array<bigint> (containsNull=true): collect_set
            # infers containsNull=false while the refresh's
            # union-with-empty path infers true — a merge would refuse
            # the "type change" unless both land on one spelling
            exprs.append(
                F.slice(
                    F.array_sort(F.collect_set(_kmv_hash(col))), 1, _KMV_K
                )
                .cast("array<bigint>")
                .alias(f"__kmv_{out}")
            )
    return exprs


def _refuse_null_groups(df: DataFrame, gb: list[str], context: str) -> int:
    cond = reduce(lambda a, b: a | b, [F.col(c).isNull() for c in gb])
    # ONE global-aggregate probe (r17): a limit(1) probe executeTakes
    # incrementally (1, 4, 16… partitions = a job cascade over the
    # not-yet-materialized state cache), and the common case — no NULL
    # anywhere — scans everything regardless; the max-flag aggregate is
    # a single Spark job with map-side partials that also materializes
    # the caller's persisted state for the write that follows. The row
    # count rides the same job (r18): the caller sizes the state write
    # from it.
    row = _plan_no_aqe(
        df.agg(
            F.max(F.when(cond, 1).otherwise(0)).alias("__has_null"),
            F.count(F.lit(1)).alias("__n"),
        )
    ).collect()[0]
    if row["__has_null"]:
        raise ValueError(
            f"mview {context}: NULL in group column(s) {gb} — the group "
            "tuple is the view table's merge key and NULL keys never "
            "equi-match; COALESCE upstream or exclude with the view filter"
        )
    return row["__n"]


def mv_create(
    spark: SparkSession,
    mv_dir: str,
    base_dir: str,
    *,
    group_by,
    aggs: dict[str, tuple[str, str]],
    key,
    where: str | None = None,
) -> dict:
    """Materialize the view (full compute, pinned to the base's current
    version) and record its definition + watermark in version 0's
    manifest. ``key`` is the BASE table's merge key (the change feed
    classifies on it). ``aggs`` maps output name → (fn, column) with
    fn ∈ count/sum/avg/min/max; ``("count", "*")`` counts rows.
    ``where`` is an optional SQL filter applied to base rows before
    grouping (and to every feed batch — filters commute with the
    signed-delta algebra because they are row-local)."""
    gb, aggs = _norm_spec(group_by, aggs)
    base_man = read_manifest(base_dir)
    base = mtable_read(spark, base_dir, version=base_man["version"])
    if where:
        base = base.where(where)
    # the NULL-group refusal runs on the STATE (one row per group, so a
    # NULL base key surfaces as a NULL-keyed group), persisted so the
    # base is scanned ONCE for check + materialization instead of twice
    # (r17 — the old base-side probe was a second full scan on clean
    # inputs, which is the common case)
    state = base.groupBy(*gb).agg(*_state_aggs(aggs)).persist()
    # fingerprint the referenced base columns' TYPES: a later base
    # widen/retype would make the signed deltas a wider type than the
    # stored state, and the refresh's align-cast would truncate
    # SILENTLY — refusal at refresh time needs the expectation recorded
    referenced = set(gb) | {
        col for (_fn, col) in aggs.values() if col != "*"
    } | set([key] if isinstance(key, str) else key)
    base_fields = {f.name: f.dataType.json() for f in base.schema.fields}
    if where:
        # columns referenced ONLY by the filter belong in the fingerprint
        # too (ADVICE r17): a later base rename/drop of one must hit the
        # deliberate 'recreate the view' refusal at refresh (not a cryptic
        # analysis error), and a retype must not silently change filter
        # semantics. Identifier-shaped tokens ∩ the base schema is a
        # conservative superset (a string literal spelling a column name
        # also pins it) — over-pinning only ever refuses more loudly,
        # never computes wrong results.
        import re

        referenced |= {
            t
            for t in re.findall(r"[A-Za-z_][A-Za-z0-9_]*", where)
            if t in base_fields
        }
    missing_ref = sorted(referenced - set(base_fields))
    if missing_ref:
        raise ValueError(
            f"mview create: referenced column(s) {missing_ref} not in the "
            f"base table schema {sorted(base_fields)}"
        )
    mv_meta = {
        "base_dir": base_dir,
        "base_version": base_man["version"],
        "col_types": {c: base_fields[c] for c in sorted(referenced)},
        "group_by": gb,
        # list-of-triples, not a dict: the manifest JSON round-trip
        # sorts object keys, and the view's declared column order must
        # survive it
        "aggs": [[o, fn, col] for o, (fn, col) in aggs.items()],
        "key": [key] if isinstance(key, str) else list(key),
        **({"where": where} if where else {}),
    }
    try:
        n_groups = _refuse_null_groups(state.select(*gb), gb, "create")
        # right-size the state files (guide §6 — small files hurt every
        # later read AND every refresh commit, which plans/rewrites per
        # file): the groupBy leaves shuffle-partition-many near-empty
        # parts (measured: a 25-row view landed as 15 files, so each
        # refresh's CoW commit re-read and re-planned 15 footers).
        # coalesce from the probe's row count — no extra job, reads the
        # persisted state.
        k = max(1, min(spark.sparkContext.defaultParallelism,
                       -(-n_groups // _STATE_ROWS_PER_FILE)))
        return mtable_create(
            spark, state.coalesce(k), mv_dir, extra_meta={"mv": mv_meta}
        )
    finally:
        state.unpersist()


def _mv_meta(mv_dir: str) -> dict:
    man = read_manifest(mv_dir)
    mv = man.get("mv")
    if not mv:
        raise ValueError(
            f"mview: {mv_dir} is not a materialized view (no 'mv' metadata "
            "in its manifest) — create it with mv_create"
        )
    return man


def mv_read(spark: SparkSession, mv_dir: str) -> DataFrame:
    """The view as a USER-FACING DataFrame: group columns + the declared
    aggregate outputs (avg divides its stored sum/count; an all-NULL
    group exposes NULL exactly as a full recompute would)."""
    man = _mv_meta(mv_dir)
    mv = man["mv"]
    stored = mtable_read(spark, mv_dir)
    cols = [F.col(c) for c in mv["group_by"]]
    for out, fn, _col in mv["aggs"]:
        if fn == "count":
            cols.append(F.col(f"__s_{out}").alias(out))
        elif fn == "sum":
            cols.append(
                F.when(F.col(f"__n_{out}") > 0, F.col(f"__s_{out}")).alias(out)
            )
        elif fn == "avg":
            cols.append(
                F.when(
                    F.col(f"__n_{out}") > 0,
                    F.col(f"__s_{out}") / F.col(f"__n_{out}"),
                ).alias(out)
            )
        elif fn == "kmv":
            # the standard KMV estimator: exact below K distinct
            # hashes (the state IS the set), else (K-1)·domain / kth
            st = F.col(f"__kmv_{out}")
            cols.append(
                F.when(F.size(st) < _KMV_K, F.size(st).cast("double"))
                .otherwise(
                    F.lit(float(_KMV_K - 1))
                    * F.lit(_KMV_DOMAIN)
                    / F.element_at(st, _KMV_K).cast("double")
                )
                .alias(out)
            )
        else:
            cols.append(F.col(f"__v_{out}").alias(out))
    return stored.select(*cols)


def mv_refresh(spark: SparkSession, mv_dir: str) -> dict:
    """Advance the view to the base table's CURRENT version by applying
    the change feed (see module docstring for the algebra). Returns a
    report: versions spanned, groups upserted/deleted, and how many
    groups needed a base recompute (min/max dirty set). Idempotent:
    a refresh against an unchanged base is a no-op; a feed window with
    zero row changes (pure compaction) advances the watermark with a
    metadata-only commit."""
    man = _mv_meta(mv_dir)
    mv = man["mv"]
    gb: list[str] = mv["group_by"]
    aggs = {o: (fn, col) for o, fn, col in mv["aggs"]}
    base_dir = mv["base_dir"]
    synced = mv["base_version"]
    base_man = read_manifest(base_dir)
    current = base_man["version"]
    if current == synced:
        return {"refreshed": False, "base_version": synced}
    if current < synced:
        raise ValueError(
            f"mview at {mv_dir}: base {base_dir} is at v{current} but the "
            f"view reflects v{synced} — the base was restored/vacuumed past "
            "the watermark; recreate the view"
        )
    # base ALTERs on referenced columns refuse loudly BEFORE any math:
    # a renamed/dropped column would fail analysis anyway (cryptically),
    # but a WIDENED one would flow wider deltas into the stored state's
    # align-cast and truncate silently
    if mv.get("col_types") and base_man.get("schema_json"):
        cur_fields = {
            f["name"]: f["type"]
            for f in json.loads(base_man["schema_json"])["fields"]
        }
        for c, tj in mv["col_types"].items():
            want = json.loads(tj)  # DataType.json() string → str | dict
            have = cur_fields.get(c)
            if have != want:
                raise ValueError(
                    f"mview at {mv_dir}: base column {c!r} changed from "
                    f"{want} to {have} since the view was created "
                    "(renamed/dropped/widened) — an incremental refresh "
                    "cannot absorb a type or name change; recreate the view"
                )

    def _stamp_only() -> dict:
        meta = _carry_schema(
            man,
            {
                "op": "mv-refresh",
                "parent": man["version"],
                "mv": {**mv, "base_version": current},
            },
        )
        _write_manifest(
            mv_dir,
            man["version"] + 1,
            man["files"],
            meta,
            file_stats=man.get("file_stats"),
            dv=man.get("dv"),
            bloom=man.get("bloom"),
        )
        return {
            "refreshed": True,
            "base_version": current,
            "groups_upserted": 0,
            "groups_deleted": 0,
            "groups_recomputed": 0,
        }

    # metadata-only window (set-checks, spec changes, an empty feed by
    # manifest identity): the endpoint manifests list the same files
    # under the same deletion vectors, so the diff is empty by
    # construction — stamp the watermark with ZERO Spark jobs instead
    # of scheduling an empty feed plan (the trickle-sink + nightly
    # maintain loop hits this constantly)
    old_man = read_manifest(base_dir, synced)
    if sorted(old_man["files"]) == sorted(base_man["files"]) and {
        f: sorted(v) for f, v in (old_man.get("dv") or {}).items()
    } == {f: sorted(v) for f, v in (base_man.get("dv") or {}).items()}:
        return _stamp_only()

    # ROW-PRESERVING window (r17 — the post-maintain refresh fix): when
    # every commit between the watermark and the head is an op that
    # cannot change the table's logical row multiset (compaction —
    # its row conservation is checked at commit; constraint/spec/
    # metadata-only schema changes), the feed is empty BY THE OP
    # ALGEBRA even though the file lists differ — stamp the watermark
    # without building (or running) the feed plan over the rewritten
    # files. A missing intermediate manifest (vacuumed history) or any
    # row-changing op falls through to the real diff.
    _ROW_PRESERVING = {
        "compact", "set-checks", "set-partitioning", "reset-epochs",
        "add-columns", "drop-columns", "rename-column", "widen-column",
    }
    try:
        if all(
            read_manifest(base_dir, v).get("op") in _ROW_PRESERVING
            for v in range(synced + 1, current + 1)
        ):
            return _stamp_only()
    except FileNotFoundError:
        pass

    # the refresh consumes the feed's COUNTED form — one row per
    # changed row-value with signed multiplicity _mt_d — because the
    # signed-delta algebra only needs multiplicities: the change-feed
    # classification window (an extra exchange over the churned rows)
    # and its explode never run (r17; was mtable_changes(pre_images=True))
    from w4h_etl_container_spark.pipeline.mtable import _changes_counted

    feed, _cols = _changes_counted(spark, base_dir, synced, current)
    if feed is None:
        return _stamp_only()
    if mv.get("where"):
        feed = feed.where(mv["where"])
    d = F.col("_mt_d")

    delta_aggs = [F.sum(d).alias("__d_rows")]
    for out, (fn, col) in aggs.items():
        if fn == "count":
            src = (
                d
                if col == "*"
                else F.when(F.col(col).isNotNull(), d).otherwise(F.lit(0))
            )
            delta_aggs.append(F.sum(src).alias(f"__ds_{out}"))
        elif fn in ("sum", "avg"):
            delta_aggs.append(
                F.sum(
                    F.when(F.col(col).isNotNull(), d * F.col(col)).otherwise(
                        F.lit(0)
                    )
                ).alias(f"__ds_{out}")
            )
            delta_aggs.append(
                F.sum(
                    F.when(F.col(col).isNotNull(), d).otherwise(F.lit(0))
                ).alias(f"__dn_{out}")
            )
        elif fn == "min":
            delta_aggs.append(F.min(F.when(d > 0, F.col(col))).alias(f"__ins_{out}"))
            delta_aggs.append(F.min(F.when(d < 0, F.col(col))).alias(f"__rm_{out}"))
        elif fn == "max":
            delta_aggs.append(F.max(F.when(d > 0, F.col(col))).alias(f"__ins_{out}"))
            delta_aggs.append(F.max(F.when(d < 0, F.col(col))).alias(f"__rm_{out}"))
        else:  # kmv: k-min set of inserted hashes; smallest removed hash
            delta_aggs.append(
                F.slice(
                    F.array_sort(
                        F.collect_set(F.when(d > 0, _kmv_hash(col)))
                    ),
                    1,
                    _KMV_K,
                ).alias(f"__kins_{out}")
            )
            delta_aggs.append(
                F.min(F.when(d < 0, _kmv_hash(col))).alias(f"__krm_{out}")
            )

    delta = feed.groupBy(*gb).agg(*delta_aggs)

    stored = mtable_read(spark, mv_dir, version=man["version"])
    m, d = stored.alias("m"), delta.alias("d")
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"m.{c}").eqNullSafe(F.col(f"d.{c}")) for c in gb],
    )
    # right join, not full outer: untouched groups stay in their files
    # verbatim (the merge below never reads them) — only groups the
    # delta names participate
    j = m.join(d, cond, "right")
    rows_new = F.coalesce(F.col("m.__rows"), F.lit(0)) + F.col("d.__d_rows")

    sel = [F.col(f"d.{c}").alias(c) for c in gb]
    sel.append(rows_new.alias("__rows"))
    dirty = F.lit(False)
    for out, (fn, _col) in aggs.items():
        if fn == "count":
            sel.append(
                (
                    F.coalesce(F.col(f"m.__s_{out}"), F.lit(0))
                    + F.col(f"d.__ds_{out}")
                ).alias(f"__s_{out}")
            )
        elif fn in ("sum", "avg"):
            sel.append(
                (
                    F.coalesce(F.col(f"m.__s_{out}"), F.lit(0))
                    + F.col(f"d.__ds_{out}")
                ).alias(f"__s_{out}")
            )
            sel.append(
                (
                    F.coalesce(F.col(f"m.__n_{out}"), F.lit(0))
                    + F.col(f"d.__dn_{out}")
                ).alias(f"__n_{out}")
            )
        elif fn == "min":
            sel.append(
                F.least(F.col(f"m.__v_{out}"), F.col(f"d.__ins_{out}")).alias(
                    f"__v_{out}"
                )
            )
            # a removal at-or-below the stored minimum may have been the
            # minimum itself (multiplicity is unknowable from the state)
            # — recompute; stored-NULL with a non-null removal is a
            # state mismatch, recompute that too
            rm = F.col(f"d.__rm_{out}")
            dirty = dirty | (
                rm.isNotNull()
                & (
                    F.col(f"m.__v_{out}").isNull()
                    | (rm <= F.col(f"m.__v_{out}"))
                )
            )
        elif fn == "max":
            sel.append(
                F.greatest(
                    F.col(f"m.__v_{out}"), F.col(f"d.__ins_{out}")
                ).alias(f"__v_{out}")
            )
            rm = F.col(f"d.__rm_{out}")
            dirty = dirty | (
                rm.isNotNull()
                & (
                    F.col(f"m.__v_{out}").isNull()
                    | (rm >= F.col(f"m.__v_{out}"))
                )
            )
        else:  # kmv: union + re-truncate is EXACTLY the from-scratch
            # sketch (k-min sets are union-maintainable); a removal
            # whose hash is at or under the stored maximum may sit
            # inside the state — recompute, same rule as min/max
            st = F.col(f"m.__kmv_{out}")
            ins = F.col(f"d.__kins_{out}")
            empty = F.array().cast("array<long>")
            sel.append(
                F.slice(
                    F.array_sort(
                        F.array_union(
                            F.coalesce(st, empty), F.coalesce(ins, empty)
                        )
                    ),
                    1,
                    _KMV_K,
                ).alias(f"__kmv_{out}")
            )
            rm = F.col(f"d.__krm_{out}")
            kmax = F.when(
                st.isNotNull() & (F.size(st) > 0),
                F.element_at(st, F.size(st)),
            )
            dirty = dirty | (
                rm.isNotNull() & (kmax.isNull() | (rm <= kmax))
            )
    # the touched-groups frame is O(churned groups) by construction —
    # registering its cache through the no-AQE companion session keeps
    # the materialization (under the stats collect below) one Spark job
    merged = _persist_no_aqe(j.select(*sel, dirty.alias("__dirty")))
    try:
        # ONE job classifies every touched group (negative-rows
        # corruption, vanished, dirty, clean, NULL group keys) — the
        # per-class counts the report needs anyway
        null_g = reduce(
            lambda a, b: a | b, [F.col(c).isNull() for c in gb]
        )
        stats = _plan_no_aqe(merged.agg(
            F.count(F.lit(1)).alias("touched"),
            F.sum(F.when(null_g, 1).otherwise(0)).alias("nullg"),
            F.sum(F.when(F.col("__rows") < 0, 1).otherwise(0)).alias("neg"),
            F.sum(F.when(F.col("__rows") == 0, 1).otherwise(0)).alias("van"),
            F.sum(
                F.when((F.col("__rows") > 0) & F.col("__dirty"), 1).otherwise(0)
            ).alias("dirty"),
            # the touched groups' per-column key box rides the same job:
            # it pre-validates the view commit below (the merge's own
            # batch-validation aggregate re-derives exactly these facts,
            # so handing them over skips one Spark job per refresh — r17)
            *[
                m
                for c in gb
                for m in (
                    F.min(c).alias(f"__mn_{c}"),
                    F.max(c).alias(f"__mx_{c}"),
                )
            ],
        )).collect()[0]
        if stats["touched"] == 0:
            # pure-compaction window (rewritten files, identical rows)
            # or the filter excluded all churn: nothing to apply, but
            # the watermark must still advance or the next refresh
            # re-diffs this window forever
            return _stamp_only()
        if stats["nullg"]:
            raise ValueError(
                f"mview refresh at {mv_dir}: NULL in group column(s) {gb} "
                "entered the base — the group tuple is the view table's "
                "merge key and NULL keys never equi-match; COALESCE "
                "upstream or exclude with the view filter"
            )
        if stats["neg"]:
            raise ValueError(
                f"mview at {mv_dir}: refresh drove a group's row count "
                "negative — the stored state disagrees with the change "
                "feed (was the base restored across the watermark, or "
                "the view table written to directly?); recreate the view"
            )
        n_dirty = stats["dirty"]
        n_del = stats["van"]
        local_rows = None
        if stats["touched"] <= _LOCAL_COMMIT_ROWS:
            # LOCAL COMMIT (r18): the merged frame is already
            # materialized in the cache by the classification job —
            # one cheap collect puts every touched group's state in
            # hand, and the commit's inputs below become
            # LocalRelations (see _LOCAL_COMMIT_ROWS)
            local_rows = _plan_no_aqe(merged).collect()
        from pyspark.sql import types as T

        from w4h_etl_container_spark.pipeline.mtable import _local_df

        gb_schema = T.StructType([merged.schema[c] for c in gb])
        out_fields = [f for f in merged.schema.fields if f.name != "__dirty"]
        if local_rows is not None:
            # all-or-nothing: every commit input must land as a true
            # LocalRelation or the distributed branch runs unchanged
            vanished_l = _local_df(
                spark,
                [tuple(r[c] for c in gb) for r in local_rows if r["__rows"] == 0],
                gb_schema,
            )
            upserts_l = _local_df(
                spark,
                [
                    tuple(r[f.name] for f in out_fields)
                    for r in local_rows
                    if r["__rows"] > 0 and not r["__dirty"]
                ],
                T.StructType(out_fields),
            )
            dirty_tuples = [
                tuple(r[c] for c in gb)
                for r in local_rows
                if r["__rows"] > 0 and r["__dirty"]
            ]
            dirty_l = _local_df(spark, dirty_tuples, gb_schema)
            if vanished_l is None or upserts_l is None or dirty_l is None:
                local_rows = None
        commit_local = local_rows is not None
        if local_rows is not None:
            vanished = vanished_l
            upserts = upserts_l
        else:
            vanished = merged.where(F.col("__rows") == 0).select(*gb)
            upserts = merged.where(
                (F.col("__rows") > 0) & ~F.col("__dirty")
            ).drop("__dirty")
        if n_dirty:
            if local_rows is not None:
                dirty_keys = dirty_l
            else:
                dirty_keys = merged.where(
                    (F.col("__rows") > 0) & F.col("__dirty")
                ).select(*gb)
            if n_dirty <= _DIRTY_PRUNE_CAP:
                # a small dirty set prunes the recompute scan through
                # the manifest's data-skipping reads: per-column
                # IN-lists refute files at PLANNING time (exact on a
                # base clustered/partitioned by the group columns;
                # conservative no-op otherwise), and the semi-join
                # below stays the correctness filter either way. The
                # collect is bounded by the cap — never by group
                # cardinality (and skipped entirely when the local
                # commit path already holds the rows).
                from w4h_etl_container_spark.pipeline.mtable import (
                    mtable_read_pruned,
                )

                if local_rows is not None:
                    bounds = {
                        c: sorted({t[i] for t in dirty_tuples})
                        for i, c in enumerate(gb)
                    }
                else:
                    rows = _plan_no_aqe(dirty_keys).collect()
                    bounds = {c: sorted({r[c] for r in rows}) for c in gb}
                base = mtable_read_pruned(
                    spark, base_dir, bounds, version=current
                )
            else:
                base = mtable_read(spark, base_dir, version=current)
            if mv.get("where"):
                base = base.where(mv["where"])
            recomp = (
                base.join(F.broadcast(dirty_keys), gb, "left_semi")
                .groupBy(*gb)
                .agg(*_state_aggs(aggs))
            )
            if local_rows is not None:
                # the recompute output is one row per dirty group —
                # bounded by the same cap that admitted the local
                # commit. Collect it (this is the recompute's one real
                # job; the scan work is identical) and stitch the union
                # driver-side so the whole upsert batch stays a
                # LocalRelation: the view commit's planner collect and
                # its broadcast builds stay job-free (r18).
                out_names = [f.name for f in out_fields]
                rec_rows = _plan_no_aqe(recomp.select(*out_names)).collect()
                stitched = _local_df(
                    spark,
                    [
                        tuple(r[f.name] for f in out_fields)
                        for r in local_rows
                        if r["__rows"] > 0 and not r["__dirty"]
                    ]
                    + [tuple(r[n] for n in out_names) for r in rec_rows],
                    T.StructType(out_fields),
                )
                if stitched is not None:
                    upserts = stitched
                else:
                    commit_local = False
                    # the recompute rows are in hand either way — a
                    # LogicalRDD union is still cheaper than re-running
                    # the recompute under the merge, but correctness
                    # only needs SOME frame with these rows
                    upserts = upserts.unionByName(
                        spark.createDataFrame(
                            [tuple(r[n] for n in out_names) for r in rec_rows],
                            T.StructType(out_fields),
                        )
                    )
            else:
                upserts = upserts.unionByName(recomp)
        # align the upsert batch to the stored schema's column order and
        # types (sum deltas over an empty side widen long→long, but a
        # double-typed stored sum must stay double)
        upserts = upserts.select(
            *[
                F.col(f.name).cast(f.dataType).alias(f.name)
                for f in stored.schema.fields
            ]
        )
        if local_rows is None:
            # pre-register the upsert batch's cache without AQE (the
            # merge's own persist() is then a no-op re-registration):
            # the batch is O(touched groups) — its materialization
            # under the planner's key collect stays one job instead of
            # a stage cascade. A local batch skips the cache entirely:
            # persisting a LocalRelation would ADD a materialization
            # job to a frame the driver already holds.
            upserts = _persist_no_aqe(upserts)
        # ONE atomic commit whatever the mix: merge accepts an empty
        # upsert side when deletes are present, so even an
        # all-groups-vanished refresh publishes data + watermark
        # together — no crash window between "state changed" and
        # "watermark advanced"
        mtable_merge(
            spark,
            mv_dir,
            upserts,
            key=gb,
            deletes=vanished if n_del else None,
            extra_meta={"mv": {**mv, "base_version": current}},
            expected_version=man["version"],
            # the classification aggregate above already proved this
            # batch non-empty, NULL-free, one-row-per-group and
            # side-disjoint (upserts ⇔ __rows > 0, deletes ⇔ __rows == 0)
            # and computed the union key box — skip the merge's own
            # validation job (ignored if the view table carries checks)
            _prevalidated={
                "n_keys": stats["touched"],
                "n_rows": stats["touched"] - n_del,
                "n_upd_keys": stats["touched"] - n_del,
                "key_box": {
                    c: (stats[f"__mn_{c}"], stats[f"__mx_{c}"]) for c in gb
                },
                # certify the commit inputs as driver-built
                # LocalRelations (upserts, vanished, and the stitched
                # dirty recompute) — the merge then skips persists and
                # plans everything locally without sniffing (r18)
                "local_batch": commit_local,
            },
        )
        return {
            "refreshed": True,
            "base_version": current,
            "groups_upserted": stats["touched"] - n_del,
            "groups_deleted": n_del,
            "groups_recomputed": n_dirty,
        }
    finally:
        merged.unpersist()
