"""Sort-based data layout for parquet min/max skipping (SURVEY §4
extension): write a table so that selective scans prune row groups.

Parquet stores per-row-group (and per-page) min/max statistics; a scan
with a pushed predicate skips any unit whose range excludes the value.
That only pays off if the writer CLUSTERED the data — a randomly-laid
table has every file spanning the whole key domain, so nothing prunes.
At 100 TB this is the difference between reading 100 TB and reading one
file: layout is the cheapest query accelerator there is (one sort at
write time, amortized over every future scan).

``cluster_by`` = range-partition on the leading key (global clustering:
each output file owns a disjoint key range) + sort WITHIN partitions on
the full key list (row-group-level order for secondary keys). This is
the classic "linear clustering" layout — optimal for leading-key
predicates, blind for trailing-key-only ones (every file spans the
whole y-domain when sorted by (x, y)).

``zorder_by`` (round 8) = the interleaved alternative: quantize each
key to ``bits`` levels, bit-interleave the quantized coordinates into
one Morton key, then range-partition + sort on it. Every key column
gets ~balanced pruning power: a predicate on ANY of the k keys touches
~n_files^((k-1)/k) files instead of all of them (the Delta/Iceberg
OPTIMIZE ZORDER layout, Morton 1966). Hilbert ordering would shave the
Z-curve's long jumps (better worst-case locality, same asymptotics) at
the cost of a state-machine encode; Z is the standard default and what
ships here.

Cited reference behavior: the reference's serving table is implicitly
clustered by its snapshot date partitioning (`main.py` partitioned
upsert); this operator generalizes that to arbitrary keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cluster_by(df: DataFrame, cols: list[str], n_files: int | None = None) -> DataFrame:
    """Return ``df`` re-laid-out for min/max skipping on ``cols``:
    range-partitioned on the key prefix so each output partition (hence
    file, under one-file-per-partition writes) owns a disjoint range of
    the leading key, then sorted within partitions on the full key so
    row groups inside a file are also clustered.

    ``n_files`` bounds the output partition count (defaults to the
    session's shuffle partitions). The transformation is one range
    shuffle + local sort; write with
    ``cluster_by(df, ks).write.parquet(...)``."""
    if not cols:
        raise ValueError("cluster_by needs at least one column")
    parted = (
        df.repartitionByRange(n_files, *cols)
        if n_files is not None
        else df.repartitionByRange(*cols)
    )
    return parted.sortWithinPartitions(*cols)


def morton_key(quantized: list[Column], bits: int = 16) -> Column:
    """Bit-interleave ``k`` already-quantized coordinates (each in
    [0, 2^bits)) into one Morton key: output bit ``b·k + j`` is bit
    ``b`` of coordinate ``j``. Pure integer shift/mask expressions —
    ``bits·k`` codegen'd terms, zero UDFs. ``bits·k`` must fit 63 bits."""
    k = len(quantized)
    if not quantized:
        raise ValueError("morton_key needs at least one coordinate")
    if bits * k > 63:
        raise ValueError(f"bits*k = {bits * k} exceeds the 63-bit key budget")
    key = F.lit(0).cast("long")
    for j, q in enumerate(quantized):
        qc = q.cast("long")
        for b in range(bits):
            key = key + F.shiftleft(
                F.shiftright(qc, b).bitwiseAND(F.lit(1)), b * k + j
            )
    return key


def hilbert_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Hilbert-curve index of a quantized 2-d point (each coordinate in
    [0, 2^bits)) — the locality refinement over Morton order: the curve
    has no long diagonal jumps, so per-file bounding boxes are tighter
    for the same file count (what Databricks' liquid clustering and
    science-grid layouts use).

    The classic xy2d algorithm (Hilbert 1891; the bitwise form is the
    Warren, *Hacker's Delight* rendering): walk bit levels from the top,
    accumulate the quadrant index, and rotate the frame. Expressed as
    ONE native fold over the bit levels with a struct accumulator
    (d, x, y) — no UDF, no per-row Python; the rotation's swap/reflect
    arms are plain integer expressions. 2-d only (the standard case:
    lat/lon, x/y tiles); k-d generalizations belong on the Morton path."""
    if bits < 1 or 2 * bits > 62:
        raise ValueError("bits must be in [1, 31]")
    levels = F.sequence(F.lit(bits - 1), F.lit(0), F.lit(-1))
    init = F.struct(
        F.lit(0).cast("long").alias("d"),
        x.cast("long").alias("x"),
        y.cast("long").alias("y"),
    )

    def step(acc, lvl):
        # 2^lvl — shiftleft() takes only a literal int shift, so the
        # per-element level goes through pow (double-exact to 2^53)
        s = F.pow(F.lit(2.0), lvl.cast("double")).cast("long")
        rx = F.when(acc["x"].bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        ry = F.when(acc["y"].bitwiseAND(s) > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        d2 = acc["d"] + s * s * ((F.lit(3) * rx).bitwiseXOR(ry))
        # rotate: ry==0 → (reflect if rx==1, then swap x/y)
        refl_x = F.when((ry == 0) & (rx == 1), s - 1 - acc["x"]).otherwise(acc["x"])
        refl_y = F.when((ry == 0) & (rx == 1), s - 1 - acc["y"]).otherwise(acc["y"])
        nx = F.when(ry == 0, refl_y).otherwise(acc["x"])
        ny = F.when(ry == 0, refl_x).otherwise(acc["y"])
        return F.struct(d2.alias("d"), nx.alias("x"), ny.alias("y"))

    return F.aggregate(levels, init, step, lambda acc: acc["d"])


def zorder_by(
    df: DataFrame,
    cols: list[str],
    n_files: int | None = None,
    bits: int = 16,
    curve: str = "z",
) -> DataFrame:
    """Return ``df`` re-laid-out on the interleaved-curve index of
    ``cols`` so min/max skipping works on EVERY listed key, not just
    the leading one (module docstring). ``curve="z"`` (default) is the
    Morton interleave for any k; ``curve="hilbert"`` swaps in the
    Hilbert index (tighter per-file bounding boxes, 2-d only).

    Quantization is equi-width over each column's observed [min, max]
    (ONE tiny all-column aggregate, collected as a driver scalar — the
    same convergence-scalar pattern as the IVF centroids; a heavily
    skewed key clusters better under rank quantization — pass
    precomputed bucket columns and ``morton_key`` directly for that).
    The layout transformation itself is identical in cost to
    ``cluster_by``: one range shuffle + local sort, now on the derived
    key. Nulls quantize to bucket 0 (they sort together, first)."""
    if not cols:
        raise ValueError("zorder_by needs at least one column")
    if curve not in ("z", "hilbert"):
        raise ValueError(f"unknown curve {curve!r}")
    if curve == "hilbert" and len(cols) != 2:
        raise ValueError("hilbert curve layout is 2-d (pass exactly two columns)")
    # try_cast, not cast: under ANSI semantics a non-numeric key would
    # throw inside the stats job; NULL here feeds the explicit guard below
    stats = df.agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.min(F.col(c).try_cast("double")).alias(f"_mn_{c}") for c in cols],
        *[F.max(F.col(c).try_cast("double")).alias(f"_mx_{c}") for c in cols],
    ).collect()[0]
    levels = (1 << bits) - 1
    quantized = []
    for c in cols:
        mn, mx = stats[f"_mn_{c}"], stats[f"_mx_{c}"]
        if stats["_n"] > 0 and (mn is None or mx is None):
            # A non-castable (date/string) or all-NULL key would silently
            # quantize every row to bucket 0, losing pruning on that key.
            raise ValueError(
                f"zorder_by column {c!r} has no double-castable values "
                "(non-numeric type or all NULL); cast/encode it to a "
                "numeric bucket column first"
            )
        if mn is None or mx is None or mx <= mn:
            quantized.append(F.lit(0))
            continue
        q = F.floor(
            (F.col(c).cast("double") - F.lit(float(mn)))
            * F.lit(float(levels))
            / F.lit(float(mx - mn))
        ).cast("long")
        quantized.append(F.coalesce(F.least(q, F.lit(levels)), F.lit(0)))
    key = (
        hilbert_key(quantized[0], quantized[1], bits)
        if curve == "hilbert"
        else morton_key(quantized, bits)
    )
    zkey = "_zkey"
    while zkey in df.columns:
        zkey = "_" + zkey
    keyed = df.withColumn(zkey, key)
    parted = (
        keyed.repartitionByRange(n_files, zkey)
        if n_files is not None
        else keyed.repartitionByRange(zkey)
    )
    return parted.sortWithinPartitions(zkey).drop(zkey)


def pruning_report(path: str, col: str, lo, hi) -> dict:
    """Zone-map audit: read every data file's per-row-group min/max
    statistics for ``col`` (pyarrow footer reads — metadata only, no
    data pages) and report what a range scan ``lo <= col <= hi`` would
    skip. This is the measurement half of the layout operators above:
    ``cluster_by``/``zorder_by`` claim pruning power; this proves it on
    the actual written table, file by file, the way an operator would
    audit a 100 TB table before deciding whether a re-layout pays.

    Returns ``{"files": n, "files_skipped": n, "row_groups": n,
    "row_groups_skipped": n, "rows": n, "rows_skipped": n,
    "per_file": [(name, skipped_bool_all_groups, rows_skipped), ...]}``.
    A unit is skippable iff its [min, max] is disjoint from [lo, hi] —
    exactly parquet's stats-filter rule; units with missing stats are
    conservatively unprunable (same as every reader)."""
    import os

    import pyarrow.parquet as pq

    files = sorted(
        f
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    report = {
        "files": 0,
        "files_skipped": 0,
        "row_groups": 0,
        "row_groups_skipped": 0,
        "rows": 0,
        "rows_skipped": 0,
        "per_file": [],
    }
    for name in files:
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        try:
            ci = [md.schema.column(i).name for i in range(md.num_columns)].index(col)
        except ValueError:
            raise ValueError(f"column {col!r} not in {name}") from None
        report["files"] += 1
        file_rows_skipped = 0
        file_groups_skipped = 0
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            st = rg.column(ci).statistics
            report["row_groups"] += 1
            report["rows"] += rg.num_rows
            skip = (
                st is not None
                and st.has_min_max
                and (st.min > hi or st.max < lo)
            )
            if skip:
                report["row_groups_skipped"] += 1
                report["rows_skipped"] += rg.num_rows
                file_rows_skipped += rg.num_rows
                file_groups_skipped += 1
        all_skipped = (
            md.num_row_groups > 0 and file_groups_skipped == md.num_row_groups
        )
        if all_skipped:
            report["files_skipped"] += 1
        report["per_file"].append((name, all_skipped, file_rows_skipped))
    return report


def compact_table(
    spark,
    in_dir: str,
    out_dir: str,
    target_bytes: int = 128 << 20,
    sort_within_by: list[str] | None = None,
) -> dict:
    """Small-file compaction — the table-maintenance job every
    long-lived 100 TB dataset needs (streaming sinks and incremental
    appends accumulate KB-scale files; at 10⁶ files the NameNode/
    object-store LIST and the per-file open dominate scan time long
    before the bytes do).

    Sizing is computed from the INPUT's real on-disk bytes (the same
    footer-level honesty as ``pruning_report``): n_out =
    ⌈total_bytes / target_bytes⌉ output files via a round-robin
    ``repartition(n_out)`` — one full shuffle, the price of the
    rewrite, producing uniformly-sized files regardless of input skew.
    ``sort_within_by`` optionally restores WITHIN-FILE ordering on the
    way through (``sortWithinPartitions`` — no extra exchange beyond
    the repartition), which orders row groups inside each multi-group
    file; round-robin files still each span the whole key domain, so
    for FILE-level zone-map pruning compose with
    ``cluster_by``/``zorder_by`` instead (range partitioning — sized
    by key distribution rather than uniformly, the opposite trade).

    Writes to ``out_dir`` (overwrite): compaction is a REWRITE job —
    publish-then-swap is the caller's transaction (the same
    staging-directory contract as the curation job), never an
    in-place mutation of a live table. Returns a manifest dict with
    before/after file counts and row-count equality (verified here,
    not assumed)."""
    import math
    import os

    from pyspark.sql import functions as F

    df = spark.read.parquet(in_dir)
    files = df.inputFiles()
    total = 0
    for f in files:
        p = f[7:] if f.startswith("file://") else (f[5:] if f.startswith("file:") else f)
        total += os.path.getsize(p)
    n_out = max(1, math.ceil(total / target_bytes))
    out = df.repartition(n_out)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    out.write.mode("overwrite").parquet(out_dir)

    n_in = df.count()
    written = spark.read.parquet(out_dir)
    n_written = written.count()
    if n_in != n_written:
        raise RuntimeError(
            f"compact_table row-count mismatch: {n_in} in vs {n_written} out"
        )
    return {
        "files_in": len(files),
        "files_out": len(written.inputFiles()),
        "bytes_in": total,
        "target_bytes": target_bytes,
        "rows": n_in,
    }
