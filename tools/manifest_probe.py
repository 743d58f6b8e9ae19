"""Manifest-scaling probe — measured evidence for the round-14
segmented-manifest claim (the r13 verdict's "largest remaining
structural driver cost").

Builds a manifest table with a FEW THOUSAND data files (the shape a
100 TB table's manifest actually has), then runs a trickle-merge
stream against it, measuring per commit:

* bytes WRITTEN to the manifest layer (descriptor + any new/rewritten
  segments) — the inline format rewrote the full file list + per-file
  stats every commit, so its per-commit bytes grow O(table files);
  the segmented format's must stay O(churn);
* the INLINE-equivalent bytes (len of the materialized manifest's
  JSON) for the same version — what the old format would have written;
* warm read_manifest wall (segment cache populated) — the per-read
  driver parse cost.

Usage: python tools/manifest_probe.py [n_files] [n_commits]
Prints one JSON line; paste the summary into PERF.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n_commits = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    from pyspark.sql import functions as F

    from w4h_etl_container_spark.pipeline import mtable as M
    from w4h_etl_container_spark.session import get_spark

    spark = get_spark("manifest-probe")
    d = tempfile.mkdtemp(prefix="manifest-probe-")
    mdir = os.path.join(d, "_manifests")

    # one commit, n_files files: the established-table shape
    df = spark.range(0, n_files * 4).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    ).repartition(n_files)
    t0 = time.time()
    M.mtable_create(spark, df, d)
    create_s = time.time() - t0

    def layer_bytes() -> dict[str, int]:
        return {
            f: os.path.getsize(os.path.join(mdir, f))
            for f in os.listdir(mdir)
            if f.endswith(".json")
        }

    per_commit = []
    for i in range(n_commits):
        before = layer_bytes()
        upd = spark.createDataFrame([(i * 7 + 1, -i)], "k long, v long")
        t0 = time.time()
        M.mtable_merge(spark, d, upd, "k")
        wall = time.time() - t0
        after = layer_bytes()
        written = sum(sz for f, sz in after.items() if f not in before)
        man = M.read_manifest(d)
        inline_equiv = len(
            json.dumps(
                {
                    k: v
                    for k, v in man.items()
                    if k not in ("segments", "segment_removed")
                }
            )
        )
        t0 = time.time()
        M.read_manifest(d)  # warm: segments cached
        read_ms = (time.time() - t0) * 1000
        per_commit.append(
            {
                "version": man["version"],
                "manifest_bytes_written": written,
                "inline_equiv_bytes": inline_equiv,
                "write_ratio": round(written / inline_equiv, 4),
                "warm_read_ms": round(read_ms, 2),
                "merge_wall_s": round(wall, 2),
                "n_segments": len(man["segments"]),
            }
        )
        print(f"# v{man['version']}: wrote {written}B vs inline "
              f"{inline_equiv}B ({written/inline_equiv:.1%}), "
              f"warm read {read_ms:.1f}ms", file=sys.stderr, flush=True)

    steady = per_commit[2:]  # skip the legacy→segment settle window
    out = {
        "n_files": n_files,
        "n_commits": n_commits,
        "create_s": round(create_s, 2),
        "steady_state": {
            "manifest_bytes_written_mean": int(
                sum(c["manifest_bytes_written"] for c in steady) / len(steady)
            ),
            "inline_equiv_bytes_mean": int(
                sum(c["inline_equiv_bytes"] for c in steady) / len(steady)
            ),
            "write_ratio_mean": round(
                sum(c["write_ratio"] for c in steady) / len(steady), 4
            ),
            "warm_read_ms_mean": round(
                sum(c["warm_read_ms"] for c in steady) / len(steady), 2
            ),
        },
        "per_commit": per_commit,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
