"""Manifest-log scaling rehearsal: commit/read metadata cost must stay
flat as the table's live file count grows.

Seeds a SnapshotTable and appends ``n_commits`` batches of
``files_per_commit`` files each (tiny rows — this measures METADATA,
not parquet I/O), tracking per-commit manifest bytes and wall, then
times head reads at several points.

What this measures (the 100 TB claims under test):

- **Commit metadata is O(new files), not O(table files)**: before the
  round-10 delta log every manifest enumerated every live file (twice,
  with a clustering stamp), so the JSON grew linearly with the table
  — at millions of files that is an O(table) serialize+parse on EVERY
  commit. With delta encoding, manifest bytes per commit must be flat
  across the run except one full checkpoint per interval.
- **Cold head resolution is bounded by the checkpoint interval**: a
  fresh reader walks at most ``interval`` raw manifests; its wall must
  not grow with total history length.
- **Correctness**: head row count and a grouped checksum equal the
  expected accumulation at the end; a mid-run version time-travels.

Usage: python tools/rehearse_manifest_checkpoint.py \
    [n_commits] [files_per_commit] [interval]
Prints one JSON line; paste into docs/PERF.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from globalweather_etl_spark.session import get_spark
from globalweather_etl_spark.sources.snapshots import SnapshotTable


def main() -> None:
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    files_per = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    interval = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    spark = get_spark(
        app_name="rehearse-manifest-checkpoint",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    root = tempfile.mkdtemp(prefix="gw_ckpt_") + "/t"
    t = SnapshotTable(spark, root, checkpoint_interval=interval)

    def manifest_bytes(v: int) -> int:
        p = os.path.join(
            root.removeprefix("file:"), "_manifests", f"v{v:08d}.json"
        )
        return os.path.getsize(p)

    commit_walls, sizes = [], []
    for i in range(n_commits):
        batch = spark.range(
            i * 1000, (i + 1) * 1000, 1, files_per
        ).select(F.col("id").alias("k"), (F.col("id") % 97).alias("g"))
        t0 = time.perf_counter()
        v = t.write(batch, mode="append")
        commit_walls.append(time.perf_counter() - t0)
        sizes.append(manifest_bytes(v))
    n_files_head = len(t._manifest(t.latest_version())["files"])

    def cold_read_wall() -> float:
        cold = SnapshotTable(spark, root, checkpoint_interval=interval)
        t0 = time.perf_counter()
        cold._manifest(cold.latest_version())
        return time.perf_counter() - t0

    # correctness: accumulation + mid-run time travel
    assert t.read().count() == n_commits * 1000
    mid = n_commits // 2
    assert t.read(mid).count() == mid * 1000

    def is_delta(v: int) -> bool:
        p = os.path.join(
            root.removeprefix("file:"), "_manifests", f"v{v:08d}.json"
        )
        with open(p, "r", encoding="utf-8") as f:
            return bool(json.load(f).get("delta"))

    delta_sizes = [
        s for v, s in enumerate(sizes, start=1) if is_delta(v)
    ]
    full_sizes = [
        s for v, s in enumerate(sizes, start=1) if not is_delta(v)
    ]
    q1 = delta_sizes[: len(delta_sizes) // 4]
    q4 = delta_sizes[-len(delta_sizes) // 4:]
    print(
        json.dumps(
            {
                "rehearsal": "manifest_checkpoint",
                "n_commits": n_commits,
                "files_per_commit": files_per,
                "interval": interval,
                "n_files_head": n_files_head,
                "delta_bytes_first_quarter_avg": round(
                    sum(q1) / len(q1)
                ),
                "delta_bytes_last_quarter_avg": round(
                    sum(q4) / len(q4)
                ),
                "max_full_manifest_bytes": max(full_sizes),
                "commit_wall_first_quarter_avg_s": round(
                    sum(commit_walls[: n_commits // 4])
                    / (n_commits // 4),
                    3,
                ),
                "commit_wall_last_quarter_avg_s": round(
                    sum(commit_walls[-(n_commits // 4):])
                    / (n_commits // 4),
                    3,
                ),
                "cold_head_resolve_s": round(cold_read_wall(), 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
