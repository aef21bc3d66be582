"""Snapshot streaming-source rehearsal: per-batch overhead vs commit
count (streaming/snapshot_source.py).

The 100 TB claim under test: a micro-batch's driver-side cost is
O(commits in the window) of manifest JSON plus O(new files) of data —
NOT O(table size) and NOT O(total history). The rehearsal commits
``n_commits`` appends (so the table's history and file count grow),
then drains the stream in two regimes:

- **catch-up**: one availableNow drain over the whole history — the
  engine slices it into micro-batches; wall is O(total data), the
  per-row rate is the headline.
- **steady-state tail**: after the catch-up checkpoint, each further
  append is drained by its own availableNow run against a table whose
  history keeps growing — per-drain wall must stay FLAT in history
  length (the driver only lists manifests and reads the one new
  file).

Usage: python tools/rehearse_snapshot_stream.py [n_commits] [rows_per]
Prints one JSON line; paste into docs/PERF.md.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, ".")

from globalweather_etl_spark.session import get_spark
from globalweather_etl_spark.sources.snapshots import SnapshotTable
from globalweather_etl_spark.streaming.snapshot_source import (
    snapshot_stream,
)


def main() -> None:
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    rows_per = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    spark = get_spark(
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    base = tempfile.mkdtemp(prefix="ss_rehearse_")
    st = SnapshotTable(spark, base + "/t")
    out, ckpt = base + "/out", base + "/ckpt"

    def batch(i):
        return spark.range(i * rows_per, (i + 1) * rows_per).selectExpr(
            "id as k", "cast(id % 97 as double) as v"
        )

    t0 = time.perf_counter()
    st.write(batch(0), mode="overwrite")
    for i in range(1, n_commits):
        st.write(batch(i), mode="append")
    commit_wall = round(time.perf_counter() - t0, 2)

    def drain():
        q = (
            snapshot_stream(spark, st.path)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)

    t0 = time.perf_counter()
    drain()
    catchup_wall = round(time.perf_counter() - t0, 2)
    n_caught = spark.read.parquet(out).count()

    tail_walls = []
    for j in range(5):
        st.write(batch(n_commits + j), mode="append")
        t0 = time.perf_counter()
        drain()
        tail_walls.append(round(time.perf_counter() - t0, 2))
    n_total = spark.read.parquet(out).count()

    print(
        json.dumps(
            {
                "rehearsal": "snapshot_stream",
                "n_commits": n_commits,
                "rows_per_commit": rows_per,
                "commit_wall_sec": commit_wall,
                "catchup_wall_sec": catchup_wall,
                "catchup_rows_ok": n_caught == n_commits * rows_per,
                "tail_drain_walls_sec": tail_walls,
                "exactly_once_total_ok": n_total
                == (n_commits + 5) * rows_per,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
