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


def rehearse_partitions_flatness(n_commits: int = 5000) -> dict:
    """Driver-only rehearsal (VERDICT r7 item 3): per-batch
    partitions() wall must be flat in TOTAL history length, not just
    window size. partitions() touches nothing but manifest JSON, so
    the table is fabricated as bare manifests (no Spark, no data
    files) — which lets history reach thousands of commits in
    seconds. A steady-state 1-commit window is timed cold (baseline
    manifest read) and warm (tail cache) at growing history lengths;
    the old from-version-0 walk would scale linearly here."""
    import os

    from pyspark.sql.types import StructType, StructField, LongType

    from globalweather_etl_spark.streaming.snapshot_source import (
        SnapshotStreamReader,
        _MANIFEST_DIR,
    )

    root = tempfile.mkdtemp(prefix="ss_parts_") + "/t"
    mdir = os.path.join(root, _MANIFEST_DIR)
    os.makedirs(mdir)
    schema = StructType([StructField("k", LongType())])
    files: list[str] = []
    out: dict = {
        "rehearsal": "snapshot_stream_partitions",
        # residual wall growth with history is manifest SIZE (each
        # append manifest lists every live file, so parsing two
        # manifests is O(table files)) plus one listdir — NOT manifest
        # open count, which this rehearsal pins at window+1/window.
        # The pre-fix walk opened O(history) manifests of O(files)
        # entries each: quadratic where this is linear.
        "points": [],
    }
    written = 0

    def fabricate(upto: int) -> None:
        nonlocal written
        for v in range(written + 1, upto + 1):
            files.append(f"data/c-{v:08x}/part-0.parquet")
            m = {
                "version": v,
                "parent": v - 1 if v > 1 else None,
                "mode": "append" if v > 1 else "overwrite",
                "schema": schema.json(),
                "files": list(files),
                "n_rows": v,
            }
            with open(
                os.path.join(mdir, f"v{v:08d}.json"), "w"
            ) as f:
                json.dump(m, f)
        written = upto

    for hist in (100, 1000, n_commits):
        fabricate(hist)
        reader = SnapshotStreamReader(schema, {"path": root})
        t0 = time.perf_counter()
        parts = reader.partitions(
            {"version": hist - 1}, {"version": hist}
        )
        cold_ms = (time.perf_counter() - t0) * 1000
        assert len(parts) == 1
        fabricate(hist + 1)
        t0 = time.perf_counter()
        parts = reader.partitions(
            {"version": hist}, {"version": hist + 1}
        )
        warm_ms = (time.perf_counter() - t0) * 1000
        assert len(parts) == 1
        out["points"].append(
            {
                "history_commits": hist,
                "cold_window1_ms": round(cold_ms, 2),
                "warm_window1_ms": round(warm_ms, 2),
            }
        )
    return out


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--partitions-only":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
        print(json.dumps(rehearse_partitions_flatness(n)))
        return
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
