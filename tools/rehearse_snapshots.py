"""Snapshot-table rehearsal: a day of continuous ingestion, compressed.

Commits the sf0.1 documents corpus (100k rows) into a SnapshotTable as
N append batches (re-keyed per batch so every row is distinct), then
measures what the manifest-log design promises:

- commit latency stays flat as the table grows (O(new data) appends);
- reading the head scans the manifested file list directly (no
  directory listing);
- time travel to v1 and a head-vs-mid diff work after many commits;
- an overwrite + vacuum reclaims every unreferenced file and the
  survivors still read consistently.

Usage: python tools/rehearse_snapshots.py [sf_dir] [n_batches]
Prints one JSON line; paste the numbers into docs/PERF.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from globalweather_etl_spark.session import get_spark
from globalweather_etl_spark.sources import load_table
from globalweather_etl_spark.sources.snapshots import SnapshotTable


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    spark = get_spark(
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    base = tempfile.mkdtemp(prefix="snap-rehearse-")
    try:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "source"
        )
        n_docs = docs.count()
        t = SnapshotTable(spark, f"{base}/tbl")
        commit_s = []
        for b in range(n_batches):
            batch = docs.withColumn(
                "doc_id", F.col("doc_id") + F.lit(b * 10_000_000)
            )
            t0 = time.perf_counter()
            t.write_batch(batch, batch_id=b, mode="append")
            commit_s.append(round(time.perf_counter() - t0, 3))

        t0 = time.perf_counter()
        head_rows = t.read().count()
        read_head_s = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        v1_rows = t.read(1).count()
        read_v1_s = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        mid = n_batches // 2
        diff_counts = {
            r["diff_status"]: r["n"]
            for r in t.diff(mid, n_batches, ["doc_id"])
            .groupBy("diff_status")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        diff_s = round(time.perf_counter() - t0, 3)

        # retention flip: overwrite with half the head's rows (new data
        # files), then vacuum to the head only — every append-era file
        # becomes unreferenced and must be reclaimed
        t.write(
            t.read().filter(F.col("doc_id") % 2 == 0), mode="overwrite"
        )
        t0 = time.perf_counter()
        vac = t.vacuum(keep_last=1, unreferenced_grace=0.0)
        vacuum_s = round(time.perf_counter() - t0, 3)
        survivor_rows = t.read().count()

        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "n_batches": n_batches,
                    "rows_per_batch": n_docs,
                    "commit_s_first3": commit_s[:3],
                    "commit_s_last3": commit_s[-3:],
                    "read_head_s": read_head_s,
                    "head_rows": head_rows,
                    "read_v1_s": read_v1_s,
                    "v1_rows": v1_rows,
                    "diff_mid_vs_head_s": diff_s,
                    "diff_counts": diff_counts,
                    "vacuum": vac,
                    "vacuum_s": vacuum_s,
                    "survivor_rows": survivor_rows,
                }
            )
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
