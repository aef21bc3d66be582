"""Rehearsal: zone-map sidecar — build cost and range-probe latency
must stay flat as the file count grows 10x, and the footer build must
touch metadata only (O(files) I/O, no data scan).

Two date-clustered tables from the sf0.1 orders rows: 64 and 640 data
files. For each: build stats via BOTH regimes (footer metadata pass vs
pure-Spark scan — rows must agree), then time
(a) the driver-cached probe path (small-table regime),
(b) the Spark-filter probe path (big-table regime, forced via the
    per-instance cache-limit override), and
(c) a pruned read_range vs the full filtered scan, recording how many
    files each opened.

Run: python tools/rehearse_zonemap.py [sf_dir]
"""

from __future__ import annotations

import datetime as dt
import sys
import tempfile
import time

from pyspark.sql import functions as F

from globalweather_etl_spark.session import get_spark
from globalweather_etl_spark.sources import load_table
from globalweather_etl_spark.sources.snapshots import SnapshotTable

WIN = (dt.date(1996, 1, 1), dt.date(1996, 3, 31))


def rehearse(spark, orders, n_files: int) -> dict:
    t = SnapshotTable(
        spark, tempfile.mkdtemp(prefix=f"zm_{n_files}_") + "/t"
    )
    t.write_clustered(
        orders, cluster_by=["o_orderdate"], n_files=n_files,
        mode="overwrite",
    )
    t0 = time.perf_counter()
    t.build_stats(cols=["o_orderdate", "o_orderkey"], method="footer")
    footer_s = time.perf_counter() - t0
    footer_rows = sorted(
        tuple(r)
        for r in spark.read.parquet(
            t._zm_path(t.latest_version()).toString()
        ).collect()
    )
    t0 = time.perf_counter()
    t.build_stats(cols=["o_orderdate", "o_orderkey"], method="scan")
    scan_s = time.perf_counter() - t0
    scan_rows = sorted(
        tuple(r)
        for r in spark.read.parquet(
            t._zm_path(t.latest_version()).toString()
        ).collect()
    )
    assert footer_rows == scan_rows, "footer/scan sidecar mismatch"

    # cached path: first probe pays the one-time sidecar load
    t0 = time.perf_counter()
    cand = t.files_for_range("o_orderdate", *WIN)
    first_probe_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(20):
        t.files_for_range("o_orderdate", *WIN)
    cached_per_probe_ms = (time.perf_counter() - t0) / 20 * 1e3

    # big-table path: fresh handle forced onto the Spark probe
    big = SnapshotTable(spark, t.path)
    big._ZM_CACHE_FILE_LIMIT = 0
    assert sorted(big.files_for_range("o_orderdate", *WIN)) == sorted(
        cand
    )
    t0 = time.perf_counter()
    for _ in range(5):
        big.files_for_range("o_orderdate", *WIN)
    spark_per_probe_ms = (time.perf_counter() - t0) / 5 * 1e3

    # pruned read vs full scan (row parity + wall)
    t0 = time.perf_counter()
    n_pruned = t.read_range("o_orderdate", *WIN).count()
    pruned_read_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_full = (
        t.read()
        .filter(F.col("o_orderdate").between(*WIN))
        .count()
    )
    full_read_s = time.perf_counter() - t0
    assert n_pruned == n_full

    return {
        "n_files": n_files,
        "footer_build_s": round(footer_s, 2),
        "scan_build_s": round(scan_s, 2),
        "first_probe_s": round(first_probe_s, 3),
        "cached_per_probe_ms": round(cached_per_probe_ms, 3),
        "spark_per_probe_ms": round(spark_per_probe_ms, 1),
        "candidate_files": len(cand),
        "pruned_read_s": round(pruned_read_s, 2),
        "full_read_s": round(full_read_s, 2),
        "rows": n_full,
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    for n in (64, 640):
        print(rehearse(spark, orders, n), flush=True)


if __name__ == "__main__":
    main()
