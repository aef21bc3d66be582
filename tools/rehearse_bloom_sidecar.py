"""Rehearsal: Bloom file-index as a parquet sidecar — probe latency
must stay flat as the file count grows 10x, and the build must remain
ONE Spark job with no driver-side index materialization.

Two tables from the sf0.1 orders rows: 64 data files and 640 data
files (10x). For each: build the index, then time
(a) the driver-cached probe path (small-table regime) and
(b) the Spark-filter probe path (big-table regime, forced by zeroing
    the cache limit) — the path a million-file table would take.

Run: python tools/rehearse_bloom_sidecar.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
import time

from pyspark.sql import functions as F

from globalweather_etl_spark.session import get_spark
from globalweather_etl_spark.sources import load_table
from globalweather_etl_spark.sources.snapshots import SnapshotTable


def rehearse(spark, orders, n_files: int) -> dict:
    t = SnapshotTable(
        spark, tempfile.mkdtemp(prefix=f"bloom_{n_files}_") + "/t"
    )
    t.write(
        orders.repartition(n_files, "o_orderkey"), mode="overwrite"
    )
    t0 = time.perf_counter()
    stats = t.build_file_index("o_orderkey")
    build_s = time.perf_counter() - t0

    keys = [r["o_orderkey"] for r in orders.limit(200).collect()][:20]

    # cached path: first probe pays the one-time sidecar load
    t0 = time.perf_counter()
    t.files_for_key("o_orderkey", keys[0])
    first_probe_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_cand = 0
    for k in keys:
        n_cand += len(t.files_for_key("o_orderkey", k))
    cached_per_probe_ms = (time.perf_counter() - t0) / len(keys) * 1e3

    # big-table path: fresh handle, cache limit 0 -> Spark probe
    big = SnapshotTable(spark, t.path)
    big._IDX_CACHE_FILE_LIMIT = 0
    big.files_for_key("o_orderkey", keys[0])  # warm plans
    t0 = time.perf_counter()
    for k in keys[:5]:
        big.files_for_key("o_orderkey", k)
    spark_per_probe_ms = (time.perf_counter() - t0) / 5 * 1e3

    return {
        "n_files": stats["files"],
        "words": stats["words"],
        "build_s": round(build_s, 3),
        "first_probe_s": round(first_probe_s, 3),
        "cached_per_probe_ms": round(cached_per_probe_ms, 3),
        "spark_per_probe_ms": round(spark_per_probe_ms, 1),
        "mean_candidates": round(n_cand / len(keys), 2),
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    for n in (64, 640):
        print(f"files={n}: {rehearse(spark, orders, n)}", flush=True)


if __name__ == "__main__":
    main()
