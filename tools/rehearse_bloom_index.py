"""Per-file Bloom-index rehearsal: point lookups at 2M rows.

Builds a 2M-row snapshot table range-clustered into 32 files, builds
the per-file Bloom index over the key, then measures:

- index build wall (one bounded aggregate) and index size in words;
- for 8 point lookups: how many files the DRIVER-SIDE probe opens
  (range clustering means a present key's Bloom words live in ~1
  file) and the read_where wall, vs the same lookup as a full
  filtered scan of the head;
- absent-key lookups: files opened (expected 0) — the metadata-only
  answer an un-indexed table cannot give.

Usage: python tools/rehearse_bloom_index.py [n_rows]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark(
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "16g",
        },
    )
    root = tempfile.mkdtemp(prefix="bloomidx_rehearsal_")
    t = SnapshotTable(spark, f"{root}/tbl")
    t.write_clustered(
        spark.range(n).select(
            F.col("id").alias("k"), (F.col("id") % 97).alias("v")
        ),
        cluster_by=["k"],
        n_files=32,
    )

    t0 = time.perf_counter()
    # ~16 bits per key per file (62.5k keys/file) -> ~0.2% fp
    stats = t.build_file_index("k", num_bits=1 << 20, num_hashes=4)
    build_s = round(time.perf_counter() - t0, 2)

    present = [0, n // 3, n // 2, n - 1, 7, n // 5, n // 7, n - 12345]
    files_opened = []
    t0 = time.perf_counter()
    for k in present:
        files = t.files_for_key("k", k)
        files_opened.append(len(files))
        rows = t.read_where("k", k).collect()
        assert len(rows) == 1 and rows[0]["k"] == k
    lookup_s = round((time.perf_counter() - t0) / len(present), 3)

    t0 = time.perf_counter()
    for k in present[:2]:
        assert t.read().filter(F.col("k") == k).count() == 1
    full_scan_s = round((time.perf_counter() - t0) / 2, 3)

    absent_files = [len(t.files_for_key("k", n + i + 1)) for i in range(8)]

    print(
        json.dumps(
            {
                "n_rows": n,
                "n_files": 32,
                "index_build_s": build_s,
                "index_words": stats["words"],
                "present_files_opened": files_opened,
                "avg_lookup_s": lookup_s,
                "full_scan_lookup_s": full_scan_s,
                "absent_files_opened": absent_files,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
