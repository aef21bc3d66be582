"""Columnar-checkpoint rehearsal: checkpoint publish/parse cost at
large file counts, JSON-inline vs parquet sidecar (round 11).

The round-10 delta log made COMMITS O(files-touched), but every
checkpoint still serialized the full listing as one JSON blob parsed
whole on cold resolve — at millions of files, GB-scale driver
serialize/parse. Round 11 stores big checkpoint listings as parquet
sidecars (snapshots.py _FILES_EXT_MIN): dictionary+snappy bytes,
vectorized pyarrow decode, Spark-readable.

This rehearsal is METADATA-ONLY: manifests are published directly via
the encode choke point with synthetic file names (no data files), so
it measures exactly the serialize/store/parse path at file counts a
real local run could never reach. For each n_files it times, for both
storage regimes:

  - checkpoint publish wall (encode + store)
  - stored bytes (JSON + sidecar)
  - cold head resolve wall (fresh table object, empty cache)
  - one delta commit wall on top of the checkpoint (must be flat)

Usage: python tools/rehearse_parquet_checkpoint.py [n_files ...]
Prints one JSON line per (n_files, regime); paste into docs/PERF.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

from globalweather_etl_spark.session import get_spark
from globalweather_etl_spark.sources.snapshots import SnapshotTable


def run(spark, n_files: int, externalize: bool) -> dict:
    root = tempfile.mkdtemp(prefix="gw_pqckpt_") + "/t"
    t = SnapshotTable(
        spark,
        root,
        checkpoint_interval=16,
        files_ext_threshold=(1 if externalize else 10**12),
    )
    files = [
        f"data/part-{i:07d}-{i * 2654435761 % 2**32:08x}.snappy.parquet"
        for i in range(n_files)
    ]
    m1 = {
        "version": 1,
        "parent": None,
        "mode": "overwrite",
        "schema": '{"type":"struct","fields":[]}',
        "files": files,
        "n_rows": n_files * 1000,
    }
    t0 = time.perf_counter()
    assert t._publish_manifest(m1, 1)
    publish_wall = time.perf_counter() - t0

    mdir = root + "/_manifests"
    stored = sum(
        os.path.getsize(os.path.join(mdir, n))
        for n in os.listdir(mdir)
        if not n.startswith(".") and not n.endswith(".lock")
    )

    # one delta on top: must be O(files touched)
    m2 = {
        "version": 2,
        "parent": 1,
        "mode": "append",
        "schema": m1["schema"],
        "files": files + ["data/part-new-0001.snappy.parquet"],
        "n_rows": m1["n_rows"] + 1000,
    }
    t0 = time.perf_counter()
    # the append path's delta hint (adds known by construction) —
    # skips the O(table-files) set diff the encoder otherwise runs
    assert t._publish_manifest(
        m2, 2, delta_hint=(["data/part-new-0001.snappy.parquet"], [])
    )
    delta_wall = time.perf_counter() - t0
    delta_bytes = os.path.getsize(os.path.join(mdir, "v00000002.json"))

    t0 = time.perf_counter()
    cold = SnapshotTable(spark, root)
    head = cold._manifest(2)
    cold_wall = time.perf_counter() - t0
    assert len(head["files"]) == n_files + 1

    return {
        "metric": "parquet_checkpoint_rehearsal",
        "n_files": n_files,
        "regime": "parquet" if externalize else "json",
        "publish_wall_s": round(publish_wall, 4),
        "stored_bytes": stored,
        "delta_wall_s": round(delta_wall, 4),
        "delta_bytes": delta_bytes,
        "cold_resolve_s": round(cold_wall, 4),
    }


def main() -> None:
    counts = [int(a) for a in sys.argv[1:]] or [10_000, 100_000, 500_000]
    spark = get_spark(
        app_name="rehearse-parquet-checkpoint",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    for n in counts:
        for ext in (False, True):
            print(json.dumps(run(spark, n, ext)))


if __name__ == "__main__":
    main()
