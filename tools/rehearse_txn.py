"""Multi-table transaction rehearsal: atomicity under a racing reader
plus the commit-overhead split at warehouse scale.

Seeds a catalog with a fact (``n`` rows) and two dims derived from it,
then runs ``n_rounds`` of transactional full rebuilds while a reader
thread continuously takes ``catalog.snapshot()`` pins and re-checks the
cross-table invariant the transaction exists to protect:

    every FACT row joins a dim row, and the fact's rebuild stamp
    equals both dims' rebuild stamps  (mixed stamps == the torn
    publish a non-transactional CTAS sequence exhibits)

What this measures (the 100 TB claims under test):

- **Atomicity is real under concurrency**: the reader must observe
  ZERO mixed-stamp states across every pin it takes while rebuilds
  race past it.  (A control run publishing the same rebuilds as plain
  sequential per-table commits shows the torn window is observable —
  the problem is real, not hypothetical.)
- **The pending window is metadata-only**: the wall-clock split must
  show data staging (size-proportional, nothing locked) dominating,
  and the publish+decide span (the only part other writers collide
  with) staying milliseconds and FLAT in data size — at 100 TB the
  lock window is the same few manifest writes.
- **Reader overhead is bounded**: snapshot() pins are one decision-log
  listing + one head resolution per table, unchanged by table size.

Usage: python tools/rehearse_txn.py [n] [n_rounds]
Prints one JSON line; paste into docs/PERF.md.
"""

from __future__ import annotations

import json
import sys
import tempfile
import threading
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from globalweather_etl_spark.session import get_spark  # noqa: E402
from globalweather_etl_spark.sources.catalog import (  # noqa: E402
    SnapshotCatalog,
)


def _frames(spark, n: int, stamp: int):
    fact = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 100).alias("dim_a_key"),
        (F.col("id") % 37).alias("dim_b_key"),
        F.lit(stamp).alias("stamp"),
    )
    dim_a = spark.range(100).select(
        F.col("id").alias("dim_a_key"), F.lit(stamp).alias("stamp")
    )
    dim_b = spark.range(37).select(
        F.col("id").alias("dim_b_key"), F.lit(stamp).alias("stamp")
    )
    return fact, dim_a, dim_b


def _stamps(cat, pins) -> set[int]:
    out = set()
    for name in ("fact", "dim_a", "dim_b"):
        v = pins.get(name)
        if v is None:
            return set()
        row = (
            cat.table(name)
            .read(v)
            .agg(F.min("stamp"), F.max("stamp"))
            .collect()[0]
        )
        out.update({row[0], row[1]})
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark(
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    root = tempfile.mkdtemp(prefix="txn-rehearsal-")
    cat = SnapshotCatalog(spark, root)

    # seed stamp 0
    fact, dim_a, dim_b = _frames(spark, n, stamp=0)
    with cat.begin() as txn:
        txn.write("fact", fact, mode="overwrite")
        txn.write("dim_a", dim_a, mode="overwrite")
        txn.write("dim_b", dim_b, mode="overwrite")

    mixed = 0
    pins_taken = 0
    stop = threading.Event()

    def _reader() -> None:
        nonlocal mixed, pins_taken
        while not stop.is_set():
            pins = cat.snapshot(["fact", "dim_a", "dim_b"])
            stamps = _stamps(cat, pins)
            pins_taken += 1
            if len(stamps) > 1:
                mixed += 1

    reader = threading.Thread(target=_reader, daemon=True)
    reader.start()

    rounds = []
    for r in range(1, n_rounds + 1):
        fact, dim_a, dim_b = _frames(spark, n, stamp=r)
        txn = cat.begin()
        t0 = time.monotonic()
        txn.write("fact", fact, mode="overwrite")
        txn.write("dim_a", dim_a, mode="overwrite")
        txn.write("dim_b", dim_b, mode="overwrite")
        # split the phases: stage (no locks) vs publish+decide window
        txn._stage_all(parallelism=3)
        t_staged = time.monotonic()
        txn.commit()
        t_done = time.monotonic()
        rounds.append(
            {
                "round": r,
                "stage_s": round(t_staged - t0, 3),
                "publish_decide_s": round(t_done - t_staged, 4),
            }
        )
    stop.set()
    reader.join(timeout=30)

    # control: the SAME rebuild as sequential per-table commits, with
    # a deliberate pause to show the torn window exists without txns
    fact, dim_a, dim_b = _frames(spark, n, stamp=99)
    cat.table("fact").write(fact, mode="overwrite")
    torn = _stamps(
        cat,
        {
            "fact": cat.table("fact").latest_visible_version(),
            "dim_a": cat.table("dim_a").latest_visible_version(),
            "dim_b": cat.table("dim_b").latest_visible_version(),
        },
    )
    cat.table("dim_a").write(dim_a, mode="overwrite")
    cat.table("dim_b").write(dim_b, mode="overwrite")

    print(
        json.dumps(
            {
                "rehearsal": "multi_table_txn",
                "n_fact_rows": n,
                "n_rounds": n_rounds,
                "reader_pins": pins_taken,
                "mixed_stamp_pins": mixed,
                "control_sequential_mixed_stamps": sorted(torn),
                "rounds": rounds,
            }
        )
    )


if __name__ == "__main__":
    main()
