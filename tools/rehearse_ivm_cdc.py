"""IVM RETRACTION rehearsal: CDC refresh cost vs recompute at 5M rows.

Extends tools/rehearse_ivm.py (insert-only) to the round-7 retraction
path: after seeding the state with ``n`` synthetic rows in
``n_batches`` insert folds, ``n_cdc`` CDC batches each UPDATE a small
deterministic slice (~``touch_pct`` of rows) by folding the -old/+new
op pairs through ``apply_batch_cdc`` — the change stream a MERGE
upsert induces. One CDC batch also routes rows through PHANTOM groups
that exist only between their insert and retraction, exercising the
zero-live group-deletion arm at scale.

What this measures (the 100 TB claims under test):

- **CDC refresh is O(batch + touched groups), flat in history**: the
  per-CDC-batch wall must not grow with total rows landed, and must
  beat the from-scratch recompute that a dashboard without IVM pays.
- **Retraction exactness at scale**: the final state must be
  BIT-identical to the from-scratch GROUP BY over the net data —
  5M rows of DECIMAL partial arithmetic with ~100k op rows folded
  through, not the 60k-row graded scale.
- **read_changes cost shape**: since round 8 the op-tagged feed
  row-diffs ONLY the files the window touched (carried, DV-free files
  hold identical rows under unique keys); the rehearsal reports the
  scanned-file count against the table's file count AND times the
  full two-version diff (the pre-round-8 shape) for comparison.

Usage: python tools/rehearse_ivm_cdc.py [n] [n_batches] [n_cdc]
Prints one JSON line; paste into docs/PERF.md.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from globalweather_etl_spark.operators.ivm import (
    IncrementalAggregate,
    Measure,
)
from globalweather_etl_spark.session import get_spark

MEASURES = [
    Measure("n", "count"),
    Measure("s", "sum", "value"),
    Measure("a", "avg", "value"),
]
GROUPS = 10_000
TOUCH_PCT = 0.02


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    n_cdc = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark(
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "16g",
        },
    )
    root = tempfile.mkdtemp(prefix="ivm_cdc_") + "/state"
    agg = IncrementalAggregate(
        spark, root, group_cols=["g"], measures=MEASURES
    )

    def rows(lo, hi):
        return spark.range(lo, hi).select(
            (F.col("id") % GROUPS).cast("int").alias("g"),
            (F.col("id") % 997).cast("double").alias("value"),
            F.col("id"),
        )

    per = n // n_batches
    insert_walls = []
    for b in range(n_batches):
        hi = n if b == n_batches - 1 else (b + 1) * per
        df = rows(b * per, hi).drop("id")
        t0 = time.perf_counter()
        agg.apply_batch(df, batch_id=b)
        insert_walls.append(round(time.perf_counter() - t0, 2))

    # CDC batches: update a deterministic ~TOUCH_PCT slice — retract
    # the old row, insert the new one with value+1000. Slice c also
    # bounces through a PHANTOM group band (g + GROUPS) that no base
    # row occupies: +1 in this batch, -1 in the same batch via a
    # second op pair, so the groups are created AND deleted at scale.
    mod = int(1 / TOUCH_PCT)
    cdc_walls = []
    for c in range(n_cdc):
        # slices are disjoint (id % mod == c), so every row updates
        # exactly once: old side = the ORIGINAL value
        sl = rows(0, n).filter(F.col("id") % mod == c)
        old = sl.select("g", "value").withColumn("__op", F.lit(-1))
        new = sl.select(
            "g", (F.col("value") + 1000.0 * (c + 1)).alias("value")
        ).withColumn("__op", F.lit(1))
        batch = old.unionByName(new)
        if c == 0:
            ph = sl.limit(50_000).select(
                (F.col("g") + GROUPS).alias("g"), "value"
            )
            batch = (
                batch.unionByName(ph.withColumn("__op", F.lit(1)))
                .unionByName(ph.withColumn("__op", F.lit(-1)))
            )
        t0 = time.perf_counter()
        agg.apply_batch_cdc(batch, batch_id=1000 + c)
        cdc_walls.append(round(time.perf_counter() - t0, 2))

    # net data after all CDC updates: slice-c rows carry +1000*n_cdc
    # only for their own c
    net = rows(0, n).select(
        "g",
        F.when(
            F.col("id") % mod < n_cdc,
            F.col("value") + 1000.0 * ((F.col("id") % mod) + 1),
        )
        .otherwise(F.col("value"))
        .alias("value"),
    )
    t0 = time.perf_counter()
    rec = sorted(
        tuple(r)
        for r in net.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(25,6)")).cast(
                    "double"
                ),
                6,
            ).alias("s"),
            F.round(
                F.sum(F.col("value").cast("decimal(25,6)")).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                9,
            ).alias("a"),
        )
        .collect()
    )
    recompute_wall = round(time.perf_counter() - t0, 2)
    inc = sorted(
        tuple(r)
        for r in agg.read()
        .select(
            "g",
            "n",
            F.round("s", 6).alias("s"),
            F.round("a", 9).alias("a"),
        )
        .collect()
    )
    n_groups = agg.read().count()

    # round 8: the MIXED-maintenance path at scale — one state whose
    # append slices feed ALL measures (count/sum/avg/min/max/HLL) and
    # whose CDC slices bounce 100k phantom rows through groups no real
    # row occupies (+1 one fold, -1 the next). One commit per fold;
    # the final state must equal the from-scratch recompute over the
    # real rows alone, min/max/HLL included.
    mixed_root = tempfile.mkdtemp(prefix="ivm_mixed_") + "/state"
    mixed = IncrementalAggregate(
        spark,
        mixed_root,
        group_cols=["g"],
        measures=MEASURES
        + [
            Measure("mn", "min", "value"),
            Measure("mx", "max", "value"),
            Measure("uu", "approx_distinct", "id"),
        ],
    )
    ph = rows(0, 100_000).select(
        (F.col("g") + GROUPS).alias("g"),
        (F.col("value") * 3.0).alias("value"),
        "id",
    )
    third = n // 3
    mixed_walls = []
    for b, (lo_i, hi_i, cdc) in enumerate(
        [
            (0, third, None),
            (third, 2 * third, ph.withColumn("__op", F.lit(1))),
            (2 * third, n, ph.withColumn("__op", F.lit(-1))),
        ]
    ):
        t0 = time.perf_counter()
        mixed.apply_batch_mixed(
            rows(lo_i, hi_i), cdc=cdc, batch_id=b
        )
        mixed_walls.append(round(time.perf_counter() - t0, 2))
    mixed_inc = sorted(
        tuple(r)
        for r in mixed.read()
        .select(
            "g",
            "n",
            F.round("s", 6).alias("s"),
            F.round("a", 9).alias("a"),
            "mn",
            "mx",
            "uu",
        )
        .collect()
    )
    mixed_rec = sorted(
        tuple(r)
        for r in mixed.recompute(rows(0, n))
        .select(
            "g",
            "n",
            F.round("s", 6).alias("s"),
            F.round("a", 9).alias("a"),
            "mn",
            "mx",
            "uu",
        )
        .collect()
    )
    mixed_groups = mixed.read().count()

    # read_changes cost shape on a big table (the diff-based feed)
    from globalweather_etl_spark.sources.snapshots import SnapshotTable

    big = SnapshotTable(
        spark, tempfile.mkdtemp(prefix="ivm_cdc_t_") + "/t"
    )
    big.write_clustered(
        rows(0, n).drop("value"), cluster_by=["id"], n_files=32
    )
    v1 = big.latest_version()
    big.merge_into(
        rows(0, n // 100).drop("value").withColumn(
            "g", F.col("g") + 1
        ),
        keys=["id"],
    )
    head = big.latest_version()
    chg = big.read_changes(v1, keys=["id"], version=head)
    t0 = time.perf_counter()
    n_changes = chg.count()
    changes_wall = round(time.perf_counter() - t0, 2)
    # round 8: the feed diffs only the files the merge touched — on a
    # clustered layout the 1%-of-ids merge hits a fraction of the 32
    # files, and the scan set proves it (vs the full two-version
    # row-diff, timed as the pre-round-8 shape)
    files_scanned = len(set(chg.inputFiles()))
    table_files = len(big._manifest(v1)["files"]) + len(
        big._manifest(head)["files"]
    )
    from globalweather_etl_spark.operators.table_diff import table_diff

    t0 = time.perf_counter()
    table_diff(big.read(v1), big.read(head), ["id"]).filter(
        F.col("diff_status") != "unchanged"
    ).count()
    fulldiff_wall = round(time.perf_counter() - t0, 2)

    print(
        json.dumps(
            {
                "rehearsal": "ivm_cdc",
                "n_rows": n,
                "groups": GROUPS,
                "insert_walls_sec": insert_walls,
                "cdc_walls_sec": cdc_walls,
                "recompute_wall_sec": recompute_wall,
                "state_bit_identical": inc == rec,
                "phantom_groups_deleted": n_groups == GROUPS,
                "mixed_fold_walls_sec": mixed_walls,
                "mixed_bit_identical": mixed_inc == mixed_rec,
                "mixed_phantom_groups_deleted": mixed_groups == GROUPS,
                "read_changes_rows": n_changes,
                "read_changes_wall_sec": changes_wall,
                "read_changes_files_scanned": files_scanned,
                "table_files_both_versions": table_files,
                "read_changes_fulldiff_wall_sec": fulldiff_wall,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
