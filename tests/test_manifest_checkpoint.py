"""The delta-encoded manifest log (round 10): checkpoint cadence,
single-copy clustering membership, vacuum chain preservation, and
cold-cache resolution equivalence.

Scale rationale: before this format every commit serialized the FULL
live file listing (and, with a clustering stamp, serialized it twice),
so commit metadata cost grew O(table-files) — the wall a 100 TB table
with millions of files hits immediately. The delta log bounds it to
O(files touched) per commit with one full checkpoint per interval,
which is the cost contract Delta checkpoints / Iceberg manifest lists
publish.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.sources.snapshots import SnapshotTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def _raw(table, version) -> dict:
    p = os.path.join(
        table.path.removeprefix("file:"),
        "_manifests",
        f"v{version:08d}.json",
    )
    with open(p, "r", encoding="utf-8") as f:
        return json.load(f)


def test_delta_cadence_and_time_travel(spark, tmp_path):
    t = SnapshotTable(
        spark, str(tmp_path / "t"), checkpoint_interval=4
    )
    for i in range(10):
        t.write(_df(spark, [(i, f"r{i}")]), mode="append")
    # v1 has no parent -> full; depth reaches the interval at v5, v9
    kinds = {
        v: ("delta" if _raw(t, v).get("delta") else "full")
        for v in t.versions()
    }
    assert kinds[1] == "full" and kinds[5] == "full" and kinds[9] == "full"
    assert all(
        kinds[v] == "delta" for v in (2, 3, 4, 6, 7, 8, 10)
    ), kinds
    # a delta stores only its own files
    assert len(_raw(t, 7)["adds"]) == len(t._manifest(7)["files"]) - len(
        t._manifest(6)["files"]
    )
    # every version still resolves to the right rows, warm or cold
    for v in t.versions():
        assert sorted(r["k"] for r in t.read(v).collect()) == list(
            range(v)
        )
    cold = SnapshotTable(spark, t.path, checkpoint_interval=4)
    assert cold._manifest(10) == t._manifest(10)
    assert sorted(r["k"] for r in cold.read(3).collect()) == [0, 1, 2]


def test_overwrite_and_restore_store_full(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]))
    t.write(_df(spark, [(2, "b")]), mode="append")
    t.write(_df(spark, [(9, "z")]), mode="overwrite")
    v4 = t.restore(2)
    # an overwrite replaces the whole listing: delta would be no
    # smaller, so the stored form is a self-contained checkpoint;
    # restore returns to an out-of-order old listing, same fallback
    assert not _raw(t, 3).get("delta")
    assert not _raw(t, v4).get("delta")
    assert sorted(r["k"] for r in t.read().collect()) == [1, 2]


def test_clustering_membership_stored_once(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    base = spark.range(0, 400).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("g")
    )
    t.write_zordered(base, zorder_by=["k", "g"], n_files=4)
    t.write(
        spark.range(400, 450).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("g")
        ),
        mode="append",
    )
    res = t.optimize(zorder_by=["k", "g"])
    assert res["files_carried"] == 4 and res["full"] is False
    # NO stored manifest ever duplicates the file list inside the
    # clustering stamp — full forms carry n_clustered over the
    # clustered-first ordering, deltas carry adds_clustered
    for v in t.versions():
        raw = _raw(t, v)
        cl = raw.get("clustering")
        if cl is None:
            continue
        assert "files" not in cl, (v, cl)
        assert ("n_clustered" in cl) != ("adds_clustered" in cl)
    # the resolved stamp still exposes explicit membership
    st = t.clustering_state()
    assert st["unclustered_files"] == []
    assert len(st["clustered_files"]) == len(t._manifest(3)["files"])
    # the append's delta marked its adds unclustered
    assert _raw(t, 2)["clustering"]["adds_clustered"] is False
    assert t.clustering_state(2)["unclustered_files"] != []


def test_vacuum_rewrites_dangling_deltas(spark, tmp_path):
    t = SnapshotTable(
        spark, str(tmp_path / "t"), checkpoint_interval=100
    )
    for i in range(6):
        t.write(_df(spark, [(i, "x")]), mode="append")
    assert _raw(t, 5).get("delta")  # head-1 rides the delta chain
    rep = t.vacuum(keep_last=2, unreferenced_grace=0.0)
    assert rep["manifests_removed"] == 4
    # the oldest kept version was a delta whose whole ancestry was
    # dropped: vacuum rewrote it as a self-contained checkpoint first
    assert not _raw(t, 5).get("delta")
    assert _raw(t, 6).get("delta")  # still resolves through v5
    assert sorted(r["k"] for r in t.read(5).collect()) == [0, 1, 2, 3, 4]
    cold = SnapshotTable(spark, t.path)
    assert sorted(r["k"] for r in cold.read(6).collect()) == [
        0, 1, 2, 3, 4, 5,
    ]
    with pytest.raises(ValueError):
        t.read(3)


def test_mutation_paths_resolve_identically_cold(spark, tmp_path):
    """Append / CoW merge / MoR delete / purge / replace_where all
    round-trip through the delta encoder: a cold reader resolves every
    version to the same manifest the writer's session sees, and every
    version's rows equal a TWIN table running the identical operations
    with checkpoint_interval=1 (i.e. the pre-r10 every-manifest-full
    format)."""

    def run(path, interval):
        t = SnapshotTable(spark, path, checkpoint_interval=interval)
        rows = spark.range(0, 300).select(
            F.col("id").alias("k"), F.lit("base").alias("v")
        )
        t.write(rows.repartition(4, "k"), mode="overwrite")
        t.merge_into(
            spark.range(0, 60).select(
                F.col("id").alias("k"), F.lit("upd").alias("v")
            ),
            keys=["k"],
        )
        t.delete_where("k % 10 = 0")
        t.merge_into(
            spark.range(280, 320).select(
                F.col("id").alias("k"), F.lit("mor").alias("v")
            ),
            keys=["k"],
            strategy="merge-on-read",
        )
        t.purge_deletes()
        t.replace_where(
            spark.range(100, 150).select(
                F.col("id").alias("k"), F.lit("band").alias("v")
            ),
            (F.col("k") >= 100) & (F.col("k") < 150),
        )
        return t

    t = run(str(tmp_path / "t"), 16)
    twin = run(str(tmp_path / "twin"), 1)
    assert any(_raw(t, v).get("delta") for v in t.versions())
    assert not any(_raw(twin, v).get("delta") for v in twin.versions())
    cold = SnapshotTable(spark, t.path)
    for v in t.versions():
        assert cold._manifest(v) == t._manifest(v), v
        assert sorted(
            (r["k"], r["v"]) for r in cold.read(v).collect()
        ) == sorted(
            (r["k"], r["v"]) for r in twin.read(v).collect()
        ), v
