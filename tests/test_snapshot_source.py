"""Streaming SOURCE over SnapshotTable commits (streaming/
snapshot_source.py — the Delta-style readStream.table capability on
PySpark 4's Python Data Source API).

Pinned contract: offsets are commit versions checkpointed by the
engine (exactly-once across restarts and replays), each micro-batch
reads ONLY the window's new files, non-append commits fail loudly
unless skipChangeCommits, schema evolution null-fills, and the
composition with IVM (stream -> foreachBatch -> apply_batch) equals
the from-scratch aggregate."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.sources.snapshots import SnapshotTable
from globalweather_etl_spark.streaming.snapshot_source import (
    snapshot_stream,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


@pytest.fixture()
def table(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "src_tbl"))
    t.write(_df(spark, [(i, f"v{i}") for i in range(6)]), mode="overwrite")
    t.write(_df(spark, [(10, "a"), (11, "b")]), mode="append")
    return t


def _drain(spark, table_root, out, ckpt, **options):
    q = (
        snapshot_stream(spark, table_root, **options)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_exactly_once_across_restarts(spark, table, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(spark, table.path, out, ckpt)
    assert spark.read.parquet(out).count() == 8  # bootstrap + append
    table.write(_df(spark, [(20, "c")]), mode="append")
    _drain(spark, table.path, out, ckpt)
    got = sorted(
        tuple(r) for r in spark.read.parquet(out).collect()
    )
    assert got == sorted(
        [(i, f"v{i}") for i in range(6)]
        + [(10, "a"), (11, "b"), (20, "c")]
    )
    # replay with no new commits: nothing re-emitted
    _drain(spark, table.path, out, ckpt)
    assert spark.read.parquet(out).count() == 9


def test_starting_version_skips_history(spark, table, tmp_path):
    out, ckpt = str(tmp_path / "o2"), str(tmp_path / "c2")
    _drain(spark, table.path, out, ckpt, startingVersion="1")
    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert got == [(10, "a"), (11, "b")]  # only the post-v1 append


def test_non_append_commit_fails_loudly(spark, table, tmp_path):
    out, ckpt = str(tmp_path / "o3"), str(tmp_path / "c3")
    _drain(spark, table.path, out, ckpt)
    table.merge_into(_df(spark, [(10, "A")]), keys=["k"])
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception, match="not append"):
        _drain(spark, table.path, out, ckpt)


def test_skip_change_commits_continues(spark, table, tmp_path):
    out, ckpt = str(tmp_path / "o4"), str(tmp_path / "c4")
    _drain(spark, table.path, out, ckpt)
    table.merge_into(_df(spark, [(10, "A"), (30, "d")]), keys=["k"])
    table.write(_df(spark, [(40, "e")]), mode="append")
    _drain(spark, table.path, out, ckpt, skipChangeCommits="true")
    got = {r["k"] for r in spark.read.parquet(out).collect()}
    # the merge's rewrites (incl. its INSERT of 30) are skipped whole —
    # the documented Delta skipChangeCommits trade; the later append
    # streams normally
    assert 40 in got and 30 not in got
    assert spark.read.parquet(out).count() == 9


def test_schema_evolution_null_fills(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "evo"))
    t.write(_df(spark, [(1, "a")]), mode="overwrite")
    t.write(
        spark.createDataFrame(
            [(2, "b", 7.5)], "k long, v string, w double"
        ),
        mode="append",
    )
    out, ckpt = str(tmp_path / "o5"), str(tmp_path / "c5")
    _drain(spark, t.path, out, ckpt)
    got = {
        r["k"]: (r["v"], r["w"])
        for r in spark.read.parquet(out).collect()
    }
    # stream schema = latest manifest; the pre-evolution file
    # null-fills the added column (read_since parity)
    assert got == {1: ("a", None), 2: ("b", 7.5)}


def test_timestamps_round_trip(spark, tmp_path):
    import datetime as dt

    t = SnapshotTable(spark, str(tmp_path / "ts"))
    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i))
        for i in range(4)
    ]
    t.write(
        spark.createDataFrame(rows, "k long, ts timestamp"),
        mode="overwrite",
    )
    out, ckpt = str(tmp_path / "o6"), str(tmp_path / "c6")
    _drain(spark, t.path, out, ckpt)
    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert got == sorted(rows)


def test_stream_feeds_ivm_exactly_once(spark, tmp_path):
    """The composition a warehouse runs: snapshot table -> stream ->
    foreachBatch -> IncrementalAggregate fold. The maintained state
    must equal the from-scratch GROUP BY over everything streamed,
    across source commits AND a stream restart."""
    from globalweather_etl_spark.operators.ivm import (
        IncrementalAggregate,
        Measure,
    )

    src = SnapshotTable(spark, str(tmp_path / "ivm_src"))
    src.write(
        spark.createDataFrame(
            [(i, i % 3, float(i)) for i in range(30)],
            "k long, g int, x double",
        ),
        mode="overwrite",
    )
    ia = IncrementalAggregate(
        spark,
        str(tmp_path / "ivm_state"),
        group_cols=["g"],
        measures=[
            Measure("n", "count"),
            Measure("sx", "sum", "x"),
        ],
    )
    ckpt = str(tmp_path / "c7")

    def fold(batch_df, batch_id):
        ia.apply_batch(batch_df.select("g", "x"), batch_id=batch_id)

    def run():
        q = (
            snapshot_stream(spark, src.path)
            .writeStream.foreachBatch(fold)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    src.write(
        spark.createDataFrame(
            [(100 + i, i % 3, 1000.0 + i) for i in range(6)],
            "k long, g int, x double",
        ),
        mode="append",
    )
    run()
    run()  # replayed trigger: stamps make the folds exactly-once
    state = {
        r["g"]: (r["n"], r["sx"]) for r in ia.read().collect()
    }
    want_rows = [(i % 3, float(i)) for i in range(30)] + [
        (i % 3, 1000.0 + i) for i in range(6)
    ]
    want: dict = {}
    for g, x in want_rows:
        n, sx = want.get(g, (0, 0.0))
        want[g] = (n + 1, sx + x)
    assert {g: (n, round(sx, 6)) for g, (n, sx) in state.items()} == {
        g: (n, round(sx, 6)) for g, (n, sx) in want.items()
    }


def test_vacuumed_baseline_fails_loudly(spark, table, tmp_path):
    """r7 advisory (medium): if vacuum() removed every manifest at or
    below the checkpointed offset, the old reader treated the first
    surviving version as a bootstrap and re-emitted the ENTIRE table
    snapshot — silently duplicating rows. Pinned behavior: fail
    loudly (Delta fails the same way when a stream's baseline version
    is vacuumed); the genuine-first-commit bootstrap (parent None)
    keeps working."""
    out, ckpt = str(tmp_path / "o8"), str(tmp_path / "c8")
    _drain(spark, table.path, out, ckpt)  # checkpoint at v2
    assert spark.read.parquet(out).count() == 8
    table.write(_df(spark, [(50, "x")]), mode="append")  # v3
    table.write(_df(spark, [(51, "y")]), mode="append")  # v4
    table.vacuum(keep_last=1, unreferenced_grace=0.0)  # only v4 stays
    with pytest.raises(Exception, match="vacuum"):
        _drain(spark, table.path, out, ckpt)
    # nothing was emitted by the failed drain
    assert spark.read.parquet(out).count() == 8


def test_partitions_manifest_io_is_o_window(spark, tmp_path, monkeypatch):
    """r7 advisory (low) / VERDICT item 3: partitions() used to walk
    every manifest from version 0 each micro-batch to seed the
    baseline file set — O(total commits) per batch, quadratic manifest
    I/O over a stream's lifetime. Pin the fixed shape: a cold window
    opens (window + 1 baseline) manifests; the steady-state window
    (starting where the last ended) hits the tail cache and opens
    exactly (window) manifests, independent of history length."""
    import globalweather_etl_spark.streaming.snapshot_source as ss

    t = SnapshotTable(spark, str(tmp_path / "io_tbl"))
    t.write(_df(spark, [(0, "a")]).coalesce(1), mode="overwrite")
    for i in range(1, 12):
        t.write(_df(spark, [(i, f"v{i}")]).coalesce(1), mode="append")
    head = t.latest_version()

    opens: list[int] = []
    real = ss._manifest

    def counting(root, version):
        opens.append(version)
        return real(root, version)

    monkeypatch.setattr(ss, "_manifest", counting)
    reader = ss.SnapshotStreamReader(
        t.read().schema, {"path": t.path}
    )
    # cold window over the last 2 commits: 2 window manifests + 1
    # baseline manifest, NOT a walk from version 0
    parts = reader.partitions(
        {"version": head - 2}, {"version": head}
    )
    assert len(parts) == 2
    assert sorted(opens) == [head - 2, head - 1, head]
    # steady state: next window starts at the cached tail — zero
    # baseline reads, one manifest per window commit
    t2 = SnapshotTable(spark, t.path)
    t2.write(_df(spark, [(100, "z")]).coalesce(1), mode="append")
    opens.clear()
    parts = reader.partitions(
        {"version": head}, {"version": head + 1}
    )
    assert len(parts) == 1
    assert opens == [head + 1]


def test_remote_scheme_rejected(spark):
    from globalweather_etl_spark.streaming.snapshot_source import (
        _local_root,
    )

    with pytest.raises(ValueError, match="local table roots"):
        _local_root("s3://bucket/tbl")
    assert _local_root("file:///x/y/") == "/x/y"


def test_max_commits_per_trigger_paces_catchup(spark, tmp_path):
    """maxCommitsPerTrigger caps how many source commits one planned
    batch absorbs. Under the engine's single-batch availableNow
    fallback for Python sources that means one capped batch per RUN:
    6 commits at cap 2 drain over 3 runs, exactly-once, and an
    uncapped late run picks up whatever remains."""
    t = SnapshotTable(spark, str(tmp_path / "paced"))
    t.write(_df(spark, [(0, "v0")]).coalesce(1), mode="overwrite")
    for i in range(1, 6):
        t.write(_df(spark, [(i, f"v{i}")]).coalesce(1), mode="append")
    out, ckpt = str(tmp_path / "o9"), str(tmp_path / "c9")
    counts = []
    for _ in range(3):
        _drain(
            spark, t.path, out, ckpt, maxCommitsPerTrigger="2"
        )
        counts.append(spark.read.parquet(out).count())
    assert counts == [2, 4, 6]  # 2 commits (1 row each) per run
    got = sorted(r["k"] for r in spark.read.parquet(out).collect())
    assert got == list(range(6))
    # two more commits; an UNCAPPED run from the same checkpoint
    # drains them both (pacing is an option, not table state)
    t.write(_df(spark, [(10, "x")]).coalesce(1), mode="append")
    t.write(_df(spark, [(11, "y")]).coalesce(1), mode="append")
    _drain(spark, t.path, out, ckpt)
    assert spark.read.parquet(out).count() == 8


def test_max_commits_per_trigger_validation(spark, table, tmp_path):
    out, ckpt = str(tmp_path / "o10"), str(tmp_path / "c10")
    with pytest.raises(Exception, match="maxCommitsPerTrigger"):
        _drain(
            spark, table.path, out, ckpt, maxCommitsPerTrigger="0"
        )


def test_optimize_commits_are_transparent(spark, tmp_path):
    """Layout maintenance (optimize/purge) is dataChange=false: the
    stream must neither re-emit the re-clustered rows nor raise —
    even WITHOUT skipChangeCommits — and appends around the
    maintenance commit stream normally."""
    t = SnapshotTable(spark, str(tmp_path / "opt_src"))
    t.write_clustered(
        _df(spark, [(i, f"v{i}") for i in range(6)]),
        cluster_by=["k"],
        n_files=2,
        mode="overwrite",
    )
    out, ckpt = str(tmp_path / "o_opt"), str(tmp_path / "c_opt")
    _drain(spark, t.path, out, ckpt)
    assert spark.read.parquet(out).count() == 6  # bootstrap
    t.write(_df(spark, [(10, "a"), (11, "b")]), mode="append")
    t.optimize(cluster_by=["k"])  # folds the append into the layout
    t.write(_df(spark, [(20, "c")]), mode="append")
    _drain(spark, t.path, out, ckpt)
    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert got == sorted(
        [(i, f"v{i}") for i in range(6)]
        + [(10, "a"), (11, "b"), (20, "c")]
    )
    # purge after a DV delete: the delete itself is a change commit
    # (skipped under skipChangeCommits); the purge is silent
    t.delete_where(F.col("k") == 10)
    t.purge_deletes()
    t.write(_df(spark, [(30, "d")]), mode="append")
    _drain(spark, t.path, out, ckpt, skipChangeCommits="true")
    ks = sorted(r["k"] for r in spark.read.parquet(out).collect())
    # the stream's copy of k=10 was delivered before the delete —
    # Delta's documented skipChangeCommits trade; no duplicates, and
    # nothing re-emitted by optimize or purge
    assert ks == [0, 1, 2, 3, 4, 5, 10, 11, 20, 30]
