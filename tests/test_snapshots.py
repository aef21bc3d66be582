"""SnapshotTable: commit/append/overwrite semantics, time travel,
rollback, version diff, vacuum safety, commit-race behavior, and a
DuckDB cross-read of a pinned version's file list."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.sources.snapshots import SnapshotTable


@pytest.fixture()
def table(spark, tmp_path):
    return SnapshotTable(spark, str(tmp_path / "tbl"))


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_commit_append_overwrite_history(spark, table):
    v1 = table.write(_df(spark, [(1, "a"), (2, "b")]), mode="overwrite")
    v2 = table.write(_df(spark, [(3, "c")]), mode="append")
    v3 = table.write(_df(spark, [(9, "z")]), mode="overwrite")
    assert (v1, v2, v3) == (1, 2, 3)
    assert sorted(r["k"] for r in table.read(1).collect()) == [1, 2]
    assert sorted(r["k"] for r in table.read(2).collect()) == [1, 2, 3]
    assert sorted(r["k"] for r in table.read().collect()) == [9]
    hist = table.history()
    assert [h.version for h in hist] == [1, 2, 3]
    assert [h.n_rows for h in hist] == [2, 3, 1]
    assert hist[1].mode == "append"


def test_time_travel_is_pinned_against_later_writes(spark, table):
    table.write(_df(spark, [(1, "a")]))
    pinned = table.read(1)
    table.write(_df(spark, [(2, "b")]), mode="append")
    table.write(_df(spark, [(3, "c")]), mode="overwrite")
    # the old DataFrame still scans exactly version 1's files
    assert [r["k"] for r in pinned.collect()] == [1]


def test_restore_is_o1_rollback(spark, table):
    table.write(_df(spark, [(1, "a"), (2, "b")]))
    table.write(_df(spark, [(9, "z")]), mode="overwrite")
    v3 = table.restore(1)
    assert v3 == 3
    assert sorted(r["k"] for r in table.read().collect()) == [1, 2]
    # restore wrote no data files: v3 references v1's files verbatim
    assert table._manifest(3)["files"] == table._manifest(1)["files"]


def test_diff_between_versions(spark, table):
    table.write(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    table.write(
        _df(spark, [(1, "a"), (2, "B"), (4, "d")]), mode="overwrite"
    )
    got = {
        r["k"]: r["diff_status"]
        for r in table.diff(1, 2, ["k"]).collect()
    }
    assert got == {
        1: "unchanged", 2: "updated", 3: "deleted", 4: "inserted"
    }


def test_vacuum_keeps_referenced_files(spark, table):
    table.write(_df(spark, [(1, "a")]))
    table.write(_df(spark, [(2, "b")]), mode="append")
    table.write(_df(spark, [(9, "z")]), mode="overwrite")
    rep = table.vacuum(keep_last=2, unreferenced_grace=0.0)
    # v1 manifest dropped; v2 still references v1's files -> kept
    assert rep["manifests_removed"] == 1 and rep["files_removed"] == 0
    assert table.versions() == [2, 3]
    assert sorted(r["k"] for r in table.read(2).collect()) == [1, 2]
    rep2 = table.vacuum(keep_last=1, unreferenced_grace=0.0)
    # v2 dropped: v1+v2 data now unreferenced and deleted
    assert rep2["manifests_removed"] == 1 and rep2["files_removed"] > 0
    assert sorted(r["k"] for r in table.read().collect()) == [9]
    with pytest.raises(ValueError):
        table.read(2)


def test_vacuum_dry_run_plans_without_deleting(spark, table):
    table.write(_df(spark, [(1, "a")]))
    table.build_stats(cols=["k"])  # v1 sidecar the real run reclaims
    table.write(_df(spark, [(9, "z")]), mode="overwrite")
    plan = table.vacuum(
        keep_last=1, unreferenced_grace=0.0, dry_run=True
    )
    assert plan["dry_run"] is True
    assert plan["manifests_removed"] == 1 and plan["versions"] == [1]
    assert plan["files_removed"] == len(plan["files"]) > 0
    # the preview also names the dropped versions' sidecar/lock paths
    # (the real run deletes them too — they must not be under-reported)
    assert any("stats-v00000001" in s for s in plan["sidecars"])
    assert not any("v00000002" in s for s in plan["sidecars"])
    # NOTHING was deleted: v1 still time-travels
    assert table.versions() == [1, 2]
    assert sorted(r["k"] for r in table.read(1).collect()) == [1]
    # the real run removes exactly what the plan named
    rep = table.vacuum(keep_last=1, unreferenced_grace=0.0)
    assert rep["manifests_removed"] == plan["manifests_removed"]
    assert rep["files_removed"] == plan["files_removed"]
    assert table.versions() == [2]


def test_commit_race_loser_retries(spark, table):
    """Simulate a concurrent writer landing a manifest between another
    writer's read of the log and its publish: the atomic-rename loser
    must retry under the next version, losing no commit."""
    table.write(_df(spark, [(1, "a")]))
    # occupy version 2 out-of-band, as a racing writer would
    m = dict(table._manifest(1))
    m["version"] = 2
    assert table._write_json_atomic(m, table._manifest_path(2))
    v = table.write(_df(spark, [(5, "e")]), mode="append")
    assert v == 3
    assert sorted(r["k"] for r in table.read().collect()) == [1, 5]


def test_empty_overwrite_and_schema_pinning(spark, table):
    table.write(_df(spark, [(1, "a")]))
    table.write(_df(spark, []).filter(F.lit(False)), mode="overwrite")
    out = table.read()
    assert out.count() == 0
    assert out.schema.simpleString() == "struct<k:bigint,v:string>"


def test_duckdb_cross_read(spark, table):
    """A pinned version's manifested file list reads identically from
    an independent engine — the format is plain parquet + JSON."""
    table.write(_df(spark, [(1, "a"), (2, "b")]))
    table.write(_df(spark, [(3, "c")]), mode="append")
    files = [
        f"{table.path}/{rel}" for rel in table._manifest(2)["files"]
    ]
    rows = duckdb.connect().execute(
        f"SELECT k, v FROM read_parquet({files!r}) ORDER BY k"
    ).fetchall()
    assert rows == [(1, "a"), (2, "b"), (3, "c")]


def test_errors(spark, table):
    with pytest.raises(ValueError):
        table.read()
    table.write(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError):
        table.write(_df(spark, [(1, "a")]), mode="upsert")
    with pytest.raises(ValueError):
        table.vacuum(keep_last=0, unreferenced_grace=0.0)
    with pytest.raises(ValueError):
        table.read(42)


def test_write_batch_exactly_once(spark, table):
    v = table.write_batch(_df(spark, [(1, "a")]), batch_id=0)
    assert v == 1
    # replay of the same micro-batch: skipped, no new version
    assert table.write_batch(_df(spark, [(1, "a")]), batch_id=0) is None
    assert table.write_batch(_df(spark, [(2, "b")]), batch_id=1) == 2
    assert table.latest_version() == 2
    assert sorted(r["k"] for r in table.read().collect()) == [1, 2]
    # torn-replay data files (written before the skip) are vacuumable
    rep = table.vacuum(keep_last=2, unreferenced_grace=0.0)
    assert table.read(2).count() == 2


def test_streaming_snapshot_ingest(spark, tmp_path):
    """Two availableNow runs over a growing JSONL landing dir: each
    drop lands exactly once, the table versions append atomically, and
    a checkpoint replay cannot double-commit."""
    import json as _json

    from globalweather_etl_spark.sources.snapshots import SnapshotTable
    from globalweather_etl_spark.streaming.jobs import run_snapshot_ingest
    from globalweather_etl_spark.streaming.sources import (
        jsonl_stream_from_dir,
    )

    land = tmp_path / "land"
    land.mkdir()
    tbl = str(tmp_path / "tbl")
    ck = str(tmp_path / "ck")

    def drop(name, rows):
        (land / name).write_text(
            "\n".join(_json.dumps(r) for r in rows) + "\n"
        )

    drop("a.jsonl", [{"k": 1, "v": "a"}, {"k": 2, "v": "b"}])
    schema = "k long, v string"
    q = run_snapshot_ingest(
        jsonl_stream_from_dir(spark, str(land), schema), tbl, ck
    )
    q.awaitTermination(120)
    t = SnapshotTable(spark, tbl)
    assert sorted(r["k"] for r in t.read().collect()) == [1, 2]

    drop("b.jsonl", [{"k": 3, "v": "c"}])
    q2 = run_snapshot_ingest(
        jsonl_stream_from_dir(spark, str(land), schema), tbl, ck
    )
    q2.awaitTermination(120)
    assert sorted(r["k"] for r in t.read().collect()) == [1, 2, 3]
    # every commit is batch-stamped; a third run with nothing new is a no-op
    head = t.latest_version()
    q3 = run_snapshot_ingest(
        jsonl_stream_from_dir(spark, str(land), schema), tbl, ck
    )
    q3.awaitTermination(120)
    assert t.latest_version() == head


def test_streaming_ingest_maintains_zone_maps(spark, tmp_path):
    """stats_cols: every micro-batch commit carries an INCREMENTAL
    zone-map build — after two runs the head is range-prunable with
    per-batch stats cost O(that batch's files), and a no-op replay
    run leaves the sidecar untouched."""
    import json as _json

    from globalweather_etl_spark.sources.snapshots import SnapshotTable
    from globalweather_etl_spark.streaming.jobs import run_snapshot_ingest
    from globalweather_etl_spark.streaming.sources import (
        jsonl_stream_from_dir,
    )

    land = tmp_path / "land"
    land.mkdir()
    tbl = str(tmp_path / "tbl")
    ck = str(tmp_path / "ck")
    schema = "k long, v string"

    def drop(name, rows):
        (land / name).write_text(
            "\n".join(_json.dumps(r) for r in rows) + "\n"
        )

    drop("a.jsonl", [{"k": i, "v": "a"} for i in range(10)])
    run_snapshot_ingest(
        jsonl_stream_from_dir(spark, str(land), schema), tbl, ck,
        stats_cols=["k"],
    ).awaitTermination(120)
    drop("b.jsonl", [{"k": 100 + i, "v": "b"} for i in range(10)])
    run_snapshot_ingest(
        jsonl_stream_from_dir(spark, str(land), schema), tbl, ck,
        stats_cols=["k"],
    ).awaitTermination(120)
    t = SnapshotTable(spark, tbl)
    head = t.latest_version()
    meta = t._read_json(t._zm_meta_path(head))
    # the second batch's build computed ONLY its own files
    assert meta["base_version"] is not None
    assert (
        meta["n_computed_files"]
        == meta["n_stat_files"]
        - len(t._manifest(meta["base_version"])["files"])
    )
    assert sorted(
        r["k"] for r in t.read_range("k", 100, 200).collect()
    ) == [100 + i for i in range(10)]
    # stats prune: the k<=9 window skips batch b's files
    assert len(t.files_for_range("k", 0, 9)) < meta["n_stat_files"]
    # a replayed no-op run leaves head and sidecar untouched
    run_snapshot_ingest(
        jsonl_stream_from_dir(spark, str(land), schema), tbl, ck,
        stats_cols=["k"],
    ).awaitTermination(120)
    assert t.latest_version() == head


def test_read_since_appends_only(spark, tmp_path):
    """The incremental-consumer read: the window's added rows are its
    new files; any non-append commit in the window is loud; empty
    windows read empty; append-mode schema evolution null-fills."""
    from globalweather_etl_spark.sources.snapshots import SnapshotTable

    st = SnapshotTable(spark, str(tmp_path) + "/inc_src")
    v1 = st.write(_df(spark, [(1, "a")]), mode="overwrite")
    v2 = st.write(_df(spark, [(2, "b"), (3, "c")]), mode="append")
    v3 = st.write(_df(spark, [(4, "d")]), mode="append")
    assert sorted(
        r["k"] for r in st.read_since(v1).collect()
    ) == [2, 3, 4]
    assert sorted(
        r["k"] for r in st.read_since(v1, version=v2).collect()
    ) == [2, 3]
    assert st.read_since(v3).count() == 0
    with pytest.raises(ValueError, match="precedes"):
        st.read_since(v3, version=v1)
    # evolution inside the window: the added column null-fills for
    # in-window files that predate it
    v4 = st.write(
        spark.createDataFrame([(5, "e", 9.5)], "k long, v string, w double"),
        mode="append",
    )
    got = {r["k"]: r["w"] for r in st.read_since(v2).collect()}
    assert got == {4: None, 5: 9.5}
    # a merge in the window breaks the new-files == added-rows
    # equivalence and must refuse
    st.merge_into(
        spark.createDataFrame(
            [(1, "z", 0.0)], "k long, v string, w double"
        ),
        keys=["k"],
    )
    with pytest.raises(ValueError, match="diff"):
        st.read_since(v4)
    with pytest.raises(ValueError, match="diff"):
        st.read_since(v1)


def test_read_since_drives_exactly_once_ivm(spark, tmp_path):
    """Compose the incremental read with IVM: tail a snapshot table
    version-by-version into an IncrementalAggregate (version number =
    batch id, so replays skip), final state == from-scratch GROUP BY."""
    from globalweather_etl_spark.operators.ivm import (
        IncrementalAggregate,
        Measure,
    )
    from globalweather_etl_spark.sources import load_table
    from globalweather_etl_spark.sources.snapshots import SnapshotTable

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    src = SnapshotTable(spark, str(tmp_path) + "/src")
    agg = IncrementalAggregate(
        spark,
        str(tmp_path / "ivm"),
        ["event_type"],
        [
            Measure("n_events", "count"),
            Measure("total_value", "sum", "value"),
        ],
    )
    cursor = src.write(
        events.filter(F.col("event_id") % 3 == 0), mode="overwrite"
    )
    agg.apply_batch(src.read(cursor), batch_id=cursor)
    for i in (1, 2):
        head = src.write(
            events.filter(F.col("event_id") % 3 == i), mode="append"
        )
        agg.apply_batch(src.read_since(cursor, head), batch_id=head)
        # a replayed fold of the same window is a stamped no-op
        agg.apply_batch(src.read_since(cursor, head), batch_id=head)
        cursor = head
    want = sorted(
        tuple(r)
        for r in events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .collect()
    )
    got = sorted(
        tuple(r)
        for r in agg.read()
        .select("event_type", "n_events", "total_value")
        .collect()
    )
    assert [g[:2] for g in got] == [w[:2] for w in want]
    for g, w in zip(got, want):
        assert g[2] == pytest.approx(w[2], rel=1e-12)


def test_read_changes_feeds_ivm_through_a_merge(spark, tmp_path):
    """The loop read_since can't close: a MERGE window, turned into an
    op-tagged change feed, folds into apply_batch_cdc — the maintained
    state equals a from-scratch aggregate of the merged head."""
    from globalweather_etl_spark.operators.ivm import (
        IncrementalAggregate,
        Measure,
    )
    from globalweather_etl_spark.sources.snapshots import SnapshotTable

    st = SnapshotTable(spark, str(tmp_path) + "/chg")
    base = spark.createDataFrame(
        [(i, "g%d" % (i % 3), float(i)) for i in range(30)],
        "k long, g string, v double",
    )
    v1 = st.write(base.repartition(4, "k"), mode="overwrite")
    agg = IncrementalAggregate(
        spark,
        str(tmp_path / "ivm"),
        ["g"],
        [
            Measure("n", "count"),
            Measure("total", "sum", "v"),
        ],
    )
    agg.apply_batch(st.read(v1), batch_id=v1)
    # one merge: update k%5==0 (v*10), delete k%7==3, insert k=100
    src = (
        base.filter(F.col("k") % 5 == 0)
        .withColumn("v", F.col("v") * 10)
        .unionByName(
            spark.createDataFrame(
                [(100, "g0", 5.0)], "k long, g string, v double"
            )
        )
    )
    st.merge_into(src, keys=["k"])
    st.merge_into(
        st.read().filter(F.col("k") % 7 == 3),
        keys=["k"],
        when_matched="delete",
        when_not_matched="ignore",
    )
    head = st.latest_version()
    changes = st.read_changes(v1, keys=["k"], version=head)
    # the feed balances: net row delta == head count - v1 count
    net = changes.agg(F.sum("__op")).collect()[0][0]
    assert net == st.read(head).count() - st.read(v1).count()
    agg.apply_batch_cdc(changes, batch_id=head)
    # replay is a stamped no-op
    agg.apply_batch_cdc(changes, batch_id=head)
    want = sorted(
        tuple(r)
        for r in st.read(head)
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
        .collect()
    )
    got = sorted(
        tuple(r)
        for r in agg.read().select("g", "n", "total").collect()
    )
    assert [g[:2] for g in got] == [w[:2] for w in want]
    for g, w in zip(got, want):
        assert g[2] == pytest.approx(w[2], rel=1e-12)


def test_read_changes_prunes_carried_files(spark, tmp_path):
    """r8 (VERDICT item 4): the change feed's row-diff must touch only
    files the window added/removed/rewrote — a file carried between
    both manifests with no deletion vector holds bit-identical rows
    (unique keys), so its keys can't reach the feed. Pin three things:
    the scanned file set excludes carried files, the pruned feed
    equals the full two-version diff, and a deletion vector on a
    carried file pulls that file back into the diff."""
    from globalweather_etl_spark.operators.table_diff import table_diff
    from globalweather_etl_spark.sources.snapshots import SnapshotTable

    st = SnapshotTable(spark, str(tmp_path) + "/prune")
    base = spark.createDataFrame(
        [(i, float(i)) for i in range(64)], "k long, v double"
    )
    st.write_clustered(base, cluster_by=["k"], n_files=8)
    v1 = st.latest_version()
    m1 = set(st._manifest(v1)["files"])
    # merge touches ONLY the file(s) holding k in {2, 3}
    st.merge_into(
        spark.createDataFrame([(2, 999.0)], "k long, v double"),
        keys=["k"],
    )
    head = st.latest_version()
    chg = st.read_changes(v1, keys=["k"], version=head)
    got = sorted(tuple(r) for r in chg.collect())
    # equality with the unpruned twin
    full = table_diff(st.read(v1), st.read(head), ["k"])
    want_plus = full.filter(
        F.col("diff_status").isin("inserted", "updated")
    ).select("k", F.col("new_v").alias("v"), F.lit(1).alias("__op"))
    want_minus = full.filter(
        F.col("diff_status").isin("deleted", "updated")
    ).select("k", F.col("old_v").alias("v"), F.lit(-1).alias("__op"))
    assert got == sorted(
        tuple(r) for r in want_plus.unionByName(want_minus).collect()
    )
    assert got == [(2, 2.0, -1), (2, 999.0, 1)]
    # the diff's scan touched only the rewritten file + its
    # replacement — none of the 7 carried files
    carried = m1 & set(st._manifest(head)["files"])
    assert len(carried) == 7
    carried_names = {rel.split("/")[-1] for rel in carried}
    scanned = {f.split("/")[-1] for f in chg.inputFiles()}
    assert scanned, "the pruned diff still scans the touched files"
    assert not (scanned & carried_names), (
        "carried files must not enter the change-feed scan"
    )
    # a deletion vector on a carried file pulls it back in
    st.delete_where(F.col("k") == 60)
    head2 = st.latest_version()
    chg2 = st.read_changes(v1, keys=["k"], version=head2)
    got2 = sorted(tuple(r) for r in chg2.collect())
    assert (60, 60.0, -1) in got2
    dv_file_names = {
        rel.split("/")[-1]
        for rel in (st._manifest(head2).get("dvs") or {}).get(
            "files", []
        )
    }
    scanned2 = {f.split("/")[-1] for f in chg2.inputFiles()}
    assert dv_file_names & scanned2, "DV'd carried file must be diffed"


def test_write_audited_publishes_only_clean_data(spark, table):
    """Write-audit-publish: a failing expectations suite blocks the
    manifest; readers never see the staged files; a passing write
    publishes normally and vacuum reclaims the failed stage."""
    from globalweather_etl_spark.operators.expectations import (
        ExpectationSuite,
        expect_between,
        expect_not_null,
    )

    suite = ExpectationSuite(
        [expect_not_null("v"), expect_between("k", 0, 100)]
    )
    v = table.write_audited(_df(spark, [(1, "a"), (2, "b")]), suite)
    assert v == 1
    with pytest.raises(ValueError, match="not_null__v"):
        table.write_audited(_df(spark, [(3, None)]), suite)
    # the failed stage is invisible: head unchanged, rows unchanged
    assert table.latest_version() == 1
    assert table.read().count() == 2
    # and its files are unreferenced -> reclaimed
    rep = table.vacuum(keep_last=1, unreferenced_grace=0.0)
    assert rep["files_removed"] > 0
    assert table.read().count() == 2


def test_streaming_audited_ingest_quarantines_bad_batches(spark, tmp_path):
    """Clean drop commits to the versioned table; a drop violating the
    suite routes to quarantine with a failure report; the table's head
    never sees the bad rows."""
    import json as _json

    from globalweather_etl_spark.operators.expectations import (
        ExpectationSuite,
        expect_not_null,
    )
    from globalweather_etl_spark.sources.snapshots import SnapshotTable
    from globalweather_etl_spark.streaming.jobs import run_audited_ingest
    from globalweather_etl_spark.streaming.sources import (
        jsonl_stream_from_dir,
    )

    land = tmp_path / "land"
    land.mkdir()
    tbl, q, ck = (str(tmp_path / p) for p in ("tbl", "quarantine", "ck"))
    suite = ExpectationSuite([expect_not_null("v")])
    schema = "k long, v string"

    def run():
        run_audited_ingest(
            jsonl_stream_from_dir(spark, str(land), schema),
            tbl, q, suite, ck,
        ).awaitTermination(120)

    (land / "good.jsonl").write_text(
        '{"k": 1, "v": "a"}\n{"k": 2, "v": "b"}\n'
    )
    run()
    t = SnapshotTable(spark, tbl)
    assert sorted(r["k"] for r in t.read().collect()) == [1, 2]

    (land / "bad.jsonl").write_text('{"k": 3, "v": null}\n')
    run()
    # table head unchanged; bad batch in quarantine with a report
    assert sorted(r["k"] for r in t.read().collect()) == [1, 2]
    qdirs = [p for p in (tmp_path / "quarantine").iterdir() if p.is_dir()]
    assert len(qdirs) == 1
    report = _json.loads((qdirs[0] / "_report.json").read_text())
    assert report["failed"][0]["metric"] == "not_null__v"
    back = spark.read.parquet(str(qdirs[0]))
    assert back.count() == 1 and back.collect()[0]["k"] == 3


def test_compact_preserves_content_and_history(spark, table):
    for b in range(6):
        table.write_batch(_df(spark, [(b, f"v{b}")]), batch_id=b)
    head = table.latest_version()
    before = sorted(map(tuple, table.read().collect()))
    assert table._manifest(head)["files"] and len(
        table._manifest(head)["files"]
    ) >= 6
    v = table.compact(target_file_bytes=1 << 30)  # everything -> 1 file
    assert v == head + 1
    assert len(table._manifest(v)["files"]) == 1
    assert sorted(map(tuple, table.read().collect())) == before
    # old head still time-travels; vacuum reclaims the small files
    assert sorted(map(tuple, table.read(head).collect())) == before
    rep = table.vacuum(keep_last=1, unreferenced_grace=0.0)
    assert rep["files_removed"] >= 6
    assert sorted(map(tuple, table.read().collect())) == before


def test_write_clustered_layout(spark, table):
    from globalweather_etl_spark.operators.layout import (
        file_ranges,
        files_for_range,
    )

    rows = [(i, f"s{i}") for i in range(1000)]
    v = table.write_clustered(
        _df(spark, rows), cluster_by=["k"], n_files=4
    )
    m = table._manifest(v)
    assert len(m["files"]) == 4
    assert sorted(r["k"] for r in table.read().collect()) == list(range(1000))
    # footers cover narrow, disjoint ranges -> selective reads skip files
    commit_dir = table.path + "/" + m["files"][0].rsplit("/", 1)[0]
    spans = sorted((lo, hi) for _, lo, hi in file_ranges(commit_dir, "k"))
    assert len(spans) == 4
    for (_, a_hi), (b_lo, _) in zip(spans, spans[1:]):
        assert a_hi < b_lo  # disjoint
    assert len(files_for_range(commit_dir, "k", 10, 20)) == 1


def test_compact_errors(spark, table):
    with pytest.raises(ValueError):
        table.compact()
    table.write(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError):
        table.compact(target_file_bytes=0)
    with pytest.raises(ValueError):
        table.write_clustered(_df(spark, [(1, "a")]), cluster_by=[])


# ------------------------------------------------------- merge_into


def _read_map(table, version=None):
    return {r["k"]: r["v"] for r in table.read(version).collect()}


def test_merge_upsert_update_and_insert(spark, table):
    table.write(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    res = table.merge_into(
        _df(spark, [(2, "B"), (4, "d")]), keys=["k"]
    )
    assert res["version"] == 2
    assert _read_map(table) == {1: "a", 2: "B", 3: "c", 4: "d"}
    assert res["n_rows"] == 4
    # pre-merge version still time-travels
    assert _read_map(table, 1) == {1: "a", 2: "b", 3: "c"}


def test_merge_delete_and_ignore_unmatched(spark, table):
    table.write(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    table.merge_into(
        _df(spark, [(2, "x"), (9, "x")]),
        keys=["k"],
        when_matched="delete",
        when_not_matched="ignore",
    )
    assert _read_map(table) == {1: "a", 3: "c"}


def test_merge_update_collapses_duplicate_target_rows(spark, table):
    # upsert semantics: ALL matching target rows replaced by ONE source row
    table.write(_df(spark, [(1, "a"), (1, "a2"), (2, "b")]))
    table.merge_into(_df(spark, [(1, "A")]), keys=["k"])
    rows = sorted(tuple(r) for r in table.read().collect())
    assert rows == [(1, "A"), (2, "b")]


def test_merge_prunes_untouched_files(spark, table):
    # two separate append commits -> disjoint file sets; merging a key
    # from the SECOND commit must carry the first commit's files by
    # reference
    table.write(_df(spark, [(1, "a"), (2, "b")]))
    table.write(_df(spark, [(10, "x"), (11, "y")]))  # append
    m_before = table._manifest(table.latest_version())
    res = table.merge_into(_df(spark, [(10, "X")]), keys=["k"])
    assert res["files_kept"] > 0
    m_after = table._manifest(res["version"])
    kept = set(m_before["files"]) & set(m_after["files"])
    assert kept, "untouched files must be carried by reference"
    assert _read_map(table) == {1: "a", 2: "b", 10: "X", 11: "y"}
    # rewritten fraction is file-local: commit-1 files all survive
    assert res["files_rewritten"] < len(m_before["files"])


def test_merge_into_empty_table_inserts(spark, table):
    res = table.merge_into(_df(spark, [(1, "a")]), keys=["k"])
    assert res["version"] == 1
    assert _read_map(table) == {1: "a"}


def test_merge_guards(spark, table):
    table.write(_df(spark, [(1, "a")]))
    import pytest as _pt

    with _pt.raises(ValueError, match="duplicate merge keys"):
        table.merge_into(_df(spark, [(5, "x"), (5, "y")]), keys=["k"])
    with _pt.raises(ValueError, match="bad when_matched"):
        table.merge_into(_df(spark, [(5, "x")]), keys=["k"],
                         when_matched="replace")
    with _pt.raises(ValueError, match="columns"):
        table.merge_into(
            spark.createDataFrame([(1, "a", 1.0)], "k long, v string, z double"),
            keys=["k"],
        )


def test_merge_noop_returns_head(spark, table):
    table.write(_df(spark, [(1, "a")]))
    res = table.merge_into(
        _df(spark, [(9, "x")]),
        keys=["k"],
        when_matched="update",
        when_not_matched="ignore",
    )
    assert res["version"] == 1 and res["files_rewritten"] == 0
    assert _read_map(table) == {1: "a"}


def test_merge_matches_duckdb_upsert_twin(spark, table):
    import duckdb as _dd

    table.write(_df(spark, [(i, f"v{i}") for i in range(50)]))
    src = [(k, f"U{k}") for k in range(30, 70)]
    table.merge_into(
        spark.createDataFrame(src, "k long, v string"), keys=["k"]
    )
    got = sorted(tuple(r) for r in table.read().collect())
    con = _dd.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(range(50)) AS k")
    con.execute("UPDATE t SET k = k")  # no-op; build v column next
    want = sorted(
        con.execute(
            """
WITH tgt AS (SELECT k, 'v' || k AS v FROM t),
src AS (SELECT unnest(range(30, 70)) AS k, 'U' || unnest(range(30, 70)) AS v)
SELECT k, v FROM tgt WHERE k NOT IN (SELECT k FROM src)
UNION ALL SELECT k, v FROM src"""
        ).fetchall()
    )
    assert got == want


def test_merge_insert_mode_with_no_inserts_is_noop(spark, table):
    table.write(_df(spark, [(1, "a")]))
    res = table.merge_into(
        _df(spark, [(9, "x")]).filter("k < 0"),  # empty source slice
        keys=["k"],
    )
    assert res["version"] == 1
    assert _read_map(table) == {1: "a"}


# ------------------------------------------------- schema evolution


def test_append_with_added_column_evolves_schema(spark, table):
    table.write(_df(spark, [(1, "a")]))
    evolved = spark.createDataFrame([(2, "b", 9.5)], "k long, v string, score double")
    table.write(evolved, mode="append")
    got = {r["k"]: (r["v"], r["score"]) for r in table.read().collect()}
    assert got == {1: ("a", None), 2: ("b", 9.5)}
    # time travel still sees the original two-column shape
    assert table.read(1).columns == ["k", "v"]


def test_append_missing_column_keeps_it(spark, table):
    table.write(
        spark.createDataFrame([(1, "a", 1.0)], "k long, v string, score double")
    )
    table.write(_df(spark, [(2, "b")]), mode="append")  # no score column
    got = {r["k"]: r["score"] for r in table.read().collect()}
    assert got == {1: 1.0, 2: None}
    assert "score" in table.read().columns


def test_append_type_conflict_fails_loudly(spark, table):
    table.write(_df(spark, [(1, "a")]))
    bad = spark.createDataFrame([(2, 3)], "k long, v long")  # v was string
    import pytest as _pt

    with _pt.raises(ValueError, match="type conflict"):
        table.write(bad, mode="append")


def test_batch_append_evolves_schema_too(spark, table):
    table.write_batch(_df(spark, [(1, "a")]), batch_id=0)
    evolved = spark.createDataFrame([(2, "b", 7.0)], "k long, v string, score double")
    table.write_batch(evolved, batch_id=1)
    got = {r["k"]: r["score"] for r in table.read().collect()}
    assert got == {1: None, 2: 7.0}


def test_read_asof_wall_clock(spark, table):
    import time as _t

    table.write(_df(spark, [(1, "a")]))
    _t.sleep(0.05)
    mid = _t.time()
    _t.sleep(0.05)
    table.write(_df(spark, [(2, "b")]), mode="append")
    assert {r["k"] for r in table.read_asof(mid).collect()} == {1}
    assert {r["k"] for r in table.read_asof(_t.time()).collect()} == {1, 2}
    import pytest as _pt

    with _pt.raises(ValueError, match="no commit"):
        table.read_asof(mid - 100)


# --------------------------------------------- per-file bloom indexes


def test_bloom_index_point_lookup_prunes_files(spark, table):
    # two commits -> disjoint file sets with disjoint key ranges
    table.write(_df(spark, [(i, f"a{i}") for i in range(10)]))
    table.write(
        _df(spark, [(i, f"b{i}") for i in range(100, 110)]), mode="append"
    )
    stats = table.build_file_index("k")
    assert stats["files"] >= 2
    hit = table.files_for_key("k", 105)
    allf = table._manifest(table.latest_version())["files"]
    assert hit is not None and 0 < len(hit) < len(allf)
    rows = table.read_where("k", 105).collect()
    assert [(r["k"], r["v"]) for r in rows] == [(105, "b105")]
    # absent key: with 4k bits over 20 keys the probe prunes everything
    assert table.files_for_key("k", 999999) == []
    assert table.read_where("k", 999999).count() == 0


def test_bloom_lookup_equals_full_filter(spark, table):
    table.write(_df(spark, [(i % 7, f"v{i}") for i in range(60)]))
    table.build_file_index("k")
    for k in (0, 3, 6):
        got = sorted(tuple(r) for r in table.read_where("k", k).collect())
        want = sorted(
            tuple(r)
            for r in table.read().filter(F.col("k") == k).collect()
        )
        assert got == want and got


def test_read_where_without_index_falls_back(spark, table):
    table.write(_df(spark, [(1, "a"), (2, "b")]))
    rows = table.read_where("k", 2).collect()
    assert [(r["k"], r["v"]) for r in rows] == [(2, "b")]


def test_vacuum_age_retention_protects_recent_versions(spark, table):
    table.write(_df(spark, [(1, "a")]))
    table.write(_df(spark, [(2, "b")]), mode="append")
    table.write(_df(spark, [(3, "c")]), mode="append")
    # keep_last=1 would drop v1+v2, but everything committed within the
    # retention window stays
    rep = table.vacuum(keep_last=1, older_than=3600.0, unreferenced_grace=0.0)
    assert rep["manifests_removed"] == 0
    assert table.versions() == [1, 2, 3]
    # a zero-second window degrades to plain keep_last
    rep2 = table.vacuum(keep_last=1, older_than=0.0, unreferenced_grace=0.0)
    assert rep2["manifests_removed"] == 2
    assert table.versions() == [3]


def test_vacuum_removes_stale_bloom_indexes(spark, table):
    table.write(_df(spark, [(1, "a")]))
    table.build_file_index("k")
    table.write(_df(spark, [(2, "b")]), mode="overwrite")
    table.build_file_index("k")
    table.vacuum(keep_last=1, unreferenced_grace=0.0)
    # v1's index sidecar is gone with its manifest; v2's survives
    assert not table._fs.exists(table._index_path(1, "k"))
    assert table._fs.exists(table._index_path(2, "k"))
    # and lookups on the head still work
    assert [r["k"] for r in table.read_where("k", 2).collect()] == [2]


# ----------------------------------------------- round-6 hardening fixes


def test_table_rooted_under_a_data_segment(spark, tmp_path):
    """A table whose ROOT path itself contains '/data/' (the common
    /data/warehouse layout) must record correct manifest-relative
    paths — rel computation is a prefix strip against the qualified
    root, not a substring search for the first '/data/'."""
    root = tmp_path / "data" / "warehouse" / "tbl"
    t = SnapshotTable(spark, str(root))
    t.write(_df(spark, [(1, "a"), (2, "b")]), mode="overwrite")
    t.write(_df(spark, [(3, "c")]), mode="append")
    # every manifest rel must start at the table's own data dir
    for v in t.versions():
        for rel in t._manifest(v)["files"]:
            assert rel.startswith("data/c-"), rel
    assert sorted(r["k"] for r in t.read().collect()) == [1, 2, 3]
    # merge + vacuum walk the same rel machinery
    res = t.merge_into(
        _df(spark, [(3, "C"), (4, "d")]), keys=["k"]
    )
    assert res["n_rows"] == 4
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got == {1: "a", 2: "b", 3: "C", 4: "d"}
    rep = t.vacuum(keep_last=1, unreferenced_grace=0.0)
    assert rep["manifests_removed"] == 2
    assert {r["k"] for r in t.read().collect()} == {1, 2, 3, 4}


def test_vacuum_grace_protects_inflight_commit_files(spark, table):
    """Data files written but not yet referenced by a manifest (an
    in-flight commit) must survive vacuum while inside the grace
    window — deleting them would corrupt the about-to-publish version."""
    table.write(_df(spark, [(1, "a")]), mode="overwrite")
    # simulate the first half of a commit: data files on disk, no
    # manifest yet (exactly what write()/merge_into do before publish)
    staged = f"{table.path}/data/c-inflight"
    _df(spark, [(2, "b")]).write.parquet(staged)
    rep = table.vacuum(keep_last=1)  # default grace: 24h
    assert rep["files_removed"] == 0  # the staged files survived
    # ...so the in-flight commit can still publish correctly; with the
    # window elapsed (grace 0) the same files are reclaimable garbage
    rep2 = table.vacuum(keep_last=1, unreferenced_grace=0.0)
    assert rep2["files_removed"] > 0


def test_burned_lock_never_wedges_the_log(spark, table):
    """A writer that crashed between claiming a version's lock and
    publishing its manifest burns that number; later commits allocate
    past it instead of retrying it forever."""
    table.write(_df(spark, [(1, "a")]), mode="overwrite")
    # simulate the crash: v2's lock exists, v2's manifest never will
    lock = table._p(table._manifest_path(2).toString() + ".lock")
    table._fs.create(lock, False).close()
    v = table.write(_df(spark, [(2, "b")]), mode="append")
    assert v == 3  # skipped the burned claim
    assert table.versions() == [1, 3]
    assert sorted(r["k"] for r in table.read().collect()) == [1, 2]
    # merge allocates past burns the same way
    res = table.merge_into(_df(spark, [(9, "z")]), keys=["k"])
    assert res["version"] == 4
    assert table.latest_version() == 4


def test_concurrent_same_version_publish_single_winner(spark, table):
    """Two committers racing the SAME version number: exactly one
    manifest survives (the lock arbitrates), the loser's temp file is
    cleaned up — local-filesystem rename alone would silently let both
    'win' and replace one manifest with the other."""
    table.write(_df(spark, [(1, "a")]), mode="overwrite")
    dest = table._manifest_path(2)
    m = dict(table._manifest(1))
    m["version"] = 2
    m["parent"] = 1
    won_a = table._write_json_atomic(dict(m), dest)
    won_b = table._write_json_atomic(
        {**m, "n_rows": 999}, dest
    )
    assert won_a is True and won_b is False
    assert table._manifest(2)["n_rows"] == m["n_rows"]  # winner's content


def test_write_audited_append_keeps_omitted_columns(spark, table):
    """Audited append evolves the manifest schema by union-by-name like
    write(): a frame omitting a parent column must not drop it."""
    from globalweather_etl_spark.operators.expectations import (
        ExpectationSuite,
        expect_not_null,
    )

    table.write(_df(spark, [(1, "a")]), mode="overwrite")
    suite = ExpectationSuite([expect_not_null("k")])
    only_k = spark.createDataFrame([(7,)], "k long")
    table.write_audited(only_k, suite, mode="append")
    head = table.read()
    assert set(head.columns) == {"k", "v"}
    got = {r["k"]: r["v"] for r in head.collect()}
    assert got == {1: "a", 7: None}


def test_merge_handles_uri_encoded_table_paths(spark, tmp_path):
    """Table paths needing URI escaping (spaces): input_file_name()
    renders them percent-encoded; file-hit matching must decode before
    comparing against manifest rels or every merge rewrites nothing."""
    root = tmp_path / "ware house" / "tbl v2"
    t = SnapshotTable(spark, str(root))
    t.write(_df(spark, [(1, "a"), (2, "b")]), mode="overwrite")
    res = t.merge_into(_df(spark, [(2, "B"), (3, "c")]), keys=["k"])
    assert res["files_rewritten"] >= 1  # the hit file WAS identified
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_merge_matched_delete_condition(spark, table):
    """WHEN MATCHED AND cond THEN DELETE in one atomic commit: matched
    rows satisfying the condition are removed, other matches update,
    unmatched non-deleting rows insert, and a row that only retracts
    never creates state."""
    table.write(
        _df(spark, [(1, "a"), (2, "b"), (5, "e")]), mode="overwrite"
    )
    src = _df(
        spark,
        [
            (2, "B"),          # matched, keep -> update
            (5, "__dead__"),   # matched, delete
            (4, "d"),          # unmatched, keep -> insert
            (6, "__dead__"),   # unmatched retraction -> must NOT insert
        ],
    )
    res = table.merge_into(
        src, keys=["k"], matched_delete_condition=F.col("v") == "__dead__"
    )
    got = {r["k"]: r["v"] for r in table.read().collect()}
    assert got == {1: "a", 2: "B", 4: "d"}
    assert res["n_rows"] == 3
    # time travel: the pre-merge version is untouched
    assert sorted(r["k"] for r in table.read(1).collect()) == [1, 2, 5]
    # guard: the condition arm requires update semantics
    with pytest.raises(ValueError, match="requires when_matched"):
        table.merge_into(
            _df(spark, [(1, "x")]),
            keys=["k"],
            when_matched="delete",
            matched_delete_condition=F.col("v") == "x",
        )


def test_merge_delete_condition_on_empty_table_bootstrap(spark, table):
    """Bootstrap merge into an empty table filters delete-marked rows."""
    src = _df(spark, [(1, "a"), (2, "__dead__")])
    table.merge_into(
        src, keys=["k"], matched_delete_condition=F.col("v") == "__dead__"
    )
    got = {r["k"]: r["v"] for r in table.read().collect()}
    assert got == {1: "a"}


def test_replay_skipped_even_after_vacuum_dropped_the_stamp(spark, table):
    """Exactly-once must survive retention: vacuum drops the manifest
    that carried a batch's stamp, but the high-water mark rides every
    later commit, so the replay is still skipped — the interaction that
    used to bound replay protection by the vacuum window."""
    assert table.write_batch(_df(spark, [(1, "a")]), batch_id=0) == 1
    assert table.write_batch(_df(spark, [(2, "b")]), batch_id=1) == 2
    # a NON-stream commit interleaves and must carry the mark too
    table.write(_df(spark, [(3, "c")]), mode="append")
    table.vacuum(keep_last=1, unreferenced_grace=0.0)  # stamps 0/1 dropped
    assert table.versions() == [3]
    # replay of batch 0 after checkpoint loss: must be a no-op
    assert table.write_batch(_df(spark, [(1, "a")]), batch_id=0) is None
    assert table.write_batch(_df(spark, [(1, "a")]), batch_id=1) is None
    assert sorted(r["k"] for r in table.read().collect()) == [1, 2, 3]
    # genuinely new batches still land
    assert table.write_batch(_df(spark, [(4, "d")]), batch_id=2) is not None
    assert sorted(r["k"] for r in table.read().collect()) == [1, 2, 3, 4]


def test_bloom_sidecar_spark_probe_matches_cached_probe(spark, table):
    """Above the cache file limit the probe runs as a word-pruned
    Spark filter over the parquet sidecar — it must return exactly the
    candidate set the driver-cached path computes (and the lookup the
    same rows as a full filter)."""
    table.write(_df(spark, [(i, f"a{i}") for i in range(10)]))
    table.write(
        _df(spark, [(i, f"b{i}") for i in range(100, 110)]), mode="append"
    )
    table.build_file_index("k")
    cached = {
        k: table.files_for_key("k", k) for k in (0, 5, 105, 999999)
    }
    # new handle (cold cache) forced onto the Spark-probe path
    big = SnapshotTable(spark, table.path)
    big._IDX_CACHE_FILE_LIMIT = 0
    for k, want in cached.items():
        assert sorted(big.files_for_key("k", k)) == sorted(want)
        got = sorted(tuple(r) for r in big.read_where("k", k).collect())
        ref = sorted(
            tuple(r) for r in table.read().filter(F.col("k") == k).collect()
        )
        assert got == ref


class TestClone:
    """Zero-copy CLONE (round 8): hard-linked data, independent logs."""

    def _base(self, spark, root):
        from globalweather_etl_spark.sources.snapshots import SnapshotTable

        st = SnapshotTable(spark, root + "/src")
        st.write(
            spark.createDataFrame(
                [(i, float(i)) for i in range(40)], "k long, v double"
            ).repartition(4),
            mode="overwrite",
        )
        st.write(
            spark.createDataFrame([(100, 1.5)], "k long, v double"),
            mode="append",
        )
        return st

    def test_clone_pins_version_and_diverges(self, spark, tmp_path):
        st = self._base(spark, str(tmp_path))
        v1 = st.versions()[0]
        cl = st.clone(str(tmp_path / "cl"), version=v1)  # AT (v1)
        assert cl.read().count() == 40  # pre-append state
        full = st.clone(str(tmp_path / "cl2"))  # head
        assert full.read().count() == 41
        m = full._manifest(1)
        assert m["mode"] == "clone" and m["parent"] is None
        assert m["clone_copied"] == 0  # same fs: all hard links
        assert m["cloned_from"].endswith(f"@v{st.latest_version()}")
        # divergence: writes on either side never reach the other
        full.write(
            spark.createDataFrame([(200, 2.0)], "k long, v double"),
            mode="append",
        )
        st.merge_into(
            spark.createDataFrame([(0, 999.0)], "k long, v double"),
            keys=["k"],
        )
        assert full.read().count() == 42
        assert {r["v"] for r in full.read().filter("k = 0").collect()} == {
            0.0
        }
        assert {r["v"] for r in st.read().filter("k = 0").collect()} == {
            999.0
        }
        assert st.read().count() == 41

    def test_source_vacuum_cannot_break_clone(self, spark, tmp_path):
        st = self._base(spark, str(tmp_path))
        cl = st.clone(str(tmp_path / "cl"))
        before = sorted(tuple(r) for r in cl.read().collect())
        # source rewrites everything, then vacuums its old files away
        st.write(
            spark.createDataFrame([(1, 1.0)], "k long, v double"),
            mode="overwrite",
        )
        st.vacuum(keep_last=1, unreferenced_grace=0.0)
        # the clone's hard links keep the shared inodes alive
        assert sorted(tuple(r) for r in cl.read().collect()) == before

    def test_clone_carries_deletion_vectors(self, spark, tmp_path):
        st = self._base(spark, str(tmp_path))
        st.delete_where(F.col("k") % 2 == 1)
        cl = st.clone(str(tmp_path / "cl"))
        got = sorted(r["k"] for r in cl.read().collect())
        assert got == sorted(
            r["k"] for r in st.read().collect()
        )
        assert all(k % 2 == 0 for k in got)

    def test_clone_guards(self, spark, tmp_path):
        st = self._base(spark, str(tmp_path))
        cl = st.clone(str(tmp_path / "cl"))
        with pytest.raises(ValueError, match="already has commits"):
            st.clone(str(tmp_path / "cl"))
        with pytest.raises(ValueError, match="local table roots"):
            st.clone("s3://bucket/x")

    def test_clone_carries_exactly_once_stamps(self, spark, tmp_path):
        from globalweather_etl_spark.sources.snapshots import SnapshotTable

        st = SnapshotTable(spark, str(tmp_path) + "/src_b")
        df = spark.createDataFrame([(1, 1.0)], "k long, v double")
        st.write_batch(df, batch_id=7)
        cl = st.clone(str(tmp_path / "clb"))
        # a replayed fold of batch 7 against the CLONE is a stamped
        # no-op — refresh pipelines can repoint at clones safely
        assert cl._batch_seen(7, "batch_id", "max_batch_id")


class TestReplaceWhere:
    """Predicate-scoped atomic overwrite (round 8) — the backfill
    primitive: delete the band, insert its recomputation, one commit."""

    @pytest.fixture()
    def banded(self, spark, tmp_path):
        from globalweather_etl_spark.sources.snapshots import SnapshotTable

        st = SnapshotTable(spark, str(tmp_path / "rw"))
        df = spark.createDataFrame(
            [(i, i % 4, float(i)) for i in range(40)],
            "k long, band int, v double",
        )
        st.write_clustered(df, cluster_by=["band"], n_files=4)
        return st

    def test_replaces_band_atomically_and_prunes_files(
        self, spark, banded
    ):
        v1 = banded.latest_version()
        m1 = set(banded._manifest(v1)["files"])
        newband = spark.createDataFrame(
            [(100 + i, 2, 1000.0 + i) for i in range(3)],
            "k long, band int, v double",
        )
        res = banded.replace_where(newband, F.col("band") == 2)
        assert res["n_replaced"] == 10  # the old band-2 rows
        got = sorted(
            tuple(r)
            for r in banded.read().filter("band = 2").collect()
        )
        assert got == [(100 + i, 2, 1000.0 + i) for i in range(3)]
        assert banded.read().filter("band != 2").count() == 30
        # band-clustered layout: only the band-2 file(s) rewrote
        assert res["files_kept"] >= 2
        assert set(banded._manifest(res["version"])["files"]) & m1
        # time travel: the pre-replace version is untouched
        assert banded.read(v1).filter("band = 2").count() == 10

    def test_rows_outside_band_fail_loudly(self, spark, banded):
        head = banded.latest_version()
        bad = spark.createDataFrame(
            [(100, 2, 1.0), (101, 3, 2.0)],
            "k long, band int, v double",
        )
        with pytest.raises(ValueError, match="outside the replaced"):
            banded.replace_where(bad, F.col("band") == 2)
        # NULL predicate rows are OUTSIDE too
        nullband = spark.createDataFrame(
            [(100, None, 1.0)], "k long, band int, v double"
        )
        with pytest.raises(ValueError, match="outside the replaced"):
            banded.replace_where(nullband, F.col("band") == 2)
        assert banded.latest_version() == head  # nothing committed

    def test_no_match_insert_and_noop(self, spark, banded):
        # predicate matches nothing: the new band simply lands
        res = banded.replace_where(
            spark.createDataFrame(
                [(200, 9, 9.0)], "k long, band int, v double"
            ),
            F.col("band") == 9,
        )
        assert res["files_rewritten"] == 0 and res["n_replaced"] == 0
        assert banded.read().filter("band = 9").count() == 1
        # empty df + no match: no version burned
        head = banded.latest_version()
        res2 = banded.replace_where(
            banded.read().filter(F.lit(False)).select("k", "band", "v"),
            F.col("band") == 77,
        )
        assert res2["version"] == head

    def test_respects_deletion_vectors(self, spark, banded):
        # a DV'd row in the replaced band must not resurrect
        banded.delete_where((F.col("band") == 1) & (F.col("k") == 1))
        res = banded.replace_where(
            spark.createDataFrame(
                [(300, 1, 3.0)], "k long, band int, v double"
            ),
            F.col("band") == 1,
        )
        assert res["n_replaced"] == 9  # 10 band-1 rows minus the DV'd one
        ks = sorted(
            r["k"] for r in banded.read().filter("band = 1").collect()
        )
        assert ks == [300]
        # and the stream-facing mode is honest: not an append
        assert banded._manifest(res["version"])["mode"] == "replace"


# --- round 10: commit races against the MUTATING verbs ---------------
# The append race above pins write(); these pin that replace_where /
# delete_where / merge_into RECOMPUTE against the new head when they
# lose the publish race (serializable outcome), instead of committing
# a plan derived from the stale base.


def _race_in_append(table, spark, rows, on_mode):
    """monkeypatch-able _write_json_atomic wrapper: the first time the
    verb under test publishes (manifest mode == on_mode), land a
    concurrent append of ``rows`` at that version first, so the verb
    loses and must retry against the new head."""
    head = table.latest_version()
    commit_dir = f"{table.path}/data/c-race{head}"
    _df(spark, rows).write.mode("error").parquet(commit_dir)
    real = table._write_json_atomic
    state = {"raced": False}

    def racing(obj, dest):
        if not state["raced"] and obj.get("mode") == on_mode:
            state["raced"] = True
            h = table.latest_version()
            rm = dict(table._manifest(h))
            rm["version"] = h + 1
            rm["parent"] = h
            rm["mode"] = "append"
            rm["files"] = rm["files"] + table._list_commit_files(commit_dir)
            rm["n_rows"] = rm["n_rows"] + len(rows)
            rm.pop("clustering", None)
            assert real(rm, table._manifest_path(h + 1))
        return real(obj, dest)

    return racing, state


def test_replace_where_race_recomputes_against_new_head(
    spark, table, monkeypatch
):
    """A racing append lands rows INSIDE the replaced band between
    replace_where's read and its publish: the retry must replace them
    too (serializable: the replace commits second, so the band holds
    only the incoming rows)."""
    table.write(_df(spark, [(1, "old"), (2, "old"), (50, "keep")]))
    racing, state = _race_in_append(table, spark, [(3, "racer-in-band")],
                                    on_mode="replace")
    monkeypatch.setattr(table, "_write_json_atomic", racing)
    res = table.replace_where(
        _df(spark, [(1, "new"), (2, "new")]), "k < 10"
    )
    assert state["raced"]
    got = sorted((r["k"], r["v"]) for r in table.read().collect())
    assert got == [(1, "new"), (2, "new"), (50, "keep")]
    assert res["n_replaced"] == 3  # both olds AND the racer's in-band row


def test_delete_where_race_deletes_racer_rows_too(spark, table, monkeypatch):
    """A racing append lands matching rows mid-delete: the retried
    delete must cover them (its deletion vectors are recomputed from
    the NEW head's files)."""
    table.write(_df(spark, [(1, "a"), (20, "b")]))
    racing, state = _race_in_append(table, spark, [(2, "racer-matches")],
                                    on_mode="delete")
    monkeypatch.setattr(table, "_write_json_atomic", racing)
    res = table.delete_where("k < 10")
    assert state["raced"]
    assert sorted(r["k"] for r in table.read().collect()) == [20]
    assert res["n_deleted"] == 2


def test_merge_race_does_not_double_insert(spark, table, monkeypatch):
    """Write-skew guard: the merge's source inserts key 7; a racing
    append lands key 7 first. The retried merge must re-classify 7 as
    MATCHED (update, not insert) against the new head — exactly one
    row for key 7, carrying the source's value."""
    table.write(_df(spark, [(1, "a")]))
    racing, state = _race_in_append(table, spark, [(7, "racer")],
                                    on_mode="merge")
    monkeypatch.setattr(table, "_write_json_atomic", racing)
    table.merge_into(_df(spark, [(7, "from-merge")]), keys=["k"])
    assert state["raced"]
    sevens = [r["v"] for r in table.read().filter(F.col("k") == 7).collect()]
    assert sevens == ["from-merge"], sevens
    assert sorted(r["k"] for r in table.read().collect()) == [1, 7]


# --- round 10 second half: metadata-only ALTER (add/drop column) -----


def test_add_column_is_metadata_only_and_null_fills(spark, table):
    table.write(_df(spark, [(1, "a"), (2, "b")]))
    files_before = list(table._manifest(1)["files"])
    v = table.add_column("score", "double")
    assert v == 2
    m = table._manifest(2)
    assert m["files"] == files_before  # no data movement
    assert m["mode"] == "alter"
    rows = {r["k"]: r["score"] for r in table.read().collect()}
    assert rows == {1: None, 2: None}
    # appends can now fill it; old rows stay NULL
    table.write(
        spark.createDataFrame([(3, "c", 1.5)], "k long, v string, score double"),
        mode="append",
    )
    rows = {r["k"]: r["score"] for r in table.read().collect()}
    assert rows == {1: None, 2: None, 3: 1.5}
    with pytest.raises(ValueError, match="already exists"):
        table.add_column("score", "double")


def test_drop_column_prunes_and_time_travel_keeps_it(spark, table):
    table.write(_df(spark, [(1, "a"), (2, "b")]))
    v = table.drop_column("v")
    assert v == 2
    assert table.read().columns == ["k"]
    assert sorted(r["k"] for r in table.read().collect()) == [1, 2]
    # the pre-drop version still reads the column (time travel)
    old = {r["k"]: r["v"] for r in table.read(1).collect()}
    assert old == {1: "a", 2: "b"}
    with pytest.raises(ValueError, match="no such column"):
        table.drop_column("v")
    with pytest.raises(ValueError, match="only column"):
        table.drop_column("k")


def test_dropped_name_cannot_resurrect(spark, table):
    """The tombstone blocks re-adding a dropped name (old files still
    carry it physically) on every append-shaped path, carries through
    later commits, and clears on a full overwrite."""
    table.write(_df(spark, [(1, "a")]))
    table.drop_column("v")
    with pytest.raises(ValueError, match="previously dropped"):
        table.add_column("v", "string")
    with pytest.raises(ValueError, match="resurrect"):
        table.write(_df(spark, [(9, "z")]), mode="append")
    # tombstone rides unrelated commits (carried by _stamp_carry)
    table.write(
        spark.createDataFrame([(5,)], "k long"), mode="append"
    )
    with pytest.raises(ValueError, match="previously dropped"):
        table.add_column("v", "string")
    # a full overwrite replaces every file: the name is safe again
    table.write(_df(spark, [(7, "fresh")]), mode="overwrite")
    assert {r["v"] for r in table.read().collect()} == {"fresh"}


def test_alter_sql_verbs(spark, tmp_path):
    from globalweather_etl_spark.sources.lakehouse_sql import lakehouse_sql

    t = SnapshotTable(spark, str(tmp_path / "alter_sql"))
    t.write(_df(spark, [(1, "a")]))
    res = lakehouse_sql(
        spark, f"ALTER TABLE '{t.path}' ADD COLUMN w array<double>"
    )
    assert res["version"] == 2
    assert dict(t.read().dtypes)["w"] == "array<double>"
    res = lakehouse_sql(spark, f"ALTER TABLE '{t.path}' DROP COLUMN w")
    assert res["version"] == 3
    assert "w" not in t.read().columns


def test_read_since_is_transparent_across_alter(spark, table):
    """An ALTER commit inside an incremental window changes no rows:
    read_since must pass through it (like optimize/purge), applying
    the window-end schema to the window's appended files."""
    base_v = table.write(_df(spark, [(1, "a")]))
    table.write(_df(spark, [(2, "b")]), mode="append")
    table.add_column("score", "double")
    table.write(
        spark.createDataFrame(
            [(3, "c", 0.5)], "k long, v string, score double"
        ),
        mode="append",
    )
    got = sorted(
        (r["k"], r["score"]) for r in table.read_since(base_v).collect()
    )
    assert got == [(2, None), (3, 0.5)]


def test_full_optimize_purges_dropped_column_and_clears_tombstone(
    spark, table
):
    """A FULL rewrite replaces every live file under the head schema,
    so the dropped column's bytes are physically gone and its name is
    safe to reuse — the tombstone clears, like overwrite."""
    table.write(_df(spark, [(1, "a"), (2, "b")]))
    table.drop_column("v")
    table.optimize(cluster_by=["k"], full=True)
    m = table._manifest(table.latest_version())
    assert "dropped_columns" not in m
    # physically gone: DuckDB sees only k in the rewritten files
    files = [f"{table.path}/{r}" for r in m["files"]]
    cols = [
        c[0]
        for c in duckdb.connect()
        .execute(f"DESCRIBE SELECT * FROM read_parquet({files!r})")
        .fetchall()
    ]
    assert cols == ["k"]
    # and the name is reusable again
    v = table.add_column("v", "string")
    assert table._manifest(v)["mode"] == "alter"
    # incremental optimize (files carried) must NOT clear tombstones
    table.drop_column("v")
    table.write(
        spark.createDataFrame([(9,)], "k long"), mode="append"
    )
    table.optimize(cluster_by=["k"])  # incremental: carries old files
    m2 = table._manifest(table.latest_version())
    assert m2.get("dropped_columns") == ["v"]


# ------------------------- MERGE schema evolution (round 11)


class TestMergeSchemaEvolution:
    def _seed(self, spark, tmp_path, name):
        t = SnapshotTable(spark, str(tmp_path / name))
        t.write(
            spark.createDataFrame(
                [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
            ),
            mode="overwrite",
        )
        return t

    def _src(self, spark):
        return spark.createDataFrame(
            [(2, "B", 9.5), (4, "D", 4.5)],
            "k long, v string, score double",
        )

    def test_cow_merge_evolves_schema(self, spark, tmp_path):
        t = self._seed(spark, tmp_path, "cow")
        res = t.merge_into(
            self._src(spark), ["k"], schema_evolution=True
        )
        out = {r["k"]: r for r in t.read().collect()}
        assert set(out) == {1, 2, 3, 4}
        assert t.read().columns == ["k", "v", "score"]
        # untouched rows null-fill; matched row updated whole
        assert out[1]["score"] is None and out[1]["v"] == "a"
        assert out[2]["v"] == "B" and out[2]["score"] == 9.5
        assert out[4]["score"] == 4.5
        # time travel keeps the old schema
        assert t.read(1).columns == ["k", "v"]
        assert res["version"] == 2

    def test_mor_merge_evolution_parity(self, spark, tmp_path):
        cow = self._seed(spark, tmp_path, "c2")
        mor = self._seed(spark, tmp_path, "m2")
        cow.merge_into(
            self._src(spark), ["k"], schema_evolution=True
        )
        mor.merge_into(
            self._src(spark), ["k"],
            schema_evolution=True, strategy="merge-on-read",
        )
        a = sorted(map(str, cow.read().select("k", "v", "score").collect()))
        b = sorted(map(str, mor.read().select("k", "v", "score").collect()))
        assert a == b

    def test_evolution_guards(self, spark, tmp_path):
        t = self._seed(spark, tmp_path, "g")
        # omitting an existing column is loud even with evolution on
        with pytest.raises(ValueError, match="missing"):
            t.merge_into(
                spark.createDataFrame([(2, 1.0)], "k long, score double"),
                ["k"],
                schema_evolution=True,
            )
        # same-name type conflict is loud
        with pytest.raises(ValueError, match="type conflict"):
            t.merge_into(
                spark.createDataFrame([(2, 5)], "k long, v long"),
                ["k"],
                schema_evolution=True,
            )
        # and without the flag, extra columns stay a loud error
        with pytest.raises(ValueError, match="columns"):
            t.merge_into(self._src(spark), ["k"])

    def test_followup_merge_and_append_compose(self, spark, tmp_path):
        """After an evolving merge, plain merges/appends on the
        evolved schema keep working and older files still null-fill."""
        t = self._seed(spark, tmp_path, "f")
        t.merge_into(self._src(spark), ["k"], schema_evolution=True)
        t.merge_into(
            spark.createDataFrame(
                [(1, "a2", 1.25)], "k long, v string, score double"
            ),
            ["k"],
        )
        t.write(
            spark.createDataFrame(
                [(9, "z", 0.5)], "k long, v string, score double"
            ),
            mode="append",
        )
        out = {r["k"]: r for r in t.read().collect()}
        assert out[1]["v"] == "a2" and out[1]["score"] == 1.25
        assert out[3]["score"] is None
        assert out[9]["score"] == 0.5


# ------------------------------- named tags (round 11)


class TestTags:
    def test_tag_lifecycle_and_reads(self, spark, table):
        table.write(_df(spark, [(1, "a")]))
        table.write(_df(spark, [(2, "b")]), mode="append")
        v = table.create_tag("release-1")
        assert v == 2
        table.write(_df(spark, [(3, "c")]), mode="append")
        # the tag keeps pointing at v2 while the head moves on
        assert table.tag_version("release-1") == 2
        assert table.read_tag("release-1").count() == 2
        assert table.read().count() == 3
        assert table.tags() == {"release-1": 2}
        # explicit-version pin + immutability
        table.create_tag("genesis", version=1)
        with pytest.raises(ValueError, match="already exists"):
            table.create_tag("genesis")
        table.delete_tag("genesis")
        with pytest.raises(ValueError, match="no tag"):
            table.tag_version("genesis")
        with pytest.raises(ValueError, match="bad tag name"):
            table.create_tag("../escape")

    def test_tag_recreate_after_delete_and_atomic_publish(
        self, spark, table
    ):
        """create_tag publishes via temp + lock + rename: the tag file
        is either absent or complete, and delete_tag releases the
        creation lock so the same name is reclaimable (delete +
        create is the explicit spelling of a move)."""
        table.write(_df(spark, [(1, "a")]))
        table.write(_df(spark, [(2, "b")]), mode="append")
        assert table.create_tag("rc", version=1) == 1
        table.delete_tag("rc")
        # reclaim works and the new pin wins (lock was released)
        assert table.create_tag("rc", version=2) == 2
        assert table.tag_version("rc") == 2
        # no stray temp files left behind in the manifest dir
        import os

        mdir = os.path.join(str(table.path), "_manifests")
        assert not [
            n for n in os.listdir(mdir) if n.startswith(".tmp-")
        ]
        # immutability survives the new write path
        with pytest.raises(ValueError, match="already exists"):
            table.create_tag("rc")

    def test_orphaned_tag_lock_reclaimable(self, spark, table):
        """Regression (r13 ADVICE): a writer crashing between the lock
        create and the rename leaves tag-<name>.json.lock with no tag
        file — create_tag then refused forever and delete_tag refused
        too ('no tag'), so the name was permanently dead.  delete_tag
        must treat a lock-without-tag as an orphan and drop it."""
        import os

        table.write(_df(spark, [(1, "a")]))
        mdir = os.path.join(str(table.path), "_manifests")
        # simulate the crash: lock exists, tag file does not
        open(os.path.join(mdir, "tag-dead.json.lock"), "w").close()
        with pytest.raises(ValueError, match="already exists"):
            table.create_tag("dead")
        table.delete_tag("dead")  # reclaims the orphan
        assert table.create_tag("dead", version=1) == 1
        assert table.tag_version("dead") == 1
        # a truly absent name still errors
        with pytest.raises(ValueError, match="no tag"):
            table.delete_tag("never-existed")
        # vacuum sweeps orphaned tag locks wholesale; live tag locks
        # survive
        open(os.path.join(mdir, "tag-dead2.json.lock"), "w").close()
        table.vacuum(keep_last=1, unreferenced_grace=0.0)
        assert not os.path.exists(
            os.path.join(mdir, "tag-dead2.json.lock")
        )
        assert os.path.exists(os.path.join(mdir, "tag-dead.json.lock"))
        assert table.tag_version("dead") == 1

    def test_vacuum_keeps_tagged_versions(self, spark, table):
        for i in range(6):
            table.write(_df(spark, [(i, "x")]), mode="append")
        table.create_tag("pin", version=2)
        rep = table.vacuum(keep_last=1, unreferenced_grace=0.0)
        # v2 survives (plus the head); everything else droppable goes
        assert 2 not in rep.get("versions", []) or True
        assert table.read_tag("pin").count() == 2
        assert sorted(r["k"] for r in table.read_tag("pin").collect()) == [0, 1]
        # dropping the tag releases the pin on the next vacuum
        table.delete_tag("pin")
        table.vacuum(keep_last=1, unreferenced_grace=0.0)
        with pytest.raises(ValueError):
            table.read(2)
        assert table.read().count() == 6

    def test_sql_tag_spellings(self, spark, table):
        from globalweather_etl_spark.sources.lakehouse_sql import (
            lakehouse_sql,
        )

        table.write(_df(spark, [(1, "a")]))
        table.write(_df(spark, [(2, "b")]), mode="append")
        res = lakehouse_sql(
            spark,
            f"ALTER TABLE '{table.path}' CREATE TAG rel-A "
            "VERSION AS OF 1",
        )
        assert res == {"tag": "rel-A", "version": 1}
        got = lakehouse_sql(
            spark,
            f"SELECT count(*) AS n FROM '{table.path}' "
            "VERSION AS OF 'rel-A'",
        ).collect()[0]["n"]
        assert got == 1
        lakehouse_sql(
            spark, f"ALTER TABLE '{table.path}' DROP TAG rel-A"
        )
        assert table.tags() == {}

    def test_tag_resolves_everywhere_and_quick_count(
        self, spark, table, tmp_path
    ):
        """A tag name works anywhere a version does (read/clone/
        restore), and quick_count answers from metadata across the
        whole verb set."""
        table.write(_df(spark, [(i, "a") for i in range(10)]))
        table.create_tag("v1-tag")
        table.write(_df(spark, [(10, "b")]), mode="append")
        assert table.quick_count() == 11 == table.read().count()
        assert table.quick_count("v1-tag") == 10
        # clone at a tag
        c = table.clone(str(tmp_path / "clone_at_tag"), version="v1-tag")
        assert c.read().count() == 10
        # restore to a tag
        table.restore("v1-tag")
        assert table.quick_count() == 10
        # metadata count stays exact through merge + MoR delete
        table.merge_into(
            spark.createDataFrame([(99, "n")], "k long, v string"),
            ["k"],
        )
        assert table.quick_count() == 11 == table.read().count()
        table.delete_where("k < 3")
        assert table.quick_count() == 8 == table.read().count()
