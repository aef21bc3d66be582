"""Incremental clustering maintenance (SnapshotTable.optimize).

The reference has no table format (Snowflake auto-clusters its
micro-partitions under ETL:23-136); this layer re-implements the
public incremental-OPTIMIZE / liquid-clustering idea: rewrite only the
files not yet in the table's clustered layout, carry every clustered
file by reference. The tests pin the contract pieces:

- content bit-identity: optimize never changes rows, only layout;
- incrementality: already-clustered files are carried BY REFERENCE
  (same relative paths in the manifest, bytes untouched on disk);
- the clustering stamp survives every commit path, shrinks when a
  merge rewrites a clustered file, and dies on plain overwrite;
- deletion vectors on rewritten files materialize away, clustered
  files keep theirs;
- spec changes / full=True trigger the full rewrite; a fully
  clustered head is a version-free no-op;
- zone-map pruning works across clustered + incrementally-added
  files after a pass.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from globalweather_etl_spark.sources.snapshots import SnapshotTable


def _rows(lo, hi):
    return [
        Row(
            k=i,
            d=dt.date(2024, 1, 1) + dt.timedelta(days=i % 200),
            u=(i * 37) % 1000,
            val=float(i) * 1.5,
        )
        for i in range(lo, hi)
    ]


def _content(st, version=None):
    return sorted(tuple(r) for r in st.read(version).collect())


@pytest.fixture()
def table(spark, tmp_path):
    st = SnapshotTable(spark, str(tmp_path) + "/t")
    base = spark.createDataFrame(_rows(0, 400))
    st.write_zordered(base, ["d", "u"], n_files=4, mode="overwrite")
    return st


class TestIncrementalOptimize:
    def test_write_zordered_stamps_clustering(self, table):
        cs = table.clustering_state()
        assert cs["kind"] == "zorder" and cs["cols"] == ["d", "u"]
        assert cs["unclustered_files"] == []
        assert cs["clustered_fraction"] == 1.0

    def test_appends_fall_outside_then_optimize_folds_them(
        self, spark, table
    ):
        table.write(spark.createDataFrame(_rows(400, 500)))
        table.write(spark.createDataFrame(_rows(500, 620)))
        cs = table.clustering_state()
        assert len(cs["unclustered_files"]) > 0
        assert 0 < cs["clustered_fraction"] < 1.0
        expected = _content(table)
        before = set(cs["clustered_files"])

        res = table.optimize(zorder_by=["d", "u"])
        assert res["full"] is False
        assert res["files_rewritten"] == len(cs["unclustered_files"])
        assert res["files_carried"] == len(before)
        # clustered files carried BY REFERENCE: same rel paths live on
        after = table.clustering_state()
        assert before <= set(after["clustered_files"])
        assert after["unclustered_files"] == []
        # rows are bit-identical; only layout moved
        assert _content(table) == expected
        # live-row accounting unchanged
        m = table._manifest(table.latest_version())
        assert m["n_rows"] == len(expected)

    def test_noop_when_fully_clustered(self, table):
        head = table.latest_version()
        res = table.optimize(zorder_by=["d", "u"])
        assert res == {
            "version": head,
            "full": False,
            "files_rewritten": 0,
            "files_written": 0,
            "files_carried": len(
                table.clustering_state()["clustered_files"]
            ),
        }
        assert table.latest_version() == head  # no version burned

    def test_spec_change_triggers_full_rewrite(self, spark, table):
        table.write(spark.createDataFrame(_rows(400, 450)))
        expected = _content(table)
        res = table.optimize(cluster_by=["k"])
        assert res["full"] is True and res["files_carried"] == 0
        cs = table.clustering_state()
        assert cs["kind"] == "range" and cs["cols"] == ["k"]
        assert cs["clustered_fraction"] == 1.0
        assert _content(table) == expected

    def test_full_flag_rewrites_everything(self, spark, table):
        table.write(spark.createDataFrame(_rows(400, 450)))
        expected = _content(table)
        res = table.optimize(zorder_by=["d", "u"], full=True)
        assert res["full"] is True
        assert _content(table) == expected
        assert table.clustering_state()["clustered_fraction"] == 1.0

    def test_merge_rewritten_file_reenters_unclustered(
        self, spark, table
    ):
        # copy-on-write MERGE rewrites the files holding matched keys;
        # those new files are outside the layout shuffle, so the stamp
        # must show them unclustered and the next pass re-cluster them
        src = spark.createDataFrame(
            [Row(k=5, d=dt.date(2024, 1, 6), u=185, val=999.0)]
        )
        table.merge_into(src, keys=["k"])
        cs = table.clustering_state()
        assert len(cs["unclustered_files"]) > 0
        expected = _content(table)
        res = table.optimize(zorder_by=["d", "u"])
        assert res["full"] is False
        assert res["files_rewritten"] == len(cs["unclustered_files"])
        assert _content(table) == expected
        assert (999.0,) in {
            (r[0],)
            for r in table.read().filter(F.col("k") == 5)
            .select("val")
            .collect()
        }

    def test_deletion_vectors_materialize_on_rewritten_files_only(
        self, spark, table
    ):
        table.write(spark.createDataFrame(_rows(400, 500)))
        # one delete landing in the unclustered appends, one in the
        # clustered base
        table.delete_where(F.col("k") == 450)
        table.delete_where(F.col("k") == 7)
        m = table._manifest(table.latest_version())
        assert m["dvs"]["files"]
        expected = _content(table)  # DV-applied view
        res = table.optimize(zorder_by=["d", "u"])
        assert res["full"] is False
        assert _content(table) == expected
        m2 = table._manifest(table.latest_version())
        # the clustered base keeps its DV entry; the rewritten appends
        # shed theirs (survivors were written DV-applied)
        kept = set(m2.get("dvs", {"files": []})["files"])
        assert kept <= set(
            table.clustering_state()["clustered_files"]
        )
        assert m2["n_rows"] == len(expected)

    def test_plain_overwrite_erases_stamp(self, spark, table):
        table.write(
            spark.createDataFrame(_rows(0, 50)), mode="overwrite"
        )
        assert table.clustering_state() is None
        # and a later optimize does the full rewrite
        res = table.optimize(zorder_by=["d", "u"])
        assert res["full"] is True

    def test_time_travel_unaffected(self, spark, table):
        v0 = table.latest_version()
        before = _content(table, v0)
        table.write(spark.createDataFrame(_rows(400, 460)))
        table.optimize(zorder_by=["d", "u"])
        assert _content(table, v0) == before

    def test_manifest_extra_cannot_spoof_stamp(self, spark, table):
        table.write(
            spark.createDataFrame(_rows(400, 420)),
            manifest_extra={"clustering": {"kind": "fake"}},
        )
        cs = table.clustering_state()
        assert cs["kind"] == "zorder"  # carried, not spoofed

    def test_zone_map_pruning_spans_both_generations(
        self, spark, table
    ):
        # appends + incremental pass, then stats: a narrow date range
        # must (a) lose no rows and (b) open fewer files than the head
        # holds — pruning works across old-pass and new-pass files
        table.write(spark.createDataFrame(_rows(400, 620)))
        table.optimize(zorder_by=["d", "u"])
        table.build_stats(cols=["d", "u"])
        lo, hi = dt.date(2024, 1, 10), dt.date(2024, 1, 20)
        got = sorted(
            tuple(r)
            for r in table.read_range("d", lo, hi).collect()
        )
        want = sorted(
            tuple(r)
            for r in table.read()
            .filter((F.col("d") >= lo) & (F.col("d") <= hi))
            .collect()
        )
        assert got == want
        n_all = len(table._manifest(table.latest_version())["files"])
        n_cand = len(table.files_for_range("d", lo, hi))
        assert n_cand < n_all

    def test_read_since_transparent_to_maintenance(self, spark, table):
        # optimize/purge change no rows (dataChange=false): an
        # incremental consumer's window that contains them must return
        # exactly the appended rows — not the re-clustered rewrites
        # (duplicates), not nothing (lost appends)
        base_v = table.latest_version()
        table.write(spark.createDataFrame(_rows(400, 450)))
        table.optimize(zorder_by=["d", "u"])
        table.write(spark.createDataFrame(_rows(450, 480)))
        got = sorted(
            r["k"] for r in table.read_since(base_v).collect()
        )
        assert got == list(range(400, 480))
        # purge inside the window is transparent too
        table.delete_where(F.col("k") == 401)
        with pytest.raises(ValueError, match="not append"):
            table.read_since(base_v)  # the DV delete IS a change
        v_del = table.latest_version()
        table.purge_deletes()
        table.write(spark.createDataFrame(_rows(480, 490)))
        got = sorted(
            r["k"] for r in table.read_since(v_del).collect()
        )
        assert got == list(range(480, 490))

    def test_compact_is_datachange_false(self, spark, table):
        # compact (plain or re-clustering) preserves every live row:
        # its manifest carries mode "optimize" so incremental windows
        # pass straight through it
        base_v = table.latest_version()
        table.write(spark.createDataFrame(_rows(400, 420)))
        v = table.compact(target_file_bytes=1 << 30)
        assert table._manifest(v)["mode"] == "optimize"
        got = sorted(
            r["k"] for r in table.read_since(base_v).collect()
        )
        assert got == list(range(400, 420))
        # the plain (hash-repartitioned) compact destroyed the layout
        assert table.clustering_state() is None

    def test_optimize_commit_race_loser_retries(
        self, spark, table, monkeypatch
    ):
        """A concurrent appender landing optimize's target version
        MID-FLIGHT (between its read of the log and its publish) must
        make it retry against the new head — clustering the racer's
        files too, losing nothing."""
        table.write(spark.createDataFrame(_rows(400, 420)))
        head = table.latest_version()
        racer = spark.createDataFrame(_rows(900, 910))
        commit_dir = f"{table.path}/data/c-race{head}"
        racer.write.mode("error").parquet(commit_dir)
        real = table._write_json_atomic
        state = {"raced": False}

        def racing(obj, dest):
            if not state["raced"] and obj.get("mode") == "optimize":
                state["raced"] = True
                rm = dict(table._manifest(head))
                rm["version"] = head + 1
                rm["parent"] = head
                rm["mode"] = "append"
                rm["files"] = rm["files"] + table._list_commit_files(
                    commit_dir
                )
                rm["n_rows"] = rm["n_rows"] + 10
                assert real(rm, table._manifest_path(head + 1))
            return real(obj, dest)

        monkeypatch.setattr(table, "_write_json_atomic", racing)
        res = table.optimize(zorder_by=["d", "u"])
        assert state["raced"]
        assert res["version"] == head + 2  # retried past the racer
        got = sorted(r["k"] for r in table.read().collect())
        assert got == list(range(0, 420)) + list(range(900, 910))
        assert table.clustering_state()["unclustered_files"] == []

    def test_schema_evolution_through_optimize(self, spark, table):
        # an append-evolved column null-fills for pre-evolution files;
        # optimize rewrites the unclustered files under the HEAD
        # schema (materializing the nulls physically) and must not
        # disturb values either way
        evolved = spark.createDataFrame(
            [
                Row(
                    k=1000 + i,
                    d=dt.date(2024, 3, 1),
                    u=i,
                    val=1.0,
                    extra=f"x{i}",
                )
                for i in range(10)
            ]
        )
        table.write(evolved)
        expected = sorted(
            tuple(r)
            for r in table.read()
            .select("k", "d", "u", "val", "extra")
            .collect()
        )
        res = table.optimize(zorder_by=["d", "u"])
        assert res["full"] is False
        got = sorted(
            tuple(r)
            for r in table.read()
            .select("k", "d", "u", "val", "extra")
            .collect()
        )
        assert got == expected
        assert {r[4] for r in got if r[0] >= 1000} == {
            f"x{i}" for i in range(10)
        }
        # pre-evolution rows read NULL extra on both sides of the pass
        assert all(r[4] is None for r in got if r[0] < 1000)

    def test_incremental_stats_compose_with_optimize(
        self, spark, table
    ):
        # the maintenance pair: optimize rewrites O(new data), then
        # the incremental zone-map build computes stats for ONLY the
        # pass's output files (carried files reuse the old sidecar) —
        # per-commit maintenance stays O(changed files) end to end
        table.build_stats(cols=["d", "u"])
        table.write(spark.createDataFrame(_rows(400, 460)))
        res = table.optimize(zorder_by=["d", "u"])
        table.build_stats(cols=["d", "u"], incremental=True)
        meta = table._read_json(
            table._zm_meta_path(table.latest_version())
        )
        assert meta["n_computed_files"] == res["files_written"]
        lo, hi = dt.date(2024, 1, 10), dt.date(2024, 1, 20)
        got = sorted(
            tuple(r)
            for r in table.read_range("d", lo, hi).collect()
        )
        want = sorted(
            tuple(r)
            for r in table.read()
            .filter((F.col("d") >= lo) & (F.col("d") <= hi))
            .collect()
        )
        assert got == want

    def test_read_since_loud_on_missing_mid_window_manifest(
        self, spark, table
    ):
        # read_since walks the PARENT CHAIN, so a vacuumed (or
        # manually removed) mid-window manifest must raise — silently
        # skipping it would drop that append's rows from the feed
        import os

        base_v = table.latest_version()
        table.write(spark.createDataFrame(_rows(400, 410)))
        gone_v = table.latest_version()
        table.write(spark.createDataFrame(_rows(410, 420)))
        os.remove(
            f"{table.path}/_manifests/v{gone_v:08d}.json"
        )
        with pytest.raises(ValueError):
            table.read_since(base_v)

    def test_clone_carries_clustering_stamp(
        self, spark, table, tmp_path
    ):
        # zero-copy clone spreads the source manifest verbatim, so
        # the clustering stamp (table-relative file list) stays valid
        # — and an incremental pass on the CLONE folds only its own
        # unclustered files, independently of the source
        table.write(spark.createDataFrame(_rows(400, 420)))
        dst = table.clone(str(tmp_path) + "/cl")
        cs, cd = table.clustering_state(), dst.clustering_state()
        assert cd["kind"] == "zorder" and cd["cols"] == ["d", "u"]
        assert set(cd["clustered_files"]) == set(cs["clustered_files"])
        res = dst.optimize(zorder_by=["d", "u"])
        assert res["full"] is False and res["files_rewritten"] > 0
        assert dst.clustering_state()["unclustered_files"] == []
        # the source's state is untouched by the clone's maintenance
        assert len(table.clustering_state()["unclustered_files"]) > 0

    def test_optimize_validation(self, table):
        with pytest.raises(ValueError, match="exactly one"):
            table.optimize()
        with pytest.raises(ValueError, match="exactly one"):
            table.optimize(zorder_by=["d"], cluster_by=["k"])
        with pytest.raises(ValueError, match="positive"):
            table.optimize(zorder_by=["d"], target_file_bytes=0)


class TestAutoRecluster:
    """clustering_overlap + optimize(auto_full_threshold=...): the
    trigger that closes the incremental-clustering loop. Incremental
    passes cluster each batch among themselves, so key ranges stack
    across passes and point probes touch ~one file PER PASS; the
    overlap metric must read that growth off the zone-map sidecar and
    optimize must escalate to the full rewrite past the threshold."""

    def _stack_passes(self, spark, table, n_passes):
        for p in range(n_passes):
            # every batch spans the SAME key range -> each incremental
            # pass adds one more layer of overlapping files
            table.write(
                spark.createDataFrame(_rows(400 + p * 100, 500 + p * 100)),
                mode="append",
            )
            res = table.optimize(zorder_by=["d", "u"])
            assert res["full"] is False

    def test_overlap_grows_with_stacked_passes(self, spark, table):
        table.build_stats(cols=["d", "u"])
        base_depth = table.clustering_overlap()["avg_depth"]
        self._stack_passes(spark, table, 3)
        ov = table.clustering_overlap()
        assert set(ov["per_col"]) == {"d", "u"}
        # the d column cycles i%200, so every pass's files cover the
        # same date range: depth must grow materially over 3 passes
        assert ov["avg_depth"] > base_depth + 1.5, (base_depth, ov)
        assert ov["per_col"]["d"]["n_unknown"] == 0

    def test_no_stamp_returns_none(self, spark, tmp_path):
        st = SnapshotTable(spark, str(tmp_path) + "/plain")
        st.write(spark.createDataFrame(_rows(0, 50)))
        assert st.clustering_overlap() is None

    def test_auto_full_escalates_past_threshold(self, spark, table):
        self._stack_passes(spark, table, 3)
        depth = table.clustering_overlap()["avg_depth"]
        before = _content(table)
        res = table.optimize(
            zorder_by=["d", "u"],
            auto_full_threshold=depth - 0.5,
        )
        assert res["auto_full"] is True and res["full"] is True
        assert res["files_carried"] == 0  # consolidation rewrote all
        assert res["overlap_depth"] == depth
        assert _content(table) == before  # layout-only, rows identical
        # consolidation collapsed the stacked layers
        assert table.clustering_overlap()["avg_depth"] < depth

    def test_auto_full_stays_incremental_below_threshold(
        self, spark, table
    ):
        table.write(
            spark.createDataFrame(_rows(400, 450)), mode="append"
        )
        res = table.optimize(
            zorder_by=["d", "u"], auto_full_threshold=1e9
        )
        assert res["auto_full"] is False and res["full"] is False
        assert res["files_carried"] > 0
        assert res["overlap_depth"] is not None


class TestHilbertCurve:
    def test_hilbert_layout_content_identical(self, spark, tmp_path):
        """curve='hilbert' changes LAYOUT only: same rows, zone-map
        box reads lose nothing."""
        st = SnapshotTable(spark, str(tmp_path) + "/h")
        base = spark.createDataFrame(_rows(0, 400))
        st.write_zordered(
            base, ["d", "u"], n_files=4, mode="overwrite",
            curve="hilbert",
        )
        assert _content(st) == sorted(
            tuple(r) for r in base.collect()
        )
        cs = st.clustering_state()
        assert cs["kind"] == "zorder" and cs["unclustered_files"] == []
        st.build_stats(cols=["d", "u"])
        import datetime as dt

        box = st.read_box(
            [
                ("d", dt.date(2024, 2, 1), dt.date(2024, 3, 1)),
                ("u", 100, 500),
            ]
        )
        expect = st.read().filter(
            (F.col("d") >= "2024-02-01") & (F.col("d") <= "2024-03-01")
            & (F.col("u") >= 100) & (F.col("u") <= 500)
        )
        assert sorted(map(tuple, box.collect())) == sorted(
            map(tuple, expect.collect())
        )

    def test_curve_change_is_a_spec_change(self, spark, tmp_path):
        """morton -> hilbert AND hilbert -> morton both trigger the
        full rewrite (the normalized comparison catches the direction
        a subset check would miss)."""
        st = SnapshotTable(spark, str(tmp_path) + "/c")
        st.write_zordered(
            spark.createDataFrame(_rows(0, 200)), ["u", "val"],
            n_files=2, mode="overwrite",
        )
        res = st.optimize(
            zorder_by=["u", "val"], curve="hilbert"
        )
        assert res["full"] is True
        # same curve again: fully clustered no-op
        res2 = st.optimize(zorder_by=["u", "val"], curve="hilbert")
        assert res2["files_rewritten"] == 0
        # back to morton: full again
        res3 = st.optimize(zorder_by=["u", "val"])
        assert res3["full"] is True

    def test_hilbert_incremental_optimize(self, spark, tmp_path):
        st = SnapshotTable(spark, str(tmp_path) + "/i")
        st.write_zordered(
            spark.createDataFrame(_rows(0, 300)), ["u", "val"],
            n_files=3, mode="overwrite", curve="hilbert",
        )
        st.write(spark.createDataFrame(_rows(300, 360)))
        res = st.optimize(
            zorder_by=["u", "val"], curve="hilbert"
        )
        assert res["full"] is False and res["files_carried"] == 3
        assert _content(st) == sorted(
            tuple(r)
            for r in spark.createDataFrame(_rows(0, 360)).collect()
        )

    def test_hilbert_requires_two_columns(self, spark, tmp_path):
        import pytest

        st = SnapshotTable(spark, str(tmp_path) + "/e")
        with pytest.raises(ValueError, match="2-D"):
            st.write_zordered(
                spark.createDataFrame(_rows(0, 10)),
                ["d", "u", "val"], mode="overwrite", curve="hilbert",
            )
