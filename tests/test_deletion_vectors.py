"""Deletion vectors (merge-on-read): delete_where, the merge-on-read
MERGE strategy, purge_deletes, DV carry across every commit path
(append / write_batch / write_audited / restore), DV-aware pruned
reads, and vacuum's DV-store retention.

This is the positional-delete design Delta and Iceberg publish: a
delete commits only a tiny (file, row_position) parquet store; reads
of the affected files anti-join it until purge/compact materializes
the deletions away.  The invariants pinned here (round-6 advisory —
the surface shipped without regression tests):

- merge-on-read and copy-on-write produce IDENTICAL table contents;
- stacked deletes account n_rows exactly and never rewrite a file;
- every commit path that keeps parent files carries the parent's
  deletion vectors (dropping them would resurrect deleted rows);
- pruned reads (read_range / read_where) apply DVs too;
- vacuum keeps DV stores any live manifest references, and reclaims
  them once purge/vacuum makes them unreferenced.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.sources.snapshots import SnapshotTable


@pytest.fixture()
def table(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "dv_tbl"))
    # 3 files of 8 rows each so deletes can be file-sparse
    df = spark.createDataFrame(
        [(i, f"v{i}", i % 3) for i in range(24)], "k long, v string, g int"
    ).repartition(3, "g")
    t.write(df, mode="overwrite")
    return t


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestDeleteWhere:
    def test_delete_applies_without_rewriting_files(self, spark, table):
        v0 = table.latest_version()
        files_before = table._manifest(v0)["files"]
        res = table.delete_where(F.col("k").isin(3, 7, 20))
        assert res["n_deleted"] == 3
        assert res["files_affected"] >= 1
        m = table._manifest(res["version"])
        # merge-on-read: the data file listing is UNTOUCHED
        assert m["files"] == files_before
        assert m["n_rows"] == 24 - 3
        got = _rows(table.read())
        assert len(got) == 21
        assert not any(r[0] in (3, 7, 20) for r in got)

    def test_condition_sees_live_rows_and_rerun_is_noop(self, spark, table):
        v1 = table.delete_where("k < 5")["version"]
        # identical re-run matches nothing: no version burned
        res = table.delete_where("k < 5")
        assert res["n_deleted"] == 0
        assert res["version"] == v1
        assert table.latest_version() == v1
        assert table.read().count() == 19

    def test_stacked_deletes_account_exactly(self, spark, table):
        table.delete_where("k < 4")
        table.delete_where("k >= 20")
        table.delete_where("v = 'v10'")
        m = table._manifest(table.latest_version())
        assert m["n_rows"] == 24 - 4 - 4 - 1
        assert table.read().count() == m["n_rows"]
        # both stores accumulate in the manifest
        assert len(m["dvs"]["stores"]) >= 3
        got = {r["k"] for r in table.read().collect()}
        assert got == {k for k in range(4, 20) if k != 10}

    def test_time_travel_to_pre_delete_version(self, spark, table):
        v0 = table.latest_version()
        v1 = table.delete_where("k = 0")["version"]
        assert table.read(v0).count() == 24
        assert table.read(v1).count() == 23

    def test_sql_string_and_column_conditions_agree(self, spark, table):
        t2 = SnapshotTable(spark, table.path + "_twin")
        t2.write(table.read(), mode="overwrite")
        table.delete_where("g = 1")
        t2.delete_where(F.col("g") == 1)
        assert _rows(table.read()) == _rows(t2.read())


class TestMergeStrategyParity:
    def _source(self, spark):
        # updates k=1,2 (file-scattered), deletes nothing, inserts k=100
        return spark.createDataFrame(
            [(1, "V1", 1), (2, "V2", 2), (100, "new", 0)],
            "k long, v string, g int",
        )

    def test_cow_and_mor_identical_contents(self, spark, table, tmp_path):
        twin = SnapshotTable(spark, str(tmp_path / "dv_tbl_mor"))
        twin.write(table.read(), mode="overwrite")
        rc = table.merge_into(self._source(spark), keys=["k"])
        rm = twin.merge_into(
            self._source(spark), keys=["k"], strategy="merge-on-read"
        )
        assert _rows(table.read()) == _rows(twin.read())
        assert rc["files_rewritten"] >= 1
        assert rm["files_rewritten"] == 0
        assert rm["n_dv_deletes"] == 2  # the two matched keys
        assert rc["n_rows"] == rm["n_rows"] == 25
        # MOR never drops a file from the listing — it only appends
        base_files = set(twin._manifest(1)["files"])
        assert base_files <= set(twin._manifest(rm["version"])["files"])

    def test_mor_matched_delete(self, spark, table):
        src = spark.createDataFrame(
            [(5, "x", 2), (6, "x", 0)], "k long, v string, g int"
        )
        res = table.merge_into(
            src, keys=["k"], when_matched="delete",
            when_not_matched="ignore", strategy="merge-on-read",
        )
        assert res["n_dv_deletes"] == 2
        assert res["files_rewritten"] == 0
        got = {r["k"] for r in table.read().collect()}
        assert got == set(range(24)) - {5, 6}

    def test_mor_matched_delete_condition(self, spark, table):
        # WHEN MATCHED AND cond THEN DELETE, plus a retract-only row
        # that must not insert
        src = spark.createDataFrame(
            [(5, "__del__", 2), (6, "kept", 0), (200, "__del__", 1)],
            "k long, v string, g int",
        )
        table.merge_into(
            src, keys=["k"],
            matched_delete_condition="v = '__del__'",
            strategy="merge-on-read",
        )
        got = {r["k"]: r["v"] for r in table.read().collect()}
        assert 5 not in got and 200 not in got
        assert got[6] == "kept"
        assert len(got) == 23

    def test_mor_noop_merge_burns_no_version(self, spark, table):
        head = table.latest_version()
        src = spark.createDataFrame(
            [(500, "x", 0)], "k long, v string, g int"
        )
        res = table.merge_into(
            src, keys=["k"], when_matched="update",
            when_not_matched="ignore", strategy="merge-on-read",
        )
        assert res["version"] == head
        assert res["n_dv_deletes"] == 0

    def test_cow_merge_on_dvd_table_never_resurrects(self, spark, table):
        """A CoW rewrite of a file that carries deletion vectors must
        read it DV-applied — and the rewritten file's stale DV entries
        must not delete surviving rows."""
        table.delete_where("k = 1")  # k=1 shares a file with k=4,7,...
        src = spark.createDataFrame(
            [(4, "V4", 1)], "k long, v string, g int"
        )
        table.merge_into(src, keys=["k"], when_not_matched="ignore")
        got = {r["k"]: r["v"] for r in table.read().collect()}
        assert 1 not in got  # stayed deleted through the rewrite
        assert got[4] == "V4"
        assert len(got) == 23
        m = table._manifest(table.latest_version())
        # the rewritten file left the DV 'files' set
        dv_files = (m.get("dvs") or {}).get("files", [])
        assert all(f in set(m["files"]) for f in dv_files)


class TestPurgeDeletes:
    def test_purge_materializes_and_carries_clean_files(self, spark, table):
        table.delete_where("k in (0, 3, 21)")
        before = _rows(table.read())
        m_before = table._manifest(table.latest_version())
        clean_before = [
            f for f in m_before["files"]
            if f not in set(m_before["dvs"]["files"])
        ]
        v = table.purge_deletes()
        m = table._manifest(v)
        assert "dvs" not in m or not m.get("dvs", {}).get("files")
        assert m["n_rows"] == 21
        assert _rows(table.read(v)) == before
        # clean files carried BY REFERENCE, only DV'd files rewritten
        assert set(clean_before) <= set(m["files"])
        assert not set(m_before["dvs"]["files"]) & set(m["files"])

    def test_purge_noop_without_dvs(self, spark, table):
        head = table.latest_version()
        assert table.purge_deletes() == head

    def test_compact_also_materializes_dvs(self, spark, table):
        table.delete_where("k >= 12")
        before = _rows(table.read())
        v = table.compact()
        m = table._manifest(v)
        assert _rows(table.read(v)) == before
        assert not (m.get("dvs") or {}).get("files")


class TestDvCarry:
    def test_append_carries_parent_dvs(self, spark, table):
        table.delete_where("k < 3")
        table.write(
            spark.createDataFrame(
                [(100, "app", 0)], "k long, v string, g int"
            ),
            mode="append",
        )
        got = {r["k"] for r in table.read().collect()}
        assert got == set(range(3, 24)) | {100}
        m = table._manifest(table.latest_version())
        assert m["n_rows"] == 22
        assert m["dvs"]["files"]  # carried, not dropped

    def test_overwrite_drops_dvs_with_the_files(self, spark, table):
        table.delete_where("k < 3")
        table.write(
            spark.createDataFrame(
                [(1, "fresh", 0)], "k long, v string, g int"
            ),
            mode="overwrite",
        )
        m = table._manifest(table.latest_version())
        assert not (m.get("dvs") or {}).get("files")
        assert table.read().count() == 1

    def test_write_batch_append_carries_dvs(self, spark, table):
        table.delete_where("k = 10")
        v = table.write_batch(
            spark.createDataFrame(
                [(200, "b", 1)], "k long, v string, g int"
            ),
            batch_id=7,
        )
        assert v is not None
        got = {r["k"] for r in table.read().collect()}
        assert 10 not in got and 200 in got
        assert len(got) == 24  # 24 - 1 deleted + 1 appended

    def test_write_audited_append_carries_dvs(self, spark, table):
        from globalweather_etl_spark.operators.expectations import (
            ExpectationSuite,
            expect_not_null,
        )

        table.delete_where("k = 11")
        table.write_audited(
            spark.createDataFrame(
                [(300, "aud", 2)], "k long, v string, g int"
            ),
            ExpectationSuite([expect_not_null("v")]),
        )
        got = {r["k"] for r in table.read().collect()}
        assert 11 not in got and 300 in got

    def test_restore_carries_the_restored_versions_dvs(self, spark, table):
        vd = table.delete_where("k = 2")["version"]
        table.write(
            spark.createDataFrame(
                [(400, "x", 0)], "k long, v string, g int"
            ),
            mode="append",
        )
        vr = table.restore(vd)
        got = {r["k"] for r in table.read(vr).collect()}
        assert got == set(range(24)) - {2}


class TestDvAwareReads:
    def test_pruned_range_read_applies_dvs(self, spark, tmp_path):
        t = SnapshotTable(spark, str(tmp_path / "dv_zm"))
        df = spark.createDataFrame(
            [(i, i * 10) for i in range(64)], "k long, val long"
        )
        t.write_clustered(df, cluster_by=["k"], n_files=8, mode="overwrite")
        t.delete_where("k = 20")
        t.build_stats(cols=["k"])
        got = {r["k"] for r in t.read_range("k", 16, 31).collect()}
        assert got == set(range(16, 32)) - {20}
        # and pruning still actually prunes
        files = t.files_for_range("k", 16, 31)
        assert files is not None
        assert len(files) < len(t._manifest(t.latest_version())["files"])

    def test_bloom_point_read_applies_dvs(self, spark, tmp_path):
        t = SnapshotTable(spark, str(tmp_path / "dv_bloom"))
        df = spark.createDataFrame(
            [(i, f"u{i}") for i in range(64)], "k long, u string"
        )
        t.write_clustered(df, cluster_by=["k"], n_files=8, mode="overwrite")
        t.delete_where("k = 5")
        t.build_file_index("k")
        assert t.read_where("k", 5).count() == 0
        assert t.read_where("k", 6).count() == 1


class TestVacuumDvRetention:
    def test_vacuum_keeps_referenced_dv_stores(self, spark, table):
        table.delete_where("k < 6")
        before = _rows(table.read())
        rep = table.vacuum(keep_last=1, unreferenced_grace=0.0)
        # the DV store is referenced by the head manifest: still readable
        assert _rows(table.read()) == before
        assert table.read().count() == 18

    def test_vacuum_reclaims_unreferenced_dv_stores(self, spark, table):
        table.delete_where("k < 6")
        m_dv = table._manifest(table.latest_version())
        stores = m_dv["dvs"]["stores"]
        table.purge_deletes()
        # head no longer references the DV store; dropping the DV'd
        # version makes it unreferenced
        table.vacuum(keep_last=1, unreferenced_grace=0.0)
        for s in stores:
            assert not table._fs.exists(table._p(f"{table.path}/{s}"))
        assert table.read().count() == 18
