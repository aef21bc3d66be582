"""Multi-table atomic transactions (sources/catalog.py).

The contract under test is the one the reference's ELT shape needs
(sql/ETL_GlobalWeather_DB.sql:23-136 rebuilds five dims + the fact
that joins them in one script): a reader NEVER sees the new fact with
an old dimension — either every staged table moved or none did.

Pinned pieces:
- all-or-nothing visibility across tables (the decision record is the
  single atomic point);
- pending manifests are invisible to every read surface (read,
  read(version), history, read_asof, read_since, latest head) and
  BLOCK other commits (ConcurrentTransactionError) until decided;
- crash recovery: a transaction that staged but never decided is
  invisible and force-abortable; the sweep burns the version numbers
  (the crashed-single-writer shape) and later commits proceed;
- commit/force-abort arbitration: exactly one decision ever wins;
- consistent cross-table snapshot pins;
- empty/abort/reuse lifecycle edges.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from globalweather_etl_spark.sources.catalog import (
    ConcurrentTransactionError,
    SnapshotCatalog,
)


def _df(spark, n, tag="a"):
    return spark.createDataFrame(
        [Row(k=i, tag=tag, val=float(i)) for i in range(n)]
    )


@pytest.fixture()
def cat(spark, tmp_path):
    return SnapshotCatalog(spark, str(tmp_path) + "/wh")


class TestCommit:
    def test_two_tables_commit_atomically(self, spark, cat):
        cat.table("fact").write(_df(spark, 4, "old"), mode="overwrite")
        cat.table("dim").write(_df(spark, 2, "old"), mode="overwrite")
        txn = cat.begin()
        txn.write("fact", _df(spark, 8, "new"), mode="overwrite")
        txn.write("dim", _df(spark, 3, "new"), mode="overwrite")
        versions = txn.commit()
        assert txn.state == "committed"
        assert set(versions) == {"fact", "dim"}
        assert cat.table("fact").read().count() == 8
        assert cat.table("dim").read().count() == 3
        # committed manifests are ordinary history
        assert [
            i.version for i in cat.table("fact").history()
        ][-1] == versions["fact"]

    def test_commit_creates_tables_on_first_touch(self, spark, cat):
        txn = cat.begin()
        txn.write("brand_new", _df(spark, 5))
        v = txn.commit()["brand_new"]
        assert cat.table("brand_new").read(v).count() == 5
        assert "brand_new" in cat.tables()

    def test_empty_commit_is_a_decision_only(self, cat):
        txn = cat.begin()
        assert txn.commit() == {}
        assert cat.txn_status(txn.id) == "committed"

    def test_decided_txn_refuses_reuse(self, spark, cat):
        txn = cat.begin()
        txn.commit()
        with pytest.raises(RuntimeError, match="committed"):
            txn.write("t", _df(spark, 1))
        with pytest.raises(RuntimeError, match="committed"):
            txn.commit()

    def test_double_stage_same_table_refused(self, spark, cat):
        txn = cat.begin()
        txn.write("t", _df(spark, 1))
        with pytest.raises(ValueError, match="already staged"):
            txn.write("t", _df(spark, 1))

    def test_append_mode_composes_with_existing_rows(self, spark, cat):
        cat.table("t").write(_df(spark, 4, "base"), mode="overwrite")
        with cat.begin() as txn:
            txn.write("t", _df(spark, 3, "more"), mode="append")
        assert cat.table("t").read().count() == 7

    def test_context_manager_aborts_on_exception(self, spark, cat):
        cat.table("t").write(_df(spark, 2), mode="overwrite")
        with pytest.raises(RuntimeError, match="boom"):
            with cat.begin() as txn:
                txn.write("t", _df(spark, 9), mode="overwrite")
                raise RuntimeError("boom")
        assert txn.state == "aborted"
        assert cat.table("t").read().count() == 2


class TestPendingInvisibility:
    """Simulate the mid-transaction state: staged manifests published,
    decision record absent (a crash between STAGE and DECIDE)."""

    def _stage_pending(self, spark, cat, txn_id="deadbeef"):
        t = cat.table("t")
        files, n = t._stage_files(_df(spark, 6, "pending"))
        v = t._commit_new_files(
            files, n, _df(spark, 1).schema, "append",
            manifest_extra={
                "txn": {"id": txn_id, "log": cat._txn_log_path()}
            },
        )
        return t, v

    def test_pending_head_invisible_to_reads(self, spark, cat):
        cat.table("t").write(_df(spark, 4, "base"), mode="overwrite")
        t, v = self._stage_pending(spark, cat)
        assert t.latest_version() == v  # raw log has it
        assert t.latest_visible_version() == v - 1
        assert t.read().count() == 4  # not 10
        assert [i.version for i in t.history()] == [v - 1]
        with pytest.raises(ValueError, match="pending transaction"):
            t.read(version=v)

    def test_pending_head_blocks_other_commits(self, spark, cat):
        cat.table("t").write(_df(spark, 4), mode="overwrite")
        t, _ = self._stage_pending(spark, cat)
        with pytest.raises(ConcurrentTransactionError, match="pending"):
            t.write(_df(spark, 1))
        with pytest.raises(ConcurrentTransactionError):
            t.delete_where("k = 0")

    def test_decision_record_flips_visibility_everywhere(
        self, spark, cat
    ):
        cat.table("t").write(_df(spark, 4, "base"), mode="overwrite")
        t, v = self._stage_pending(spark, cat, txn_id="feedface")
        assert t.read().count() == 4
        assert cat._write_decision(
            "feedface", {"txn": "feedface", "status": "committed"}
        )
        assert t.latest_visible_version() == v
        assert t.read().count() == 10
        # and commits are unblocked, building on the txn version
        v2 = t.write(_df(spark, 1, "after"))
        assert v2 == v + 1
        assert t.read().count() == 11

    def test_force_abort_sweeps_and_unblocks(self, spark, cat):
        cat.table("t").write(_df(spark, 4, "base"), mode="overwrite")
        t, v = self._stage_pending(spark, cat, txn_id="cafebabe")
        staged_files = set(t._manifest(v)["files"]) - set(
            t._manifest(v - 1)["files"]
        )
        assert cat.abort("cafebabe") == "aborted"
        # manifest gone, version burned (lock remains), gap in the log
        assert t.latest_version() == v - 1
        assert v in t._locked_versions()
        for rel in staged_files:
            assert not t._fs.exists(t._p(f"{t.path}/{rel}"))
        # next commit allocates PAST the burned number
        v2 = t.write(_df(spark, 1, "after"))
        assert v2 == v + 1
        assert t.read().count() == 5

    def test_abort_is_idempotent_and_loses_to_commit(self, spark, cat):
        cat.table("t").write(_df(spark, 2), mode="overwrite")
        _, _ = self._stage_pending(spark, cat, txn_id="aa11")
        assert cat.abort("aa11") == "aborted"
        assert cat.abort("aa11") == "aborted"
        # a committed txn cannot be aborted afterwards
        t2, v2 = self._stage_pending(spark, cat, txn_id="bb22")
        cat._write_decision("bb22", {"txn": "bb22", "status": "committed"})
        assert cat.abort("bb22") == "committed"
        assert t2.read().count() == 2 + 6

    def test_restore_to_pending_refused(self, spark, cat):
        cat.table("t").write(_df(spark, 4), mode="overwrite")
        t, v = self._stage_pending(spark, cat)
        with pytest.raises(ValueError, match="pending transaction"):
            t.restore(v)

    def test_read_asof_skips_pending(self, spark, cat):
        import time as _time

        cat.table("t").write(_df(spark, 4), mode="overwrite")
        t, _ = self._stage_pending(spark, cat)
        assert t.read_asof(_time.time() + 3600).count() == 4

    def test_read_since_ignores_pending_head(self, spark, cat):
        t = cat.table("t")
        v0 = t.write(_df(spark, 4, "base"), mode="overwrite")
        self._stage_pending(spark, cat)
        # no VISIBLE commits after v0
        assert t.read_since(v0).count() == 0

    def test_streaming_batch_stamps_ignore_pending(self, spark, cat):
        """A pending manifest's high-water batch stamp must not gate a
        replay: if the txn aborts, skipping against it loses data."""
        t = cat.table("t")
        t.write_batch(_df(spark, 2), batch_id=0)
        files, n = t._stage_files(_df(spark, 1))
        t._commit_new_files(
            files, n, _df(spark, 1).schema, "append",
            manifest_extra={
                "txn": {"id": "zz99", "log": cat._txn_log_path()},
                "batch_id": 7,
            },
        )
        assert not t._batch_seen(7)  # pending stamp does not count
        cat.abort("zz99")
        assert t.write_batch(_df(spark, 3), batch_id=7) is not None
        assert t.read().count() == 5


class TestEagerStaging:
    def test_write_eager_reads_back_before_commit(self, spark, cat):
        txn = cat.begin()
        staged = txn.write_eager("stg", _df(spark, 7), mode="overwrite")
        assert staged.count() == 7  # readable pipeline-breaker
        # ...but the table itself has no visible state yet
        assert cat.table("stg").latest_visible_version() is None
        versions = txn.commit()
        assert cat.table("stg").read(versions["stg"]).count() == 7

    def test_downstream_derivation_from_staged_files(self, spark, cat):
        """The ELT shape: a dim derived FROM eagerly-staged staging,
        both published in one atomic decision."""
        txn = cat.begin()
        staged = txn.write_eager("stg", _df(spark, 10), mode="overwrite")
        dim = staged.select("tag").distinct()
        txn.write("dim", dim, mode="overwrite")
        versions = txn.commit(parallelism=4)
        assert cat.table("dim").read(versions["dim"]).count() == 1
        assert cat.table("stg").read().count() == 10

    def test_abort_discards_eagerly_staged_files(self, spark, cat):
        txn = cat.begin()
        txn.write_eager("stg", _df(spark, 5), mode="overwrite")
        t = cat.table("stg")
        dirs = [
            st.getPath().getName()
            for st in t._fs.listStatus(t._p(f"{t.path}/data"))
        ]
        assert dirs  # files staged on disk
        txn.abort()
        dirs_after = [
            st.getPath().getName()
            for st in t._fs.listStatus(t._p(f"{t.path}/data"))
        ]
        assert dirs_after == []
        assert cat.txn_status(txn.id) == "aborted"

    def test_failed_stage_rolls_everything_back(self, spark, cat):
        """A frame that fails at stage time aborts the whole
        transaction: already-staged tables keep nothing."""
        cat.table("a").write(_df(spark, 2), mode="overwrite")
        bad = _df(spark, 3).selectExpr(
            "k", "assert_true(k < 1) as boom", "val"
        )
        txn = cat.begin()
        txn.write("a", _df(spark, 9), mode="overwrite")
        txn.write("b", bad, mode="overwrite")
        with pytest.raises(Exception):
            txn.commit(parallelism=2)
        assert txn.state == "aborted"
        assert cat.table("a").read().count() == 2  # untouched
        assert cat.txn_status(txn.id) == "aborted"


class TestTransactionalMaterialize:
    def test_elt_publish_is_atomic_and_correct(self, spark, cat):
        from globalweather_etl_spark.plans import (
            build_warehouse,
            materialize_transactional,
        )
        from globalweather_etl_spark.sources import (
            AS_OF_DATE,
            load_table,
            weather_staging_from_events,
        )

        events = load_table(spark, "/root/testdata/sf0.001", "events")
        wh = build_warehouse(
            spark, weather_staging_from_events(events), AS_OF_DATE
        )
        out, versions = materialize_transactional(wh, cat)
        assert len(versions) == 10
        # one decision committed all ten tables
        recs = {v for v in versions.values()}
        assert out.validate()["null_fk_count"] == 0
        assert out.fact.count() == wh.fact.count()
        # every table reads back at its committed version
        for name, v in versions.items():
            assert cat.table(name).read(v).columns
        # a consistent pin sees the whole rebuild
        pins = cat.snapshot(list(versions))
        assert pins == versions

    def test_rebuild_twice_keeps_time_travel(self, spark, cat):
        from globalweather_etl_spark.plans import (
            build_warehouse,
            materialize_transactional,
        )
        from globalweather_etl_spark.sources import (
            AS_OF_DATE,
            load_table,
            weather_staging_from_events,
        )

        events = load_table(spark, "/root/testdata/sf0.001", "events")
        staging = weather_staging_from_events(events)
        wh = build_warehouse(spark, staging, AS_OF_DATE)
        _, v1 = materialize_transactional(wh, cat)
        wh2 = build_warehouse(
            spark, staging.limit(100), AS_OF_DATE
        )
        out2, v2 = materialize_transactional(wh2, cat)
        fact = cat.table("fact_weather_day")
        assert fact.read(v2["fact_weather_day"]).count() == out2.fact.count()
        # the previous rebuild is still time-travelable
        old = fact.read(v1["fact_weather_day"]).count()
        assert old > out2.fact.count()


class TestStreamingVisibility:
    def test_stream_head_skips_pending_until_decision(self, spark, cat):
        """The streaming source plans batch windows by plain-file I/O;
        its head must apply the same transaction visibility as the
        JVM-side readers — an uncommitted staged commit in a batch
        would emit rows that may never commit."""
        from globalweather_etl_spark.streaming.snapshot_source import (
            _local_root,
            _versions,
            _visible_head,
        )

        t = cat.table("t")
        v1 = t.write(_df(spark, 4), mode="overwrite")
        files, n = t._stage_files(_df(spark, 2))
        v2 = t._commit_new_files(
            files, n, _df(spark, 1).schema, "append",
            manifest_extra={
                "txn": {"id": "str1", "log": cat._txn_log_path()}
            },
        )
        root = _local_root(t.path)
        assert _visible_head(root, _versions(root)) == v1
        cat._write_decision("str1", {"txn": "str1", "status": "committed"})
        assert _visible_head(root, _versions(root)) == v2


class TestStagedRewriteVerbs:
    def test_merge_delete_write_commit_together(self, spark, cat):
        cat.table("t1").write(_df(spark, 10, "base"), mode="overwrite")
        cat.table("t2").write(_df(spark, 10, "base"), mode="overwrite")
        src = spark.createDataFrame(
            [Row(k=i, tag="merged", val=float(i) * 10) for i in (1, 2, 99)]
        )
        txn = cat.begin()
        txn.merge_into("t1", src, keys=["k"])
        txn.delete_where("t2", "k >= 5")
        txn.write("t3", _df(spark, 4), mode="overwrite")
        versions = txn.commit()
        assert set(versions) == {"t1", "t2", "t3"}
        t1 = cat.table("t1").read()
        assert t1.count() == 11  # 10 + inserted k=99
        assert t1.filter("tag = 'merged'").count() == 3
        assert cat.table("t2").read().count() == 5
        assert cat.table("t3").read().count() == 4

    def test_verbs_invisible_until_decision_and_abortable(
        self, spark, cat
    ):
        """A staged delete's DV commit must be invisible while pending
        and fully swept (manifest + DV store) on abort."""
        t = cat.table("t")
        t.write(_df(spark, 8), mode="overwrite")
        txn = cat.begin()
        txn.delete_where("t", "k < 4")
        # drive commit() up to the decision by hand: run the op with
        # the txn tag, then force-abort before the decision record
        t2 = cat.table("t")
        res = t2.delete_where(
            "k < 4",
            manifest_extra={
                "txn": {"id": txn.id, "log": cat._txn_log_path()}
            },
        )
        assert res["n_deleted"] == 4
        assert t2.read().count() == 8  # pending: delete invisible
        stores = (
            t2._manifest(res["version"]).get("dvs") or {}
        ).get("stores", [])
        assert stores
        assert cat.abort(txn.id) == "aborted"
        assert t2.read().count() == 8
        for rel in stores:
            assert not t2._fs.exists(t2._p(f"{t2.path}/{rel}"))

    def test_noop_delete_in_txn_is_harmless(self, spark, cat):
        cat.table("a").write(_df(spark, 3), mode="overwrite")
        cat.table("b").write(_df(spark, 3), mode="overwrite")
        txn = cat.begin()
        txn.delete_where("a", "k > 100")  # matches nothing
        txn.write("b", _df(spark, 2), mode="append")
        versions = txn.commit()
        assert cat.table("a").read().count() == 3
        assert cat.table("b").read().count() == 5
        # the no-op delete pinned the base version, not a new one
        assert versions["a"] == 1

    def test_replace_where_in_txn(self, spark, cat):
        cat.table("t").write(_df(spark, 10, "old"), mode="overwrite")
        repl = spark.createDataFrame(
            [Row(k=i, tag="new", val=0.0) for i in range(3)]
        )
        with cat.begin() as txn:
            txn.replace_where("t", repl, "k < 3")
            txn.write("other", _df(spark, 1), mode="overwrite")
        t = cat.table("t").read()
        assert t.count() == 10
        assert t.filter("tag = 'new'").count() == 3


class TestMultiTableStreamingSink:
    def test_write_batch_applies_once_across_tables(self, spark, cat):
        """The cross-table exactly-once contract: a replayed batch id
        is skipped for ALL tables, never a subset."""
        v0 = cat.write_batch(
            {"events": _df(spark, 4, "b0"), "daily": _df(spark, 2, "b0")},
            batch_id=0,
        )
        assert set(v0) == {"events", "daily"}
        v1 = cat.write_batch(
            {"events": _df(spark, 3, "b1"), "daily": _df(spark, 1, "b1")},
            batch_id=1,
        )
        assert v1 is not None
        # replay of batch 1 (checkpoint recovery): nothing lands
        assert cat.write_batch(
            {"events": _df(spark, 3, "b1"), "daily": _df(spark, 1, "b1")},
            batch_id=1,
        ) is None
        assert cat.table("events").read().count() == 7
        assert cat.table("daily").read().count() == 3
        # stamps are atomic with the decision: both heads carry the
        # same high-water mark
        for name in ("events", "daily"):
            t = cat.table(name)
            assert t._manifest(
                t.latest_visible_version()
            )["max_batch_id"] == 1

    def test_crashed_batch_replays_exactly_once(self, spark, cat):
        """Crash between stage and decision: the pending stamps must
        NOT gate the replay (they may never commit); after a force-
        abort the replay lands exactly once."""
        cat.write_batch({"t": _df(spark, 2, "seed")}, batch_id=0)
        # simulate the crash: pending manifest stamped batch_id=1,
        # decision never written
        t = cat.table("t")
        files, n = t._stage_files(_df(spark, 5, "b1"))
        t._commit_new_files(
            files, n, _df(spark, 1).schema, "append",
            manifest_extra={
                "batch_id": 1,
                "txn": {"id": "crashed", "log": cat._txn_log_path()},
            },
        )
        # replay arrives; the old attempt still pends -> head-locked
        with pytest.raises(ConcurrentTransactionError):
            cat.write_batch({"t": _df(spark, 5, "b1")}, batch_id=1)
        cat.abort("crashed")
        out = cat.write_batch({"t": _df(spark, 5, "b1")}, batch_id=1)
        assert out is not None
        assert cat.table("t").read().count() == 7  # once, not twice

    def test_foreachbatch_end_to_end(self, spark, cat, tmp_path):
        """Drive the real Structured Streaming path: a rate-limited
        file stream fanned into two tables through one catalog sink,
        then replay the whole stream on a FRESH checkpoint into the
        same tables — the second run must be fully absorbed by the
        batch stamps ... which (by design, high-water marks) means it
        must be skipped via the same-checkpoint restart instead."""
        src = str(tmp_path / "src")
        spark.range(20).selectExpr(
            "id AS k", "id % 4 AS g"
        ).write.json(src)
        ckpt = str(tmp_path / "ckpt")

        def sink(df, bid):
            cat.write_batch(
                {"raw": df, "by_g": df.groupBy("g").count()},
                bid,
                mode="append",
            )

        def run():
            q = (
                spark.readStream.schema("k long, g long").json(src)
                .writeStream.foreachBatch(sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run()
        raw1 = cat.table("raw").read().count()
        assert raw1 == 20
        # restart on the SAME checkpoint: engine replays nothing new,
        # and even if it re-runs the last batch, the stamps hold
        run()
        assert cat.table("raw").read().count() == 20
        assert cat.table("by_g").read().groupBy().sum(
            "count"
        ).collect()[0][0] == 20


class TestConcurrentTransactions:
    def test_racing_transactions_serialize_per_table(self, spark, cat):
        """Two live transactions overlapping on one table: the loser
        hits the pending head-lock and can retry as a fresh txn after
        the winner decides — no torn or lost state either way."""
        cat.table("shared").write(_df(spark, 2, "base"), mode="overwrite")
        a, b = cat.begin(), cat.begin()
        a.write("shared", _df(spark, 5, "from_a"), mode="append")
        b.write("shared", _df(spark, 7, "from_b"), mode="append")
        # deterministic interleaving: A publishes its pending manifest
        # (phase 1b) but has not decided yet
        t = cat.table("shared")
        pa = a._staged["shared"]
        files, n = t._stage_files(pa["df"])
        t._commit_new_files(
            files, n, pa["df"].schema, pa["mode"],
            manifest_extra={"txn": {"id": a.id,
                                    "log": cat._txn_log_path()}},
        )
        with pytest.raises(ConcurrentTransactionError):
            b.commit()
        assert b.state == "aborted"
        # A decides; a fresh transaction lands B's rows on top
        assert cat._write_decision(
            a.id, {"txn": a.id, "status": "committed"}
        )
        with cat.begin() as b2:
            b2.write("shared", _df(spark, 7, "from_b"), mode="append")
        assert cat.table("shared").read().count() == 2 + 5 + 7

    def test_threaded_commit_storm_stays_consistent(self, spark, cat):
        """3 writer threads x 3 transactional rebuilds of the same two
        tables, retrying on head-lock collisions: every decided
        transaction leaves both tables on the SAME stamp, and the two
        heads carry one stamp at the end."""
        import threading

        cat.table("x").write(_df(spark, 2, "seed"), mode="overwrite")
        cat.table("y").write(_df(spark, 2, "seed"), mode="overwrite")
        errors: list[Exception] = []

        def _worker(wid: int) -> None:
            for i in range(3):
                stamp = f"w{wid}_i{i}"
                for _ in range(60):  # retry budget per rebuild
                    txn = cat.begin()
                    try:
                        txn.write("x", _df(spark, 3, stamp),
                                  mode="overwrite")
                        txn.write("y", _df(spark, 4, stamp),
                                  mode="overwrite")
                        txn.commit()
                        break
                    except ConcurrentTransactionError:
                        continue  # lost a head-lock race: new txn
                    except Exception as e:  # pragma: no cover
                        errors.append(e)
                        return
                else:  # pragma: no cover
                    errors.append(RuntimeError(f"{stamp} starved"))
                    return

        threads = [
            threading.Thread(target=_worker, args=(w,)) for w in range(3)
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=600)
        assert errors == []
        x = cat.table("x").read().select("tag").distinct().collect()
        y = cat.table("y").read().select("tag").distinct().collect()
        assert len(x) == 1 and len(y) == 1
        assert x[0]["tag"] == y[0]["tag"]  # one decision owns both heads


class TestDecisionLifecycle:
    def test_asof_uses_the_decision_stamp(self, spark, cat):
        """Both tables of one transaction must resolve AS OF reads by
        the SAME instant (the decision), not their per-table manifest
        stamps — otherwise an AS OF between the two publishes pins the
        torn view the transaction exists to prevent."""
        cat.table("a").write(_df(spark, 1, "old"), mode="overwrite")
        cat.table("b").write(_df(spark, 2, "old"), mode="overwrite")
        with cat.begin() as txn:
            txn.write("a", _df(spark, 5, "new"), mode="overwrite")
            txn.write("b", _df(spark, 6, "new"), mode="overwrite")
        ta, tb = cat.table("a"), cat.table("b")
        va, vb = ta.latest_visible_version(), tb.latest_visible_version()
        rec_ts = None
        for t, v in ((ta, va), (tb, vb)):
            m = t._manifest(v)
            eff = t._effective_commit_ts(m)
            assert eff is not None and eff >= m["committed_at"]
            rec_ts = eff if rec_ts is None else rec_ts
            assert eff == rec_ts  # same decision instant for both
        # an AS OF between a's publish stamp and the decision pins the
        # OLD state of both tables (the decision had not happened yet)
        mid = ta._manifest(va)["committed_at"]
        if mid < rec_ts:
            pins = cat.snapshot_asof(mid, ["a", "b"])
            assert pins == {"a": va - 1, "b": vb - 1}
        pins_now = cat.snapshot_asof(rec_ts, ["a", "b"])
        assert pins_now == {"a": va, "b": vb}

    def test_vacuum_strips_committed_tags_and_gc_removes_records(
        self, spark, cat
    ):
        with cat.begin() as txn:
            txn.write("t", _df(spark, 4), mode="overwrite")
        t = cat.table("t")
        v = t.latest_visible_version()
        assert t._manifest(v).get("txn") is not None
        eff_before = t._effective_commit_ts(t._manifest(v))
        rep = cat.vacuum(keep_last=10, unreferenced_grace=0.0)
        # tag folded away; AS OF instant preserved bit-identically
        m = t._manifest(v)
        assert m.get("txn") is None
        assert m["committed_at"] == eff_before
        assert t.read(v).count() == 4
        # the decision record is now unreferenced -> GC-able
        assert cat.gc_decisions(min_age=0.0) == 1
        assert t.read(v).count() == 4  # still visible without it
        assert t.version_asof(eff_before) == v

    def test_gc_keeps_referenced_and_young_records(self, spark, cat):
        with cat.begin() as txn:
            txn.write("t", _df(spark, 3), mode="overwrite")
        # no vacuum -> tag still on the manifest -> record is
        # load-bearing and must survive even with min_age=0
        assert cat.gc_decisions(min_age=0.0) == 0
        assert cat.table("t").read().count() == 3
        cat.table("t").vacuum(keep_last=10, unreferenced_grace=0.0)
        # stripped now, but a young record survives the age guard
        assert cat.gc_decisions(min_age=3600.0) == 0
        assert cat.gc_decisions(min_age=0.0) == 1

    def test_aborted_decision_gc(self, spark, cat):
        t = cat.table("t")
        t.write(_df(spark, 2), mode="overwrite")
        files, n = t._stage_files(_df(spark, 1))
        t._commit_new_files(
            files, n, _df(spark, 1).schema, "append",
            manifest_extra={
                "txn": {"id": "gone1", "log": cat._txn_log_path()}
            },
        )
        cat.abort("gone1")
        assert cat.gc_decisions(min_age=0.0) == 1
        assert cat.txn_status("gone1") == "pending"  # record gone


class TestSnapshotPins:
    def test_snapshot_pins_committed_heads(self, spark, cat):
        cat.table("a").write(_df(spark, 1), mode="overwrite")
        cat.table("b").write(_df(spark, 2), mode="overwrite")
        with cat.begin() as txn:
            txn.write("a", _df(spark, 5), mode="overwrite")
            txn.write("b", _df(spark, 6), mode="overwrite")
        pins = cat.snapshot()
        assert cat.table("a").read(pins["a"]).count() == 5
        assert cat.table("b").read(pins["b"]).count() == 6

    def test_snapshot_excludes_pending(self, spark, cat):
        t = cat.table("a")
        v0 = t.write(_df(spark, 1), mode="overwrite")
        files, n = t._stage_files(_df(spark, 9))
        t._commit_new_files(
            files, n, _df(spark, 1).schema, "append",
            manifest_extra={
                "txn": {"id": "pend1", "log": cat._txn_log_path()}
            },
        )
        assert cat.snapshot(["a"]) == {"a": v0}

    def test_register_views_pins_consistent_sql_surface(
        self, spark, cat
    ):
        with cat.begin() as txn:
            txn.write("facts", _df(spark, 6), mode="overwrite")
            txn.write("dims", _df(spark, 2), mode="overwrite")
        pins = cat.register_views(prefix="wh_")
        assert spark.sql("SELECT count(*) AS n FROM wh_facts").collect()[
            0
        ]["n"] == 6
        # new transaction lands; the registered views stay pinned
        with cat.begin() as txn:
            txn.write("facts", _df(spark, 9), mode="overwrite")
        assert spark.sql("SELECT count(*) AS n FROM wh_facts").collect()[
            0
        ]["n"] == 6
        pins2 = cat.register_views(prefix="wh_")
        assert pins2["facts"] == pins["facts"] + 1
        assert spark.sql("SELECT count(*) AS n FROM wh_facts").collect()[
            0
        ]["n"] == 9

    def test_catalog_history_lists_decisions(self, spark, cat):
        with cat.begin() as txn:
            txn.write("a", _df(spark, 1), mode="overwrite")
        t2 = cat.begin()
        t2.abort()
        hist = cat.history()
        assert [h["status"] for h in hist] == ["committed", "aborted"]
        assert hist[0]["tables"] == {"a": 1}
        assert all("decided_at" in h for h in hist)

    def test_invalid_table_name_rejected(self, cat):
        for bad in ("../escape", "..", ".", "a/b", ""):
            with pytest.raises(ValueError, match="invalid table name"):
                cat.table(bad)


class TestDeferredRewritePublish:
    """Round 11: staged rewrite verbs compute BEFORE any pending
    manifest publishes — the lock window a long merge used to hold is
    now metadata-only (validate-at-decision)."""

    def test_plain_writer_succeeds_during_staged_rewrite_compute(
        self, spark, cat
    ):
        """The verdict's Done criterion: while a transaction's merge
        is computing, a racing plain writer on the SAME table commits
        without ConcurrentTransactionError, and the txn's merge then
        recomputes against the new head (both effects land)."""
        t = cat.table("t")
        t.write(_df(spark, 10, "base"), mode="overwrite")
        src = spark.createDataFrame(
            [Row(k=i, tag="merged", val=1.0) for i in range(3)]
        )
        txn = cat.begin()
        txn.merge_into("t", src, ["k"])

        # simulate the race deterministically: run the compute half
        # (defer_publish) exactly like commit() does, then let a plain
        # writer land, then drive the publish half
        txn_field = {
            "txn": {"id": txn.id, "log": cat._txn_log_path()}
        }
        prep = t.merge_into(
            src, ["k"], manifest_extra=txn_field, defer_publish=True
        )
        assert prep.get("prepared")
        # during the compute phase nothing is pending: the plain
        # writer commits freely — THE point of the deferred publish
        racer = cat.table("t")
        v_racer = racer.write(
            spark.createDataFrame(
                [Row(k=100 + i, tag="racer", val=0.0) for i in range(2)]
            ),
            mode="append",
        )
        assert racer.read().count() == 12  # visible immediately
        # the prepared publish now fails (head moved) ...
        assert not t._publish_manifest(prep["manifest"], prep["target"])
        # ... and the normal self-publishing path recovers, exactly
        # like Transaction.commit()'s fallback
        res = t.merge_into(src, ["k"], manifest_extra=txn_field)
        assert res["version"] > v_racer
        cat._write_decision(
            txn.id,
            {"txn": txn.id, "status": "committed",
             "tables": {"t": res["version"]}},
        )
        out = cat.table("t").read()
        assert out.count() == 12
        assert out.filter("tag = 'merged'").count() == 3
        assert out.filter("tag = 'racer'").count() == 2

    def test_commit_end_to_end_with_mid_compute_racer(self, spark, cat):
        """Full commit() drive: a spy on _publish_manifest injects a
        racing append after the op's compute finished but before its
        publish — commit() must succeed and keep both effects."""
        t = cat.table("t")
        t.write(_df(spark, 10, "base"), mode="overwrite")
        src = spark.createDataFrame(
            [Row(k=i, tag="merged", val=1.0) for i in range(3)]
        )
        fired = {"n": 0}
        orig = type(t)._publish_manifest

        def spy(self, manifest, version, delta_hint=None):
            # first publish attempt of the txn-tagged merge: sneak a
            # plain append in first (separate table object = separate
            # caches, like a second process)
            if (
                manifest.get("txn") is not None
                and fired["n"] == 0
            ):
                fired["n"] = 1
                racer = SnapshotCatalog(
                    self.spark, self.path.rsplit("/", 1)[0]
                ).table(self.path.rsplit("/", 1)[1])
                racer.write(
                    self.spark.createDataFrame(
                        [Row(k=200 + i, tag="racer", val=0.0)
                         for i in range(2)]
                    ),
                    mode="append",
                )
            return orig(self, manifest, version, delta_hint)

        import unittest.mock as mock

        with mock.patch.object(type(t), "_publish_manifest", spy):
            txn = cat.begin()
            txn.merge_into("t", src, ["k"])
            versions = txn.commit()
        assert txn.state == "committed"
        out = cat.table("t").read(versions["t"])
        assert out.count() == 12
        assert out.filter("tag = 'merged'").count() == 3
        assert out.filter("tag = 'racer'").count() == 2

    def test_all_three_verbs_defer(self, spark, cat):
        """replace_where / delete_where / merge_into (CoW and MoR)
        defer_publish forms all round-trip through publish."""
        for verb, args, kw in (
            ("replace_where",
             (lambda s: (spark.createDataFrame(
                 [Row(k=i, tag="r", val=0.0) for i in range(2)]
             ), "k < 2"))(None), {}),
            ("delete_where", ("k >= 8",), {}),
            ("merge_into",
             (spark.createDataFrame([Row(k=0, tag="m", val=9.9)]),
              ["k"]), {}),
            ("merge_into",
             (spark.createDataFrame([Row(k=1, tag="m2", val=8.8)]),
              ["k"]), {"strategy": "merge-on-read"}),
        ):
            name = f"t_{verb}_{len(kw)}"
            t = cat.table(name)
            t.write(_df(spark, 10, "base"), mode="overwrite")
            prep = getattr(t, verb)(*args, defer_publish=True, **kw)
            assert prep.get("prepared"), (verb, prep)
            assert t.latest_version() == 1  # nothing published yet
            assert t._publish_manifest(prep["manifest"], prep["target"])
            assert t.latest_version() == prep["target"]
            assert prep["result"]["version"] == prep["target"]
        # and the no-op shape returns a plain result
        t = cat.table("t_noop")
        t.write(_df(spark, 3, "base"), mode="overwrite")
        res = t.delete_where("k > 99", defer_publish=True)
        assert "prepared" not in res and res["version"] == 1
