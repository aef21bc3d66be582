"""Zone-map (per-file min/max) sidecar: build regimes, range pruning,
and the conservative-keep contract.

The reference has no table format at all (Snowflake supplies
micro-partition pruning under ETL:23-136); this layer is our
re-implementation of the public per-file-stats data-skipping idea
(Delta/Iceberg manifest stats), so the tests pin three things: the two
build regimes agree bit-for-bit, pruning never changes results (only
which files open), and every unknown-stats case is kept, never pruned.
"""

from __future__ import annotations

import datetime as dt
import decimal

import pytest
from pyspark.sql import Row, functions as F

from globalweather_etl_spark.sources.snapshots import SnapshotTable


def _mk_rows(n=64):
    out = []
    for i in range(n):
        out.append(
            Row(
                k=i,
                big=(i - n // 2) * 10_000_000_000_000_000,  # > 2^53 spans
                dec=decimal.Decimal(i * 100 + 7) / 100,
                s=f"w{i:04d}",
                d=dt.date(2024, 1, 1) + dt.timedelta(days=i),
                ts=dt.datetime(2024, 1, 1, 0, 0, 0)
                + dt.timedelta(hours=3 * i, microseconds=i),
                val=float(i) * 1.5,
            )
        )
    return out


@pytest.fixture(scope="module")
def zm_table(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("zm")) + "/t"
    st = SnapshotTable(spark, root)
    df = spark.createDataFrame(_mk_rows()).withColumn(
        "dec", F.col("dec").cast("decimal(20,2)")
    )
    st.write_clustered(df, cluster_by=["k"], n_files=8, mode="overwrite")
    return st


def _sidecar_rows(st, v):
    return sorted(
        (
            tuple(r)
            for r in st.spark.read.parquet(
                st._zm_path(v).toString()
            ).collect()
        )
    )


class TestBuildRegimes:
    def test_footer_and_scan_agree_bit_for_bit(self, zm_table):
        v = zm_table.latest_version()
        zm_table.build_stats(version=v, method="footer")
        footer = _sidecar_rows(zm_table, v)
        zm_table.build_stats(version=v, method="scan")
        scan = _sidecar_rows(zm_table, v)
        assert footer == scan
        # every zone-mappable column of every file got a stats row
        assert len(footer) == 8 * 7

    def test_remote_scheme_rejected_for_footer(self, spark, tmp_path):
        st = SnapshotTable(spark, str(tmp_path) + "/t")
        st.path = "s3a://bucket/t"  # footer guard looks at the root only
        with pytest.raises(ValueError, match="scan"):
            st._zm_local_root()

    def test_unsupported_column_is_loud(self, spark, tmp_path):
        st = SnapshotTable(spark, str(tmp_path) + "/arr")
        st.write(
            spark.createDataFrame([Row(k=1, a=[1, 2])]), mode="overwrite"
        )
        with pytest.raises(TypeError, match="zone-mappable"):
            st.build_stats(cols=["a"])
        # default column pick silently skips it but keeps k
        st.build_stats()
        assert st.files_for_range("k", 5, 9) == []


class TestPruning:
    def test_clustered_layout_prunes_files(self, zm_table):
        zm_table.build_stats()
        all_files = zm_table._manifest(zm_table.latest_version())["files"]
        cand = zm_table.files_for_range("k", 10, 17)
        assert 1 <= len(cand) <= 3 < len(all_files) == 8

    def test_range_read_equals_full_filter(self, zm_table):
        got = sorted(
            r["k"]
            for r in zm_table.read_range("k", 10, 17).collect()
        )
        want = sorted(
            r["k"]
            for r in zm_table.read()
            .filter(F.col("k").between(10, 17))
            .collect()
        )
        assert got == want == list(range(10, 18))

    def test_one_sided_ranges(self, zm_table):
        lo_only = zm_table.read_range("k", lo=60).collect()
        assert sorted(r["k"] for r in lo_only) == [60, 61, 62, 63]
        hi_only = zm_table.read_range("k", hi=3).collect()
        assert sorted(r["k"] for r in hi_only) == [0, 1, 2, 3]
        with pytest.raises(ValueError, match="bound"):
            zm_table.read_range("k")

    def test_string_date_timestamp_and_widened_types(self, zm_table):
        # string: lexicographic window on the zero-padded words
        got = sorted(
            r["s"]
            for r in zm_table.read_range("s", "w0005", "w0008").collect()
        )
        assert got == [f"w{i:04d}" for i in range(5, 9)]
        # date window
        got = zm_table.read_range(
            "d", dt.date(2024, 2, 1), dt.date(2024, 2, 3)
        ).count()
        assert got == 3
        # timestamp window (TIMESTAMP_MICROS stats must exist)
        assert (
            len(
                zm_table.files_for_range(
                    "ts",
                    dt.datetime(2024, 1, 1, 0, 0),
                    dt.datetime(2024, 1, 1, 9, 0),
                )
            )
            < 8
        )
        got = zm_table.read_range(
            "ts",
            dt.datetime(2024, 1, 1, 0, 0),
            dt.datetime(2024, 1, 1, 9, 0),
        ).count()
        # hours 0, 3, 6 qualify; hour 9 carries +3 us and misses the
        # inclusive bound — the microsecond tail is the point: stats
        # comparisons must be exact to the microsecond
        assert got == 3
        # bigint beyond 2^53: widened bounds stay conservative
        got = zm_table.read_range(
            "big", 0, 10_000_000_000_000_000
        ).count()
        assert got == 2  # i = 32, 33
        # decimal
        got = zm_table.read_range(
            "dec", decimal.Decimal("10.07"), decimal.Decimal("12.07")
        ).count()
        assert got == 3

    def test_random_layout_keeps_all_but_stays_correct(
        self, spark, tmp_path
    ):
        st = SnapshotTable(spark, str(tmp_path) + "/rand")
        df = spark.createDataFrame(
            [Row(k=i) for i in range(64)]
        ).repartition(8)  # round-robin: every file spans ~full range
        st.write(df, mode="overwrite")
        st.build_stats()
        assert len(st.files_for_range("k", 10, 12)) == 8
        assert sorted(
            r["k"] for r in st.read_range("k", 10, 12).collect()
        ) == [10, 11, 12]


class TestConservativeKeeps:
    def test_no_sidecar_returns_none_and_read_falls_back(
        self, spark, tmp_path
    ):
        st = SnapshotTable(spark, str(tmp_path) + "/nostats")
        st.write(
            spark.createDataFrame([Row(k=i) for i in range(10)]),
            mode="overwrite",
        )
        assert st.files_for_range("k", 2, 4) is None
        assert st.read_range("k", 2, 4).count() == 3

    def test_all_null_file_is_pruned(self, spark, tmp_path):
        st = SnapshotTable(spark, str(tmp_path) + "/nulls")
        st.write(
            spark.createDataFrame(
                [Row(k=i, v=float(i)) for i in range(8)]
            ).coalesce(1),
            mode="overwrite",
        )
        st.write(
            spark.createDataFrame(
                [Row(k=100 + i, v=None) for i in range(4)],
                "k bigint, v double",
            ).coalesce(1),
            mode="append",
        )
        st.build_stats()
        # the all-NULL-v file can never satisfy a range predicate on v
        assert len(st.files_for_range("v", 0.0, 1000.0)) == 1
        assert st.read_range("v", 0.0, 1000.0).count() == 8
        # but a k-range still reads it
        assert st.read_range("k", 100, 101).count() == 2

    def test_schema_evolved_file_without_column_is_kept(
        self, spark, tmp_path
    ):
        st = SnapshotTable(spark, str(tmp_path) + "/evolve")
        st.write(
            spark.createDataFrame([Row(k=1)]).coalesce(1),
            mode="overwrite",
        )
        st.write(
            spark.createDataFrame([Row(k=2, v=7.0)]).coalesce(1),
            mode="append",
        )
        st.build_stats(cols=["v"])
        # the old file has no v footer entry -> conservatively kept
        assert len(st.files_for_range("v", 0.0, 100.0)) == 2
        assert st.read_range("v", 0.0, 100.0).count() == 1

    def test_unknown_column_returns_none(self, zm_table):
        assert zm_table.files_for_range("nope", 1, 2) is None

    def test_date_bound_on_timestamp_column_keeps_midnight_file(
        self, spark, tmp_path
    ):
        """A date upper bound against a timestamp column means
        midnight-inclusive: a file whose min is EXACTLY midnight of
        the bound day must be kept (the bare-date encoding would sort
        before every same-day timestamp and wrongly prune it)."""
        st = SnapshotTable(spark, str(tmp_path) + "/midnight")
        st.write(
            spark.createDataFrame(
                [
                    Row(ts=dt.datetime(2024, 5, 1, 0, 0, 0), k=1),
                    Row(ts=dt.datetime(2024, 5, 1, 8, 0, 0), k=2),
                ]
            ).coalesce(1),
            mode="overwrite",
        )
        st.build_stats(cols=["ts"])
        assert len(
            st.files_for_range(
                "ts", dt.date(2024, 4, 1), dt.date(2024, 5, 1)
            )
        ) == 1
        got = st.read_range(
            "ts", dt.date(2024, 4, 1), dt.date(2024, 5, 1)
        ).collect()
        # Spark promotes the date bound to midnight: only k=1 matches
        assert [r["k"] for r in got] == [1]


class TestLifecycle:
    def test_vacuum_drops_dropped_versions_sidecars(self, spark, tmp_path):
        st = SnapshotTable(spark, str(tmp_path) + "/vac")
        v1 = st.write(
            spark.createDataFrame([Row(k=1)]), mode="overwrite"
        )
        st.build_stats(version=v1)
        v2 = st.write(
            spark.createDataFrame([Row(k=2)]), mode="overwrite"
        )
        st.build_stats(version=v2)
        assert st._fs.exists(st._zm_meta_path(v1))
        st.vacuum(keep_last=1, unreferenced_grace=0.0)
        assert not st._fs.exists(st._zm_meta_path(v1))
        assert not st._fs.exists(st._zm_path(v1))
        assert st._fs.exists(st._zm_meta_path(v2))
        assert st.read_range("k", 0, 5).count() == 1

    def test_rebuild_invalidates_probe_cache(self, spark, tmp_path):
        st = SnapshotTable(spark, str(tmp_path) + "/cache")
        st.write(
            spark.createDataFrame(
                [Row(k=i) for i in range(16)]
            ).coalesce(2),
            mode="overwrite",
        )
        st.build_stats()
        before = st.files_for_range("k", 0, 100)
        v2 = st.write(
            spark.createDataFrame([Row(k=100 + i) for i in range(4)]),
            mode="append",
        )
        st.build_stats(version=v2)
        after = st.files_for_range("k", 100, 200, version=v2)
        assert set(before).isdisjoint(set(after))
        assert st.read_range("k", 100, 200).count() == 4

    def test_scan_build_under_non_utc_session(self, spark, tmp_path):
        """Regression (round-6 advisory): the scan build rendered
        timestamp bounds via date_format in the SESSION timezone while
        the probe codec renders naive UTC — under Asia/Kolkata a
        pruned read silently returned 0 of the matching rows.  The
        build now pins UTC around the stats job, and naive bounds
        under a non-UTC session fail loudly instead of mispruning."""
        tzkey = "spark.sql.session.timeZone"
        prev = spark.conf.get(tzkey)
        try:
            st = SnapshotTable(spark, str(tmp_path) + "/tz")
            df = spark.createDataFrame(
                [
                    Row(
                        k=i,
                        ts=dt.datetime(2024, 1, 1)
                        + dt.timedelta(hours=6 * i),
                    )
                    for i in range(32)
                ]
            )
            st.write_clustered(
                df, cluster_by=["ts"], n_files=8, mode="overwrite"
            )
            spark.conf.set(tzkey, "Asia/Kolkata")
            st.build_stats(cols=["ts"], method="scan")
            # conf restored after the build, not left pinned
            assert spark.conf.get(tzkey) == "Asia/Kolkata"
            lo = dt.datetime(2024, 1, 2, tzinfo=dt.timezone.utc)
            hi = dt.datetime(2024, 1, 4, tzinfo=dt.timezone.utc)
            want = (
                st.read()
                .filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi)))
                .count()
            )
            assert want > 0
            assert st.read_range("ts", lo, hi).count() == want
            files = st.files_for_range("ts", lo, hi)
            all_files = st._manifest(st.latest_version())["files"]
            assert files is not None and len(files) < len(all_files)
            with pytest.raises(ValueError, match="session timezone"):
                st.read_range(
                    "ts", dt.datetime(2024, 1, 2), dt.datetime(2024, 1, 4)
                )
        finally:
            spark.conf.set(tzkey, prev)

    def test_spark_probe_path_matches_cached_path(self, zm_table):
        """Force the big-table Spark probe regime and pin it to the
        driver-cache regime's answer (same contract as the Bloom
        sidecar's two regimes). The selective predicate exercises the
        candidate-side collect (prunable > half the files), the wide
        one the prunable-side collect — both must agree with the
        cached walk."""
        v = zm_table.latest_version()
        big = SnapshotTable(zm_table.spark, zm_table.path)
        big._ZM_CACHE_FILE_LIMIT = 0  # instance override, class untouched
        for lo, hi in ((10, 17), (0, 60), (2, 3)):
            cached = zm_table.files_for_range("k", lo, hi, version=v)
            assert cached == big.files_for_range("k", lo, hi, version=v)

    def test_stats_missing_row_kept_by_candidate_collect(
        self, spark, tmp_path
    ):
        """r7 advisory (high): a stats-missing sidecar row — NULL
        min/max AND NULL null_count, the documented 'footer stats
        unreadable, conservatively keep' state — made is_prunable
        evaluate to SQL NULL, so the Spark-probe regime's
        candidate-side collect (filter(~is_prunable)) silently PRUNED
        the file whenever full coverage held and >50% of files pruned.
        The prunable-side walk and the cached path kept it; the two
        regimes disagreed. Pin: all three paths keep the file and
        read_range stays row-exact."""
        root = str(tmp_path) + "/zm_missing"
        st = SnapshotTable(spark, root)
        st.write_clustered(
            spark.createDataFrame([Row(k=i) for i in range(64)]),
            cluster_by=["k"],
            n_files=8,
        )
        st.build_stats(cols=["k"])
        v = st.latest_version()
        zm = st._zm_path(v).toString()
        side = spark.read.parquet(zm)
        schema = side.schema
        rows = side.collect()
        # blind the file holding k=40 (bigint bounds are eps-widened,
        # so select by range membership, not exact equality)
        victim = next(
            r["file"]
            for r in rows
            if r["min_num"] is not None
            and r["min_num"] <= 40 <= r["max_num"]
        )
        blinded = [
            (
                r.asDict()
                | {
                    "min_num": None,
                    "max_num": None,
                    "min_str": None,
                    "max_str": None,
                    "null_count": None,
                }
                if r["file"] == victim
                else r.asDict()
            )
            for r in rows
        ]
        spark.createDataFrame(
            [Row(**d) for d in blinded], schema=schema
        ).coalesce(1).write.mode("overwrite").parquet(zm)
        # selective range: only 1 of 8 files truly matches, so
        # prunable (6 known + victim's fate) > half → candidate-side
        # collect path; full coverage holds (every file has a row)
        probe = SnapshotTable(spark, root)
        probe._ZM_CACHE_FILE_LIMIT = 0  # force Spark-probe regime
        cached = SnapshotTable(spark, root)
        got_probe = probe.files_for_range("k", 2, 3, version=v)
        got_cached = cached.files_for_range("k", 2, 3, version=v)
        assert victim in got_probe, "stats-missing file was pruned"
        assert sorted(got_probe) == sorted(got_cached)
        assert len(got_probe) == 2  # the true match + the blind file
        assert sorted(
            r["k"] for r in probe.read_range("k", 2, 3, version=v).collect()
        ) == [2, 3]

    def test_probe_cache_is_lru_bounded(self, spark, tmp_path):
        """A handle probing many versions must not hold every
        version's sidecar rows forever — the per-handle cache is LRU
        capped at _ZM_CACHE_VERSIONS (r6 advisory)."""
        st = SnapshotTable(spark, str(tmp_path) + "/lru")
        st.write(
            spark.createDataFrame([Row(k=i) for i in range(8)]).coalesce(2),
            mode="overwrite",
        )
        st.build_stats(cols=["k"])
        versions = [st.latest_version()]
        for j in range(6):
            v = st.write(
                spark.createDataFrame([Row(k=100 + j)]), mode="append"
            )
            st.build_stats(cols=["k"], version=v, incremental=True)
            versions.append(v)
        for v in versions:
            got = st.files_for_range("k", 0, 1000, version=v)
            assert got  # every version still answers correctly
        assert len(st._zm_cache) <= st._ZM_CACHE_VERSIONS
        # the MOST RECENTLY probed versions are the ones retained
        assert set(st._zm_cache) == set(
            versions[-st._ZM_CACHE_VERSIONS :]
        )


class TestZOrder:
    @pytest.fixture(scope="class")
    def grid(self, spark, tmp_path_factory):
        """64x64 integer grid: the canonical z-order demonstrator."""
        return spark.createDataFrame(
            [Row(x=i % 64, y=i // 64, v=float(i)) for i in range(4096)]
        )

    def test_box_predicates_prune_on_both_axes(
        self, spark, grid, tmp_path
    ):
        zt = SnapshotTable(spark, str(tmp_path) + "/z")
        zt.write_zordered(grid, ["x", "y"], n_files=16, bits=6)
        zt.build_stats(cols=["x", "y"])
        lex = SnapshotTable(spark, str(tmp_path) + "/lex")
        lex.write_clustered(grid, cluster_by=["x"], n_files=16)
        lex.build_stats(cols=["x", "y"])
        # y-box: the z-layout prunes; the x-lexicographic layout
        # cannot (every file spans the full y range)
        assert len(zt.files_for_range("y", 0, 7)) <= 8
        assert len(lex.files_for_range("y", 0, 7)) == 16
        # x-box: BOTH layouts prune
        assert len(zt.files_for_range("x", 0, 7)) <= 8
        assert len(lex.files_for_range("x", 0, 7)) <= 2
        # correctness on both axes of the z layout
        got = sorted(
            (r["x"], r["y"])
            for r in zt.read_range("y", 3, 4).collect()
        )
        want = sorted(
            (r["x"], r["y"])
            for r in grid.filter(F.col("y").between(3, 4)).collect()
        )
        assert got == want

    def test_nulls_cluster_and_read_back(self, spark, tmp_path):
        st = SnapshotTable(spark, str(tmp_path) + "/znull")
        df = spark.createDataFrame(
            [Row(x=i, y=(None if i % 5 == 0 else i)) for i in range(50)],
            "x long, y long",
        )
        st.write_zordered(df, ["x", "y"], n_files=4, bits=4)
        assert st.read().count() == 50
        st.build_stats()
        # range reads never return NULL-y rows; totals still check out
        assert st.read_range("y", 0, 100).count() == 40

    def test_constant_and_date_axes(self, spark, tmp_path):
        st = SnapshotTable(spark, str(tmp_path) + "/zdate")
        df = spark.createDataFrame(
            [
                Row(
                    d=dt.date(2024, 1, 1) + dt.timedelta(days=i % 30),
                    c=1,
                    v=i,
                )
                for i in range(300)
            ]
        )
        st.write_zordered(df, ["d", "c"], n_files=4, bits=4)
        st.build_stats(cols=["d"])
        assert (
            len(
                st.files_for_range(
                    "d", dt.date(2024, 1, 1), dt.date(2024, 1, 5)
                )
            )
            < 4
        )
        assert (
            st.read_range(
                "d", dt.date(2024, 1, 1), dt.date(2024, 1, 5)
            ).count()
            == 50
        )

    def test_unsupported_axis_is_loud(self, spark, tmp_path):
        st = SnapshotTable(spark, str(tmp_path) + "/zbad")
        df = spark.createDataFrame([Row(s="a", v=1)])
        with pytest.raises(TypeError, match="z-ordered"):
            st.write_zordered(df, ["s"], n_files=2)
        with pytest.raises(ValueError, match="exceeds"):
            st.write_zordered(df, ["v"] * 9, bits=8)


class TestIncrementalStats:
    def test_append_computes_only_new_files(self, spark, tmp_path):
        st = SnapshotTable(spark, str(tmp_path) + "/inc")
        st.write(
            spark.createDataFrame(
                [Row(k=i) for i in range(16)]
            ).coalesce(2),
            mode="overwrite",
        )
        st.build_stats()
        v2 = st.write(
            spark.createDataFrame(
                [Row(k=100 + i) for i in range(8)]
            ).coalesce(1),
            mode="append",
        )
        st.build_stats(version=v2, incremental=True)
        meta = st._read_json(st._zm_meta_path(v2))
        assert meta["base_version"] is not None
        assert meta["n_computed_files"] == 1  # only the appended file
        inc_rows = _sidecar_rows(st, v2)
        # bit-identical to a from-scratch build of the same version
        st.build_stats(version=v2)  # full rebuild overwrites
        assert _sidecar_rows(st, v2) == inc_rows
        st._zm_cache = {}
        assert st.read_range("k", 100, 200, version=v2).count() == 8

    def test_merge_drops_rewritten_files_rows(self, spark, tmp_path):
        st = SnapshotTable(spark, str(tmp_path) + "/incmerge")
        st.write(
            spark.createDataFrame(
                [Row(k=i, v=float(i)) for i in range(32)]
            ).repartition(4, "k"),
            mode="overwrite",
        )
        st.build_stats()
        src = spark.createDataFrame([Row(k=3, v=999.0)])
        st.merge_into(src, keys=["k"])
        st.build_stats(incremental=True)
        inc_rows = _sidecar_rows(st, st.latest_version())
        meta = st._read_json(st._zm_meta_path(st.latest_version()))
        # the merge rewrote one source file; only its replacement
        # output needed computing — the three untouched files carried
        n_head = len(st._manifest(st.latest_version())["files"])
        assert meta["n_computed_files"] == n_head - 3 < n_head
        st.build_stats()  # full rebuild
        assert _sidecar_rows(st, st.latest_version()) == inc_rows
        st._zm_cache = {}
        assert (
            st.read_range("v", 999.0, 999.0).collect()[0]["k"] == 3
        )

    def test_no_compatible_base_falls_back_to_full(self, spark, tmp_path):
        st = SnapshotTable(spark, str(tmp_path) + "/incfall")
        st.write(
            spark.createDataFrame([Row(k=1, v=2.0)]), mode="overwrite"
        )
        st.build_stats(cols=["k"])
        v2 = st.write(
            spark.createDataFrame([Row(k=2, v=3.0)]), mode="append"
        )
        # different column set -> full build, not a partial carry
        st.build_stats(version=v2, cols=["k", "v"], incremental=True)
        meta = st._read_json(st._zm_meta_path(v2))
        assert meta["base_version"] is None
        # full fallback: EVERY manifest file was computed, none carried
        n_head = len(st._manifest(v2)["files"])
        assert meta["n_computed_files"] == meta["n_stat_files"] == n_head
        assert st.read_range("v", 2.5, 3.5).count() == 1

    def test_incremental_scan_method(self, spark, tmp_path):
        st = SnapshotTable(spark, str(tmp_path) + "/incscan")
        st.write(
            spark.createDataFrame([Row(k=i) for i in range(8)]).coalesce(1),
            mode="overwrite",
        )
        st.build_stats(method="scan")
        v2 = st.write(
            spark.createDataFrame([Row(k=50 + i) for i in range(4)]).coalesce(1),
            mode="append",
        )
        st.build_stats(version=v2, method="scan", incremental=True)
        full = SnapshotTable(spark, st.path)
        full.build_stats(version=v2, method="scan")
        assert _sidecar_rows(st, v2) == _sidecar_rows(full, v2)


class TestCompactLayout:
    def test_compact_recluster_restores_pruning(self, spark, tmp_path):
        """Many small commits -> compact(cluster_by) -> one commit
        whose zone maps prune again; content bit-identical."""
        st = SnapshotTable(spark, str(tmp_path) + "/copt")
        for lo in range(0, 64, 8):  # 8 tiny append commits
            st.write(
                spark.createDataFrame(
                    [Row(k=lo + i) for i in range(8)]
                ).coalesce(1),
                mode="append",
            )
        before = sorted(r["k"] for r in st.read().collect())
        v = st.compact(
            target_file_bytes=2_000, cluster_by=["k"]
        )
        assert sorted(r["k"] for r in st.read(v).collect()) == before
        st.build_stats(version=v)
        files = st._manifest(v)["files"]
        cand = st.files_for_range("k", 0, 7, version=v)
        assert len(cand) < len(files)
        assert st.read_range("k", 0, 7, version=v).count() == 8

    def test_compact_zorder_and_guard(self, spark, tmp_path):
        st = SnapshotTable(spark, str(tmp_path) + "/cz")
        st.write(
            spark.createDataFrame(
                [Row(x=i % 16, y=i // 16) for i in range(256)]
            ).coalesce(1),
            mode="overwrite",
        )
        with pytest.raises(ValueError, match="not both"):
            st.compact(cluster_by=["x"], zorder_by=["y"])
        v = st.compact(target_file_bytes=500, zorder_by=["x", "y"])
        st.build_stats(version=v, cols=["x", "y"])
        files = st._manifest(v)["files"]
        if len(files) >= 4:
            assert len(
                st.files_for_range("y", 0, 3, version=v)
            ) < len(files)
        assert st.read_range("y", 0, 3, version=v).count() == 64


class TestBoxReads:
    def test_box_intersects_candidates_on_zorder(self, spark, tmp_path):
        st = SnapshotTable(spark, str(tmp_path) + "/box")
        grid = spark.createDataFrame(
            [Row(x=i % 64, y=i // 64) for i in range(4096)]
        )
        st.write_zordered(grid, ["x", "y"], n_files=16, bits=6)
        st.build_stats(cols=["x", "y"])
        got = sorted(
            (r["x"], r["y"])
            for r in st.read_box([("x", 8, 15), ("y", 8, 15)]).collect()
        )
        assert got == sorted(
            (x, y) for x in range(8, 16) for y in range(8, 16)
        )
        # the 2-D box touches fewer files than either 1-D candidate set
        fx = set(st.files_for_range("x", 8, 15))
        fy = set(st.files_for_range("y", 8, 15))
        assert len(fx & fy) < min(len(fx), len(fy)) or len(
            fx & fy
        ) <= 4

    def test_box_without_stats_falls_back(self, spark, tmp_path):
        st = SnapshotTable(spark, str(tmp_path) + "/boxns")
        st.write(
            spark.createDataFrame(
                [Row(x=i, y=10 * i) for i in range(20)]
            ),
            mode="overwrite",
        )
        assert st.read_box([("x", 5, 9), ("y", 0, 70)]).count() == 3
        with pytest.raises(ValueError, match="bound"):
            st.read_box([("x", None, None)])
        with pytest.raises(ValueError, match="predicate"):
            st.read_box([])

    def test_empty_intersection_returns_empty(self, spark, tmp_path):
        st = SnapshotTable(spark, str(tmp_path) + "/boxe")
        st.write_clustered(
            spark.createDataFrame([Row(x=i, y=i) for i in range(64)]),
            cluster_by=["x"],
            n_files=8,
        )
        st.build_stats()
        out = st.read_box([("x", 0, 3), ("y", 60, 63)])
        assert out.count() == 0


class TestEncodeProperties:
    """Hypothesis: the canonical zone-map encoding must preserve order
    within each supported type — pruning compares encoded forms, so a
    single inversion is a wrong-row bug."""

    def test_numeric_order_preserved(self):
        from hypothesis import given, settings, strategies as hst

        from pyspark.sql.types import DoubleType, LongType

        @settings(max_examples=300, deadline=None)
        @given(
            hst.lists(
                hst.integers(-(2**63) + 1, 2**63 - 1),
                min_size=2,
                max_size=6,
            )
        )
        def longs_widen_conservatively(vals):
            from globalweather_etl_spark.sources.snapshots import (
                _zm_encode, _zm_widen_lo, _zm_widen_hi,
            )

            dt_ = LongType()
            enc = [_zm_encode(v, dt_)[1] for v in vals]
            lo = _zm_widen_lo(min(enc))
            hi = _zm_widen_hi(max(enc))
            # every true value's encoded probe bound stays inside the
            # widened stats interval -> the file can never be pruned
            # while containing a match
            for v in vals:
                e = _zm_encode(v, dt_)[1]
                assert lo <= e <= hi

        longs_widen_conservatively()

        @settings(max_examples=300, deadline=None)
        @given(
            hst.floats(allow_nan=False, allow_infinity=True),
            hst.floats(allow_nan=False, allow_infinity=True),
        )
        def doubles_monotone(a, b):
            from globalweather_etl_spark.sources.snapshots import (
                _zm_encode,
            )

            dt_ = DoubleType()
            ea, eb = _zm_encode(a, dt_)[1], _zm_encode(b, dt_)[1]
            assert (a <= b) == (ea <= eb)

        doubles_monotone()

    def test_temporal_string_encoding_monotone(self):
        from hypothesis import given, settings, strategies as hst

        from pyspark.sql.types import DateType, StringType, TimestampType

        @settings(max_examples=300, deadline=None)
        @given(
            hst.datetimes(
                min_value=dt.datetime(1, 1, 1),
                max_value=dt.datetime(9999, 12, 28),
            ),
            hst.datetimes(
                min_value=dt.datetime(1, 1, 1),
                max_value=dt.datetime(9999, 12, 28),
            ),
        )
        def timestamps_monotone(a, b):
            from globalweather_etl_spark.sources.snapshots import (
                _zm_encode,
            )

            t = TimestampType()
            ea, eb = _zm_encode(a, t)[2], _zm_encode(b, t)[2]
            assert (a <= b) == (ea <= eb)

        timestamps_monotone()

        @settings(max_examples=300, deadline=None)
        @given(
            hst.dates(
                min_value=dt.date(1, 1, 1), max_value=dt.date(9999, 12, 31)
            ),
            hst.dates(
                min_value=dt.date(1, 1, 1), max_value=dt.date(9999, 12, 31)
            ),
        )
        def dates_monotone(a, b):
            from globalweather_etl_spark.sources.snapshots import (
                _zm_encode,
            )

            d = DateType()
            ea, eb = _zm_encode(a, d)[2], _zm_encode(b, d)[2]
            assert (a <= b) == (ea <= eb)

        dates_monotone()

        @settings(max_examples=300, deadline=None)
        @given(hst.text(max_size=40), hst.text(max_size=40))
        def strings_identity(a, b):
            from globalweather_etl_spark.sources.snapshots import (
                _zm_encode,
            )

            s = StringType()
            ea, eb = _zm_encode(a, s)[2], _zm_encode(b, s)[2]
            assert (a <= b) == (ea <= eb)

        strings_identity()

    def test_date_bound_vs_timestamp_stats_alignment(self):
        """Cross-type probe: a date bound against timestamp stats must
        behave exactly like midnight of that day."""
        from hypothesis import given, settings, strategies as hst

        from pyspark.sql.types import TimestampType

        @settings(max_examples=300, deadline=None)
        @given(
            hst.dates(
                min_value=dt.date(1, 1, 2), max_value=dt.date(9999, 12, 28)
            ),
            hst.datetimes(
                min_value=dt.datetime(1, 1, 1),
                max_value=dt.datetime(9999, 12, 28),
            ),
        )
        def aligned(day, ts):
            from globalweather_etl_spark.sources.snapshots import (
                _zm_encode,
            )

            t = TimestampType()
            e_day = _zm_encode(day, t)[2]
            e_ts = _zm_encode(ts, t)[2]
            midnight = dt.datetime(day.year, day.month, day.day)
            assert (e_ts <= e_day) == (ts <= midnight)
            assert (e_ts >= e_day) == (ts >= midnight)

        aligned()


class TestRangeReadProperty:
    def test_random_data_random_windows(self, spark, tmp_path):
        """End-to-end property at bounded scale: random integer data in
        a random file layout, random windows — the pruned read must
        equal the plain filter every time."""
        import random

        rng = random.Random(20260815)
        st = SnapshotTable(spark, str(tmp_path) + "/prop")
        vals = [rng.randint(-1000, 1000) for _ in range(500)]
        st.write(
            spark.createDataFrame(
                [Row(k=v) for v in vals]
            ).repartition(rng.randint(1, 12)),
            mode="overwrite",
        )
        st.build_stats(method="scan")
        for _ in range(25):
            a, b = rng.randint(-1200, 1200), rng.randint(-1200, 1200)
            lo, hi = min(a, b), max(a, b)
            got = sorted(
                r["k"] for r in st.read_range("k", lo, hi).collect()
            )
            want = sorted(v for v in vals if lo <= v <= hi)
            assert got == want, (lo, hi)


def test_pre_year_1000_timestamp_both_builds_agree(spark, tmp_path):
    """The hypothesis-caught year-padding bug, pinned end-to-end: a
    dirty year-999 timestamp must carry identical footer/scan stats
    and stay correctly ordered against modern rows."""
    st = SnapshotTable(spark, str(tmp_path) + "/y999")
    st.write(
        spark.createDataFrame(
            [
                Row(ts=dt.datetime(999, 1, 1, 12, 0, 0), k=1),
                Row(ts=dt.datetime(2024, 6, 1, 12, 0, 0), k=2),
            ]
        ).coalesce(1),
        mode="overwrite",
    )
    v = st.latest_version()
    st.build_stats(cols=["ts"], method="footer")
    footer = _sidecar_rows(st, v)
    st.build_stats(cols=["ts"], method="scan")
    assert _sidecar_rows(st, v) == footer
    st._zm_cache = {}
    got = st.read_range(
        "ts", dt.datetime(2000, 1, 1), dt.datetime(2030, 1, 1)
    ).collect()
    assert [r["k"] for r in got] == [2]


class TestBoundGuardsAndComposition:
    def test_bound_type_mismatch_is_loud(self, zm_table):
        zm_table.build_stats()  # guard needs a sidecar to defend
        with pytest.raises(TypeError, match="cast the bound"):
            zm_table.files_for_range("s", 5, 9)  # numeric vs string col
        with pytest.raises(TypeError, match="cast the bound"):
            zm_table.read_range("k", "0", "9")  # string vs numeric col
        with pytest.raises(TypeError, match="cast the bound"):
            zm_table.files_for_range("d", dt.datetime(2024, 1, 1), None)

    def test_read_where_intersects_bloom_and_zonemap(
        self, spark, tmp_path
    ):
        """A deliberately saturated Bloom filter keeps almost every
        file; the zone map on the clustered layout still prunes the
        point lookup to its one covering file."""
        st = SnapshotTable(spark, str(tmp_path) + "/compose")
        st.write_clustered(
            spark.createDataFrame([Row(k=i) for i in range(512)]),
            cluster_by=["k"],
            n_files=8,
        )
        st.build_file_index("k", num_bits=64)  # saturated: ~all set
        st.build_stats(cols=["k"])
        bloom_only = st.files_for_key("k", 100)
        zm_only = st.files_for_range("k", 100, 100)
        assert len(zm_only) == 1
        assert len(bloom_only) >= len(zm_only)
        got = st.read_where("k", 100).collect()
        assert [r["k"] for r in got] == [100]

    def test_read_where_without_stats_unchanged(self, spark, tmp_path):
        st = SnapshotTable(spark, str(tmp_path) + "/composeb")
        st.write(
            spark.createDataFrame([Row(k=i) for i in range(32)]),
            mode="overwrite",
        )
        st.build_file_index("k")
        assert [
            r["k"] for r in st.read_where("k", 7).collect()
        ] == [7]
        # zone map only (no Bloom): read_where prunes via stats alone
        st2 = SnapshotTable(spark, str(tmp_path) + "/composec")
        st2.write_clustered(
            spark.createDataFrame([Row(k=i) for i in range(64)]),
            cluster_by=["k"],
            n_files=4,
        )
        st2.build_stats()
        assert [
            r["k"] for r in st2.read_where("k", 63).collect()
        ] == [63]
