"""Semi-structured (VARIANT-style) JSON operators
(functions/semistructured.py): path navigation NULL semantics,
schema-on-read typed parsing with corrupt tolerance, and LATERAL
FLATTEN inner/outer behavior. The cross-engine value check lives in
the tpch_scalar_checks json_* graded rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.functions.semistructured import (
    flatten_json_array,
    json_array_size,
    json_get,
    parse_json,
)

DOCS = [
    (1, '{"a": {"b": 7}, "tags": ["x", "y"], "n": 3}'),
    (2, '{"a": {"b": null}, "tags": []}'),
    (3, '{"other": 1}'),
    (4, "not json at all"),
    (5, None),
]


@pytest.fixture(scope="module")
def jdf(spark):
    return spark.createDataFrame(DOCS, "id long, j string")


class TestNavigation:
    def test_json_get_paths_and_nulls(self, spark, jdf):
        got = {
            r["id"]: r["v"]
            for r in jdf.select(
                "id", json_get("j", "a.b").alias("v")
            ).collect()
        }
        # present -> string; JSON null / missing / malformed / NULL
        # doc -> NULL, never an error (schema-on-read)
        assert got == {1: "7", 2: None, 3: None, 4: None, 5: None}

    def test_parse_json_typed_and_corrupt_tolerant(self, spark, jdf):
        got = {
            r["id"]: r["b"]
            for r in jdf.select(
                "id",
                parse_json("j", "struct<a: struct<b: bigint>>")["a"][
                    "b"
                ].alias("b"),
            ).collect()
        }
        assert got == {1: 7, 2: None, 3: None, 4: None, 5: None}

    def test_array_size(self, spark, jdf):
        got = {
            r["id"]: r["n"]
            for r in jdf.select(
                "id", json_array_size("j", "tags").alias("n")
            ).collect()
        }
        assert got == {1: 2, 2: 0, 3: None, 4: None, 5: None}


class TestFlatten:
    def test_inner_flatten_drops_missing(self, spark, jdf):
        rows = flatten_json_array(jdf, "j", "tags", out_col="tag").select(
            "id", "tag"
        ).collect()
        assert sorted((r["id"], r["tag"]) for r in rows) == [
            (1, "x"), (1, "y"),
        ]

    def test_outer_flatten_keeps_all_rows(self, spark, jdf):
        rows = flatten_json_array(
            jdf, "j", "tags", out_col="tag", outer=True
        ).select("id", "tag").collect()
        got = sorted(
            ((r["id"], r["tag"]) for r in rows),
            key=lambda t: (t[0], t[1] or ""),
        )
        # row 1 fans out; empty/missing/corrupt/NULL rows all keep one
        # NULL-element row (Snowflake's OUTER => TRUE)
        assert got == [
            (1, "x"), (1, "y"), (2, None), (3, None), (4, None),
            (5, None),
        ]

    def test_typed_elements(self, spark):
        df = spark.createDataFrame(
            [('{"xs": [1, 2, 30]}',)], "j string"
        )
        rows = flatten_json_array(
            df, "j", "xs", element_type="bigint", out_col="x"
        ).collect()
        assert sorted(r["x"] for r in rows) == [1, 2, 30]
        assert rows[0].__fields__[-1] == "x"


class TestShredding:
    """VARIANT shredding (round 8): write-time path materialization
    must be answer-identical to raw navigation, one parse wide, and
    scan-pruned after a parquet round-trip."""

    PATHS = {
        "ab": ("a.b", "bigint"),
        "n": ("n", "bigint"),
        "missing": ("x.y", "string"),
    }

    def test_shred_equals_raw_navigation(self, spark, jdf):
        from globalweather_etl_spark.functions.semistructured import (
            shred_json,
        )

        got = {
            r["id"]: (r["shred_ab"], r["shred_n"], r["shred_missing"])
            for r in shred_json(jdf, "j", self.PATHS).collect()
        }
        want = {
            r["id"]: (r["ab"], r["n"], r["m"])
            for r in jdf.select(
                "id",
                json_get("j", "a.b").cast("bigint").alias("ab"),
                json_get("j", "n").cast("bigint").alias("n"),
                json_get("j", "x.y").alias("m"),
            ).collect()
        }
        # missing paths, explicit nulls, malformed docs, NULL docs —
        # all NULL on both sides
        assert got == want
        assert got[3] == (None, None, None)  # path absent
        assert got[4] == (None, None, None)  # malformed
        assert got[5] == (None, None, None)  # NULL doc

    def test_single_parse_and_conflicts_loud(self, spark, jdf):
        from globalweather_etl_spark.functions.semistructured import (
            _shred_ddl,
            shred_json,
        )

        assert (
            _shred_ddl(["a.b", "a.c"])
            == "struct<`a`: struct<`b`: string, `c`: string>>"
        )
        # every shred column navigates the SAME merged from_json
        # expression (one schema string in the plan), so whole-stage
        # codegen's common-subexpression elimination parses once —
        # k get_json_object columns would instead carry k path probes
        plan = shred_json(jdf, "j", self.PATHS)._jdf.queryExecution(
        ).optimizedPlan().toString()
        assert plan.count("from_json") == len(self.PATHS)
        assert "get_json_object" not in plan
        with pytest.raises(ValueError, match="both a leaf and a branch"):
            _shred_ddl(["a", "a.b"])
        # one path shredded under TWO types is legal (string leaf +
        # per-column try_cast): the typed view coerces, the raw keeps
        two = shred_json(
            jdf.limit(1),
            "j",
            {"abn": ("a.b", "bigint"), "abs": ("a.b", "string")},
        ).collect()[0]
        assert (two["shred_abn"], two["shred_abs"]) == (7, "7")
        # an output name colliding with a surviving input column must
        # fail up front — a duplicate-named frame only errors later
        # (ambiguity) or silently misfeeds positional consumers
        with pytest.raises(ValueError, match="collide"):
            shred_json(
                jdf.withColumn("shred_ab", F.lit(1)), "j", self.PATHS
            )
        # ...but reusing the DROPPED document column's name is fine:
        # keep_doc=False removes "j" before the shreds are appended
        reused = shred_json(
            jdf.limit(1),
            "j",
            {"j": ("a.b", "bigint")},
            prefix="",
            keep_doc=False,
        )
        assert reused.columns.count("j") == 1
        assert reused.collect()[0]["j"] == 7

    def test_parquet_read_prunes_to_shred_column(self, spark, jdf, tmp_path):
        from globalweather_etl_spark.functions.semistructured import (
            shred_json,
        )

        out = str(tmp_path / "shredded")
        shred_json(jdf, "j", self.PATHS).write.parquet(out)
        back = spark.read.parquet(out)
        q = back.select("shred_ab").filter(F.col("shred_ab") > 0)
        plan = q._jdf.queryExecution().executedPlan().toString()
        rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
        assert rs, "expected a parquet FileScan"
        read_schema = rs[0].split("ReadSchema:")[1].strip()
        # the whole point: ONLY the shred column leaves disk — the
        # multi-KB raw document column is pruned away, and the filter
        # is pushed into the scan
        assert read_schema == "struct<shred_ab:bigint>"
        assert "PushedFilters: [IsNotNull(shred_ab), GreaterThan(shred_ab,0)]" in rs[0]
        assert sorted(
            r["shred_ab"] for r in q.collect()
        ) == [7]

    def test_shredded_get_resolves_and_falls_back(self, spark, jdf):
        from globalweather_etl_spark.functions.semistructured import (
            shred_json,
            shredded_get,
        )

        meta = {n: p for n, (p, _t) in self.PATHS.items()}
        sdf = shred_json(jdf, "j", self.PATHS)
        resolved = shredded_get(sdf, "j", "a.b", meta)
        raw = shredded_get(sdf, "j", "tags", meta)  # not shredded
        got = sdf.select(
            "id", resolved.alias("ab"), raw.alias("tags")
        ).collect()
        by_id = {r["id"]: (r["ab"], r["tags"]) for r in got}
        assert by_id[1] == (7, '["x","y"]')
        assert by_id[3] == (None, None)


class TestShreddedTable:
    """write_shredded / json_path (round 8): the shred map rides the
    manifest, so readers resolve paths without out-of-band knowledge."""

    def test_manifest_resolution_and_pruned_scan(self, spark, jdf, tmp_path):
        from globalweather_etl_spark.sources.snapshots import SnapshotTable

        t = SnapshotTable(spark, str(tmp_path / "shredtbl"))
        t.write_shredded(
            jdf, "j", {"ab": ("a.b", "bigint"), "n": ("n", "bigint")}
        )
        # shredded path -> the typed column; raw doc never scanned
        q = t.read().select("id", t.json_path("a.b").alias("ab"))
        got = {r["id"]: r["ab"] for r in q.collect()}
        assert got == {1: 7, 2: None, 3: None, 4: None, 5: None}
        plan = q._jdf.queryExecution().executedPlan().toString()
        rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
        assert "shred_ab" in rs and "j:string" not in rs
        # un-shredded path -> raw navigation fallback, same rows
        tags = {
            r["id"]: r["t"]
            for r in t.read()
            .select("id", t.json_path("tags").alias("t"))
            .collect()
        }
        assert tags[1] == '["x","y"]' and tags[3] is None
        # append preserves the map via stamp carry? appends carry
        # manifest_extra only when re-supplied — the shred map is
        # recorded per write_shredded commit; a plain append loses it
        # and json_path says so loudly
        t2 = SnapshotTable(spark, str(tmp_path / "noshred"))
        t2.write(jdf, mode="overwrite")
        import pytest as _pytest

        with _pytest.raises(ValueError, match="write_shredded"):
            t2.json_path("a.b")
