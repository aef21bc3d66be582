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
