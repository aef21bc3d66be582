"""HTML extraction kernel: semantics on adversarial fixtures + exact
cross-engine parity (the Spark expressions and the RE2/DuckDB twin
must produce byte-identical text)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.functions.html import (
    STRIP_HTML_SQL,
    strip_html,
    visible_text_ratio,
)

FIXTURES = [
    # tag soup, entities, block boundaries
    (
        "<html><head><title>T</title><style>p{color:red}</style></head>"
        "<body><h1>Big &amp; Bold</h1><p>one</p><p>two&nbsp;words</p>"
        "<script>var x = '<p>not text</p>';</script>"
        "<div>a<br>b</div><!-- hidden --><ul><li>i1</li><li>i2</li></ul>"
        "</body></html>"
    ),
    # unclosed / uppercase / attribute-heavy tags
    (
        '<DIV CLASS="x" data-y="<z>">Mixed <B>case</B>\n'
        "<P>para with &lt;escaped&gt; markup &#39;quoted&#39;"
    ),
    # double-encoded entity must decode exactly once
    "&amp;lt;still-escaped&amp;gt; plain &amp; done",
    # whitespace storms
    "a\t\t b   c\r\n\n\n\n\nd   <p>  e  </p>  ",
    # empty and markup-only documents
    "",
    "<script>only()</script><style>.x{}</style><!-- nothing -->",
    # template/noscript blocks vanish with their content
    "<noscript>enable js</noscript>keep<template><p>x</p></template>me",
]


class TestSemantics:
    def test_blocks_entities_and_breaks(self, spark):
        df = spark.createDataFrame([(FIXTURES[0],)], "h string")
        out = df.select(strip_html(F.col("h")).alias("t")).collect()[0][
            "t"
        ]
        assert "not text" not in out  # script INNER text gone
        assert "color:red" not in out
        assert "hidden" not in out
        assert "Big & Bold" in out  # entity decoded
        assert "two words" in out  # &nbsp; -> space
        assert "one\ntwo" in out  # </p><p> is a line break, not fusion
        assert "a\nb" in out  # <br>
        assert "i1\ni2" in out

    def test_single_decode_only(self, spark):
        df = spark.createDataFrame([(FIXTURES[2],)], "h string")
        out = df.select(strip_html(F.col("h")).alias("t")).collect()[0][
            "t"
        ]
        assert out == "&lt;still-escaped&gt; plain & done"

    def test_markup_only_and_empty(self, spark):
        df = spark.createDataFrame(
            [(h,) for h in (FIXTURES[4], FIXTURES[5])], "h string"
        )
        got = [
            r["t"]
            for r in df.select(strip_html(F.col("h")).alias("t")).collect()
        ]
        assert got == ["", ""]

    def test_visible_text_ratio(self, spark):
        df = spark.createDataFrame(
            [("chrome", FIXTURES[5]), ("content", "plain words only")],
            "k string, h string",
        )
        got = {
            r["k"]: r["r"]
            for r in df.select(
                "k", visible_text_ratio(F.col("h")).alias("r")
            ).collect()
        }
        assert got["chrome"] == 0.0
        assert got["content"] == 1.0
        null_df = spark.createDataFrame([(None,)], "h string")
        assert (
            null_df.select(
                visible_text_ratio(F.col("h")).alias("r")
            ).collect()[0]["r"]
            == 0.0
        )


class TestCrossEngineParity:
    def test_duckdb_twin_byte_identical(self, spark):
        df = spark.createDataFrame(
            [(i, h) for i, h in enumerate(FIXTURES)], "i long, h string"
        )
        got = {
            r["i"]: r["t"]
            for r in df.select(
                "i", strip_html(F.col("h")).alias("t")
            ).collect()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE fx AS SELECT * FROM (VALUES "
            + ", ".join(
                f"({i}, '{h}')".replace("\n", "' || chr(10) || '")
                for i, h in [
                    (i, h.replace("'", "''")) for i, h in enumerate(FIXTURES)
                ]
            )
            + ") AS t(i, h)"
        )
        want = dict(
            con.execute(
                f"SELECT i, {STRIP_HTML_SQL('h')} FROM fx"
            ).fetchall()
        )
        assert got == want
