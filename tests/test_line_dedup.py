"""Line-level corpus dedup: hand-computed fixtures + DuckDB parity."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.line_dedup import (
    dedup_lines,
    line_doc_freq,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # "copyright 2024 acme" appears (normalized) in docs 1,2,3;
        # "subscribe to our newsletter" in 1 and 3 (case/ws variants);
        # blank lines and unique lines must survive.
        (1, "Unique opening line\nCopyright 2024 ACME\n\nSubscribe to our newsletter\nreal content one"),
        (2, "copyright   2024 acme\nreal content two"),
        (3, "More real text\nSUBSCRIBE TO OUR NEWSLETTER\ncopyright 2024 acme"),
        (4, "totally original document\nwith two lines"),
        (5, "   \n\t\n"),  # only whitespace lines
        (6, "repeated inside\nrepeated inside\nsolo doc"),  # intra-doc repeat
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_doc_freq_distinct_per_doc(docs):
    freq = {r["doc_freq"] for r in line_doc_freq(docs, "doc_id", "text").collect()}
    # intra-doc repetition counts once: doc 6's repeated line has df=1
    got = line_doc_freq(docs, "doc_id", "text")
    df6 = [
        r["doc_freq"]
        for r in got.collect()
    ]
    assert max(df6) == 3  # the copyright line
    assert freq <= {1, 2, 3}


def test_dedup_lines_fixture(docs):
    out = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_dup_lines"])
        for r in dedup_lines(docs, "doc_id", "text", min_doc_freq=2).collect()
    }
    # copyright (df=3) and newsletter (df=2) lines removed everywhere
    assert out[1] == (
        "Unique opening line\n\nreal content one", 4, 2,
    )
    assert out[2] == ("real content two", 2, 1)
    assert out[3] == ("More real text", 3, 2)
    # untouched doc keeps its text verbatim
    assert out[4] == ("totally original document\nwith two lines", 2, 0)
    # whitespace-only doc: lines never counted, text preserved verbatim
    assert out[5] == ("   \n\t\n", 0, 0)
    # intra-doc repeat is NOT cross-document duplication
    assert out[6] == ("repeated inside\nrepeated inside\nsolo doc", 3, 0)


def test_dedup_lines_out_col_keeps_original(docs):
    out = dedup_lines(
        docs, "doc_id", "text", min_doc_freq=2, out_col="clean"
    )
    row = {r["doc_id"]: r for r in out.collect()}[2]
    assert row["text"] == "copyright   2024 acme\nreal content two"
    assert row["clean"] == "real content two"


def test_dedup_lines_duckdb_parity(spark):
    """Full cleaned-text parity against an independent DuckDB
    implementation of the same pinned semantics, on real testdata.

    The synthetic corpus is single-line/unique-text, so boilerplate is
    synthesized the way the graded query does it: every doc gains a
    per-source copyright footer (heavily duplicated across docs) and
    every third doc a subscribe banner — the body line stays unique."""
    raw = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs = raw.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.concat(F.lit("Copyright 2024 "), F.col("source")),
            F.when(
                F.col("doc_id") % 3 == 0, F.lit("Subscribe to our newsletter")
            ),
        ).alias("text"),
    )
    got = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_dup_lines"])
        for r in dedup_lines(docs, "doc_id", "text", min_doc_freq=2).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"""CREATE VIEW documents AS
        SELECT doc_id,
               concat_ws(chr(10), text, 'Copyright 2024 ' || source,
                         CASE WHEN doc_id % 3 = 0
                              THEN 'Subscribe to our newsletter' END) AS text
        FROM read_parquet('{SF_DIR}/documents.parquet')"""
    )
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            r"""
WITH base AS (
  SELECT doc_id, str_split(text, chr(10)) AS ls FROM documents
),
lines AS (
  SELECT doc_id, ls[i] AS line, i AS pos
  FROM base, unnest(generate_series(1, len(ls))) AS g(i)
),
keyed AS (
  SELECT doc_id, line, pos,
         CASE WHEN lower(trim(regexp_replace(line, '\s+', ' ', 'g'))) = ''
              THEN NULL
              ELSE md5(lower(trim(regexp_replace(line, '\s+', ' ', 'g'))))
         END AS k
  FROM lines
),
freq AS (
  SELECT k, count(DISTINCT doc_id) AS df
  FROM keyed WHERE k IS NOT NULL GROUP BY k
),
flagged AS (
  SELECT keyed.doc_id, keyed.line, keyed.pos,
         keyed.k IS NOT NULL AS counted,
         coalesce(freq.df >= 2, FALSE) AS dup
  FROM keyed LEFT JOIN freq ON keyed.k = freq.k
)
SELECT doc_id,
       coalesce(string_agg(CASE WHEN NOT dup THEN line END, chr(10)
                           ORDER BY pos), '') AS clean,
       sum(CASE WHEN counted THEN 1 ELSE 0 END)::BIGINT AS n_lines,
       sum(CASE WHEN dup THEN 1 ELSE 0 END)::BIGINT AS n_dup_lines
FROM flagged GROUP BY doc_id
"""
        ).fetchall()
    }
    assert set(got) == set(want)
    assert got == want
    # the testdata corpus really exercises the operator
    assert any(v[2] > 0 for v in got.values())


def test_dedup_lines_within_fixture(spark):
    from globalweather_etl_spark.operators.line_dedup import dedup_lines_within

    rows = [
        (1, "repeated inside\nrepeated inside\nsolo line"),
        (2, "A  Mixed   Case\n\na mixed case\n\nkeep me\nA MIXED CASE"),
        (3, "   \n\t\n"),  # blank lines repeat but are never removed
        (4, "only one line"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["text"], r["n_lines_within"], r["n_dup_within"])
        for r in dedup_lines_within(docs, "doc_id", "text").collect()
    }
    assert out[1] == ("repeated inside\nsolo line", 3, 1)
    # first occurrence kept VERBATIM; both later variants dropped
    assert out[2] == ("A  Mixed   Case\n\n\nkeep me", 4, 2)
    assert out[3] == ("   \n\t\n", 0, 0)
    assert out[4] == ("only one line", 1, 0)


def test_dedup_lines_within_zero_shuffle_plan(spark):
    from globalweather_etl_spark.operators.line_dedup import dedup_lines_within

    docs = spark.createDataFrame([(1, "a\nb\na")], "doc_id long, text string")
    plan = dedup_lines_within(docs, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_dedup_lines_within_duckdb_parity(spark):
    """Intra-doc dedup over real testdata (with synthesized intra-doc
    repetition) matches a DuckDB row_number-window twin line for line."""
    from globalweather_etl_spark.operators.line_dedup import dedup_lines_within
    from globalweather_etl_spark.sources import load_table

    base = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    docs = base.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.lit("Repeat   Me"),
            F.lit("repeat me"),
            F.when(F.col("doc_id") % 2 == 0, F.split_part(F.col("text"), F.lit("\n"), F.lit(1))),
        ).alias("text"),
    )
    got = {
        r["doc_id"]: (r["text"], r["n_lines_within"], r["n_dup_within"])
        for r in dedup_lines_within(docs, "doc_id", "text").collect()
    }
    con = duckdb.connect()
    con.execute(
        f"""CREATE VIEW documents AS
        SELECT doc_id,
               concat_ws(chr(10), text, 'Repeat   Me', 'repeat me',
                         CASE WHEN doc_id % 2 = 0
                              THEN split_part(text, chr(10), 1) END) AS text
        FROM read_parquet('{SF_DIR}/documents.parquet')"""
    )
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            r"""
WITH base AS (
  SELECT doc_id, str_split(text, chr(10)) AS ls FROM documents
),
lines AS (
  SELECT doc_id, ls[i] AS line, i AS pos
  FROM base, unnest(generate_series(1, len(ls))) AS g(i)
),
keyed AS (
  SELECT doc_id, line, pos,
         CASE WHEN lower(trim(regexp_replace(line, '\s+', ' ', 'g'))) = ''
              THEN NULL
              ELSE md5(lower(trim(regexp_replace(line, '\s+', ' ', 'g'))))
         END AS k
  FROM lines
),
flagged AS (
  SELECT doc_id, line, pos, k IS NOT NULL AS counted,
         CASE WHEN k IS NULL THEN FALSE
              ELSE row_number() OVER (PARTITION BY doc_id, k ORDER BY pos) > 1
         END AS dup
  FROM keyed
)
SELECT doc_id,
       coalesce(string_agg(CASE WHEN NOT dup THEN line END, chr(10)
                           ORDER BY pos), '') AS clean,
       sum(CASE WHEN counted THEN 1 ELSE 0 END)::BIGINT AS n_lines_within,
       sum(CASE WHEN dup THEN 1 ELSE 0 END)::BIGINT AS n_dup_within
FROM flagged GROUP BY doc_id
"""
        ).fetchall()
    }
    assert got == want
    # the synthesized corpus really exercises the operator
    assert any(v[2] > 0 for v in got.values())
