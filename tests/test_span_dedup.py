"""Duplicate-span removal: hand-computed fixtures + DuckDB parity."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.span_dedup import (
    duplicate_span_starts,
    remove_duplicate_spans,
)
from globalweather_etl_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"

SHARED = "one two three four five six seven eight"  # 8 tokens


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # doc 1 (min id) keeps the shared passage
        (1, f"intro alpha {SHARED} outro beta"),
        # doc 2 embeds the same passage mid-text -> erased there
        (2, f"different opening sentences {SHARED} and a different close"),
        # doc 3: no duplication
        (3, "entirely unique text with no repeated passages at all"),
        # doc 4: TWO copies of the passage (also dup'd with 1 and 2)
        (4, f"{SHARED} filler middle words {SHARED}"),
        (5, ""),  # empty
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_marks_hand_computed(corpus):
    marks = {
        (r["doc"], r["p"])
        for r in duplicate_span_starts(corpus, "doc_id", "text", k=8).collect()
    }
    # doc 1 is keeper (min id) -> no marks; doc 2's copy starts at token 3;
    # doc 4 has copies at 0 and 11
    assert marks == {(2, 3), (4, 0), (4, 11)}


def test_removal_hand_computed(corpus):
    out = {
        r["doc_id"]: (
            r["text"],
            r["span_n_tokens"],
            r["span_tokens_removed"],
            r["span_n_spans"],
        )
        for r in remove_duplicate_spans(corpus, "doc_id", "text", k=8).collect()
    }
    assert out[1] == (f"intro alpha {SHARED} outro beta", 12, 0, 0)
    assert out[2] == ("different opening sentences and a different close", 15, 8, 1)
    assert out[3] == ("entirely unique text with no repeated passages at all", 9, 0, 0)
    assert out[4] == ("filler middle words", 19, 16, 2)
    assert out[5] == ("", 0, 0, 0)


def test_long_repeat_fully_tiled(spark):
    """A shared run LONGER than k is erased end to end (overlapping
    k-windows tile it), and k is a hard floor: a k-1-token repeat
    survives."""
    long_shared = " ".join(f"w{i}" for i in range(12))  # 12 tokens
    short_shared = "s1 s2 s3"  # 3 tokens < k=4
    docs = spark.createDataFrame(
        [
            (1, f"{long_shared} tail {short_shared}"),
            (2, f"head {long_shared} mid {short_shared}"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_spans(docs, "doc_id", "text", k=4).collect()
    }
    assert out[1] == f"{long_shared} tail {short_shared}"  # keeper intact
    assert out[2] == f"head mid {short_shared}"  # 12-token run gone, short repeat kept


def test_duckdb_parity(spark):
    """md5 mode over real testdata with a syndicated passage appended
    to every 6th doc; full SQL twin of marks, coverage, and counts."""
    passage = (
        "this syndicated boilerplate passage is repeated verbatim across "
        "many documents of the crawl corpus"
    )
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 6 == 0,
            F.concat(F.col("text"), F.lit(" " + passage)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    got = {
        r["doc_id"]: (
            r["text"],
            r["span_n_tokens"],
            r["span_tokens_removed"],
            r["span_n_spans"],
        )
        for r in remove_duplicate_spans(
            docs, "doc_id", "text", k=8, hash_fn="md5"
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"""CREATE VIEW docs AS
        SELECT doc_id,
               CASE WHEN doc_id % 6 = 0 THEN text || ' {passage}'
                    ELSE text END AS text
        FROM read_parquet('{SF_DIR}/documents.parquet')"""
    )
    want = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(
            r"""
WITH toks AS (
  SELECT doc_id, i - 1 AS pos, t[i] AS tok, len(t) AS n
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM docs),
       unnest(generate_series(1, len(t))) AS g(i)),
wins AS (
  SELECT doc_id, i - 1 AS p,
         CAST('0x' || substring(md5(array_to_string(t[i:i+7], ' ')), 1, 15)
           AS BIGINT) AS gh
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM docs),
       unnest(generate_series(1, len(t) - 7)) AS g(i)
  WHERE len(t) >= 8),
dup AS (
  SELECT gh, min(doc_id) AS keeper
  FROM (SELECT DISTINCT doc_id, gh FROM wins)
  GROUP BY gh HAVING count(*) >= 2),
marks AS (
  SELECT DISTINCT w.doc_id, w.p
  FROM wins w JOIN dup USING (gh)
  WHERE w.doc_id <> dup.keeper),
flagged AS (
  SELECT t.doc_id, t.pos, t.tok,
         EXISTS (SELECT 1 FROM marks m
                 WHERE m.doc_id = t.doc_id
                   AND m.p <= t.pos AND t.pos < m.p + 8) AS rm
  FROM toks t
  WHERE t.tok <> ''),
spans AS (
  SELECT doc_id, count(*) AS n_spans
  FROM (SELECT doc_id, p,
               lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev
        FROM marks)
  WHERE prev IS NULL OR p > prev + 7
  GROUP BY doc_id)
SELECT d.doc_id,
  coalesce((SELECT string_agg(tok, ' ' ORDER BY pos)
            FROM flagged f WHERE f.doc_id = d.doc_id AND NOT f.rm), '')
    AS clean,
  coalesce((SELECT count(*) FROM flagged f WHERE f.doc_id = d.doc_id),
           0)::BIGINT AS n_tokens,
  coalesce((SELECT count(*) FROM flagged f
            WHERE f.doc_id = d.doc_id AND f.rm), 0)::BIGINT AS removed,
  coalesce(spans.n_spans, 0)::BIGINT AS n_spans
FROM docs d LEFT JOIN spans USING (doc_id)"""
        ).fetchall()
    }
    assert got == want
    # the synthesized passage is really erased somewhere
    assert any(v[2] > 0 for v in got.values())
