"""chunk_documents: hand-computed windows + DuckDB parity + coverage
invariant (every token appears in some chunk)."""

from __future__ import annotations

from pyspark.sql import functions as F

from globalweather_etl_spark.operators.chunking import chunk_documents
from globalweather_etl_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _chunks(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return [
        (r["chunk_id"], r["chunk_start"], r["n_chunk_tokens"], r["chunk_text"])
        for r in chunk_documents(df, **kw).orderBy("chunk_id").collect()
    ]


def test_hand_computed_no_overlap(spark):
    got = _chunks(spark, "a b c d e f g", chunk_tokens=3)
    assert got == [
        (0, 0, 3, "a b c"),
        (1, 3, 3, "d e f"),
        (2, 6, 1, "g"),
    ]


def test_hand_computed_overlap(spark):
    got = _chunks(spark, "a b c d e f g", chunk_tokens=4, overlap_tokens=2)
    assert got == [
        (0, 0, 4, "a b c d"),
        (1, 2, 4, "c d e f"),
        (2, 4, 3, "e f g"),
    ]


def test_short_and_empty_docs(spark):
    assert _chunks(spark, "only two", chunk_tokens=128) == [(0, 0, 2, "only two")]
    assert _chunks(spark, "", chunk_tokens=8) == []
    assert _chunks(spark, "   ", chunk_tokens=8) == []


def test_every_token_covered(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = chunk_documents(docs, chunk_tokens=16, overlap_tokens=4)
    cover = out.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("chunk_id") == 0, F.col("n_chunk_tokens")).otherwise(
                F.col("n_chunk_tokens") - 4
            )
        ).alias("covered")
    )
    from globalweather_etl_spark.functions.text import token_count

    want = docs.select("doc_id", token_count(F.col("text")).alias("n"))
    diff = cover.join(want, "doc_id").filter(F.col("covered") != F.col("n"))
    assert diff.count() == 0


def test_duckdb_parity(spark):
    import duckdb

    docs = load_table(spark, SF_DIR, "documents")
    got = {
        (r["doc_id"], r["chunk_id"]): r["chunk_text"]
        for r in chunk_documents(
            docs, chunk_tokens=32, overlap_tokens=8
        ).collect()
    }
    con = duckdb.connect()
    want = {
        (r[0], r[1]): r[2]
        for r in con.execute(f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM read_parquet('{SF_DIR}/documents.parquet')
  WHERE length(trim(text)) > 0),
g AS (
  SELECT doc_id, toks, i, (i - 1) / 24 AS chunk_id
  FROM t, unnest(generate_series(1, greatest(len(toks) - 8, 1), 24)) AS s(i))
SELECT doc_id, chunk_id,
  array_to_string(list_slice(toks, i, least(i + 31, len(toks))), ' ')
FROM g""").fetchall()
    }
    assert got == want
