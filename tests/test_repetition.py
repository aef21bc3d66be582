"""top_ngram_stats: hand-computed values + DuckDB parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from globalweather_etl_spark.operators.repetition import top_ngram_stats


def _rows(spark, data):
    df = spark.createDataFrame(data, "doc_id long, text string")
    return {
        r["doc_id"]: (r["n_ngrams"], r["top_ngram_count"], r["top_ngram_frac"])
        for r in top_ngram_stats(df, "doc_id", "text", n=2).collect()
    }


def test_top_ngram_hand_computed(spark):
    got = _rows(
        spark,
        [
            # bigrams: [a b, b a, a b, b a] -> 4 grams, top 2, frac .5
            (1, "a b a b a"),
            # all distinct bigrams -> frac 1/3
            (2, "w x y z"),
            # one token: no bigrams -> no row
            (3, "solo"),
            # total repetition: frac 1.0
            (4, "go go go go"),
        ],
    )
    assert got[1] == (4, 2, 0.5)
    assert got[2] == (3, 1, 1.0 / 3.0)
    assert 3 not in got
    assert got[4] == (3, 3, 1.0)


def test_top_ngram_duckdb_parity(spark):
    """Same statistic over the real documents table in both engines."""
    import duckdb

    from globalweather_etl_spark.sources.registry import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    got = {
        r["doc_id"]: (r["n_ngrams"], r["top_ngram_count"])
        for r in top_ngram_stats(docs, "doc_id", "text", n=2).collect()
    }
    con = duckdb.connect()
    want = {
        row[0]: (row[1], row[2])
        for row in con.execute(
            f"""
WITH toks AS (
  SELECT doc_id,
    regexp_split_to_array(trim(text), '\\s+') AS t
  FROM read_parquet('{sf}/documents.parquet')),
grams AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] AS gram
  FROM toks, unnest(generate_series(1, len(t) - 1)) AS g(i)),
per AS (
  SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY 1, 2)
SELECT doc_id, sum(c) AS n_ngrams, max(c) AS top FROM per GROUP BY 1
"""
        ).fetchall()
    }
    assert got == want
