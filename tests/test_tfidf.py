"""Hashed TF-IDF: hand-computed idf/vector fixtures, a DuckDB
bit-for-bit twin on real docs, frozen-idf application, and the
clustering composition (kmeans over text, no embedding model)."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.tfidf import hashed_tfidf, idf_table
from globalweather_etl_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "spark spark join"),
        (2, "join scan"),
        (3, "spark"),
        (4, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_idf_hand_computed(docs):
    got = {r["term"]: (r["df"], r["idf"]) for r in idf_table(docs).collect()}
    n = 4

    def idf(df):
        return round(math.log((n + 1) / (df + 1)) + 1, 6)

    assert got == {
        "spark": (2, idf(2)),
        "join": (2, idf(2)),
        "scan": (1, idf(1)),
    }


def test_vector_hand_computed(spark, docs):
    dim = 8
    out = {
        r["doc_id"]: r["tfidf"]
        for r in hashed_tfidf(docs, dim=dim).collect()
    }
    # bucket of a term: first 60 bits of md5 % dim (mirror in python)
    import hashlib

    def bucket(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % dim

    n = 4

    def idf(df):
        return round(math.log((n + 1) / (df + 1)) + 1, 6)

    v1 = [0.0] * dim
    v1[bucket("spark")] += round(2 * idf(2), 6)
    v1[bucket("join")] += round(1 * idf(2), 6)
    assert out[1] == pytest.approx(v1, abs=1e-12)
    assert out[4] == [0.0] * dim  # empty doc -> zero vector
    assert len(out) == 4


def test_duckdb_twin_on_real_docs(spark):
    dim = 32
    docs = load_table(spark, SF_DIR, "documents")
    got = {
        r["doc_id"]: r["tfidf"]
        for r in hashed_tfidf(docs, dim=dim).collect()
    }
    n = docs.count()
    want = dict(
        duckdb.connect().execute(
            f"""
WITH docs AS (SELECT doc_id, text
              FROM read_parquet('{SF_DIR}/documents.parquet')),
toks AS (
  SELECT doc_id,
    unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
  FROM docs),
toks2 AS (SELECT * FROM toks WHERE term != ''),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks2 GROUP BY term),
idf AS (SELECT term, round(ln(({n}+1) / (df + 1.0)) + 1, 6) AS idf FROM df),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks2 GROUP BY 1, 2),
w AS (
  SELECT doc_id,
    CAST('0x' || substring(md5(term), 1, 15) AS BIGINT) % {dim} AS bucket,
    CAST(round(tf * idf, 6) AS DECIMAL(25,6)) AS w
  FROM tf JOIN idf USING (term)),
pb AS (SELECT doc_id, bucket, sum(w) AS w FROM w GROUP BY 1, 2),
m AS (SELECT doc_id, map(list(bucket), list(CAST(w AS DOUBLE))) AS m
      FROM pb GROUP BY doc_id)
SELECT d.doc_id,
  coalesce([coalesce(m.m[i][1], 0.0) FOR i IN range({dim})],
           [0.0 FOR i IN range({dim})]) AS v
FROM docs d LEFT JOIN m ON m.doc_id = d.doc_id"""
        ).fetchall()
    )
    assert set(got) == set(want)
    for k in got:
        assert got[k] == pytest.approx(want[k], abs=0.0)


def test_frozen_idf_application(spark, docs):
    """A stream scored against a FROZEN idf: unseen terms drop out."""
    idf = idf_table(docs)
    stream = spark.createDataFrame(
        [(10, "spark quantum")], "doc_id long, text string"
    )
    [r] = hashed_tfidf(stream, dim=8, idf=idf).collect()
    assert sum(1 for x in r["tfidf"] if x != 0.0) == 1  # only 'spark'


def test_kmeans_over_text_composition(spark):
    """tfidf -> spherical kmeans recovers the two synthetic topics."""
    from globalweather_etl_spark.operators.kmeans import (
        assign_clusters,
        fit_kmeans,
    )

    rows = [
        (i, "spark shuffle partition join executor task stage")
        for i in range(10)
    ] + [
        (100 + i, "violin cello sonata orchestra tempo concerto aria")
        for i in range(10)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    vecs = hashed_tfidf(docs, dim=64)
    cents = fit_kmeans(vecs, 2, id_col="doc_id", vec_col="tfidf")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in assign_clusters(
            vecs, cents, id_col="doc_id", vec_col="tfidf"
        ).collect()
    }
    spark_cluster = {got[i] for i in range(10)}
    music_cluster = {got[100 + i] for i in range(10)}
    assert len(spark_cluster) == 1 and len(music_cluster) == 1
    assert spark_cluster != music_cluster


def test_errors(docs):
    with pytest.raises(ValueError):
        hashed_tfidf(docs, dim=0)
