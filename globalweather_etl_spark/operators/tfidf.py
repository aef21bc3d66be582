"""Hashed TF-IDF vectors — embedding-free text vectorization.

Bridges the lexical and vector halves of the engine: `operators.bm25`
scores query/document pairs, but clustering (`operators.kmeans`),
semantic dedup (`operators.semdedup`), and ANN (`operators.similarity`)
all want a fixed-width vector per document.  The classic
no-model answer is the feature-hashing trick (public formulation:
Weinberger et al. 2009) over TF-IDF weights: term -> md5 % dim bucket,
weight = tf * idf, summed per bucket into a dense array<double>.

Engine-portable determinism (the house rules): md5 bucket hashing,
idf = round(ln((N+1)/(df+1)) + 1, 6) (smooth idf, 6dp so a last-ulp
ln divergence can't change the value), per-bucket weights are sums of
6dp-rounded tf*idf terms accumulated as DECIMAL — the final vector is
a pure function of the corpus, bit-identical in DuckDB (parity-tested).

Scale shape (100 TB): ONE token explode feeding two hash aggregates
(per-doc tf, corpus df — both map-side combined), one equi-join of the
token stream against the term-idf table keyed on the term (the idf
table is |vocab|-sized — broadcast if it fits, shuffle-join if not),
then a per-doc aggregate assembling the dense vector.  No UDFs; the
dense assembly is map_from_entries + a sequence transform, all
codegen-friendly built-ins.  `dim` bounds the output row width
(dim * 8 bytes per doc) independent of vocabulary size — the entire
point of the hashing trick at web scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from globalweather_etl_spark.functions.text import tokens
from globalweather_etl_spark.operators.dedup import _md5_long

__all__ = ["idf_table", "hashed_tfidf"]


def idf_table(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(term, df, idf) over the lowercased whitespace vocabulary;
    smooth idf = round(ln((N+1)/(df+1)) + 1, 6) — always positive, so
    hash-bucket sums can't silently cancel."""
    n_docs = docs.count()
    return (
        docs.select(
            F.col(id_col).alias("__id"),
            F.explode(
                F.array_distinct(tokens(F.lower(F.col(text_col))))
            ).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .withColumn(
            "idf",
            F.round(
                F.log(
                    (F.lit(float(n_docs + 1)))
                    / (F.col("df").cast("double") + F.lit(1.0))
                )
                + F.lit(1.0),
                6,
            ),
        )
    )


def hashed_tfidf(
    docs: DataFrame,
    dim: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    idf: DataFrame | None = None,
    out_col: str = "tfidf",
) -> DataFrame:
    """(id, tfidf array<double>[dim]): feature-hashed TF-IDF vectors.

    ``idf`` defaults to `idf_table(docs)` — pass a precomputed table to
    vectorize a stream against a frozen training-corpus vocabulary
    (the production shape: idf is fit once, applied everywhere).
    Empty/NULL docs yield the all-zero vector."""
    if dim < 1:
        raise ValueError("dim must be >= 1")
    if idf is None:
        idf = idf_table(docs, id_col, text_col)
    tf = (
        docs.select(
            F.col(id_col).alias("__id"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("__id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    weighted = tf.join(idf.select("term", "idf"), "term").select(
        "__id",
        (_md5_long(F.col("term")) % F.lit(dim)).alias("bucket"),
        F.round(F.col("tf").cast("double") * F.col("idf"), 6)
        .cast("decimal(25,6)")
        .alias("w"),
    )
    per_bucket = weighted.groupBy("__id", "bucket").agg(
        F.sum("w").alias("w")
    )
    assembled = (
        per_bucket.groupBy("__id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("bucket", "w"))
            ).alias("__m")
        )
        .select(
            "__id",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(
                    F.col("__m")[i].cast("double"), F.lit(0.0)
                ),
            ).alias(out_col),
        )
    )
    zero = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)), lambda _: F.lit(0.0)
    )
    return (
        docs.select(F.col(id_col))
        .join(assembled, F.col(id_col) == F.col("__id"), "left")
        .select(
            id_col,
            F.coalesce(F.col(out_col), zero).alias(out_col),
        )
    )
