"""Aggregation-backed repetition statistics (Gopher quality filters).

The scan-stage kernel (functions/text.py) covers the repetition signals
expressible per row: duplicate-word and duplicate-line fractions. The
remaining Gopher filter — "fraction of n-grams occupied by the most
frequent n-gram" — needs a per-(doc, gram) count, i.e. an aggregation,
so it lives here as an operator.

Scale shape: explode -> two hash aggregates keyed on (doc_id, gram)
then (doc_id). Both keys are high-cardinality (no hot reducer), both
aggregates map-side combine, and there are no joins — the corpus is
shuffled once at (doc, gram) grain, which is the information the
statistic needs. Public background: Rae et al., "Scaling Language
Models: Methods, Analysis & Insights from Training Gopher" (2021),
table A1 repetition filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from globalweather_etl_spark.functions.text import word_shingles


def top_ngram_stats(
    df: DataFrame, id_col: str, text_col: str, n: int = 2
) -> DataFrame:
    """Per-document top-n-gram concentration: (id, n_ngrams,
    top_ngram_count, top_ngram_frac) where top_ngram_frac is the share
    of the document's word n-grams taken by its single most frequent
    n-gram. High values mark templated/degenerate text.

    Documents with fewer than n tokens emit no row (they have no
    n-grams); callers wanting full coverage left-join and coalesce.
    """
    from globalweather_etl_spark.operators.partitioning import (
        spread_for_compute,
    )

    # A single-split input would pin the explode + map-side combine to
    # one core (measured 5x the whole operator at sf0.1); exact no-op
    # when the input already has >= defaultParallelism partitions.
    df = spread_for_compute(df)
    grams = df.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("gram")
    )
    per_gram = grams.groupBy(id_col, "gram").agg(F.count("*").alias("c"))
    return (
        per_gram.groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_ngrams"),
            F.max("c").cast("long").alias("top_ngram_count"),
        )
        .withColumn(
            "top_ngram_frac",
            F.col("top_ngram_count").cast("double")
            / F.col("n_ngrams").cast("double"),
        )
    )
