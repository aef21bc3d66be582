"""Partition-layout helpers shared by compute-heavy operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_compute(df: DataFrame, *keys: str) -> DataFrame:
    """Ensure at least defaultParallelism partitions before a
    compute-bound stage (shingle hashing, signature folds, vector math).

    Small inputs often arrive as a single parquet split, which would pin
    every downstream narrow transformation to one core. At cluster scale
    the input partition count already exceeds parallelism and this is an
    exact no-op — no shuffle is ever added on the 100 TB path. When keys
    are given, the spread is hash-partitioned on them so a downstream
    groupBy/join on the same keys can reuse the exchange.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *keys) if keys else df.repartition(target)
