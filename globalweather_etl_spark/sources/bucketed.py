"""Bucketed managed tables: shuffle-free big-to-big equi-joins.

At 100 TB the lineitem-orders-shaped join cannot broadcast either side;
the scalable answer is to pay the shuffle ONCE at write time: bucket
both tables by the join key into the same bucket count, and every
subsequent join/groupBy on that key reads co-located buckets with no
Exchange in the plan (SortMergeJoin directly over bucketed scans).

This is the Spark-native equivalent of the reference warehouse's
clustering: a physical-layout decision made at CTAS time that queries
benefit from transparently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Materialize df as a managed parquet table bucketed (and
    bucket-sorted) on the join key. Bucket-local sort makes the
    downstream SortMergeJoin skip its sort as well."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key. With matching
    bucket counts Catalyst plans SortMergeJoin over the bucketed scans
    with ZERO Exchange operators — verified by tests/test_bucketed.py
    against the physical plan."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key])
