"""Constant-row source: a FROM-less SELECT of literals (reference uses it
for DIM_SOURCE, ETL:77-82)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def constant_rows(
    spark: SparkSession, rows: list[dict], schema: str | None = None
) -> DataFrame:
    """Build a small literal DataFrame. For the single-row case we use
    spark.range(1).select(lit(...)) so the plan is a pure LocalRelation —
    no RDD, broadcastable by size."""
    if len(rows) == 1 and schema is None:
        row = rows[0]
        return spark.range(1).select(
            *[F.lit(v).alias(k) for k, v in row.items()]
        )
    return spark.createDataFrame(rows, schema=schema)
