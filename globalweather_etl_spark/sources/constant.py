"""Constant-row source: a FROM-less SELECT of literals (reference uses it
for DIM_SOURCE, ETL:77-82)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def constant_rows(
    spark: SparkSession, rows: list[dict], schema: str | None = None
) -> DataFrame:
    """Build a small literal DataFrame. Column order follows the FIRST
    row's key order regardless of row count (createDataFrame's dict
    inference would sort keys alphabetically, silently changing the
    shape between the 1-row and n-row paths). NULL literals require an
    explicit `schema` — an untyped None has no usable Spark type.

    The single-row untyped case builds via range(1).select(lit(...)):
    a pure LocalRelation — no RDD, broadcastable by size."""
    if not rows:
        raise ValueError("constant_rows needs at least one row")
    cols = list(rows[0])
    if schema is None and any(v is None for r in rows for v in r.values()):
        raise ValueError(
            "NULL literals need an explicit schema (untyped None would "
            "produce an unusable VOID column)"
        )
    if len(rows) == 1 and schema is None:
        row = rows[0]
        return spark.range(1).select(
            *[F.lit(row[k]).alias(k) for k in cols]
        )
    df = spark.createDataFrame(rows, schema=schema)
    return df.select(*cols) if schema is None else df
