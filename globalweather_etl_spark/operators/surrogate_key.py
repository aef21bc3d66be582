"""Dense surrogate-key assignment (reference: ROW_NUMBER() OVER (ORDER BY
POSTAL_CODE, CITY_NAME, COUNTRY), ETL:38-39).

Two strategies producing IDENTICAL output:

- ``row_number``: reference-faithful single window. An unpartitioned
  window forces every row through one task — fine for dimension-sized
  inputs (<= a few million rows), a deliberate non-starter at 100 TB.

- ``distributed``: exact, scale-safe two-pass. Range-partition by the
  order columns (global order across partitions), rank *within* each
  partition, then add per-partition prefix-sum offsets. Only the
  per-partition row counts (one long per partition) ever reach the
  driver. Same trick Spark itself uses for zipWithIndex, expressed with
  DataFrame ops so codegen still applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from globalweather_etl_spark.operators.partitioning import (
    deliberate_single_partition,
)


def surrogate_key(
    df: DataFrame,
    order_cols: list[str],
    key_col: str = "surrogate_key",
    strategy: str = "row_number",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a dense 1-based BIGINT key ordered by ``order_cols``.

    The ordering must be total (e.g. over distinct tuples) for the output
    to be deterministic — true for the reference's use (distinct
    POSTAL_CODE, CITY_NAME, COUNTRY tuples).

    NULL ordering is pinned to NULLS LAST in both strategies: Spark's
    default ASC is NULLS FIRST, but the reference engine (Snowflake) and
    the DuckDB oracle both default to NULLS LAST — without the pin, a
    NULL in any order column would silently shift every assigned key.
    """
    if strategy == "row_number":
        w = Window.orderBy(*[F.asc_nulls_last(c) for c in order_cols])
        return df.withColumn(key_col, F.row_number().over(w).cast("long"))
    if strategy == "distributed":
        return _surrogate_key_distributed(df, order_cols, key_col, num_partitions)
    raise ValueError(f"unknown surrogate_key strategy: {strategy!r}")


def _surrogate_key_distributed(
    df: DataFrame,
    order_cols: list[str],
    key_col: str,
    num_partitions: int | None,
) -> DataFrame:
    sess = df.sparkSession
    n = num_partitions or int(sess.conf.get("spark.sql.shuffle.partitions", "200"))
    ranged = df.repartitionByRange(
        n, *[F.asc_nulls_last(c) for c in order_cols]
    ).withColumn("__pid", F.spark_partition_id())
    # MATERIALIZE: the local-rank branch and the offsets branch both
    # consume `ranged`, and exchange reuse is NOT guaranteed across
    # the broadcast side's separate job — if each branch re-executes
    # repartitionByRange over an upstream whose intra-partition row
    # order varies between jobs, the sampled range boundaries can
    # differ and __pid means different ranges per branch, silently
    # corrupting every key after the first divergence. The same bug
    # class was OBSERVED in pack_by_budget at sf0.1 (commit 47bf95b);
    # the persist pins one materialization for both branches (and
    # saved ~35% of that operator's wall — one range shuffle, not two).
    ranged = ranged.persist(StorageLevel.MEMORY_AND_DISK)
    # Partition-local rank: the window partitions by __pid, so no single
    # task ever sees more than one range-partition of rows.
    w = Window.partitionBy("__pid").orderBy(
        *[F.asc_nulls_last(c) for c in order_cols]
    )
    local = ranged.withColumn("__local_rn", F.row_number().over(w).cast("long"))
    # Offsets = exclusive prefix sum of per-partition counts, computed
    # IN-PLAN (no driver collect): the count aggregate has one row per
    # partition, so the running-sum window touches only #partitions rows
    # in a single trivial task — single-partition BY DESIGN, marked with
    # deliberate_single_partition so the WindowExec warning stays
    # reserved for genuine regressions. Both branches read the persisted
    # ranged blocks (see above — ReuseExchange alone is not a guarantee
    # across the broadcast side's job), and nothing scales with row
    # count on the driver.
    offsets = (
        ranged.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__cnt").over(
                    Window.partitionBy(deliberate_single_partition())
                    .orderBy("__pid")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("long"),
        )
        .drop("__cnt")
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(key_col, (F.col("__local_rn") + F.col("__offset")).cast("long"))
        .drop("__pid", "__local_rn", "__offset")
    )
