"""Training-shard writer: the sink end of the curation pipeline.

Trainers consume corpora as directories of bounded-size shards, laid
out by split, with deterministic shard membership (a resumable run
must re-produce byte-identical shard assignment). This writer maps the
curation output (split + bin_id from pack_by_budget) onto files:

- layout: <out>/split=<name>/part-*.parquet (partitionBy split)
- shard membership: shard_id = bin_id // bins_per_shard — packing bins
  are already deterministic and token-bounded, so shards inherit both
  properties; repartitioning by (split, shard_id) makes file contents
  a pure function of the data.
- file sizing: one file per (split, shard_id) task via
  maxRecordsPerFile as a backstop.

Scale shape: one exchange keyed by (split, shard_id) — high
cardinality by construction (total_tokens / (budget * bins_per_shard)
keys), then a parallel write. No global sort, no driver data path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def shard_id_col(bin_col: str, bins_per_shard: int) -> Column:
    """The shard-membership expression write_shards keys files by:
    shard_id = bin_id // bins_per_shard (double-divide + long cast,
    truncation — bin ids are non-negative)."""
    return (F.col(bin_col) / F.lit(bins_per_shard)).cast("long")


def shard_assignment(
    df: DataFrame,
    bins_per_shard: int = 64,
    split_col: str | None = None,
    bin_col: str = "bin_id",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Shard assignment + manifest columns as a pure plan (no I/O):
    every row gains the shard_id write_shards would file it under and
    its shard's manifest aggregates (shard_rows, shard_tokens — what
    shard_manifest reads back from the written directory). Lets the
    assignment and manifest math be checked cross-engine without a
    filesystem round-trip; the writer's physical layout stays covered
    by the round-trip tests.

    Scale shape: one window over the (split, shard_id) key — the same
    exchange write_shards pays to co-locate shard files.
    """
    keys = ([split_col] if split_col else []) + ["shard_id"]
    out = df.withColumn("shard_id", shard_id_col(bin_col, bins_per_shard))
    w = Window.partitionBy(*keys)
    return out.withColumn(
        "shard_rows", F.count(F.lit(1)).over(w).cast("long")
    ).withColumn("shard_tokens", F.sum(token_col).over(w).cast("long"))


def write_shards(
    curated: DataFrame,
    out_dir: str,
    bins_per_shard: int = 64,
    max_records_per_file: int = 1_000_000,
    split_col: str = "split",
    bin_col: str = "bin_id",
) -> None:
    """Write a curated corpus (must carry `split` and `bin_id`
    columns, e.g. CurationResult.curated) as split-partitioned,
    shard-keyed parquet."""
    sharded = curated.withColumn(
        "shard_id", shard_id_col(bin_col, bins_per_shard)
    )
    (
        sharded.repartition(F.col(split_col), F.col("shard_id"))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(split_col)
        .parquet(out_dir)
    )


def shard_manifest(
    spark, out_dir: str, token_col: str = "n_tokens"
) -> DataFrame:
    """Manifest of a written shard directory: one row per (split,
    shard_id) with row count and token sum (when the shards carry a
    token-count column) — what a trainer's data loader reads to plan
    epochs without scanning payloads.

    Cost: one column-pruned scan of the shard parquet (row counts come
    from footers when only counting); output is shard-count sized.
    """
    df = spark.read.parquet(out_dir)
    aggs = [F.count("*").cast("long").alias("n_rows")]
    if token_col in df.columns:
        aggs.append(F.sum(token_col).cast("long").alias("total_tokens"))
    return (
        df.groupBy("split", "shard_id")
        .agg(*aggs)
        .orderBy("split", "shard_id")
    )
