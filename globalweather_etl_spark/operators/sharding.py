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

from pyspark.sql import DataFrame, functions as F


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
        "shard_id", (F.col(bin_col) / F.lit(bins_per_shard)).cast("long")
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
