"""Token-budget document packing (LLM training prep).

Group documents into bins of ~budget tokens so each training sequence
is filled: deterministic ordering, exclusive running token total,
bin = total div budget. A document straddling a boundary overflows its
bin by less than one document — the standard streaming approximation of
bin packing (exact first-fit is inherently sequential; this form is a
distributed prefix sum and scales to any corpus).

The prefix sum uses the same two-pass shape as the distributed
surrogate key (operators/surrogate_key.py): range-partition by the
total order, partition-local running sums, per-partition token totals
prefix-summed in-plan (a window over #partitions rows) — no
single-partition window, no driver data. The result is a pure function
of (keys, seed-order, budget): identical on any cluster and mirrored
exactly by a plain windowed cumsum in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from globalweather_etl_spark.operators.partitioning import (
    deliberate_single_partition,
)


def pack_by_budget(
    df: DataFrame,
    id_col: str,
    tokens_col: Column,
    budget: int,
    order_key: Column | None = None,
    num_partitions: int | None = None,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Assign (bin_id, bin_offset) to every document.

    order_key defaults to md5(id) — a deterministic shuffle so bins mix
    content. bin_offset is the document's starting token position within
    its bin's running total (diagnostics / sequence layout).

    partition_cols packs each group independently (bins never straddle
    groups — e.g. train/val/test splits) in ONE scan: the range
    exchange keys on (groups, order), the prefix sums restart per
    group, and the per-range totals are prefix-summed per group. The
    per-group output is bit-identical to filtering that group out and
    packing it alone, because the order key is group-independent.
    """
    sess = df.sparkSession
    n = num_partitions or int(sess.conf.get("spark.sql.shuffle.partitions", "200"))
    okey = order_key if order_key is not None else F.md5(F.col(id_col).cast("string"))
    pcols = list(partition_cols or [])
    base = df.select(
        *pcols,
        F.col(id_col),
        tokens_col.cast("long").alias("n_tokens"),
        okey.alias("__ok"),
    )
    # Range-partition on (groups, order): each group's rows are
    # contiguous in the composite order, so partition-local running
    # sums per (range, group) compose with per-group range offsets.
    ranged = base.repartitionByRange(
        n, *[F.col(c) for c in pcols], F.col("__ok"), F.col(id_col)
    ).withColumn("__pid", F.spark_partition_id())
    # MATERIALIZE the range partitioning: two plan branches consume
    # `ranged` (the offsets aggregate and the final join's left side),
    # and without a persist each branch re-executes repartitionByRange
    # INDEPENDENTLY. The range boundaries come from sampling the
    # upstream rows by position, and after a shuffle-heavy upstream
    # (e.g. the curation pipeline) intra-partition row order is not
    # run-stable — so the two evaluations can draw DIFFERENT
    # boundaries, making __pid mean different ranges in the two
    # branches and silently corrupting offsets (caught at sf0.1 by the
    # cross-engine check: ~1.2k shifted bin assignments, intermittent).
    # Persisting pins one materialization; both branches read the same
    # blocks. At cluster scale this is the operator's working set for
    # the duration of one job — the same trade as the dedup index cache.
    ranged = ranged.persist(StorageLevel.MEMORY_AND_DISK)
    w_local = (
        Window.partitionBy("__pid", *pcols)
        .orderBy("__ok", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_prior = F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0))
    # Without groups this window is deliberately single-partition over
    # #partitions rows (see deliberate_single_partition): plan-identical
    # but suppresses the WindowExec warning so that warning stays a
    # genuine-regression signal. With groups it partitions per group
    # (n * n_groups rows total — still tiny).
    w_offset = (
        Window.partitionBy(*(pcols or [deliberate_single_partition()]))
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        ranged.groupBy("__pid", *pcols)
        .agg(F.sum("n_tokens").alias("__ptot"))
        .withColumn(
            "__offset",
            F.coalesce(F.sum("__ptot").over(w_offset), F.lit(0)).cast("long"),
        )
        .drop("__ptot")
    )
    prior = (local_prior + F.col("__offset")).cast("long")
    return (
        ranged.join(F.broadcast(offsets), ["__pid", *pcols])
        .select(
            *pcols,
            F.col(id_col),
            F.col("n_tokens"),
            F.floor(prior / F.lit(budget)).cast("long").alias("bin_id"),
            (prior % F.lit(budget)).alias("bin_offset"),
        )
    )


def materialize_sequences(
    df: DataFrame,
    text_col: str,
    bin_cols: list[str] | None = None,
    offset_col: str = "bin_offset",
    sep: str = "\n\n",
) -> DataFrame:
    """Turn pack_by_budget's bin assignment into the training sequences
    a loader actually reads: ONE row per bin with the member documents'
    text concatenated in offset order (separator between documents —
    the EOD marker slot), plus member/token accounting. Input is the
    packed frame joined back to its text column.

    Scale shape: one aggregate keyed on the bin id (high cardinality —
    corpus_tokens / budget bins), offset order restored per bin by the
    same array_sort(collect_list(struct(...))) reassembly the line-dedup
    operator uses; a bin's payload is ~budget tokens by construction,
    so per-group state is bounded by the packing budget, not the
    corpus."""
    bin_cols = bin_cols or ["bin_id"]
    return df.groupBy(*bin_cols).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col(offset_col).alias("o"),
                            F.col(text_col).alias("t"),
                        )
                    )
                ),
                lambda s: s["t"],
            ),
        ).alias("seq_text"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens_total"),
    )
