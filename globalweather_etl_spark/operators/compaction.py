"""Small-file compaction for parquet tables.

Long-lived warehouses accumulate small files (incremental loads,
streaming sinks, per-task partitionBy writes); scans then pay per-file
open/footer costs and the driver pays listing time. Compaction rewrites
a table's files into ~target-sized files, preserving rows, schema, and
partition directories.

Scale design:
- File inventory comes from the Hadoop FileSystem API, so any scheme
  (file:/, hdfs://, s3a://) works — consistent with
  plans.pipeline.materialize_fact_incremental's retraction.
- Output file counts derive from ACTUAL byte sizes, per partition
  directory for partitioned tables: each partition is rewritten into
  ceil(bytes / target_file_bytes) files via a (partition, salt) hash
  repartition — one shuffle, no sampling pass, partition-pruned reads
  untouched.
- The rewrite goes to a sibling temp directory first, then swaps via
  FS rename: the source is never read and overwritten in the same job
  (Spark cannot safely overwrite its own input). Rename is atomic on
  HDFS/local; on S3 it is a copy — for object stores prefer compacting
  into a NEW table path and flipping the catalog pointer.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass(frozen=True)
class CompactionReport:
    files_before: int
    files_after: int
    bytes_total: int
    partitions: int


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def _list_data_files(fs, hpath, jvm) -> list:
    """All parquet data files under a table root (recursive), skipping
    hidden/metadata entries (_SUCCESS, .crc)."""
    out = []
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        out.append(st)
    return out


def _partition_dir(root: str, file_path: str) -> str:
    """Relative partition directory of a data file ('' if unpartitioned)."""
    rel = os.path.relpath(os.path.dirname(file_path), root)
    return "" if rel == "." else rel


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_cols: list[str] | None = None,
) -> CompactionReport:
    """Rewrite the parquet table at ``path`` into ~target-sized files.

    partition_cols: the table's partitionBy columns, if any — partition
    directory layout is preserved and each partition is sized
    independently from its actual bytes. Rows and schema are unchanged
    (verified by tests); file boundaries and intra-file row order are
    not part of a table's contract.
    """
    fs, hpath, jvm = _fs_and_path(spark, path)
    files = _list_data_files(fs, hpath, jvm)
    if not files:
        raise ValueError(f"no data files under {path}")
    root = hpath.toUri().getPath()
    by_partition: dict[str, int] = {}
    for st in files:
        pdir = _partition_dir(root, st.getPath().toUri().getPath())
        by_partition[pdir] = by_partition.get(pdir, 0) + st.getLen()
    bytes_total = sum(by_partition.values())

    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compact_tmp"
    if partition_cols:
        # Per-partition output sizing: salt count = ceil(bytes/target)
        # from the real on-disk size of that partition directory. The
        # mapping is #partitions rows — broadcast it.
        def _n_files(nbytes: int) -> int:
            return max(1, math.ceil(nbytes / target_file_bytes))

        # partition dir 'DATE_KEY=2020-01-01/...' -> key values in dir
        # order; joined back on the stringified column values (hive
        # directory names ARE the string renderings).
        salt_rows = []
        for pdir, nbytes in by_partition.items():
            values = [seg.split("=", 1)[1] for seg in pdir.split("/") if "=" in seg]
            salt_rows.append((*values, _n_files(nbytes)))
        schema = (
            ", ".join(f"`__p_{c}` string" for c in partition_cols) + ", `__n` int"
        )
        salts = spark.createDataFrame(salt_rows, schema)
        cond = F.lit(True)
        for c in partition_cols:
            cond = cond & (F.col(c).cast("string") == F.col(f"__p_{c}"))
        data_cols = df.columns
        salted = df.join(F.broadcast(salts), cond, "left").withColumn(
            "__salt",
            F.pmod(F.xxhash64(*data_cols), F.coalesce(F.col("__n"), F.lit(1))),
        )
        (
            salted.repartition(*[F.col(c) for c in partition_cols], F.col("__salt"))
            .select(*data_cols)
            .write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(tmp)
        )
    else:
        n = max(1, math.ceil(bytes_total / target_file_bytes))
        df.repartition(n).write.mode("overwrite").parquet(tmp)

    # swap: remove original, rename tmp into place
    tmp_path = jvm.org.apache.hadoop.fs.Path(tmp)
    fs.delete(hpath, True)
    fs.rename(tmp_path, hpath)

    after = _list_data_files(fs, hpath, jvm)
    return CompactionReport(
        files_before=len(files),
        files_after=len(after),
        bytes_total=bytes_total,
        partitions=len(by_partition),
    )
