"""compact_parquet: rows/schema preserved, file counts bounded by actual
bytes, partition directories kept, any-scheme FS path handling."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.compaction import compact_parquet


def _files(path: str) -> list[str]:
    return [
        f
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if not os.path.basename(f).startswith(("_", "."))
    ]


@pytest.fixture()
def fragmented(spark, tmp_path):
    path = str(tmp_path / "frag")
    df = spark.range(10_000).select(
        F.col("id"),
        (F.col("id") % 7).alias("grp"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    df.repartition(40).write.mode("overwrite").parquet(path)
    return path, df


def test_unpartitioned_compaction_preserves_rows(spark, fragmented):
    path, df = fragmented
    before = len(_files(path))
    assert before == 40
    on_disk = spark.read.parquet(path)
    expected = sorted(on_disk.collect())
    disk_schema = on_disk.schema
    report = compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert report.files_before == 40
    assert report.files_after == 1  # everything fits one target-sized file
    assert len(_files(path)) == 1
    got = spark.read.parquet(path)
    assert sorted(got.collect()) == expected
    assert got.schema == disk_schema


def test_unpartitioned_target_sizing(spark, fragmented):
    path, _ = fragmented
    total = sum(os.path.getsize(f) for f in _files(path))
    # target of ~1/3 the table -> ceil gives 3-4 output files
    report = compact_parquet(spark, path, target_file_bytes=max(1, total // 3))
    assert 3 <= report.files_after <= 4
    assert report.bytes_total > 0


def test_partitioned_compaction_keeps_directories(spark, tmp_path):
    path = str(tmp_path / "part")
    df = spark.range(5_000).select(
        F.col("id"),
        (F.col("id") % 3).alias("part"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    df.repartition(10).write.mode("overwrite").partitionBy("part").parquet(path)
    before_dirs = sorted(os.listdir(path))
    assert len(_files(path)) > 3
    expected = sorted(df.select("id", "payload", "part").collect())
    report = compact_parquet(
        spark, path, target_file_bytes=1 << 30, partition_cols=["part"]
    )
    assert report.partitions == 3
    assert report.files_after == 3  # one file per partition at huge target
    after_dirs = sorted(d for d in os.listdir(path) if d.startswith("part="))
    assert after_dirs == [d for d in before_dirs if d.startswith("part=")]
    got = spark.read.parquet(path).select("id", "payload", "part")
    assert sorted(got.collect()) == expected


def test_empty_table_raises(spark, tmp_path):
    p = tmp_path / "empty"
    p.mkdir()
    with pytest.raises(ValueError, match="no data files"):
        compact_parquet(spark, str(p))
