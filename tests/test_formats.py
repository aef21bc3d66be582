"""JSONL / CSV ingestion: round-trip vs parquet, corrupt quarantine."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from globalweather_etl_spark.sources.formats import (
    CORRUPT_COL,
    corrupt_count,
    drop_corrupt,
    read_csv,
    read_jsonl,
    write_jsonl,
)
from globalweather_etl_spark.sources.registry import load_table

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


def test_jsonl_roundtrip_matches_parquet(spark, tmp_path):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "lang", "text"
    )
    path = os.path.join(str(tmp_path), "docs_jsonl")
    write_jsonl(docs, path, partitions=2)
    back = read_jsonl(spark, path, DOC_SCHEMA)
    assert corrupt_count(back) == 0
    clean = drop_corrupt(back)
    a = {(r["doc_id"], r["lang"], r["text"]) for r in docs.collect()}
    b = {(r["doc_id"], r["lang"], r["text"]) for r in clean.collect()}
    assert a == b


def test_jsonl_corrupt_quarantine(spark, tmp_path):
    path = os.path.join(str(tmp_path), "mixed.jsonl")
    with open(path, "w") as f:
        f.write('{"doc_id": 1, "lang": "en", "text": "ok"}\n')
        f.write("THIS IS NOT JSON\n")
        f.write('{"doc_id": 2, "lang": "de", "text": "auch ok"}\n')
    df = read_jsonl(spark, path, DOC_SCHEMA)
    assert corrupt_count(df) == 1
    clean = drop_corrupt(df)
    assert CORRUPT_COL not in clean.columns
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2]
    # strict mode fails the job on the same file
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    with pytest.raises((Py4JJavaError, PySparkException)):
        read_jsonl(spark, path, DOC_SCHEMA, strict=True).collect()


def test_csv_roundtrip_and_quarantine(spark, tmp_path):
    path = os.path.join(str(tmp_path), "docs.csv")
    with open(path, "w") as f:
        f.write("doc_id,lang,text\n")
        f.write('1,en,"hello, world"\n')
        f.write('not_a_number,en,broken\n')
        f.write("2,fr,bonjour\n")
    df = read_csv(spark, path, DOC_SCHEMA)
    assert corrupt_count(df) == 1
    clean = drop_corrupt(df)
    rows = {r["doc_id"]: (r["lang"], r["text"]) for r in clean.collect()}
    assert rows == {1: ("en", "hello, world"), 2: ("fr", "bonjour")}


def test_jsonl_schema_prunes_extra_fields(spark, tmp_path):
    """Fields absent from the declared schema are ignored, not errors —
    and missing declared fields arrive NULL (drift is visible, not
    fatal)."""
    path = os.path.join(str(tmp_path), "drift.jsonl")
    with open(path, "w") as f:
        f.write('{"doc_id": 1, "lang": "en", "text": "a", "extra": 99}\n')
        f.write('{"doc_id": 2, "text": "no lang"}\n')
    clean = drop_corrupt(read_jsonl(spark, path, DOC_SCHEMA))
    rows = {r["doc_id"]: (r["lang"], r["text"]) for r in clean.collect()}
    assert rows == {1: ("en", "a"), 2: (None, "no lang")}
    assert "extra" not in clean.columns


def test_clean_frame_count_is_legal(spark, tmp_path):
    """drop_corrupt(...).count() must not trip Spark's
    QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction."""
    path = os.path.join(str(tmp_path), "ok.jsonl")
    with open(path, "w") as f:
        f.write('{"doc_id": 1, "lang": "en", "text": "ok"}\n')
        f.write("broken line\n")
    assert drop_corrupt(read_jsonl(spark, path, DOC_SCHEMA)).count() == 1


def test_csv_strict_mode_fails_on_corrupt(spark, tmp_path):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    path = os.path.join(str(tmp_path), "bad.csv")
    with open(path, "w") as f:
        f.write("doc_id,lang,text\n")
        f.write("xx,en,broken\n")
    with pytest.raises((Py4JJavaError, PySparkException)):
        read_csv(spark, path, DOC_SCHEMA, strict=True).collect()


def test_orc_roundtrip_matches_parquet(spark, tmp_path):
    from globalweather_etl_spark.sources.formats import read_orc, write_orc

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    path = os.path.join(str(tmp_path), "docs_orc")
    write_orc(docs, path, partitions=2)
    back = read_orc(spark, path, expected_schema=docs.schema)
    assert back.count() == docs.count()
    a = {tuple(r) for r in docs.select("doc_id", "lang", "n_chars").collect()}
    b = {tuple(r) for r in back.select("doc_id", "lang", "n_chars").collect()}
    assert a == b


def test_orc_schema_drift_fails_loudly(spark, tmp_path):
    import pytest

    from globalweather_etl_spark.sources.formats import read_orc, write_orc

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    path = os.path.join(str(tmp_path), "docs_orc2")
    write_orc(docs.select("doc_id", "lang"), path)
    wrong = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.IntegerType()),  # drifted type
        ]
    )
    with pytest.raises(ValueError, match="schema drift"):
        read_orc(spark, path, expected_schema=wrong)


def test_orc_scan_pushes_filters_and_prunes_columns(spark, tmp_path):
    from globalweather_etl_spark.sources.formats import read_orc, write_orc

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    path = os.path.join(str(tmp_path), "docs_orc3")
    write_orc(docs, path)
    q = (
        read_orc(spark, path)
        .filter(F.col("lang") == "en")
        .select("doc_id", "n_chars")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "lang" in plan.split("PushedFilters")[1][:80]
    rs = plan.split("ReadSchema")[1][:120]
    assert "text" not in rs  # the wide column never leaves the scan


def test_orc_hive_partition_pruning(spark, tmp_path):
    from globalweather_etl_spark.sources.formats import read_orc, write_orc

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    path = os.path.join(str(tmp_path), "docs_orc4")
    write_orc(docs, path, partition_by=["lang"])
    langs = [
        r["lang"]
        for r in read_orc(spark, path).select("lang").distinct().collect()
    ]
    assert len(langs) > 1
    one = read_orc(spark, path).filter(F.col("lang") == langs[0])
    plan = one._jdf.queryExecution().executedPlan().toString()
    # partition filter handled by pruning, not a data filter
    assert one.count() == docs.filter(F.col("lang") == langs[0]).count()
    assert "PartitionFilters: [" in plan
