"""Bloom filter DataFrames + Bloom-screened incremental dedup.

Covers the three contractual guarantees (no false negatives, bounded
false-positive rate, bit-identity of the screened incremental dedup
with the unscreened one) plus merge algebra and a Python-reference
cross-check of the portable md5 bit positions.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.bloom import (
    bloom_build,
    bloom_merge,
    bloom_probe,
    empty_bloom,
    exact_dedup_incremental_bloom,
)
from globalweather_etl_spark.operators.dedup import exact_dedup_incremental

M = 1 << 14  # small filter so FP behavior is observable
K = 5


def _py_positions(value: str, num_bits: int, num_hashes: int) -> list[int]:
    """Reference implementation of the portable md5 position scheme."""
    return [
        int(hashlib.md5(f"bloom{i}|{value}".encode()).hexdigest()[:15], 16) % num_bits
        for i in range(num_hashes)
    ]


def _py_probe(words: dict[int, int], value: str) -> bool:
    return all(
        (words.get(p // 63, 0) >> (p % 63)) & 1 for p in _py_positions(value, M, K)
    )


def test_words_duckdb_parity(spark):
    """The Spark-built filter words are bit-identical to a DuckDB
    build over the same values — the 63-bit packing keeps every word
    a portable non-negative BIGINT."""
    import duckdb

    vals = [f"m{i}" for i in range(64)]
    df = spark.createDataFrame([(v,) for v in vals], "v STRING")
    got = sorted(tuple(r) for r in bloom_build(df, "v", M, K).collect())
    vv = ", ".join(f"('{v}')" for v in vals)
    want = sorted(
        duckdb.sql(
            f"""
WITH vals(v) AS (VALUES {vv}),
pos AS (
  SELECT (CAST('0x' || substring(md5('bloom' || i || '|' || v), 1, 15)
          AS BIGINT)) % {M} AS p
  FROM vals, unnest([0,1,2,3,4]) AS t(i)
)
SELECT p // 63 AS word_idx,
       bit_or(1::BIGINT << CAST(p % 63 AS INT)) AS bits
FROM pos GROUP BY 1"""
        ).fetchall()
    )
    assert got == want
    assert all(w >= 0 and b > 0 for w, b in got)


def _members(n):
    return [f"member-{i}" for i in range(n)]


def test_positions_match_python_reference(spark):
    df = spark.createDataFrame([("abc",), ("xyz",)], "v STRING")
    from globalweather_etl_spark.operators.bloom import _positions

    got = {
        r["v"]: r["pos"]
        for r in df.select("v", _positions(F.col("v"), M, K).alias("pos")).collect()
    }
    for v in ("abc", "xyz"):
        assert got[v] == _py_positions(v, M, K)


def test_no_false_negatives_and_python_parity(spark):
    members = _members(300)
    df = spark.createDataFrame([(m,) for m in members], "v STRING")
    bloom = bloom_build(df, "v", M, K)
    words = {r["word_idx"]: r["bits"] & ((1 << 64) - 1) for r in bloom.collect()}

    probed = bloom_probe(df, "v", bloom, M, K).collect()
    assert all(r["bloom_maybe"] for r in probed)
    # the Spark-built filter answers identically to the Python replica
    for m in members[:50]:
        assert _py_probe(words, m)


def test_false_positive_rate_tracks_bound(spark):
    n = 300
    members = spark.createDataFrame([(m,) for m in _members(n)], "v STRING")
    others = spark.createDataFrame(
        [(f"other-{i}",) for i in range(2000)], "v STRING"
    )
    bloom = bloom_build(members, "v", M, K)
    hits = (
        bloom_probe(others, "v", bloom, M, K)
        .agg(F.sum(F.col("bloom_maybe").cast("int")))
        .first()[0]
    )
    p = (1.0 - math.exp(-K * n / M)) ** K  # ~0.18% at these parameters
    # generous 5x headroom over the expected count; guards order-of-magnitude
    assert hits <= max(10, 5 * p * 2000)


def test_probe_nulls_and_empty_bloom(spark):
    df = spark.createDataFrame([("a",), (None,)], "v STRING")
    probed = {
        r["v"]: r["bloom_maybe"]
        for r in bloom_probe(df, "v", empty_bloom(spark), M, K).collect()
    }
    assert probed == {"a": False, None: False}


def test_merge_equals_joint_build(spark):
    a = spark.createDataFrame([(m,) for m in _members(100)], "v STRING")
    b = spark.createDataFrame([(f"b-{i}",) for i in range(100)], "v STRING")
    merged = bloom_merge(bloom_build(a, "v", M, K), bloom_build(b, "v", M, K))
    joint = bloom_build(a.unionByName(b), "v", M, K)
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in joint.collect()}


@pytest.fixture()
def batches(spark):
    rows1 = [(i, f"text-{i % 40}") for i in range(100)]  # heavy in-batch dup
    rows2 = [(100 + i, f"text-{i % 70}") for i in range(120)]  # overlaps batch 1
    rows3 = [(300 + i, f"fresh-{i}") for i in range(50)]  # all new
    mk = lambda rows: spark.createDataFrame(rows, "doc_id INT, text STRING")
    return mk(rows1), mk(rows2), mk(rows3)


def test_screened_matches_unscreened_fold(spark, batches):
    b1, b2, b3 = batches
    k1, h1 = exact_dedup_incremental(b1, None, "doc_id", "text")
    k2, h2 = exact_dedup_incremental(b2, h1, "doc_id", "text")
    k3, h3 = exact_dedup_incremental(b3, h2, "doc_id", "text")

    s1, g1, bl1 = exact_dedup_incremental_bloom(b1, None, None, "doc_id", "text", M, K)
    s2, g2, bl2 = exact_dedup_incremental_bloom(b2, g1, bl1, "doc_id", "text", M, K)
    s3, g3, bl3 = exact_dedup_incremental_bloom(b3, g2, bl2, "doc_id", "text", M, K)

    for plain, screened in [(k1, s1), (k2, s2), (k3, s3)]:
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, screened.collect())
        )
    for plain, screened in [(h1, g1), (h2, g2), (h3, g3)]:
        assert sorted(r[0] for r in plain.collect()) == sorted(
            r[0] for r in screened.collect()
        )
    # the maintained filter equals a fresh build over the final history
    rebuilt = bloom_build(g3, "fingerprint", M, K)
    assert {tuple(r) for r in bl3.collect()} == {tuple(r) for r in rebuilt.collect()}


def test_bloom_arg_none_rebuilds_from_history(spark, batches):
    b1, b2, _ = batches
    _, h1 = exact_dedup_incremental(b1, None, "doc_id", "text")
    k2, h2 = exact_dedup_incremental(b2, h1, "doc_id", "text")
    s2, g2, _ = exact_dedup_incremental_bloom(b2, h1, None, "doc_id", "text", M, K)
    assert sorted(map(tuple, k2.collect())) == sorted(map(tuple, s2.collect()))
    assert sorted(r[0] for r in h2.collect()) == sorted(r[0] for r in g2.collect())
