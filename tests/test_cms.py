"""Count-min sketch: hand-computed estimates, the never-underestimate
guarantee, weighted counting, mergeability, and a DuckDB bit-for-bit
twin of sketch cells and estimates."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.sketches import (
    cms_estimate,
    count_min_sketch,
)
from globalweather_etl_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"
D, W = 4, 64


@pytest.fixture(scope="module")
def stream(spark):
    vals = (
        ["alpha"] * 10 + ["beta"] * 5 + ["gamma"] * 3 + ["delta"] * 1
    )
    return spark.createDataFrame([(v,) for v in vals], "v string")


def test_estimates_never_underestimate_and_exact_without_collisions(
    spark, stream
):
    sk = count_min_sketch(stream, "v", depth=D, width=W)
    qs = spark.createDataFrame(
        [("alpha",), ("beta",), ("gamma",), ("delta",), ("absent",)],
        "v string",
    )
    got = {
        r["v"]: r["cms_est"]
        for r in cms_estimate(sk, qs, "v", depth=D, width=W).collect()
    }
    exact = {"alpha": 10, "beta": 5, "gamma": 3, "delta": 1, "absent": 0}
    for v, n in exact.items():
        assert got[v] >= n
    # 4 distinct values in a 4x64 sketch: overwhelmingly collision-free
    # (deterministic for this fixed fixture — the hash is pinned md5)
    assert got == exact


def test_sketch_mass_invariant(stream):
    """Every row of the sketch sums to the full stream mass."""
    sk = count_min_sketch(stream, "v", depth=D, width=W)
    mass = {
        r["row"]: r["s"]
        for r in sk.groupBy("row").agg(F.sum("cnt").alias("s")).collect()
    }
    assert mass == {i: 19 for i in range(D)}


def test_weighted_counts(spark):
    df = spark.createDataFrame(
        [("a", 3), ("a", 4), ("b", 10)], "v string, w long"
    )
    sk = count_min_sketch(df, "v", depth=2, width=32, weight="w")
    qs = spark.createDataFrame([("a",), ("b",)], "v string")
    got = {
        r["v"]: r["cms_est"]
        for r in cms_estimate(sk, qs, "v", depth=2, width=32).collect()
    }
    assert got["a"] >= 7 and got["b"] >= 10


def test_merge_by_union_resum(spark, stream):
    """CMS(a ++ b) == cell-wise sum of CMS(a) and CMS(b)."""
    a = stream.filter(F.col("v").isin("alpha", "beta"))
    b = stream.filter(~F.col("v").isin("alpha", "beta"))
    ska = count_min_sketch(a, "v", depth=D, width=W)
    skb = count_min_sketch(b, "v", depth=D, width=W)
    merged = (
        ska.unionAll(skb)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    whole = count_min_sketch(stream, "v", depth=D, width=W)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_duckdb_twin_on_real_tokens(spark):
    """Sketch cells AND estimates agree bit-for-bit with a DuckDB twin
    over the real documents' token stream."""
    from globalweather_etl_spark.functions.text import tokens

    docs = load_table(spark, SF_DIR, "documents")
    stream = docs.select(
        F.explode(tokens(F.lower(F.col("text")))).alias("t")
    )
    sk = count_min_sketch(stream, "t", depth=D, width=W)
    got_cells = sorted(map(tuple, sk.collect()))

    toks = f"""
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t
  FROM read_parquet('{SF_DIR}/documents.parquet')"""
    cells_sql = " UNION ALL ".join(
        f"""SELECT {i} AS row,
      CAST('0x' || substring(md5('{i}|' || t), 1, 15) AS BIGINT) % {W}
        AS bucket FROM toks"""
        for i in range(D)
    )
    sk_sql = f"""
WITH toks AS ({toks}),
cells AS ({cells_sql}),
sk AS (SELECT row, bucket, count(*)::BIGINT AS cnt FROM cells GROUP BY 1, 2)"""
    con = duckdb.connect()
    want_cells = sorted(
        map(tuple, con.execute(sk_sql + "SELECT * FROM sk").fetchall())
    )
    assert got_cells == want_cells

    # estimate parity for the 3 most frequent tokens
    top3 = [
        r[0]
        for r in con.execute(
            f"WITH toks AS ({toks}) SELECT t FROM toks "
            "GROUP BY t ORDER BY count(*) DESC, t LIMIT 3"
        ).fetchall()
    ]
    qs = spark.createDataFrame([(t,) for t in top3], "t string")
    got_est = {
        r["t"]: r["cms_est"]
        for r in cms_estimate(sk, qs, "t", depth=D, width=W).collect()
    }
    for t in top3:
        want = con.execute(
            sk_sql
            + f"""
SELECT min(coalesce(sk.cnt, 0))
FROM (SELECT i AS row,
        CAST('0x' || substring(md5(i || '|' || '{t}'), 1, 15) AS BIGINT)
          % {W} AS bucket
      FROM (SELECT unnest(range({D})) AS i)) q
LEFT JOIN sk USING (row, bucket)"""
        ).fetchone()[0]
        assert got_est[t] == want


def test_errors(stream):
    with pytest.raises(ValueError):
        count_min_sketch(stream, "v", depth=0)
