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


# ------------------------- grouped portable HLL (hll_distinct_by)


def test_hll_by_matches_global_per_slice(spark):
    from globalweather_etl_spark.operators.sketches import (
        hll_distinct_by,
        hll_distinct_estimate,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    grouped = {
        r["lang"]: r["approx_distinct"]
        for r in hll_distinct_by(docs, ["lang"], "text").collect()
    }
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    assert set(grouped) == set(langs)
    for lang in langs:
        [g] = hll_distinct_estimate(
            docs.filter(F.col("lang") == lang), "text"
        ).collect()
        assert grouped[lang] == g["approx_distinct"], lang


def test_hll_by_error_bound(spark):
    from globalweather_etl_spark.operators.sketches import hll_distinct_by

    # 3 groups with known distinct counts 100 / 500 / 2000
    df = spark.range(2600).select(
        F.when(F.col("id") < 100, F.lit("a"))
        .when(F.col("id") < 600, F.lit("b"))
        .otherwise(F.lit("c"))
        .alias("g"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("v"),
    )
    got = {
        r["g"]: r["approx_distinct"]
        for r in hll_distinct_by(df, ["g"], "v", b=8).collect()
    }
    for g, truth in (("a", 100), ("b", 500), ("c", 2000)):
        # b=8 -> m=256 -> ~6.5% standard error; allow 4 sigma
        assert abs(got[g] - truth) / truth < 0.26, (g, got[g])


def test_hll_by_duckdb_grouped_twin(spark):
    from globalweather_etl_spark.operators.sketches import hll_distinct_by

    sf = "/root/testdata/sf0.001"
    got = {
        (r["lang"],): r["approx_distinct"]
        for r in hll_distinct_by(
            spark.read.parquet(f"{sf}/documents.parquet"), ["lang"], "text",
            b=6,
        ).collect()
    }
    m, w, b, cap = 64, 54, 6, 40
    import math

    alpha = 0.709  # _alpha(64)
    con = duckdb.connect()
    rows = con.execute(
        f"""
SELECT lang,
  round(CASE WHEN {alpha} * {m} * {m} / sum_inv <= {2.5 * m}
              AND n_empty > 0
        THEN {float(m)} * ln({float(m)} / n_empty)
        ELSE {alpha} * {m} * {m} / sum_inv END, 6)
FROM (
  SELECT lang,
    sum(1.0 / (CAST(1 AS BIGINT) << rho)) + ({m} - count(*)) AS sum_inv,
    {m} - count(*) AS n_empty
  FROM (
    SELECT lang, h & {m - 1} AS bucket,
      max(least({w + 1} - length(ltrim(bin(h >> {b}), '0')), {cap})) AS rho
    FROM (SELECT lang, CAST('0x' || substring(md5(text), 1, 15) AS BIGINT)
            AS h
          FROM read_parquet('{sf}/documents.parquet'))
    GROUP BY lang, h & {m - 1})
  GROUP BY lang)"""
    ).fetchall()
    want = {(r[0],): r[1] for r in rows}
    assert got == want


# ----------------- mergeable HLL register state (incremental distinct)


def test_hll_registers_merge_equals_whole(spark):
    from globalweather_etl_spark.operators.sketches import (
        hll_distinct_estimate,
        hll_estimate_from_registers,
        hll_merge,
        hll_registers,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = docs.filter(F.col("doc_id") % 3 == 0)
    b = docs.filter(F.col("doc_id") % 3 == 1)
    c = docs.filter(F.col("doc_id") % 3 == 2)
    merged = hll_merge(
        hll_merge(hll_registers(a, "text"), hll_registers(b, "text")),
        hll_registers(c, "text"),
    )
    [inc] = hll_estimate_from_registers(merged).collect()
    [whole] = hll_distinct_estimate(docs, "text").collect()
    assert inc["approx_distinct"] == whole["approx_distinct"]


def test_hll_merge_is_order_independent(spark):
    from globalweather_etl_spark.operators.sketches import (
        hll_estimate_from_registers,
        hll_merge,
        hll_registers,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = hll_registers(docs.filter(F.col("doc_id") % 2 == 0), "text")
    b = hll_registers(docs.filter(F.col("doc_id") % 2 == 1), "text")
    [ab] = hll_estimate_from_registers(hll_merge(a, b)).collect()
    [ba] = hll_estimate_from_registers(hll_merge(b, a)).collect()
    assert ab["approx_distinct"] == ba["approx_distinct"]


def test_hll_registers_round_trip_parquet(spark, tmp_path):
    """Registers persist as a tiny parquet between batches — the
    incremental-distinct state-store pattern."""
    from globalweather_etl_spark.operators.sketches import (
        hll_distinct_estimate,
        hll_estimate_from_registers,
        hll_merge,
        hll_registers,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    state = str(tmp_path / "hll_state")
    hll_registers(docs.filter(F.col("doc_id") < 250), "text").write.parquet(
        state
    )
    merged = hll_merge(
        spark.read.parquet(state),
        hll_registers(docs.filter(F.col("doc_id") >= 250), "text"),
    )
    [inc] = hll_estimate_from_registers(merged).collect()
    [whole] = hll_distinct_estimate(docs, "text").collect()
    assert inc["approx_distinct"] == whole["approx_distinct"]
