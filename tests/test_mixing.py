"""mix_corpora: proportions, determinism, shortfall semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.mixing import mix_corpora
from globalweather_etl_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpora(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "lang", "text")
    a = docs.filter(F.col("doc_id") % 2 == 0)  # ~250 rows
    b = docs.filter(F.col("doc_id") % 2 == 1)  # ~250 rows
    return a, b


def test_target_rows_proportions(spark, corpora):
    a, b = corpora
    out = mix_corpora(
        {"web": (a, 3.0), "code": (b, 1.0)},
        F.col("doc_id"),
        total_rows=200,
        seed=5,
    )
    by_src = {
        r["mix_source"]: r["n"]
        for r in out.groupBy("mix_source").agg(F.count("*").alias("n")).collect()
    }
    # 75/25 of 200 with 1/65536-resolution hash rates: generous ±20%
    assert 120 <= by_src["web"] <= 180
    assert 30 <= by_src["code"] <= 70


def test_no_target_scarcest_source_binds(spark, corpora):
    # With weights 1:9 over two ~equal-size corpora, the 9-weight source
    # is the scarcest per weight unit: it keeps 100% and the other
    # downsamples to ~1/9 of it, preserving the target proportions.
    a, b = corpora
    nb = b.count()
    out = mix_corpora(
        {"big": (a, 1.0), "small": (b, 9.0)}, F.col("doc_id"), seed=5
    )
    by_src = {
        r["mix_source"]: r["n"]
        for r in out.groupBy("mix_source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src["small"] == nb
    expected_big = nb / 9.0
    # hash-rate sampling at 1/65536 resolution: generous ±60% band
    assert 0.4 * expected_big <= by_src["big"] <= 1.6 * expected_big


def test_no_target_equal_weights_equal_sizes_keeps_all(spark, corpora):
    # Equal weights over equal-size corpora: every source is equally
    # scarce, so nothing downsamples. (Same frame twice — per-source key
    # salting keeps the draws independent.)
    a, _ = corpora
    out = mix_corpora({"x": (a, 1.0), "y": (a, 1.0)}, F.col("doc_id"), seed=5)
    assert out.count() == 2 * a.count()


def test_deterministic_and_tagged(spark, corpora):
    a, b = corpora
    args = dict(key=F.col("doc_id"), total_rows=150, seed=11)
    one = mix_corpora({"x": (a, 1.0), "y": (b, 1.0)}, **args)
    two = mix_corpora({"x": (a.repartition(7), 1.0), "y": (b, 1.0)}, **args)
    s1 = {(r["doc_id"], r["mix_source"]) for r in one.collect()}
    s2 = {(r["doc_id"], r["mix_source"]) for r in two.collect()}
    assert s1 == s2
    assert {t[1] for t in s1} == {"x", "y"}


def test_shortfall_not_reweighted(spark, corpora):
    a, b = corpora
    tiny = b.limit(10)
    out = mix_corpora(
        {"main": (a, 1.0), "tiny": (tiny, 1.0)},
        F.col("doc_id"),
        total_rows=400,
        seed=3,
    )
    by_src = {
        r["mix_source"]: r["n"]
        for r in out.groupBy("mix_source").agg(F.count("*").alias("n")).collect()
    }
    # tiny cannot fill its 200-row share: it contributes all 10 rows
    # and main is NOT inflated to compensate
    assert by_src["tiny"] == 10
    assert by_src["main"] <= 250


def test_streaming_source_rejected(spark, tmp_path):
    import pytest
    from pyspark.sql import types as T

    from globalweather_etl_spark.sources import write_jsonl
    from globalweather_etl_spark.streaming import jsonl_stream_from_dir

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "lang", "text")
    path = str(tmp_path / "landing")
    write_jsonl(docs, path, partitions=1)
    schema = T.StructType([T.StructField("doc_id", T.LongType())])
    stream = jsonl_stream_from_dir(spark, path, schema)
    with pytest.raises(ValueError, match="streaming"):
        mix_corpora({"s": (stream, 1.0)}, F.col("doc_id"), total_rows=10)


def test_upsample_epochs(spark, corpora):
    """allow_upsample=True repeats a scarce source deterministically:
    rate r > 1 emits floor(r) copies per row plus a fractional-draw
    extra; expected size n*r. DuckDB recomputes the per-row copy count
    from the same md5 formula."""
    import duckdb

    a, b = corpora  # each ~250 rows
    n_a = a.count()
    n_b = b.count()
    # weights 4:1, total = 2 * (n_a + n_b): source a's share is
    # 0.8 * 2 * 500 = 800 from ~250 rows -> rate ~3.2 (upsampled);
    # source b's is 200 from ~250 -> rate ~0.8 (downsampled).
    total = 2 * (n_a + n_b)
    out = mix_corpora(
        {"hi": (a, 4.0), "lo": (b, 1.0)},
        F.col("doc_id"),
        total_rows=total,
        seed=5,
        allow_upsample=True,
    )
    assert "mix_epoch" in out.columns
    by = {
        r["mix_source"]: (r["n"], r["max_ep"])
        for r in out.groupBy("mix_source")
        .agg(F.count("*").alias("n"), F.max("mix_epoch").alias("max_ep"))
        .collect()
    }
    rate_hi = total * 0.8 / n_a
    assert by["hi"][0] == pytest.approx(n_a * rate_hi, rel=0.1)
    assert by["hi"][1] >= int(rate_hi) - 1  # floor(r) copies exist
    assert by["lo"][1] == 0  # downsampled side never repeats
    assert by["lo"][0] == pytest.approx(total * 0.2, rel=0.25)

    # determinism
    out2 = mix_corpora(
        {"hi": (a, 4.0), "lo": (b, 1.0)},
        F.col("doc_id"),
        total_rows=total,
        seed=5,
        allow_upsample=True,
    )
    got = sorted(
        (r["doc_id"], r["mix_source"], r["mix_epoch"]) for r in out.collect()
    )
    assert got == sorted(
        (r["doc_id"], r["mix_source"], r["mix_epoch"]) for r in out2.collect()
    )

    # DuckDB twin of the per-row copy count for the upsampled source
    whole = int(rate_hi)
    frac = rate_hi - whole
    thr = round(frac * 65536)
    thr_hex = format(thr, "04x") if thr < 65536 else "g"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = {
        r[0]: r[1]
        for r in con.execute(
            f"""
SELECT doc_id,
  {whole} + CASE WHEN substring(
      md5(CAST(doc_id AS VARCHAR) || '|hi|up:5'), 1, 4) < '{thr_hex}'
    THEN 1 ELSE 0 END AS copies
FROM documents WHERE doc_id % 2 = 0"""
        ).fetchall()
    }
    got_copies = {
        r["doc_id"]: r["n"]
        for r in out.filter(F.col("mix_source") == "hi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # every emitted doc's copy count matches; docs with 0 copies are
    # absent from the mix but present in `want` with copies == whole
    # only if the fractional draw missed AND whole == 0 (not the case
    # here: whole >= 1 so every doc appears)
    assert set(got_copies) == set(want)
    assert got_copies == want
