"""Fuzzy (MinHash-LSH) benchmark decontamination."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.dedup import fuzzy_decontaminate
from globalweather_etl_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"

BASE = (
    "the quick brown fox jumps over the lazy dog near the quiet river "
    "while the patient heron watches from the tall reeds every morning"
)


@pytest.fixture(scope="module")
def fixture(spark):
    corpus = spark.createDataFrame(
        [
            (1, BASE.replace("every morning", "each evening")),  # near-match
            (2, "completely unrelated text about spark shuffles and partitions "
                "with enough words to form plenty of shingles for hashing"),
            (3, "too short"),  # < n words: no shingles, never flagged
            (4, BASE),  # verbatim copy
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, BASE)], "doc_id long, text string")
    return corpus, bench


def test_fixture_semantics(fixture):
    corpus, bench = fixture
    out = {
        r["doc_id"]: r
        for r in fuzzy_decontaminate(
            corpus, bench, "doc_id", "text", n=3, num_hashes=32, bands=16,
            threshold=0.5,
        ).collect()
    }
    assert out[4]["fuzzy_containment"] == 1.0
    assert out[4]["is_fuzzy_contaminated"] and out[4]["matched_bench"] == 100
    assert 0.5 <= out[1]["fuzzy_containment"] < 1.0
    assert out[1]["is_fuzzy_contaminated"] and out[1]["matched_bench"] == 100
    assert out[2]["fuzzy_containment"] == 0.0 and not out[2]["is_fuzzy_contaminated"]
    assert out[3]["fuzzy_containment"] == 0.0 and out[3]["matched_bench"] is None


def test_short_benchmark_never_divides_by_zero(spark):
    corpus = spark.createDataFrame([(1, BASE)], "doc_id long, text string")
    bench = spark.createDataFrame([(9, "tiny")], "doc_id long, text string")
    out = fuzzy_decontaminate(corpus, bench, "doc_id", "text", n=3).collect()
    assert out[0]["fuzzy_containment"] == 0.0


def test_duckdb_parity_md5(spark):
    """md5 mode over real testdata vs a full SQL twin: benchmark =
    every 7th doc with an appended eval marker (a near-match of its
    source doc), n=5, 32 hashes, 8 bands, containment verify."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    marker = " eval answer option marker alpha beta gamma"
    bench = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(marker)).alias("text"),
    )
    got = {
        r["doc_id"]: (
            round(r["fuzzy_containment"], 9),
            r["matched_bench"],
            r["is_fuzzy_contaminated"],
        )
        for r in fuzzy_decontaminate(
            docs, bench, "doc_id", "text", n=5, num_hashes=32, bands=8,
            threshold=0.5, hash_fn="md5",
        ).collect()
    }
    from globalweather_etl_spark.oracles import _shingles_sql

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT doc_id, text "
        f"FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    con.execute(
        f"CREATE VIEW bench AS SELECT doc_id + 1000000 AS doc_id, "
        f"text || '{marker}' AS text FROM documents WHERE doc_id % 7 = 0"
    )
    sig = """
SELECT doc_id, i, min((h * (2*i+1) + 7919 * (i+1)) % 2147483647) AS mh
FROM (SELECT doc_id,
        CAST('0x' || substring(md5(shingle), 1, 15) AS BIGINT) % 2147483647 AS h
      FROM {sh})
CROSS JOIN (SELECT unnest(range(32)) AS i) hi
GROUP BY doc_id, i"""
    bandq = """
SELECT doc_id, i // 4 AS band,
  CAST('0x' || substring(
      md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i)), 1, 15)
    AS BIGINT) AS bhash
FROM {sig} GROUP BY doc_id, i // 4"""
    want = {
        r[0]: (r[1] if r[1] is None else round(r[1], 9), r[2], r[3])
        for r in con.execute(
            f"""
WITH csh AS ({_shingles_sql(5)}),
bsh AS ({_shingles_sql(5, source="bench")}),
csig AS ({sig.format(sh="csh")}),
bsig AS ({sig.format(sh="bsh")}),
cband AS ({bandq.format(sig="csig")}),
bband AS ({bandq.format(sig="bsig")}),
cand AS (
  SELECT DISTINCT c.doc_id AS cdoc, b.doc_id AS bdoc
  FROM cband c JOIN bband b ON c.band = b.band AND c.bhash = b.bhash),
inter AS (
  SELECT cand.cdoc, cand.bdoc, count(*) AS n_common
  FROM cand
  JOIN csh sc ON sc.doc_id = cand.cdoc
  JOIN bsh sb ON sb.doc_id = cand.bdoc AND sb.shingle = sc.shingle
  GROUP BY cand.cdoc, cand.bdoc),
bs AS (SELECT doc_id, count(*) AS ns FROM bsh GROUP BY doc_id),
scored AS (
  SELECT cdoc, bdoc,
         CAST(n_common AS DOUBLE) / CAST(bs.ns AS DOUBLE) AS containment
  FROM inter JOIN bs ON bs.doc_id = inter.bdoc),
best AS (
  SELECT cdoc, containment, bdoc
  FROM scored
  QUALIFY row_number() OVER (PARTITION BY cdoc
                             ORDER BY containment DESC, bdoc ASC) = 1)
SELECT d.doc_id,
       round(coalesce(best.containment, 0.0), 9) AS fuzzy_containment,
       best.bdoc AS matched_bench,
       coalesce(best.containment, 0.0) >= 0.5 AS is_fuzzy_contaminated
FROM documents d LEFT JOIN best ON best.cdoc = d.doc_id"""
        ).fetchall()
    }
    want = {
        k: ((0.0 if v[0] is None else v[0]), v[1], v[2]) for k, v in want.items()
    }
    assert got == want
    # the synthesized benchmark really flags its source docs
    assert sum(1 for v in got.values() if v[2]) > 0


def test_hot_shingle_cap_is_symmetric(spark):
    """The cap must remove the SAME hot-shingle set from both signature
    spaces: a corpus doc IDENTICAL to a benchmark doc must always be
    flagged even when shared boilerplate makes most shingles hot on the
    corpus side only (the benchmark is too small to trip the cap by
    itself). Before the round-6 fix the corpus-only cap desynchronized
    the signatures and 8-11%% of planted identical matches were missed
    at the 1M-doc rehearsal."""
    boiler = (
        "subscribe to our newsletter today click here for more breaking "
        "updates terms of service apply all rights reserved"
    )
    # 80 corpus docs all sharing the boilerplate prefix -> its shingles
    # have corpus df=80 > cap=16; each doc's tail is unique
    corpus = spark.createDataFrame(
        [
            (i, f"{boiler} body w{i}a w{i}b w{i}c w{i}d w{i}e w{i}f w{i}g")
            for i in range(80)
        ],
        "doc_id long, text string",
    )
    # 3 bench docs: verbatim copies of corpus docs 5, 17, 42 — bench-side
    # boilerplate df=3 <= cap, so only a SHARED hot set keeps the two
    # signature spaces aligned
    bench = corpus.filter(F.col("doc_id").isin(5, 17, 42)).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    out = fuzzy_decontaminate(
        corpus, bench, "doc_id", "text",
        n=5, num_hashes=32, bands=8, threshold=0.5, max_doc_freq=16,
    )
    flagged = {
        r["doc_id"]
        for r in out.filter(F.col("is_fuzzy_contaminated")).collect()
    }
    assert {5, 17, 42} <= flagged
    # identical pairs score containment 1.0 over the surviving shingles
    got = {
        r["doc_id"]: r["fuzzy_containment"]
        for r in out.filter(F.col("doc_id").isin(5, 17, 42)).collect()
    }
    assert all(v == 1.0 for v in got.values()), got
