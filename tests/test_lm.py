"""Bigram LM perplexity scoring: hand-computed model + DuckDB parity."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.lm import (
    bigram_lm_score,
    train_bigram_lm,
)
from globalweather_etl_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lm(spark):
    train = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], "doc_id long, text string"
    )
    return train_bigram_lm(train, "doc_id", "text", min_count=2)


def test_model_tables_hand_computed(lm):
    # unigrams a:3 b:2 c:1 -> kept {a, b}; V = 3
    assert sorted(r["w"] for r in lm.vocab.collect()) == ["a", "b"]
    assert lm.vsize.collect()[0]["v"] == 3
    bi = {(r["prev"], r["w"]): r["c"] for r in lm.bigrams.collect()}
    assert bi == {("<s>", "a"): 3, ("a", "b"): 2, ("a", "<unk>"): 1}
    pc = {r["prev"]: r["c_prev"] for r in lm.prev_counts.collect()}
    assert pc == {"<s>": 3, "a": 3}


def test_scores_hand_computed(spark, lm):
    target = spark.createDataFrame(
        [(10, "a b"), (11, "z"), (12, "c a"), (13, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bigram_lm_score(target, lm, "doc_id", "text").collect()}

    # "a b": P(a|<s>)=4/6, P(b|a)=3/6 -> ppl = sqrt(1/(4/6*1/2))^-1... = sqrt(3)
    r = out[10]
    assert (r["lm_tokens"], r["lm_oov"]) == (2, 0)
    assert r["perplexity"] == pytest.approx(math.sqrt(3.0), rel=1e-12)
    assert float(r["logprob6"]) == pytest.approx(
        round(math.log(4 / 6), 6) + round(math.log(3 / 6), 6), abs=1e-9
    )

    # "z" -> <unk>: P(<unk>|<s>) = (0+1)/(3+3) = 1/6 -> ppl 6
    r = out[11]
    assert (r["lm_tokens"], r["lm_oov"]) == (1, 1)
    assert r["perplexity"] == pytest.approx(6.0, rel=1e-12)

    # "c a": P(<unk>|<s>)=1/6, P(a|<unk>)=(0+1)/(0+3)=1/3 (unseen prev)
    r = out[12]
    assert (r["lm_tokens"], r["lm_oov"]) == (2, 1)
    assert r["perplexity"] == pytest.approx(math.sqrt(18.0), rel=1e-12)

    # empty doc: no transitions
    r = out[13]
    assert (r["lm_tokens"], r["lm_oov"]) == (0, 0)
    assert float(r["logprob6"]) == 0.0
    assert r["perplexity"] is None


def test_gibberish_scores_worse_than_corpus_text(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    model = train_bigram_lm(docs, "doc_id", "text", min_count=2)
    real = docs.limit(50)
    noise = spark.createDataFrame(
        [(900000 + i, f"zq{i}x wvu{i * 7} qqq{i} plorp glorx{i}") for i in range(50)],
        "doc_id long, text string",
    )
    scored = bigram_lm_score(real.unionByName(noise), model, "doc_id", "text")
    med = (
        scored.groupBy((F.col("doc_id") >= 900000).alias("is_noise"))
        .agg(F.expr("percentile_approx(perplexity, 0.5)").alias("p50"))
        .collect()
    )
    p = {r["is_noise"]: r["p50"] for r in med}
    # the synthetic corpus is itself noisy, so the margin is modest:
    # median gibberish perplexity ~1.9x the median real-doc perplexity
    assert p[True] > 1.5 * p[False]


def test_duckdb_parity(spark):
    """Train + score over real testdata vs a full SQL twin: integer
    columns and the decimal logprob6 must match exactly; double
    avg_logprob to 1e-12."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    model = train_bigram_lm(docs, "doc_id", "text", min_count=2)
    got = {
        r["doc_id"]: (
            r["lm_tokens"],
            r["lm_oov"],
            str(r["logprob6"]),
            r["avg_logprob"],
        )
        for r in bigram_lm_score(docs, model, "doc_id", "text").collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT doc_id, text "
        f"FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = {
        r[0]: (r[1], r[2], str(r[3]), r[4])
        for r in con.execute(
            r"""
WITH toks AS (
  SELECT doc_id, i AS pos, lower(t[i]) AS tok
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents),
       unnest(generate_series(1, len(t))) AS g(i)
  WHERE t[i] <> ''),
uni AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
kept AS (SELECT tok FROM uni WHERE c >= 2),
mapped AS (
  SELECT doc_id, pos,
         CASE WHEN kept.tok IS NULL THEN '<unk>' ELSE toks.tok END AS w
  FROM toks LEFT JOIN kept ON kept.tok = toks.tok),
chain AS (
  SELECT doc_id,
         coalesce(lag(w) OVER (PARTITION BY doc_id ORDER BY pos), '<s>')
           AS prev,
         w
  FROM mapped),
bi AS (SELECT prev, w, count(*) AS c FROM chain GROUP BY prev, w),
pc AS (SELECT prev, count(*) AS c_prev FROM chain GROUP BY prev),
vs AS (SELECT count(*) + 1 AS v FROM kept),
lp AS (
  SELECT ch.doc_id, ch.w,
         ln(CAST(coalesce(bi.c, 0) + 1 AS DOUBLE)
            / CAST(coalesce(pc.c_prev, 0) + vs.v AS DOUBLE)) AS lp
  FROM chain ch
  LEFT JOIN bi ON bi.prev = ch.prev AND bi.w = ch.w
  LEFT JOIN pc ON pc.prev = ch.prev
  CROSS JOIN vs),
agg AS (
  SELECT doc_id,
         count(*)::BIGINT AS lm_tokens,
         sum(CASE WHEN w = '<unk>' THEN 1 ELSE 0 END)::BIGINT AS lm_oov,
         sum(CAST(round(lp, 6) AS DECIMAL(28,6))) AS logprob6,
         avg(lp) AS avg_logprob
  FROM lp GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(a.lm_tokens, 0) AS lm_tokens,
       coalesce(a.lm_oov, 0) AS lm_oov,
       coalesce(a.logprob6, CAST(0 AS DECIMAL(28,6))) AS logprob6,
       a.avg_logprob
FROM documents d LEFT JOIN agg a USING (doc_id)"""
        ).fetchall()
    }
    assert set(got) == set(want)
    for k in got:
        assert got[k][:2] == want[k][:2], k
        assert float(got[k][2]) == pytest.approx(float(want[k][2]), abs=1e-9), k
        assert got[k][3] == pytest.approx(want[k][3], rel=1e-12), k
