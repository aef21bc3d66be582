"""Exact BPE: hand-computed merges, segmentation invariants, real-corpus run."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.bpe import (
    bpe_encode,
    bpe_vocab,
    learn_bpe,
)
from globalweather_etl_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tiny(spark):
    # newline-separated so every piece is the bare word (no leading-space
    # pieces): low x5, lower x2, newest x6, widest x3
    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    return spark.createDataFrame([(0, "\n".join(words))], "doc_id long, text string")


def test_first_merge_hand_computed(tiny):
    # pair counts: (e,s)=6+3=9, (s,t)=9, (l,o)=7, (o,w)=7, (w,e)=8, ...
    # ties at 9 break to the lexicographically smaller pair: ('e','s')
    merges = learn_bpe(tiny, "text", 1)
    assert merges == [("e", "s")]


def test_learn_is_deterministic(tiny):
    assert learn_bpe(tiny, "text", 8) == learn_bpe(tiny, "text", 8)


def test_frequent_words_collapse_to_single_tokens(tiny):
    merges = learn_bpe(tiny, "text", 50)  # more than enough
    probe = tiny.sparkSession.createDataFrame(
        [(1, "newest\nlow\nwidest\nlower")], "doc_id long, text string"
    )
    out = bpe_encode(probe, "text", merges).collect()[0]
    assert out["bpe_tokens"] == ["newest", "low", "widest", "lower"]
    assert out["n_bpe"] == 4


def test_no_merges_yields_characters(spark):
    df = spark.createDataFrame([(0, "abc 12")], "doc_id long, text string")
    out = bpe_encode(df, "text", []).collect()[0]
    # pieces: "abc", " 12" -> all single chars
    assert out["bpe_tokens"] == ["a", "b", "c", " ", "1", "2"]


def test_null_text(spark):
    df = spark.createDataFrame([(0, None)], "doc_id long, text string")
    out = bpe_encode(df, "text", [("a", "b")]).collect()[0]
    assert out["bpe_tokens"] is None and out["n_bpe"] == -1


def test_unseen_text_segments_losslessly(tiny, spark):
    """Encoding text the merges never saw still concatenates back to
    exactly the pre-tokenizer pieces, and counts sit between the piece
    count and the character count."""
    from globalweather_etl_spark.functions.text import bpe_token_estimate

    merges = learn_bpe(tiny, "text", 10)
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").limit(100)
    enc = bpe_encode(docs, "text", merges).select(
        "doc_id",
        "text",
        "bpe_tokens",
        "n_bpe",
        bpe_token_estimate(F.col("text")).alias("n_pieces"),
        F.concat_ws("", F.col("bpe_tokens")).alias("glued"),
        F.concat_ws(
            "",
            F.regexp_extract_all(
                F.col("text"),
                F.lit(r"'(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+"),
                0,
            ),
        ).alias("pieces_glued"),
    )
    bad = enc.filter(
        (F.col("glued") != F.col("pieces_glued"))
        | (F.col("n_bpe") < F.col("n_pieces"))
        | (F.col("n_bpe") > F.length("text"))
    ).count()
    assert bad == 0
    # merges learned on the tiny corpus actually fire somewhere real
    assert enc.filter(F.col("n_bpe") < F.length(F.col("pieces_glued"))).count() > 0


def test_corpus_learned_encode_round(spark):
    """Learn from the real sf0.001 corpus and encode it: lossless
    segmentation everywhere, and the exact counts beat the estimate."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    merges = learn_bpe(docs, "text", 100, max_words=5000)
    assert len(merges) == 100
    enc = bpe_encode(docs, "text", merges)
    row = enc.agg(
        F.sum(F.when(F.concat_ws("", F.col("bpe_tokens")) != F.concat_ws(
            "",
            F.regexp_extract_all(
                F.col("text"),
                F.lit(r"'(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+"),
                0,
            ),
        ), 1).otherwise(0)).alias("lossy"),
        F.sum("n_bpe").alias("total"),
    ).collect()[0]
    assert row["lossy"] == 0
    assert row["total"] > 0


def test_vocab_table():
    vocab = bpe_vocab([("a", "b"), ("ab", "c")], alphabet=list("cab"))
    assert vocab == {"a": 0, "b": 1, "c": 2, "ab": 3, "abc": 4}


def test_bpe_counts_feed_token_packing(spark):
    """The exact encoder composes with pack_by_budget: bins respect the
    budget under EXACT BPE counts (the precise form of the packing the
    graded slot runs on whitespace counts)."""
    from globalweather_etl_spark.operators.packing import pack_by_budget

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    merges = learn_bpe(docs, "text", 50, max_words=2000)
    enc = bpe_encode(docs, "text", merges).select("doc_id", "n_bpe")
    from pyspark.sql import Window

    packed = pack_by_budget(enc, "doc_id", F.col("n_bpe"), budget=2048)
    # contiguous-stream packing contract: bin_id/bin_offset are exactly
    # the prefix sum of EXACT counts under the default md5(id) order
    w = (
        Window.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chk = packed.select(
        "doc_id",
        "bin_id",
        "bin_offset",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("prior"),
    )
    bad = chk.filter(
        (F.col("bin_id") != F.floor(F.col("prior") / 2048))
        | (F.col("bin_offset") != F.col("prior") % 2048)
    ).count()
    assert bad == 0
    assert packed.count() == docs.count()
    assert packed.select("doc_id").distinct().count() == docs.count()
