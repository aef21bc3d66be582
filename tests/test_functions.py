"""Unit tests for the expression kernel — every reference semantic quirk."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from globalweather_etl_spark.functions import (
    dayofweek_iso,
    precip_type,
    weather_band,
    weekiso,
)


def _classify_temps(spark, temps):
    df = spark.createDataFrame([(t,) for t in temps], "t double")
    return [
        r["band"]
        for r in df.select(weather_band(F.col("t")).alias("band"))
        .orderBy("t")
        .collect()
    ]


def test_weather_band_boundaries(spark):
    temps = [-40.0, 31.9, 32.0, 50.0, 51.0, 70.0, 71.0, 85.0, 86.0, 120.0]
    assert _classify_temps(spark, temps) == [
        "Freezing",
        "Freezing",
        "Cold",
        "Cold",
        "Mild",
        "Mild",
        "Warm",
        "Warm",
        "Hot",
        "Hot",
    ]


def test_weather_band_gap_quirk(spark):
    """ETL:57-63 gap: 50<t<51 and 70<t<71 match no branch -> 'Hot'.
    The quirk is live (FLOAT temps); must NOT be 'fixed'."""
    assert _classify_temps(spark, [50.5, 70.2]) == ["Hot", "Hot"]


def test_weather_band_null_is_hot(spark):
    """NULL temp: every comparison is NULL -> falls to ELSE 'Hot'."""
    df = spark.createDataFrame([(None,)], "t double")
    assert df.select(weather_band(F.col("t")).alias("b")).collect()[0]["b"] == "Hot"


def test_precip_type_branch_order(spark):
    cases = [
        (2.0, 1.0, "Snow"),  # snow wins over rain (ETL:70 first)
        (0.0, 1.0, "Rain"),
        (0.0, 0.0, "None"),
        (None, None, "None"),  # NULL comparisons are not-true -> ELSE
        (None, 0.5, "Rain"),
    ]
    df = spark.createDataFrame(
        [(s, p) for s, p, _ in cases], "snow double, precip double"
    )
    got = [
        r["pt"]
        for r in df.select(
            precip_type(F.col("snow"), F.col("precip")).alias("pt")
        ).collect()
    ]
    assert got == [c[2] for c in cases]


def test_dayofweek_iso(spark):
    # 2024-01-01 is a Monday -> ISO 1; 2024-01-07 is a Sunday -> ISO 7
    df = spark.createDataFrame(
        [(dt.date(2024, 1, 1),), (dt.date(2024, 1, 7),), (dt.date(2024, 1, 6),)],
        "d date",
    )
    got = [
        r["iso"] for r in df.select(dayofweek_iso(F.col("d")).alias("iso")).collect()
    ]
    assert got == [1, 7, 6]


def test_weekiso(spark):
    # ISO-8601: 2021-01-01 (Friday) belongs to week 53 of 2020;
    # 2024-01-01 (Monday) is week 1.
    df = spark.createDataFrame(
        [(dt.date(2021, 1, 1),), (dt.date(2024, 1, 1),)], "d date"
    )
    got = [r["w"] for r in df.select(weekiso(F.col("d")).alias("w")).collect()]
    assert got == [53, 1]


# --- LLM-corpus text signals (round 3): hand-computed + cross-engine ---


def _one_text(spark, text, col):
    from pyspark.sql import types as T

    df = spark.createDataFrame(
        [(text,)], T.StructType([T.StructField("text", T.StringType())])
    )
    return df.select(col(F.col("text")).alias("v")).collect()[0]["v"]


def test_bpe_token_estimate_hand_computed(spark):
    from globalweather_etl_spark.functions.text import bpe_token_estimate

    # I | 'm | ' don' | 't | ' 123' | ' abc' | '!!' -> 7 pieces
    assert _one_text(spark, "I'm don't 123 abc!!", bpe_token_estimate) == 7
    # letter run | symbol run (',') | letter run -> 3
    assert _one_text(spark, "hello,world", bpe_token_estimate) == 3
    assert _one_text(spark, "", bpe_token_estimate) == 0
    assert _one_text(spark, None, bpe_token_estimate) is None


def test_dup_word_fraction_hand_computed(spark):
    from globalweather_etl_spark.functions.text import dup_word_fraction

    assert _one_text(spark, "a a b", dup_word_fraction) == 1.0 - 2.0 / 3.0
    assert _one_text(spark, "a b c", dup_word_fraction) == 0.0
    assert _one_text(spark, None, dup_word_fraction) is None


def test_dup_line_fraction_hand_computed(spark):
    from globalweather_etl_spark.functions.text import dup_line_fraction

    # trimmed non-empty lines [x, y, x] -> 1 - 2/3
    assert (
        _one_text(spark, "x\ny\n  x  \n\n   ", dup_line_fraction)
        == 1.0 - 2.0 / 3.0
    )
    assert _one_text(spark, "only one line", dup_line_fraction) == 0.0
    assert _one_text(spark, None, dup_line_fraction) is None


def test_bpe_pattern_cross_engine_parity(spark):
    """The pattern the Spark side counts with must count identically in
    DuckDB's RE2 — on exactly the inputs the graded corpus lacks:
    contractions, digit runs, symbol runs, non-ASCII letters (\\p{L}),
    and multi-space gaps."""
    import duckdb
    from pyspark.sql import types as T

    from globalweather_etl_spark.functions.text import (
        _BPE_PATTERN,
        bpe_token_estimate,
    )

    fixtures = [
        "I'm don't won't it's we're you've they'll he'd",
        "café élan naïve Zürich über",
        "x9 42°C 3.14  double  spaced",
        "!!!...###   mixed!?",
        "plain words only here",
    ]
    df = spark.createDataFrame(
        [(t,) for t in fixtures],
        T.StructType([T.StructField("text", T.StringType())]),
    )
    got_spark = [
        r["v"]
        for r in df.select(bpe_token_estimate(F.col("text")).alias("v")).collect()
    ]
    pat = _BPE_PATTERN.replace("'", "''")
    con = duckdb.connect()
    got_duck = [
        con.execute(
            f"SELECT len(regexp_extract_all(?, '{pat}'))", [t]
        ).fetchone()[0]
        for t in fixtures
    ]
    assert got_spark == got_duck


def test_pii_redaction_hand_computed(spark):
    from globalweather_etl_spark.functions.text import pii_counts, redact_pii

    text = (
        "mail a.b+c@ex-ample.org or admin@host.io, "
        "server 10.0.255.7, call +1 (415) 555-0199 now"
    )
    got = _one_text(spark, text, redact_pii)
    assert got == ("mail <EMAIL> or <EMAIL>, server <IP>, call <PHONE> now")
    counts = {
        k: _one_text(spark, text, lambda c, k=k: pii_counts(c)[k])
        for k in ("EMAIL", "IP", "PHONE")
    }
    assert counts == {"EMAIL": 2, "IP": 1, "PHONE": 1}
    # clean text untouched
    assert _one_text(spark, "no pii here 1.5 + 2", redact_pii) == "no pii here 1.5 + 2"


def test_pii_patterns_cross_engine_parity(spark):
    """Each pattern must redact identically under DuckDB's RE2."""
    import duckdb
    from pyspark.sql import types as T

    from globalweather_etl_spark.functions.text import _PII_PATTERNS, redact_pii

    fixtures = [
        "a@b.co x@y.museum not-an@email bad@.com 1.2.3.4.5",
        "ip 192.168.0.1 ip2 999.1.1.1 version 1.2.3",
        "+49 (30) 1234-567 vs +1invalid +12 345",
        "edge a.b+c_d%e@sub.domain-x.org end",
    ]
    df = spark.createDataFrame(
        [(t,) for t in fixtures],
        T.StructType([T.StructField("text", T.StringType())]),
    )
    got_spark = [
        r["v"] for r in df.select(redact_pii(F.col("text")).alias("v")).collect()
    ]
    con = duckdb.connect()
    got_duck = []
    for t in fixtures:
        v = t
        for kind in ("EMAIL", "IP", "PHONE"):
            pat = _PII_PATTERNS[kind].replace("'", "''")
            v = con.execute(
                f"SELECT regexp_replace(?, '{pat}', '<{kind}>', 'g')", [v]
            ).fetchone()[0]
        got_duck.append(v)
    assert got_spark == got_duck


# ---------------------------------------------------- round-5 signals

def test_char_entropy_hand_computed(spark):
    import math
    from collections import Counter

    from globalweather_etl_spark.functions.text import char_entropy

    texts = ["aaaa", "abab", "hello world", "", None,
             "The quick brown fox jumps over the lazy dog."]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    got = {
        r["i"]: r["e"]
        for r in df.select(
            "i", char_entropy(F.col("t")).alias("e")
        ).collect()
    }

    def ref(t):
        if not t:
            return 0.0
        c = Counter(t)
        s = sum(round(v * math.log(v), 9) for v in c.values())
        return round((math.log(len(t)) - s / len(t)) / 0.6931471805599453, 6)

    assert got == {i: ref(t) for i, t in enumerate(texts)}
    assert got[0] == 0.0          # uniform repetition -> no information
    assert got[1] == 1.0          # two equiprobable symbols -> 1 bit
    assert 4.0 < got[5] < 5.0     # English prose band


def test_char_entropy_zero_shuffle_plan(spark):
    from globalweather_etl_spark.functions.text import char_entropy

    df = spark.createDataFrame([("x",)], "t string").select(
        char_entropy(F.col("t")).alias("h")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_compression_ratio(spark):
    import zlib

    from globalweather_etl_spark.functions.text import compression_ratio

    rows = [(1, "a" * 1000), (2, "The quick brown fox. " * 5), (3, ""),
            (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["compression_ratio"]
        for r in compression_ratio(df).collect()
    }
    for doc_id, text in rows:
        b = (text or "").encode()
        want = (len(zlib.compress(b, 6)) / len(b)) if b else 0.0
        assert got[doc_id] == want
    assert got[1] < 0.05 < got[2]  # repetition compresses far better


def test_normalize_text(spark):
    import duckdb

    from globalweather_etl_spark.functions.text import normalize_text

    rows = [
        (1, "  Hello\t\tWORLD \x07bell\x00 "),
        (2, "Keep,\nlines? (ok) [y]"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    got = {
        r["i"]: (r["a"], r["b"])
        for r in df.select(
            "i",
            normalize_text(F.col("t")).alias("a"),
            normalize_text(F.col("t"), strip_punct=True).alias("b"),
        ).collect()
    }
    assert got[1] == ("hello world bell", "hello world bell")
    assert got[2] == ("keep, lines? (ok) [y]", "keep lines ok y")
    assert got[3] == (None, None)
    # SQL mirror (same regex chain) agrees
    want = duckdb.connect().execute(
        r"""SELECT lower(trim(regexp_replace(regexp_replace(
              'Keep,' || chr(10) || 'lines? (ok) [y]',
              '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g'),
              '\s+', ' ', 'g')))"""
    ).fetchone()[0]
    assert got[2][0] == want


def test_char_entropy_forms_agree(spark):
    """Expression form == aggregate (throughput) form on real docs."""
    from globalweather_etl_spark.functions.text import (
        char_entropy,
        char_entropy_table,
    )
    from globalweather_etl_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    expr = {
        r["doc_id"]: r["h"]
        for r in docs.select(
            "doc_id", char_entropy(F.col("text")).alias("h")
        ).collect()
    }
    agg = {
        r["doc_id"]: r["char_entropy6"]
        for r in char_entropy_table(docs).collect()
    }
    assert expr == {**expr, **agg}  # agg ⊆ expr with equal values
    missing = set(expr) - set(agg)  # only char-less docs may be absent
    assert all(expr[k] == 0.0 for k in missing)
