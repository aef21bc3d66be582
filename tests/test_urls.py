"""URL kernel: hand-computed cases + DuckDB regexp parity for host
extraction (the dedup-critical path)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from globalweather_etl_spark.functions.urls import (
    registered_domain,
    url_host,
    url_normalize,
)


def _run(spark, urls, col):
    df = spark.createDataFrame(
        [(u,) for u in urls], T.StructType([T.StructField("u", T.StringType())])
    )
    return [r["v"] for r in df.select(col(F.col("u")).alias("v")).collect()]


CASES = [
    ("https://WWW.Example.COM/Path/Q?x=1#frag", "www.example.com"),
    ("http://sub.a.co.uk:8080/x", "sub.a.co.uk"),
    ("https://192.168.0.1/admin", "192.168.0.1"),
    ("ftp://files.example.org", "files.example.org"),
    ("not a url", None),
    ("/relative/path", None),
]


def test_url_host_hand_computed(spark):
    got = _run(spark, [c[0] for c in CASES], url_host)
    assert got == [c[1] for c in CASES]


def test_url_normalize(spark):
    cases = {
        "HTTPS://Example.COM/": "https://example.com",
        "https://Example.com/Path/It?q=Z#sec": "https://example.com/Path/It?q=Z",
        "http://a.b/x/": "http://a.b/x/",  # only bare-authority slash strips
    }
    got = _run(spark, list(cases), url_normalize)
    assert got == list(cases.values())


def test_registered_domain(spark):
    cases = {
        "www.example.com": "example.com",
        "a.b.news.co.uk": "news.co.uk",
        "example.org": "example.org",
        "192.168.0.1": "192.168.0.1",
        "localhost": "localhost",
    }
    got = _run(spark, list(cases), registered_domain)
    assert got == list(cases.values())


def test_host_extraction_duckdb_parity(spark):
    import duckdb

    urls = [c[0] for c in CASES] + [
        "https://x.y.z:443/deep/path?a=b&c=d",
        "scheme+ext://Host.Name/path",
    ]
    got = _run(spark, urls, url_host)
    con = duckdb.connect()
    want = []
    for u in urls:
        h, = con.execute(
            r"SELECT lower(nullif(regexp_extract(?,"
            r" '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]+)', 1), ''))",
            [u],
        ).fetchone()
        want.append(h)
    assert got == want
