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


def test_registered_domain_join_psl(spark, tmp_path):
    from pyspark.sql import types as T

    from globalweather_etl_spark.functions.urls import (
        registered_domain_join,
        suffix_table,
    )

    hosts = [
        "www.bbc.co.uk",          # 2-label rule -> bbc.co.uk
        "a.b.example.com",        # default rule -> example.com
        "deep.sub.shop.com.au",   # 2-label rule -> shop.com.au
        "x.pvt.k12.ma.us",        # 4-label rule -> x.pvt.k12.ma.us
        "192.168.0.1",            # IPv4 passthrough
        "localhost",              # single label passthrough
        None,                     # NULL passthrough
    ]
    df = spark.createDataFrame(
        [(h,) for h in hosts],
        T.StructType([T.StructField("host", T.StringType())]),
    )
    out = registered_domain_join(df, "host", suffix_table(spark))
    got = {r["host"]: r["registered_domain"] for r in out.collect()}
    assert got["www.bbc.co.uk"] == "bbc.co.uk"
    assert got["a.b.example.com"] == "example.com"
    assert got["deep.sub.shop.com.au"] == "shop.com.au"
    assert got["x.pvt.k12.ma.us"] == "x.pvt.k12.ma.us"
    assert got["192.168.0.1"] == "192.168.0.1"
    assert got["localhost"] == "localhost"
    assert got[None] is None
    # exactly one output row per input row (no join fan-out)
    assert out.count() == len(hosts)


def test_suffix_table_from_psl_format_file(spark, tmp_path):
    from globalweather_etl_spark.functions.urls import (
        registered_domain_join,
        suffix_table,
    )

    dat = tmp_path / "psl.dat"
    dat.write_text(
        "// ===BEGIN ICANN DOMAINS===\n"
        "com\n"            # single-label: default rule, skipped
        "co.uk\n"
        "CO.JP\n"          # case-normalized
        "co.uk\n"          # duplicate: must not fan out
        "*.ck\n"           # wildcard: skipped
        "!www.ck\n"        # exception: skipped
        "\n"
    )
    sfx = suffix_table(spark, path=str(dat))
    assert {r["suffix"] for r in sfx.collect()} == {"co.uk", "co.jp"}
    df = spark.createDataFrame([("shop.tokyo.co.jp",)], "host string")
    out = registered_domain_join(df, "host", sfx).collect()
    assert out[0]["registered_domain"] == "tokyo.co.jp"


def test_filter_domains_block_and_allow(spark):
    from globalweather_etl_spark.functions.urls import filter_domains

    docs = spark.createDataFrame(
        [
            (1, "https://www.spam.Example.CO.UK/page"),  # sub of blocked
            (2, "http://spam.example.co.uk/x"),
            (3, "https://good.example.org/y"),
            (4, "http://192.168.0.1/z"),  # IP host
            (5, "not a url at all"),
            (6, None),
        ],
        "doc_id long, url string",
    )
    block = ["Example.co.uk"]

    blocked = filter_domains(docs, "url", block, mode="block")
    assert sorted(r["doc_id"] for r in blocked.collect()) == [3, 4, 5, 6]
    assert blocked.columns == docs.columns  # helper cols dropped

    allowed = filter_domains(docs, "url", ["example.org"], mode="allow")
    assert sorted(r["doc_id"] for r in allowed.collect()) == [3]

    # DataFrame-valued list and IP matching
    ips = spark.createDataFrame([("192.168.0.1",)], "domain string")
    assert sorted(
        r["doc_id"] for r in filter_domains(docs, "url", ips, mode="block").collect()
    ) == [1, 2, 3, 5, 6]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="mode"):
        filter_domains(docs, "url", block, mode="deny")
