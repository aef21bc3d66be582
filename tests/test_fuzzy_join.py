"""Fuzzy string join (operators/fuzzy_join.py): exactness vs a DuckDB
brute-force quadratic twin, the short-string completeness path, the
hot-gram cap, and two-table linkage."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.fuzzy_join import (
    char_qgrams,
    fuzzy_join,
    fuzzy_self_pairs,
)

NAMES = [
    "weather station",
    "weather statoin",   # transposition-ish: dist 2 from the first
    "weather stations",  # insertion: dist 1
    "wx",                # short: below the q-gram guarantee bound
    "wxy",               # short, dist 1 from wx
    "ab",                # short, far from everything
    "climate sensor",
    "climate sensor",    # duplicate row: must not duplicate pairs
    "climate censor",    # substitution: dist 1
]


def _brute(rows: list[str], d: int) -> set[tuple[str, str, int]]:
    con = duckdb.connect()
    con.execute("CREATE TABLE t(s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(r,) for r in rows])
    return set(
        con.execute(
            """SELECT a.s, b.s, levenshtein(a.s, b.s)
               FROM (SELECT DISTINCT s FROM t) a
               JOIN (SELECT DISTINCT s FROM t) b ON a.s < b.s
               WHERE levenshtein(a.s, b.s) <= ?""",
            [d],
        ).fetchall()
    )


@pytest.mark.parametrize("d", [1, 2])
def test_self_pairs_match_brute_force(spark, d):
    df = spark.createDataFrame([(s,) for s in NAMES], ["name"])
    got = {
        tuple(r)
        for r in fuzzy_self_pairs(df, "name", max_dist=d).collect()
    }
    assert got == _brute(NAMES, d)
    # the short-string path is actually exercised by this fixture
    assert ("wx", "wxy", 1) in got


def test_self_pairs_on_part_names(spark):
    """Real data: every p_name pair within distance 2, vs DuckDB."""
    sf_dir = "/root/testdata/sf0.001"
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    got = {
        tuple(r) for r in fuzzy_self_pairs(part, "p_name", max_dist=2).collect()
    }
    con = duckdb.connect()
    want = set(
        con.execute(
            f"""WITH n AS (SELECT DISTINCT p_name
                           FROM read_parquet('{sf_dir}/part.parquet'))
                SELECT a.p_name, b.p_name, levenshtein(a.p_name, b.p_name)
                FROM n a JOIN n b ON a.p_name < b.p_name
                WHERE levenshtein(a.p_name, b.p_name) <= 2"""
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_char_qgrams_short_and_exact(spark):
    df = spark.range(1).select(
        char_qgrams(F.lit("abcd"), 2).alias("g4"),
        char_qgrams(F.lit("a"), 2).alias("g1"),
        char_qgrams(F.lit("abab"), 2).alias("gd"),
    )
    row = df.collect()[0]
    assert row.g4 == ["ab", "bc", "cd"]
    assert row.g1 == ["a"]          # below q: the string is its own gram
    assert row.gd == ["ab", "ba"]   # distinct

def test_cap_preserves_result_when_no_gram_is_hot(spark):
    df = spark.createDataFrame([(s,) for s in NAMES], ["name"])
    uncapped = {
        tuple(r) for r in fuzzy_self_pairs(df, "name", max_dist=1).collect()
    }
    capped = {
        tuple(r)
        for r in fuzzy_self_pairs(
            df, "name", max_dist=1, max_gram_freq=len(NAMES)
        ).collect()
    }
    assert capped == uncapped


def test_fuzzy_join_two_tables(spark):
    left = spark.createDataFrame(
        [("Weather Source LLC",), ("Acme Corp",), ("zz",)], ["provider"]
    )
    right = spark.createDataFrame(
        [("Weather Source LL",), ("Acme Corp",), ("zq",), ("unrelated name",)],
        ["vendor"],
    )
    got = {
        tuple(r)
        for r in fuzzy_join(left, right, "provider", "vendor", max_dist=1).collect()
    }
    assert got == {
        ("Weather Source LLC", "Weather Source LL", 1),
        ("Acme Corp", "Acme Corp", 0),   # exact match is the d=0 case
        ("zz", "zq", 1),                 # short-path pair across tables
    }


def test_zero_distance_is_exact_join(spark):
    left = spark.createDataFrame([("abc",), ("def",)], ["k"])
    right = spark.createDataFrame([("abc",), ("deg",)], ["k"])
    got = {tuple(r) for r in fuzzy_join(left, right, "k", "k", max_dist=0).collect()}
    assert got == {("abc", "abc", 0)}


def test_rejects_negative_distance(spark):
    df = spark.createDataFrame([("x",)], ["s"])
    with pytest.raises(ValueError):
        fuzzy_self_pairs(df, "s", max_dist=-1)


def test_resolve_entities_transitive_chains(spark):
    from globalweather_etl_spark.operators.fuzzy_join import resolve_entities

    names = [
        "acme corp",    # chain: a ~ b ~ c though a-c are 2 edits apart
        "acme corp.",
        "acme  corp.",
        "zenith ltd",   # singleton
        "weather hub",  # pair
        "weather hubs",
        "weather hub",  # duplicate row folds into the same entity
    ]
    df = spark.createDataFrame([(s,) for s in names], ["name"])
    got = {
        r["entity"]: (r["canonical"], r["cluster_size"])
        for r in resolve_entities(df, "name", max_dist=1).collect()
    }
    assert got["acme corp"] == ("acme  corp.", 3)  # lexicographic min
    assert got["acme corp."] == ("acme  corp.", 3)
    assert got["acme  corp."] == ("acme  corp.", 3)
    assert got["zenith ltd"] == ("zenith ltd", 1)
    assert got["weather hub"] == ("weather hub", 2)
    assert got["weather hubs"] == ("weather hub", 2)
    assert len(got) == 6  # one row per DISTINCT entity


def test_resolve_entities_real_part_names(spark):
    from globalweather_etl_spark.operators.fuzzy_join import resolve_entities

    part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    out = resolve_entities(part, "p_name", max_dist=1)
    rows = out.collect()
    # invariants: canonical is a member of its own cluster; sizes agree
    by_canon = {}
    for r in rows:
        by_canon.setdefault(r["canonical"], []).append(r)
    for canon, members in by_canon.items():
        assert any(m["entity"] == canon for m in members)
        assert all(m["cluster_size"] == len(members) for m in members)
    assert out.count() == part.select("p_name").distinct().count()


def test_resolve_entities_over_merge_guard(spark):
    """max_cluster_size fails loudly when transitive closure builds a
    giant cluster (the dense-graph over-merge signature) and passes
    untouched when every cluster is within bound."""
    import pytest as _pytest

    from globalweather_etl_spark.operators.fuzzy_join import resolve_entities

    # a 5-long typo chain: every neighbor is 1 edit apart, endpoints far
    chain = ["node aaaa", "node aaab", "node aabb", "node abbb", "node bbbb"]
    df = spark.createDataFrame([(s,) for s in chain + ["other thing"]], ["name"])

    with _pytest.raises(ValueError, match="over-merge guard"):
        resolve_entities(df, "name", max_dist=1, max_cluster_size=3)

    # bound >= actual worst cluster: identical result to the unguarded run
    ok = resolve_entities(df, "name", max_dist=1, max_cluster_size=5)
    got = {r["entity"]: r["cluster_size"] for r in ok.collect()}
    assert got == {**{s: 5 for s in chain}, "other thing": 1}

    with _pytest.raises(ValueError, match="max_cluster_size must be >= 1"):
        resolve_entities(df, "name", max_dist=1, max_cluster_size=0)
