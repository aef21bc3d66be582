"""connected_components / neardup_clusters: hand-computed fixtures
(chains, hubs, singletons) + DuckDB recursive-CTE parity on the real
minhash pair graph — the independent-engine check the cluster
assignment feeding curate_documents previously lacked."""

from __future__ import annotations

from pyspark.sql import functions as F

from globalweather_etl_spark.operators.components import (
    connected_components,
    neardup_clusters,
)
from globalweather_etl_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _labels(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }


def test_chain_hub_and_duplicate_edges(spark):
    # chain 1-2-3-4-5 (worst case for naive propagation), hub 10 with
    # spokes, duplicate + reversed + self-loop edges tolerated
    edges = [
        (1, 2), (2, 3), (3, 4), (4, 5),
        (10, 11), (10, 12), (10, 13), (12, 10), (10, 10),
        (20, 21), (21, 20),
    ]
    got = _labels(spark, edges)
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
        10: 10, 11: 10, 12: 10, 13: 10,
        20: 20, 21: 20,
    }


def test_neardup_clusters_sizes_and_singletons(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(1, 8)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    rows = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["is_canonical"])
        for r in neardup_clusters(docs, pairs).collect()
    }
    assert rows == {
        1: (1, 3, 1), 2: (1, 3, 0), 3: (1, 3, 0),
        4: (4, 1, 1),
        5: (5, 2, 1), 6: (5, 2, 0),
        7: (7, 1, 1),
    }


def test_duckdb_recursive_parity_on_real_pairs(spark):
    """Components over the actual minhash_lsh_pairs graph at sf0.001,
    cross-checked against a DuckDB recursive min-label walk."""
    import duckdb

    from globalweather_etl_spark.operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, SF_DIR, "documents")
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, num_hashes=32, bands=8,
        threshold=0.5, hash_fn="md5", max_doc_freq=64,
    ).select("doc_a", "doc_b")
    edge_rows = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    assert edge_rows, "fixture needs a non-empty pair graph"
    got = {
        r["node"]: r["component"]
        for r in connected_components(
            spark.createDataFrame(edge_rows, "doc_a long, doc_b long")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE e (u BIGINT, v BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edge_rows)
    want = {
        r[0]: r[1]
        for r in con.execute("""
WITH RECURSIVE
edges AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
walk AS (
  SELECT u AS node, u AS label FROM (SELECT DISTINCT u FROM edges) n
  UNION
  SELECT e2.v AS node, w.label FROM walk w JOIN edges e2 ON e2.u = w.node)
SELECT node, min(label) FROM walk GROUP BY node
""").fetchall()
    }
    assert got == want


def test_fused_round_equals_composed_stars(spark):
    # _cc_round must emit exactly _canonical(_small_star(_large_star(e)))
    # on canonical inputs — the redundant-dedup removals are identities
    # there (round-14 optimization; see _cc_round's docstring).
    from globalweather_etl_spark.operators.components import (
        _canonical,
        _cc_round,
        _large_star,
        _small_star,
    )

    fixtures = [
        # chain, hub, two-cliques bridged, random-ish blob
        [(1, 2), (2, 3), (3, 4), (4, 5)],
        [(10, 11), (10, 12), (10, 13), (11, 12)],
        [(1, 2), (1, 3), (2, 3), (7, 8), (7, 9), (8, 9), (3, 7)],
        [(5, 9), (2, 9), (14, 2), (6, 14), (3, 8), (8, 11), (1, 4)],
    ]
    for edges in fixtures:
        e = _canonical(
            spark.createDataFrame(edges, "u long, v long")
        )
        want = sorted(
            (r["u"], r["v"])
            for r in _canonical(_small_star(_large_star(e))).collect()
        )
        got = sorted((r["u"], r["v"]) for r in _cc_round(e).collect())
        assert got == want, (edges, got, want)
