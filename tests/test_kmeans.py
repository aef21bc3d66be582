"""Spherical k-means: separable fixture, invariants, assignment parity."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.kmeans import (
    assign_clusters,
    cluster_sizes,
    fit_kmeans,
)
from globalweather_etl_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def blobs(spark):
    """Two tight, well-separated direction blobs in R^4."""
    rows = []
    for i in range(40):
        eps = (i % 7) * 0.01
        rows.append((i, [1.0, eps, 0.0, 0.0]))  # blob A ~ +x
        rows.append((100 + i, [0.0, eps, 0.0, -1.0]))  # blob B ~ -w
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_blobs_recovered(blobs):
    cents = fit_kmeans(blobs, 2, iters=4)
    assigned = assign_clusters(blobs, cents)
    groups = (
        assigned.groupBy("cluster_id")
        .agg(F.collect_set((F.col("vec_id") < 100).alias("is_a")).alias("s"))
        .collect()
    )
    # each cluster is pure: one holds only blob A, the other only blob B
    assert sorted(tuple(sorted(r["s"])) for r in groups) == [(False,), (True,)]
    sizes = {r["cluster_id"]: r["n"] for r in cluster_sizes(assigned).collect()}
    assert sorted(sizes.values()) == [40, 40]
    # tight blobs: everyone close to its centroid
    assert assigned.agg(F.min("cluster_sim")).first()[0] > 0.99


def test_deterministic(blobs):
    a = sorted(map(tuple, fit_kmeans(blobs, 2, iters=3).collect()))
    b = sorted(map(tuple, fit_kmeans(blobs, 2, iters=3).collect()))
    assert a == b


def test_objective_not_worse_after_lloyd(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    c0 = fit_kmeans(emb, 8, iters=0)
    c3 = fit_kmeans(emb, 8, iters=3)
    obj0 = assign_clusters(emb, c0).agg(F.avg("cluster_sim")).first()[0]
    obj3 = assign_clusters(emb, c3).agg(F.avg("cluster_sim")).first()[0]
    assert obj3 >= obj0 - 1e-9


def test_assignment_matches_numpy_argmax(spark):
    emb = load_table(spark, SF_DIR, "embeddings").limit(100)
    cents = fit_kmeans(emb, 4, iters=2)
    got = {
        r["vec_id"]: r["cluster_id"]
        for r in assign_clusters(emb, cents).collect()
    }
    C = np.array(
        [r["centroid"] for r in sorted(cents.collect(), key=lambda r: r["cluster_id"])]
    )
    for r in emb.collect():
        scores = C @ np.asarray(r["embedding"], dtype=np.float64)
        best = max(range(len(scores)), key=lambda i: (scores[i], i)) + 1
        assert got[r["vec_id"]] == best


def test_errors(spark, blobs):
    with pytest.raises(ValueError, match="exceeds"):
        fit_kmeans(blobs.limit(3), 5, iters=1)
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        fit_kmeans(empty, 2)


def test_cluster_balanced_cap_composition(spark):
    """Cluster-balanced sampling: fit_kmeans -> assign_clusters ->
    cap_per_group on cluster_id caps every topic at n docs — the
    SemDeDup-adjacent curation move the clustering API exists for."""
    from globalweather_etl_spark.operators.sampling import cap_per_group

    emb = load_table(spark, SF_DIR, "embeddings")
    cents = fit_kmeans(emb, 8, iters=2)
    assigned = assign_clusters(emb, cents)
    capped = cap_per_group(
        assigned, F.col("cluster_id"), F.col("vec_id"), 10
    )
    per = {r["key"] for r in capped.collect()}
    sizes = {r["cluster_id"]: r["n"] for r in cluster_sizes(assigned).collect()}
    kept_per_cluster = (
        assigned.join(
            spark.createDataFrame([(k,) for k in per], "vec_id long"),
            "vec_id",
            "left_semi",
        )
        .groupBy("cluster_id")
        .count()
        .collect()
    )
    for r in kept_per_cluster:
        assert r["count"] == min(10, sizes[r["cluster_id"]])


def test_portable_centroids_are_normalized_id_ordered_seeds(spark):
    """portable_centroids: md5-hash-min sample, numbered in id order,
    components = fold-normalized copies of input vectors — the
    invariants the DuckDB semdedup twin (sd_* rows) depends on."""
    import numpy as np

    from globalweather_etl_spark.operators.kmeans import portable_centroids

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = sorted(
        portable_centroids(emb, 8).collect(), key=lambda r: r["cluster_id"]
    )
    assert [r["cluster_id"] for r in rows] == list(range(1, 9))
    by_vec = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    ids = []
    for r in rows:
        c = np.asarray(r["centroid"], dtype=np.float64)
        assert abs(float(c @ c) - 1.0) < 1e-12  # unit norm
        # must be a normalized copy of SOME input vector
        matches = [
            v
            for v, vec in by_vec.items()
            if np.allclose(vec / np.sqrt(vec @ vec), c, atol=1e-12)
        ]
        assert matches, "centroid is not a normalized input vector"
        ids.append(min(matches))
    assert ids == sorted(ids), "cluster numbering is not id-ordered"
