"""SemDeDup: hand-built epsilon-groups, keep-policy semantics,
eps monotonicity, determinism, and the real-embeddings composition."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.semdedup import semdedup
from globalweather_etl_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _vec(angle, scale=1.0):
    return [scale * math.cos(angle), scale * math.sin(angle)]


@pytest.fixture(scope="module")
def blobs(spark):
    # two well-separated directions; b-blob holds a near-duplicate pair
    rows = [
        (1, _vec(0.00)),          # a-blob
        (2, _vec(0.05)),          # a-blob, near-dup of 1 (cos ~ .9988)
        (3, _vec(1.57)),          # b-blob
        (4, _vec(1.57, 2.0)),     # b-blob, same direction as 3 (cos = 1)
        (5, _vec(1.30)),          # b-blob outlier
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_epsilon_groups_and_survivors(spark, blobs):
    out = semdedup(blobs, n_clusters=2, eps=0.999, keep="min_id").collect()
    kept = {r["vec_id"] for r in out if r["is_kept"]}
    # only the exact-direction pair (3,4) exceeds .999; min-id keeps 3
    assert 3 in kept and 4 not in kept
    assert {1, 2, 5} <= kept
    # clusters separate the two directions
    cl = {r["vec_id"]: r["cluster_id"] for r in out}
    assert cl[1] == cl[2] and cl[3] == cl[4] == cl[5] and cl[1] != cl[3]


def test_far_from_centroid_keeps_the_outlier(spark, blobs):
    out = {
        r["vec_id"]: r
        for r in semdedup(
            blobs, n_clusters=2, eps=0.999, keep="far_from_centroid"
        ).collect()
    }
    # within the (3,4) pair the member with LOWER centroid similarity
    # survives; both can't survive
    assert out[3]["is_kept"] != out[4]["is_kept"]
    kept = 3 if out[3]["is_kept"] else 4
    dropped = 7 - kept
    assert out[kept]["cluster_sim"] <= out[dropped]["cluster_sim"]


def test_eps_monotonicity(spark, blobs):
    loose = semdedup(blobs, n_clusters=2, eps=0.95, keep="min_id")
    tight = semdedup(blobs, n_clusters=2, eps=0.9999, keep="min_id")
    n_loose = loose.filter("is_kept").count()
    n_tight = tight.filter("is_kept").count()
    assert n_loose <= n_tight  # lower eps prunes at least as much
    # at eps=.95 the (1,2) pair collapses AND 5 falls into 3's
    # epsilon-ball (cos(0.27 rad) ~ .964): only the two group minima survive
    assert n_loose == 2


def test_always_at_least_one_survivor_per_group(spark):
    # five identical vectors: exactly one survives whatever the policy
    df = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(1, 6)],
        "vec_id long, embedding array<double>",
    )
    for keep in ("min_id", "far_from_centroid"):
        out = semdedup(df, n_clusters=1, eps=0.99, keep=keep)
        assert out.filter("is_kept").count() == 1


def test_deterministic_and_real_embeddings(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    a = semdedup(emb, n_clusters=8, eps=0.97).orderBy("vec_id").collect()
    b = semdedup(emb, n_clusters=8, eps=0.97).orderBy("vec_id").collect()
    assert [(r["vec_id"], r["cluster_id"], r["is_kept"]) for r in a] == [
        (r["vec_id"], r["cluster_id"], r["is_kept"]) for r in b
    ]
    kept = sum(1 for r in a if r["is_kept"])
    assert 0 < kept <= emb.count()


def test_errors(spark, blobs):
    with pytest.raises(ValueError):
        semdedup(blobs, n_clusters=2, keep="best")
    with pytest.raises(ValueError):
        semdedup(blobs, n_clusters=2, eps=1.5)
