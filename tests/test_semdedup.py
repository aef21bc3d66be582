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


# ---------------- fully-exact composition (round 13)


def test_semdedup_exact_matches_python_twin(spark):
    """kmeans_exact clustering + exact rational cosine dominance must
    equal a from-scratch Python implementation bit-for-bit."""
    import random
    from fractions import Fraction

    from globalweather_etl_spark.operators.semdedup import (
        semdedup_exact,
    )
    from tests.test_kmeans import _py_kmeans_exact

    rng = random.Random(71)
    base = [
        [rng.uniform(-1, 1) for _ in range(8)] for _ in range(12)
    ]
    vecs = {}
    vid = 0
    for v in base:
        vecs[vid] = v
        vid += 1
        # a few near-duplicates: tiny perturbations of the base rows
        if rng.random() < 0.5:
            vecs[vid] = [x * 1.001 for x in v]
            vid += 1
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    vecs_f = {r["vec_id"]: r["embedding"] for r in df.collect()}
    got = {
        r["vec_id"]: (r["cluster_id"], r["is_kept"])
        for r in semdedup_exact(
            df, n_clusters=3, eps_pct=95, n_iter=2
        ).collect()
    }

    # Python twin
    assign, _ = _py_kmeans_exact(vecs_f, 3, 2)

    def q(x):
        from decimal import Decimal, ROUND_HALF_UP

        return int(
            Decimal(repr(float(x) * 1e6)).quantize(
                0, rounding=ROUND_HALF_UP
            )
        )

    qv = {i: [q(x) for x in v] for i, v in vecs_f.items()}
    kept = {}
    for i, (di, ci) in assign.items():
        dom = False
        for j, (dj, cj) in assign.items():
            if j == i or cj != ci:
                continue
            if not (dj > di or (dj == di and j < i)):
                continue
            dot = sum(a * b for a, b in zip(qv[i], qv[j]))
            ni = sum(a * a for a in qv[i])
            nj = sum(a * a for a in qv[j])
            if dot >= 0 and Fraction(10000 * dot * dot) >= Fraction(
                95 * 95 * ni * nj
            ):
                dom = True
                break
        kept[i] = (ci, not dom)
    assert got == kept
    # the near-duplicate pairs actually exercised the prune path
    assert any(not k for _, k in got.values())
    assert any(k for _, k in got.values())


def test_semdedup_exact_guards(spark):
    from globalweather_etl_spark.operators.semdedup import (
        semdedup_exact,
    )

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1])],
        "vec_id long, embedding array<float>",
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="eps_pct"):
        semdedup_exact(df, 1, eps_pct=0)
    with _pytest.raises(ValueError, match="keep"):
        semdedup_exact(df, 1, keep="nope")
    # min_id policy: the lower id always survives its epsilon-group
    out = {
        r["vec_id"]: r["is_kept"]
        for r in semdedup_exact(
            df, n_clusters=1, eps_pct=90, keep="min_id"
        ).collect()
    }
    assert out[0] is True and out[1] is False


def test_semdedup_exact_custom_id_col_and_shared_assignments(spark):
    from globalweather_etl_spark.operators.kmeans import kmeans_exact
    from globalweather_etl_spark.operators.semdedup import (
        semdedup_exact,
    )

    df = spark.createDataFrame(
        [(i, [1.0, float(i % 2)]) for i in range(6)],
        "doc_id long, emb array<float>",
    )
    out = semdedup_exact(
        df, n_clusters=2, eps_pct=95, n_iter=1,
        id_col="doc_id", vec_col="emb",
    )
    assert {"doc_id", "cluster_id", "dist2", "is_kept"} <= set(
        out.columns
    )
    assert out.count() == 6
    # pre-fit assignments give the identical verdicts
    a, _ = kmeans_exact(
        df, n_clusters=2, n_iter=1, id_col="doc_id", vec_col="emb"
    )
    out2 = semdedup_exact(
        df, n_clusters=2, eps_pct=95, id_col="doc_id",
        vec_col="emb", assigned=a,
    )
    assert sorted(
        (r["doc_id"], r["is_kept"]) for r in out.collect()
    ) == sorted((r["doc_id"], r["is_kept"]) for r in out2.collect())
