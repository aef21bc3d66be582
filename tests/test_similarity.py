"""Similarity-search operators: exact path is oracle-checked by the
driver harness; here we pin the approximate paths' contracts — shape,
determinism, and recall against the exact brute force."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.similarity import (
    cosine_topk,
    ivf_cosine_topk,
    lsh_cosine_topk,
)
from globalweather_etl_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 10)


@pytest.fixture(scope="module")
def exact(emb, queries):
    rows = cosine_topk(emb, queries, k=5).collect()
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["cand_id"])
    return out


def _recall(approx_rows, exact_sets) -> float:
    got: dict[int, set[int]] = {}
    for r in approx_rows:
        got.setdefault(r["query_id"], set()).add(r["cand_id"])
    hits = sum(len(got.get(q, set()) & s) for q, s in exact_sets.items())
    total = sum(len(s) for s in exact_sets.values())
    return hits / total


def test_ivf_shape_and_determinism(emb, queries):
    a = ivf_cosine_topk(emb, queries, k=5, n_lists=8, n_probe=2).collect()
    b = ivf_cosine_topk(emb, queries, k=5, n_lists=8, n_probe=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per_query: dict[int, list] = {}
    for r in a:
        per_query.setdefault(r["query_id"], []).append(r)
    for q, rows in per_query.items():
        assert len(rows) <= 5
        assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))


def test_ivf_full_probe_equals_exact(emb, queries, exact):
    """Probing every list IS the exact search — recall must be 1."""
    rows = ivf_cosine_topk(emb, queries, k=5, n_lists=8, n_probe=8).collect()
    assert _recall(rows, exact) == 1.0


def test_ivf_partial_probe_recall_reasonable(emb, queries, exact):
    rows = ivf_cosine_topk(
        emb, queries, k=5, n_lists=8, n_probe=4, refine_iters=1
    ).collect()
    assert _recall(rows, exact) >= 0.4


def test_lsh_recall_floor(emb, queries, exact):
    rows = lsh_cosine_topk(emb, queries, k=5, dim=64, num_planes=4).collect()
    assert _recall(rows, exact) >= 0.3
