"""Similarity-search operators: exact path is oracle-checked by the
driver harness; here we pin the approximate paths' contracts — shape,
determinism, and recall against the exact brute force."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.similarity import (
    _as_double,
    cosine,
    cosine_topk,
    ivf_cosine_topk,
    lsh_cosine_topk,
    lsh_range_pairs,
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


@pytest.fixture(scope="module")
def brute_range_pairs(emb):
    """Exact cosine >= 0.4 pairs — the oracle baseline for range search."""
    e = emb.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    a, b = e.alias("a"), e.alias("b")
    rows = (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            cosine(F.col("a.v"), F.col("b.v")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.4)
        .collect()
    )
    return {(r["id_a"], r["id_b"]): r["cos_sim"] for r in rows}


def test_lsh_range_pairs_precision_exact(emb, brute_range_pairs):
    """Every emitted pair must be a true >= threshold pair with the
    exact cosine value (verification makes precision 1.0).

    The default arrow impl scores with numpy, whose pairwise summation
    order differs from the brute-force expression fold at the last ulp
    — compare with a 1e-9 tolerance there; the portable expr impl folds
    in the same order as the oracle and must match bit-for-bit."""
    for impl, tol in (("arrow", 1e-9), ("expr", 0.0)):
        rows = lsh_range_pairs(
            emb, threshold=0.4, dim=64, num_planes=4, num_tables=6, impl=impl
        ).collect()
        assert rows, impl
        for r in rows:
            key = (r["id_a"], r["id_b"])
            assert key in brute_range_pairs, impl
            assert abs(r["cos_sim"] - brute_range_pairs[key]) <= tol, impl


def test_arrow_expr_parity(emb, queries):
    """The arrow (numpy-vectorized) and expr (portable expression)
    implementations must agree: identical LSH bucket keys per (id,
    table) — the plane family is derived from the same xxhash64 stream
    — and identical ANN result sets (rank ties and ulp-boundary flips
    would surface here as symmetric differences)."""
    from globalweather_etl_spark.operators.similarity import _bucketize

    base = emb.select(
        F.col("vec_id").alias("id"), _as_double(F.col("embedding")).alias("v")
    )
    ba, _ = _bucketize(base, "v", 64, 4, 3, "arrow")
    be, _ = _bucketize(base, "v", 64, 4, 3, "expr")
    sel = ["id", "table", "bucket"]
    assert ba.select(*sel).exceptAll(be.select(*sel)).count() == 0
    assert be.select(*sel).exceptAll(ba.select(*sel)).count() == 0

    keys = ["query_id", "cand_id", "rank"]
    ia = ivf_cosine_topk(emb, queries, k=5, n_lists=8, n_probe=2, impl="arrow")
    ie = ivf_cosine_topk(emb, queries, k=5, n_lists=8, n_probe=2, impl="expr")
    assert ia.select(*keys).exceptAll(ie.select(*keys)).count() == 0
    la = lsh_cosine_topk(emb, queries, k=5, dim=64, impl="arrow")
    le = lsh_cosine_topk(emb, queries, k=5, dim=64, impl="expr")
    assert la.select(*keys).exceptAll(le.select(*keys)).count() == 0


def test_lsh_range_pairs_recall_floor(emb, brute_range_pairs):
    rows = lsh_range_pairs(
        emb, threshold=0.4, dim=64, num_planes=4, num_tables=6
    ).collect()
    recall = len(rows) / max(1, len(brute_range_pairs))
    assert recall >= 0.5, f"recall {recall} over {len(brute_range_pairs)} pairs"


def test_lsh_range_pairs_deterministic(emb):
    a = lsh_range_pairs(emb, threshold=0.4, dim=64, num_planes=4).collect()
    b = lsh_range_pairs(emb, threshold=0.4, dim=64, num_planes=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_docs_embedding_neardup_contract(spark):
    """Doc-level semantic near-dup (registry query): keeper is always
    the lower doc_id, precision is exact versus the brute >= 0.4 pair
    set, and the dup-side metadata matches the documents table."""
    from globalweather_etl_spark.queries import q_docs_embedding_neardup

    rows = q_docs_embedding_neardup(spark, SF_DIR).collect()
    assert rows, "synthetic corpus should contain >=1 near-dup pair"
    docs = {
        r["doc_id"]: r
        for r in load_table(spark, SF_DIR, "documents").collect()
    }
    emb_df = load_table(spark, SF_DIR, "embeddings")
    e = emb_df.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    a, b = e.alias("a"), e.alias("b")
    brute = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            cosine(F.col("a.v"), F.col("b.v")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.4)
        .collect()
    }
    for r in rows:
        assert r["keep_doc_id"] < r["dup_doc_id"]
        assert (r["keep_doc_id"], r["dup_doc_id"]) in brute
        assert r["cos_sim"] >= 0.4
        d = docs[r["dup_doc_id"]]
        assert (r["dup_lang"], r["dup_n_chars"]) == (d["lang"], d["n_chars"])
    assert len(rows) / len(brute) >= 0.5, "recall floor vs brute baseline"
