"""Similarity search over embedding columns (array<float>).

Two paths:
  cosine_topk      exact brute force — the baseline and the oracle target
  lsh_cosine_topk  random-hyperplane LSH bucketing — the 100 TB path:
                   probe only candidates sharing a signature bucket

Everything is built-in higher-order functions (zip_with/aggregate) over
double-cast arrays — JVM-side, no UDF, so the dot products run inside
codegen and the oracle (DuckDB list_dot_product on DOUBLE[]) accumulates
in the same left-to-right order -> bit-identical scores.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ a_i*b_i via zip_with + left-fold aggregate (sequential order —
    deterministic and engine-portable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    Plan shape: broadcast the (small) query set against the (huge)
    candidate table — a broadcast nested-loop scoring pass, no shuffle
    of the candidates; then per-query top-k. Top-k uses row_number over
    a window partitioned BY QUERY — parallelism = #queries, each
    partition holds only candidate scores, and ties break on candidate
    id for determinism."""
    cand = embeddings.select(
        F.col(id_col).alias("cand_id"), _as_double(F.col(vec_col)).alias("cvec")
    )
    qry = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qvec")
    )
    scored = (
        cand.crossJoin(F.broadcast(qry))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            cosine(F.col("qvec"), F.col("cvec")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )


def _hyperplane(dim: int, plane_idx: int) -> Column:
    """Deterministic pseudo-random hyperplane: component j of plane i is
    derived from xxhash64(i, j) mapped to [-1, 1). No RNG state, no
    driver-side arrays — reproducible across runs and engines."""
    return F.array(
        *[
            (
                F.pmod(F.xxhash64(F.lit(plane_idx), F.lit(j)), F.lit(2000001))
                / F.lit(1000000.0)
                - F.lit(1.0)
            )
            for j in range(dim)
        ]
    )


def lsh_signature(vec: Column, dim: int, num_planes: int = 16) -> Column:
    """Random-hyperplane signature: bit i = sign(vec . plane_i), folded
    into a BIGINT bucket key."""
    sig = F.lit(0).cast("long")
    for i in range(num_planes):
        bit = F.when(dot(vec, _hyperplane(dim, i)) >= 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig.bitwiseOR(bit)
    return sig


def lsh_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only candidates in the query's LSH
    bucket. At 100 TB the bucket join replaces the full scoring pass —
    shuffle keys are bucket ids (2^num_planes of them), candidates are
    ~1/2^num_planes of the table per query. Recall tunes with
    num_planes (fewer planes = bigger buckets = higher recall)."""
    cand = embeddings.select(
        F.col(id_col).alias("cand_id"),
        _as_double(F.col(vec_col)).alias("cvec"),
    ).withColumn("bucket", lsh_signature(F.col("cvec"), dim, num_planes))
    qry = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qvec"),
    ).withColumn("bucket", lsh_signature(F.col("qvec"), dim, num_planes))
    scored = (
        cand.join(F.broadcast(qry), "bucket")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            cosine(F.col("qvec"), F.col("cvec")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )
