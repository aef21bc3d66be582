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

from globalweather_etl_spark.operators.partitioning import spread_for_compute


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
    embeddings = spread_for_compute(embeddings)
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


def lsh_signature(vec: Column, dim: int, num_planes: int = 16) -> Column:
    """Random-hyperplane signature: bit i = sign(vec . plane_i), folded
    into a BIGINT bucket key.

    Hyperplane component j of plane i derives from xxhash64(i, j) mapped
    to [-1, 1) — deterministic, no RNG state, no driver-side arrays.
    Plane indices come from sequence() and components from a nested
    transform, so the expression tree is constant-size in (dim,
    num_planes) instead of materializing dim literals per plane — the
    naive unrolled form took seconds just to codegen."""
    plane_idx = F.sequence(F.lit(0), F.lit(num_planes - 1))
    comp_idx = F.sequence(F.lit(0), F.lit(dim - 1))
    dots = F.transform(
        plane_idx,
        lambda i: F.aggregate(
            F.zip_with(
                vec,
                F.transform(
                    comp_idx,
                    lambda j: F.pmod(F.xxhash64(i, j), F.lit(2000001))
                    / F.lit(1000000.0)
                    - F.lit(1.0),
                ),
                lambda x, p: x * p,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    masks = F.array(*[F.lit(1 << i).cast("long") for i in range(num_planes)])
    return F.aggregate(
        F.zip_with(
            dots,
            masks,
            lambda d, m: F.when(d >= 0, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, m: acc.bitwiseOR(m),
    )


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
    embeddings = spread_for_compute(embeddings)
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
