"""Arrow-vectorized kernels for embedding math (numpy inside Pandas
UDFs).

The expression-based kernels in operators/similarity.py (dot/cosine/
lsh_signature_multi) are engine-portable — DuckDB computes them
bit-identically, which the oracled exact top-k query needs. But Spark
higher-order functions are interpreted, so per-row vector math pays
~dim interpreter dispatches per element; the LSH signature pays
dim x planes x tables PER ROW. At 100 TB that CPU bill dominates
everything else in the scan stage.

These kernels are the scale path: Arrow ships columnar batches to a
worker pool once per partition-batch, numpy does one BLAS matmul per
batch (batch x dim @ dim x planes), and results return as a single
Arrow column. Same plane family, same sign convention, same bucket
keys as the expression form — parity is pinned by test (ulp-level
summation-order differences can only matter if a dot product lands
exactly on 0/threshold, probability ~0 for real-valued planes).

Driver traffic is the plane/centroid matrix only: (tables*planes) x dim
or n_lists x dim doubles — kilobytes, independent of corpus size, the
same shape FAISS ships its coarse quantizer around.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


_PLANE_CACHE: dict[tuple[int, int, int, str], np.ndarray] = {}


def hyperplane_matrix(
    spark: SparkSession,
    dim: int,
    num_planes: int,
    num_tables: int = 1,
    derivation: str = "xxhash64",
) -> np.ndarray:
    """The deterministic hyperplane family as a dense
    (num_tables*num_planes, dim) float64 matrix.

    derivation="xxhash64" (default): component (i, j) =
    pmod(xxhash64(i, j), 2000001)/1e6 - 1 — computed by SPARK
    expressions (a few-thousand-row local job), not a Python
    re-implementation of xxhash64, so the values are bit-identical to
    what lsh_signature_multi derives per row. The i/j operands are
    INTs (sequence literals), matching the expression path's types —
    xxhash64 hashes typed values, so an int/long mismatch would silently
    produce a different plane family.

    derivation="md5": component (i, j) =
    (md5_60bit('i,j') % 2000001)/1e6 - 1 with the 60-bit md5 prefix of
    the 'i,j' decimal string — an ENGINE-PORTABLE family DuckDB derives
    bit-identically in SQL, enabling full cross-engine oracles for the
    LSH operators (the same md5-prefix trick MinHash/SimHash use).

    Memoized per shape+derivation: the family is a pure function of its
    parameters, so repeated operator constructions in one session reuse
    the collected matrix instead of re-running the derivation job."""
    key = (dim, num_planes, num_tables, derivation)
    cached = _PLANE_CACHE.get(key)
    if cached is not None:
        return cached
    n = num_tables * num_planes
    if derivation == "xxhash64":
        comp = (
            F.pmod(F.xxhash64(F.col("i"), F.col("j")), F.lit(2000001))
            / F.lit(1000000.0)
            - F.lit(1.0)
        )
    elif derivation == "md5":
        h60 = F.conv(
            F.substring(F.md5(F.concat_ws(",", F.col("i"), F.col("j"))), 1, 15),
            16,
            10,
        ).cast("long")
        comp = (h60 % F.lit(2000001)) / F.lit(1000000.0) - F.lit(1.0)
    else:
        raise ValueError(f"unknown derivation: {derivation!r}")
    rows = (
        spark.range(1)
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("i")
        )
        .select(
            "i",
            F.explode(F.sequence(F.lit(0), F.lit(dim - 1))).alias("j"),
        )
        .select("i", "j", comp.alias("p"))
        .collect()
    )
    planes = np.empty((n, dim), dtype=np.float64)
    for r in rows:
        planes[r["i"], r["j"]] = r["p"]
    _PLANE_CACHE[key] = planes
    return planes


def _stack(vecs: pd.Series, dim: int) -> np.ndarray:
    """Arrow array<double> batch -> (batch, dim) float64 matrix."""
    return np.array([np.asarray(v, dtype=np.float64) for v in vecs]).reshape(
        len(vecs), dim
    )


def lsh_buckets_arrow(
    spark: SparkSession,
    dim: int,
    num_planes: int,
    num_tables: int,
    derivation: str = "xxhash64",
):
    """Column function: vector -> array<bigint> of num_tables bucket
    keys (bit p of table t = sign(vec . plane[t*num_planes+p]), same
    convention as lsh_signature_multi). One BLAS matmul per Arrow batch."""
    planes_t = hyperplane_matrix(spark, dim, num_planes, num_tables, derivation).T
    weights = (1 << np.arange(num_planes, dtype=np.int64))

    @pandas_udf("array<long>")
    def _buckets(vecs: pd.Series) -> pd.Series:
        m = _stack(vecs, dim)
        bits = (m @ planes_t) >= 0.0  # batch x (tables*planes)
        bits = bits.reshape(len(m), num_tables, num_planes)
        keys = (bits * weights).sum(axis=2).astype(np.int64)
        return pd.Series(list(keys))

    return _buckets


def lsh_buckets_normalized_arrow(
    spark: SparkSession, dim: int, num_planes: int, num_tables: int
):
    """Like lsh_buckets_arrow but returns struct(bs: bucket keys,
    nv: the L2-NORMALIZED vector) in the same batch pass.

    Carrying the normalized vector out of the UDF costs one dim-array
    per ROW across the Arrow boundary — cheap next to the per-PAIR work
    it saves downstream: candidate verification becomes a single dot
    product (cosine of unit vectors) instead of dot + two norms,
    cutting the dominant per-candidate CPU to a third. Zero-norm
    vectors normalize to NaN, matching the division semantics of the
    plain cosine."""
    planes_t = hyperplane_matrix(spark, dim, num_planes, num_tables).T
    weights = (1 << np.arange(num_planes, dtype=np.int64))

    @pandas_udf("struct<bs: array<long>, nv: array<double>>")
    def _buckets_nv(vecs: pd.Series) -> pd.DataFrame:
        m = _stack(vecs, dim)
        bits = (m @ planes_t) >= 0.0
        bits = bits.reshape(len(m), num_tables, num_planes)
        keys = (bits * weights).sum(axis=2).astype(np.int64)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        nv = m / norms
        return pd.DataFrame({"bs": list(keys), "nv": list(nv)})

    return _buckets_nv


def argmax_centroid_arrow(centroids: np.ndarray):
    """Column function: vector -> list_id (1-based) of the centroid with
    the max dot product. Ties go to the LARGER list_id, matching the
    expression path's max_by(list_id, struct(score, list_id)) whose
    lexicographic struct max resolves equal scores by larger id —
    implemented by argmax over the column-reversed score matrix."""
    dim = centroids.shape[1]
    n_lists = centroids.shape[0]
    c_t = centroids.T

    @pandas_udf("int")
    def _assign(vecs: pd.Series) -> pd.Series:
        m = _stack(vecs, dim)
        scores = m @ c_t  # batch x n_lists
        # np.argmax keeps the FIRST max; reversing columns makes "first"
        # mean "largest list_id", then map back to the original index.
        rev = n_lists - 1 - np.argmax(scores[:, ::-1], axis=1)
        return pd.Series((rev + 1).astype(np.int32))

    return _assign


def centroid_rows_to_matrix(
    rows, n_lists: int, dim: int, base: np.ndarray | None = None
) -> np.ndarray:
    """collect()ed (list_id, centroid) rows -> (n_lists, dim) matrix.

    ``base`` seeds lists absent from ``rows`` with their previous
    centroid (a Lloyd step emits no row for a list no vector chose —
    keeping the old centroid is the FAISS convention). Without a base,
    every list must be present."""
    c = np.empty((n_lists, dim), dtype=np.float64) if base is None else base.copy()
    seen = set()
    for r in rows:
        c[r["list_id"] - 1] = np.asarray(r["centroid"], dtype=np.float64)
        seen.add(r["list_id"])
    if base is None and len(seen) != n_lists:
        raise ValueError(f"expected {n_lists} centroids, got {len(seen)}")
    return c
