"""Arrow/numpy vector kernels (operators/vector_arrow.py): plane-family
derivation, memoization, centroid matrix assembly, and the argmax tie
rule — the pieces whose breakage would silently change ANN results.
(End-to-end arrow==expr parity lives in test_similarity.py.)"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.vector_arrow import (
    _PLANE_CACHE,
    argmax_centroid_arrow,
    centroid_rows_to_matrix,
    hyperplane_matrix,
)


def test_hyperplane_matrix_matches_expression_derivation(spark):
    """Component (i, j) must equal the per-row expression form
    pmod(xxhash64(i, j), 2000001)/1e6 - 1 with INT operands — the
    whole parity story rests on this."""
    dim, planes, tables = 5, 3, 2
    mat = hyperplane_matrix(spark, dim, planes, tables)
    assert mat.shape == (tables * planes, dim)
    rows = (
        spark.range(1)
        .select(F.explode(F.sequence(F.lit(0), F.lit(tables * planes - 1))).alias("i"))
        .select("i", F.explode(F.sequence(F.lit(0), F.lit(dim - 1))).alias("j"))
        .select(
            "i",
            "j",
            (
                F.pmod(F.xxhash64(F.col("i"), F.col("j")), F.lit(2000001))
                / F.lit(1000000.0)
                - F.lit(1.0)
            ).alias("p"),
        )
        .collect()
    )
    for r in rows:
        assert mat[r["i"], r["j"]] == r["p"]
    assert (mat >= -1.0).all() and (mat < 1.0).all()


def test_hyperplane_matrix_memoized(spark):
    a = hyperplane_matrix(spark, 7, 2, 2)
    assert (7, 2, 2, "xxhash64") in _PLANE_CACHE
    b = hyperplane_matrix(spark, 7, 2, 2)
    assert a is b
    # md5-derived family is distinct and separately cached
    c = hyperplane_matrix(spark, 7, 2, 2, "md5")
    assert (c != a).any()


def test_centroid_rows_to_matrix_requires_all_without_base():
    rows = [{"list_id": 1, "centroid": [1.0, 0.0]}]
    with pytest.raises(ValueError, match="expected 2"):
        centroid_rows_to_matrix(rows, 2, 2)


def test_centroid_rows_to_matrix_base_fills_missing():
    base = np.array([[9.0, 9.0], [8.0, 8.0]])
    rows = [{"list_id": 2, "centroid": [1.0, 2.0]}]
    mat = centroid_rows_to_matrix(rows, 2, 2, base=base)
    assert mat.tolist() == [[9.0, 9.0], [1.0, 2.0]]
    # base must not be mutated (next Lloyd iteration may reuse it)
    assert base.tolist() == [[9.0, 9.0], [8.0, 8.0]]


def test_argmax_tie_goes_to_larger_list_id(spark):
    """max_by(list_id, struct(score, list_id)) resolves equal scores to
    the LARGER id; the numpy argmax must match (column-reversed trick)."""
    centroids = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]])  # 1 and 3 tie
    assign = argmax_centroid_arrow(centroids)
    df = spark.createDataFrame(
        [(1, [2.0, 0.0]), (2, [0.0, 5.0])], "id long, v array<double>"
    )
    got = {r["id"]: r["list"] for r in df.select("id", assign("v").alias("list")).collect()}
    assert got == {1: 3, 2: 2}
