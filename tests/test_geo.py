"""Spatial proximity join (operators/geo.py): hand-computed pairs,
brute-force losslessness, grid guards, haversine vs Python math, and
the no-cartesian plan contract."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.geo import (
    haversine_km,
    planar_radius_join,
)


def _pts(spark, rows, xc="x", yc="y"):
    return spark.createDataFrame(
        [Row(id=i, **{xc: x, yc: y}) for i, (x, y) in enumerate(rows)]
    )


def test_hand_computed_pairs_and_boundary(spark):
    a = _pts(spark, [(0, 0), (100, 100)])
    b = spark.createDataFrame(
        [
            Row(bid=0, bx=3, by=4),      # dist2 25 <= 25  (boundary IN)
            Row(bid=1, bx=0, by=6),      # dist2 36 > 25   (out)
            Row(bid=2, bx=103, by=96),   # dist2 25 from (100,100)
        ]
    )
    out = planar_radius_join(
        a, b, radius=5, left_cols=("x", "y"), right_cols=("bx", "by")
    ).collect()
    got = sorted((r["id"], r["bid"], r["dist2"]) for r in out)
    assert got == [(0, 0, 25), (1, 2, 25)]


def test_lossless_vs_brute_force(spark):
    rng = random.Random(7)
    A = [(rng.randrange(-500, 500), rng.randrange(-500, 500)) for _ in range(120)]
    B = [(rng.randrange(-500, 500), rng.randrange(-500, 500)) for _ in range(90)]
    R = 60
    expect = sorted(
        (i, j)
        for i, (ax, ay) in enumerate(A)
        for j, (bx, by) in enumerate(B)
        if (ax - bx) ** 2 + (ay - by) ** 2 <= R * R
    )
    assert expect  # non-degenerate fixture
    a = _pts(spark, A)
    b = _pts(spark, B, xc="bx", yc="by").withColumnRenamed("id", "bid")
    for cell in (R, R * 3):  # tightest grid and a coarser one
        out = planar_radius_join(
            a, b, radius=R,
            left_cols=("x", "y"), right_cols=("bx", "by"), cell=cell,
        ).collect()
        assert sorted((r["id"], r["bid"]) for r in out) == expect, cell
        # distances are exact integers
        for r in out:
            assert r["dist2"] <= R * R


def test_guards(spark):
    a = _pts(spark, [(0, 0)])
    b = _pts(spark, [(0, 0)], xc="bx", yc="by")
    with pytest.raises(ValueError, match="radius"):
        planar_radius_join(
            a, b, radius=0, right_cols=("bx", "by")
        )
    with pytest.raises(ValueError, match="cell"):
        planar_radius_join(
            a, b, radius=10, cell=5, right_cols=("bx", "by")
        )


def test_overlapping_coordinate_names_rejected(spark):
    """Same coordinate column name on both sides would be a cryptic
    ambiguous-reference AnalysisException at verify time — the
    operator must reject it up front with an actionable message
    (notably the ('x','y')/('x','y') DEFAULTS, which are unusable
    together)."""
    a = _pts(spark, [(0, 0)])
    with pytest.raises(ValueError, match="disjoint"):
        planar_radius_join(a, a, radius=5)  # both sides default x,y
    with pytest.raises(ValueError, match="disjoint"):
        planar_radius_join(
            a, a, radius=5, left_cols=("x", "y"), right_cols=("x", "ry")
        )


def test_no_cartesian_in_plan(spark):
    a = _pts(spark, [(0, 0), (9, 9)])
    b = _pts(spark, [(1, 1)], xc="bx", yc="by").withColumnRenamed(
        "id", "bid"
    )
    plan = (
        planar_radius_join(
            a, b, radius=5,
            left_cols=("x", "y"), right_cols=("bx", "by"),
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_haversine_vs_python_math(spark):
    rng = random.Random(3)
    rows = [
        Row(
            lat1=rng.uniform(-89, 89), lon1=rng.uniform(-180, 180),
            lat2=rng.uniform(-89, 89), lon2=rng.uniform(-180, 180),
        )
        for _ in range(50)
    ] + [Row(lat1=0.0, lon1=0.0, lat2=0.0, lon2=0.0)]
    df = spark.createDataFrame(rows)
    got = df.select(
        "lat1", "lon1", "lat2", "lon2",
        haversine_km(
            F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")
        ).alias("km"),
    ).collect()

    def ref(la1, lo1, la2, lo2):
        p1, p2 = math.radians(la1), math.radians(la2)
        dphi = math.radians(la2 - la1)
        dlmb = math.radians(lo2 - lo1)
        a = (
            math.sin(dphi / 2) ** 2
            + math.cos(p1) * math.cos(p2) * math.sin(dlmb / 2) ** 2
        )
        return 2.0 * 6371.0088 * math.asin(math.sqrt(a))

    for r in got:
        assert r["km"] == pytest.approx(
            ref(r["lat1"], r["lon1"], r["lat2"], r["lon2"]), abs=1e-9
        )


def test_knn_hand_computed_and_bounded(spark):
    from globalweather_etl_spark.operators.geo import planar_knn_join

    a = _pts(spark, [(0, 0)])
    b = spark.createDataFrame(
        [
            Row(bid=0, bx=1, by=0),    # dist2 1
            Row(bid=1, bx=0, by=2),    # dist2 4
            Row(bid=2, bx=2, by=2),    # dist2 8
            Row(bid=3, bx=0, by=3),    # dist2 9 (cut by k)
            Row(bid=4, bx=50, by=50),  # outside max_radius
        ]
    )
    out = planar_knn_join(
        a, b, k=3, max_radius=10, left_id="id",
        left_cols=("x", "y"), right_cols=("bx", "by"), right_id="bid",
    ).collect()
    got = sorted((r["knn_rank"], r["bid"], r["dist2"]) for r in out)
    assert got == [(1, 0, 1), (2, 1, 4), (3, 2, 8)]


def test_knn_tie_determinism(spark):
    """Equal distances rank by (bx, by, right_id) — stable across
    runs and engines."""
    from globalweather_etl_spark.operators.geo import planar_knn_join

    a = _pts(spark, [(0, 0)])
    b = spark.createDataFrame(
        [Row(bid=9, bx=0, by=5), Row(bid=1, bx=5, by=0),
         Row(bid=5, bx=0, by=-5)]
    )  # all dist2 = 25
    out = planar_knn_join(
        a, b, k=3, max_radius=5, left_id="id",
        left_cols=("x", "y"), right_cols=("bx", "by"), right_id="bid",
    ).collect()
    ranked = [r["bid"] for r in sorted(out, key=lambda r: r["knn_rank"])]
    assert ranked == [5, 9, 1]  # by (bx, by): (0,-5) < (0,5) < (5,0)
