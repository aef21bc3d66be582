"""Point-in-polygon join rehearsal (round 12): millions of points vs
tens of thousands of polygons — bbox grid blocking must keep the
candidate count near |points| x (covered fraction), nowhere near the
all-pairs product.

Deterministic pseudo-random fixture on a 1e9 x 1e9 integer plane:
``n_pts`` points and ``n_polys`` 6-vertex polygons whose vertices
scatter +/- ``half_box`` around their centers. Records wall, inside
pairs, candidate pairs examined (the cell-join size before the PIP
fold), and candidates per inside pair. A NumPy even-odd reference
verifies the inside COUNT over a deterministic 1/256 subsample of
the points so the check is independent of the operator's own fold.

Usage: python tools/rehearse_pip.py [n_pts] [n_polys] [half_box]
Prints one JSON line; paste into docs/PERF.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from globalweather_etl_spark.operators.geo import (
    planar_point_in_polygon_join,
)
from globalweather_etl_spark.session import get_spark

SIDE = 1_000_000_000
NV = 6


def main() -> None:
    n_pts = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_polys = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    half_box = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000_000
    spark = get_spark(
        app_name="rehearse-pip",
        master="local[8]",
        shuffle_partitions=64,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    pts = spark.range(0, n_pts, 1, 32).select(
        F.col("id").alias("pt_id"),
        F.pmod(F.xxhash64("id", F.lit("px")), F.lit(SIDE)).alias("x"),
        F.pmod(F.xxhash64("id", F.lit("py")), F.lit(SIDE)).alias("y"),
    )

    def vtx(i, tag, ctag):
        c = F.pmod(F.xxhash64("id", F.lit(ctag)), F.lit(SIDE))
        d = F.pmod(
            F.xxhash64("id", F.lit(tag), i), F.lit(2 * half_box + 1)
        ) - F.lit(half_box)
        return c + d

    polys = spark.range(0, n_polys, 1, 8).select(
        F.col("id").alias("pg_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(NV - 1)),
            lambda i: F.struct(
                vtx(i, "vx", "cx").alias("x"),
                vtx(i, "vy", "cy").alias("y"),
            ),
        ).alias("vertices"),
    )

    t0 = time.perf_counter()
    inside = planar_point_in_polygon_join(
        pts, polys, "pt_id", "pg_id"
    )
    n_inside = inside.count()
    wall = time.perf_counter() - t0

    # candidate pairs = the cell join BEFORE the fold: rebuild the
    # blocking exactly (cell = max bbox side, same derivation)
    verts = F.col("vertices")
    bx_min = F.array_min(F.transform(verts, lambda v: v["x"]))
    bx_max = F.array_max(F.transform(verts, lambda v: v["x"]))
    by_min = F.array_min(F.transform(verts, lambda v: v["y"]))
    by_max = F.array_max(F.transform(verts, lambda v: v["y"]))
    cell = int(
        polys.agg(
            F.max(F.greatest(bx_max - bx_min, by_max - by_min))
        ).first()[0]
    )
    cl = F.lit(cell)
    rhs = polys.withColumn(
        "cx", F.explode(F.sequence(F.floor(bx_min / cl), F.floor(bx_max / cl)))
    ).withColumn(
        "cy", F.explode(F.sequence(F.floor(by_min / cl), F.floor(by_max / cl)))
    ).select("pg_id", "cx", "cy")
    lhs = pts.select(
        "pt_id", F.floor(F.col("x") / cl).alias("cx"),
        F.floor(F.col("y") / cl).alias("cy"),
    )
    n_cand = lhs.join(rhs, ["cx", "cy"]).count()

    # independent NumPy even-odd reference on a 1/256 point subsample
    import numpy as np

    sub = pts.filter(F.col("pt_id") % 256 == 0).toPandas()
    pv = polys.toPandas()
    edges = []
    for _, row in pv.iterrows():
        vs = [(v["x"], v["y"]) for v in row["vertices"]]
        edges.append(np.array(vs + [vs[0]], dtype=np.int64))
    px = sub["x"].to_numpy(dtype=np.int64)
    py = sub["y"].to_numpy(dtype=np.int64)
    want_sub = 0
    for e in edges:
        x1, y1 = e[:-1, 0][:, None], e[:-1, 1][:, None]
        x2, y2 = e[1:, 0][:, None], e[1:, 1][:, None]
        strad = (y1 > py) != (y2 > py)
        t = (x1 - px) * (y2 - y1) + (py - y1) * (x2 - x1)
        cross = strad & (
            ((y2 > y1) & (t > 0)) | ((y2 < y1) & (t < 0))
        )
        want_sub += int((cross.sum(axis=0) % 2 == 1).sum())
    got_sub = inside.filter(F.col("pt_id") % 256 == 0).count()
    assert got_sub == want_sub, (got_sub, want_sub)

    print(
        json.dumps(
            {
                "metric": "pip_join_rehearsal",
                "n_points": n_pts,
                "n_polygons": n_polys,
                "inside_pairs": n_inside,
                "wall_s": round(wall, 2),
                "cell": cell,
                "candidate_pairs": n_cand,
                "candidates_per_inside": round(
                    n_cand / max(1, n_inside), 2
                ),
                "all_pairs_would_be": n_pts * n_polys,
                "subsample_verified": want_sub,
            }
        )
    )


if __name__ == "__main__":
    main()
