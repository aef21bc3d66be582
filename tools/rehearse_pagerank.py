"""PageRank rehearsal on a synthesized power-law web graph.

Edges are generated as pure deterministic expressions (no Python data
path): source uniform over N nodes, destination Zipf-shaped (u^4
collapses the hash-uniform draw onto popular targets), which yields
the hub-heavy in-degree distribution real link graphs have.

Reports wall time for a fixed iteration budget, the rank mass (must be
1), and the in-degree/rank correlation sanity (the top-ranked node
should sit in the top in-degree tier).

Usage: python tools/rehearse_pagerank.py [n_nodes] [n_edges] [iters]
Prints one JSON line; paste into docs/PERF.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from globalweather_etl_spark.operators.pagerank import pagerank
from globalweather_etl_spark.session import get_spark


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_edges = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark(
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # first session in the process, so this takes effect: the
            # default 1g local heap cannot hold two back-to-back
            # 2M-edge runs' shuffle state at 32 threads
            "spark.driver.memory": "6g",
        },
    )
    u = (F.pmod(F.xxhash64(F.col("id")), F.lit(1 << 30)).cast("double")
         / F.lit(float(1 << 30)))
    v = (F.pmod(F.xxhash64(F.col("id") + F.lit(10_000_000)),
                F.lit(1 << 30)).cast("double") / F.lit(float(1 << 30)))
    edges = (
        spark.range(n_edges)
        .select(
            (u * n_nodes).cast("long").alias("src"),
            (F.pow(v, F.lit(4.0)) * n_nodes).cast("long").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    t0 = time.perf_counter()
    ranks = pagerank(edges, max_iter=iters, tol=0.0)
    top = ranks.orderBy(F.col("rank").desc()).limit(5).collect()
    mass = ranks.agg(F.sum("rank")).collect()[0][0]
    wall = round(time.perf_counter() - t0, 2)
    indeg = dict(
        edges.groupBy("dst").count()
        .orderBy(F.col("count").desc()).limit(20)
        .select(F.col("dst").alias("n"), "count").collect()
    )
    top_ids = [r["node"] for r in top]
    # the exact-integer graded form on the same graph (round 13):
    # same per-iteration shape minus the convergence collect; its
    # top-5 must agree with the float path's at this resolution
    from globalweather_etl_spark.operators.pagerank import (
        pagerank_exact,
    )

    t0 = time.perf_counter()
    xr = pagerank_exact(edges, n_iter=iters)
    xtop = (
        xr.orderBy(F.col("rank_units").desc(), "node")
        .limit(5)
        .collect()
    )
    xmass = xr.agg(F.sum("rank_units")).collect()[0][0]
    xwall = round(time.perf_counter() - t0, 2)
    print(
        json.dumps(
            {
                "n_nodes": n_nodes,
                "n_edges": n_edges,
                "iters": iters,
                "wall_s": wall,
                "rank_mass": round(mass, 9),
                "top5_in_top20_indegree": sum(
                    1 for i in top_ids if i in indeg
                ),
                "exact_wall_s": xwall,
                "exact_mass_units": int(xmass),
                "exact_top5_matches_float": [r["node"] for r in xtop]
                == top_ids,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
