"""Round-14 isolation profile for the exact_iterative bench key:
times its three stages (pagerank_exact, kmeans_exact, semdedup_exact)
separately over N warm reps, and reports per-stage job counts via the
status tracker so per-round fixed overhead is visible.

Usage: python tools/opt/profile_exact_iterative.py [--reps N]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from pyspark.sql import functions as F


def main() -> None:
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from globalweather_etl_spark.session import get_spark
    from globalweather_etl_spark.sources import load_table
    from globalweather_etl_spark.operators.kmeans import kmeans_exact
    from globalweather_etl_spark.operators.pagerank import pagerank_exact
    from globalweather_etl_spark.operators.semdedup import semdedup_exact

    spark = get_spark(
        app_name="profile-exact-iterative",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    st = spark.sparkContext.statusTracker()

    def stage(name, fn, out):
        j0 = len(st.getJobIdsForGroup(None))
        t0 = time.perf_counter()
        fn()
        wall = time.perf_counter() - t0
        j1 = len(st.getJobIdsForGroup(None))
        out.setdefault(name, []).append((round(wall, 3), j1 - j0))

    out: dict[str, list] = {}
    for _ in range(reps):
        li = load_table(spark, sf_dir, "lineitem")
        edges = li.select(
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
        )
        stage(
            "pagerank_exact",
            lambda: pagerank_exact(edges, n_iter=10)
            .write.format("noop").mode("overwrite").save(),
            out,
        )
        emb = load_table(spark, sf_dir, "embeddings")
        holder = {}
        stage(
            "kmeans_exact",
            lambda: holder.update(a=kmeans_exact(emb, 8, n_iter=3)[0]),
            out,
        )
        stage(
            "semdedup_exact",
            lambda: semdedup_exact(emb, 8, eps_pct=35, assigned=holder["a"])
            .write.format("noop").mode("overwrite").save(),
            out,
        )
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
    for name, runs in out.items():
        walls = [w for w, _ in runs]
        print(json.dumps({
            name: {
                "runs": runs,
                "median_wall": round(statistics.median(walls), 3),
                "jobs": runs[-1][1],
            }
        }), flush=True)


if __name__ == "__main__":
    main()
