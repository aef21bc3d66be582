"""kmeans_exact rehearsal: the exact-integer Lloyd loop at corpus
scale (round 13).

Vectors are expression-synthesized (no Python data path): 64
hash-uniform components in [-1, 1) per id. Reports wall for the full
fixed-iteration fit + final assignment, the assignment balance
(largest cluster share — hash-uniform data should spread), and the
exact integer inertia digest, plus the per-round shape facts the
SCALE.md entry claims: the update aggregate emits k x dim rows
regardless of corpus size and the only cross-round state is the
k-row centroid table.

Usage: python tools/rehearse_kmeans_exact.py [n_vecs] [k] [iters]
Prints one JSON line; paste into docs/PERF.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from globalweather_etl_spark.operators.kmeans import kmeans_exact
from globalweather_etl_spark.session import get_spark


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark(
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "6g",
        },
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: (
            F.pmod(
                F.xxhash64(F.col("id"), i), F.lit(1 << 30)
            ).cast("double")
            / F.lit(float(1 << 29))
            - F.lit(1.0)
        ).cast("float"),
    )
    emb = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    )
    t0 = time.perf_counter()
    assigned, cent = kmeans_exact(emb, k, n_iter=iters)
    sizes = (
        assigned.groupBy("cluster_id")
        .count()
        .agg(
            F.max("count").alias("mx"), F.count(F.lit(1)).alias("nc")
        )
        .collect()[0]
    )
    inertia_digest = assigned.agg(
        F.sum(F.col("dist2") % F.lit(2147483647))
    ).collect()[0][0]
    wall = round(time.perf_counter() - t0, 2)
    print(
        json.dumps(
            {
                "n_vecs": n_vecs,
                "k": k,
                "iters": iters,
                "wall_s": wall,
                "clusters_live": int(sizes["nc"]),
                "largest_cluster_share": round(
                    sizes["mx"] / n_vecs, 4
                ),
                "inertia_digest": int(inertia_digest),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
