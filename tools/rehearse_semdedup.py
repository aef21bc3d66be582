"""SemDeDup rehearsal at 25x the bench embedding corpus.

Synthesizes 50k 64-dim vectors executor-side (deterministic per-id
RandomState — no driver-side data path): 40k base vectors drawn from
32 latent topic directions (so clustering has real structure) plus 10k
planted near-duplicates (a base vector + small noise). Runs semdedup
and reports:

- wall time and the max cluster size (the pair-stage quadratic bound);
- planted-duplicate recall: fraction of the 10k perturbed copies
  pruned (their base should dominate them at eps=.97);
- false-prune rate among the 40k bases (topic neighbors that are NOT
  planted dups but fall inside eps — expected small but nonzero;
  semantic dedup is a radius cut, not an id match).

Usage: python tools/rehearse_semdedup.py [n_base] [n_dup] [k]
Prints one JSON line; paste into docs/PERF.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.semdedup import semdedup
from globalweather_etl_spark.session import get_spark

DIM = 64
TOPICS = 32


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
    n_dup = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    spark = get_spark(
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    def gen(iterator):
        topics = np.random.RandomState(12345).randn(TOPICS, DIM)
        topics /= np.linalg.norm(topics, axis=1, keepdims=True)
        for pdf in iterator:
            out = []
            for vid in pdf["id"]:
                if vid < n_base:
                    rs = np.random.RandomState(vid)
                    v = topics[vid % TOPICS] + 0.35 * rs.randn(DIM)
                else:
                    base = vid - n_base
                    rs = np.random.RandomState(base)
                    v = topics[base % TOPICS] + 0.35 * rs.randn(DIM)
                    v = v + 0.02 * np.random.RandomState(vid).randn(DIM)
                out.append([float(x) for x in v])
            pdf = pdf.copy()
            pdf["embedding"] = out
            yield pdf

    emb = (
        spark.range(n_base + n_dup)
        .repartition(32)
        .mapInPandas(gen, "id long, embedding array<double>")
        .withColumnRenamed("id", "vec_id")
    )
    t0 = time.perf_counter()
    out = semdedup(emb, n_clusters=k, eps=0.97, keep="min_id")
    pruned = (
        out.filter(~F.col("is_kept"))
        .select("vec_id")
        .collect()
    )
    wall = round(time.perf_counter() - t0, 2)
    pruned_ids = {r["vec_id"] for r in pruned}
    dup_pruned = sum(1 for i in pruned_ids if i >= n_base)
    base_pruned = len(pruned_ids) - dup_pruned
    sizes = (
        out.groupBy("cluster_id").count().agg(F.max("count")).collect()
    )[0][0]
    print(
        json.dumps(
            {
                "n_vectors": n_base + n_dup,
                "dim": DIM,
                "k": k,
                "wall_s": wall,
                "max_cluster": sizes,
                "planted_dup_recall": round(dup_pruned / n_dup, 4),
                "base_false_prune_rate": round(base_pruned / n_base, 4),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
