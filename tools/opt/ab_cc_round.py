"""A/B: current connected_components round vs fused round.

Fused round removes two redundant full-edge-list distincts
(_small_star's input dedup of _large_star's already-distinct output;
_canonical's re-dedup of _small_star's distinct output, where the
min/max flip is a bijective projection) and fuses the eager-checkpoint
job with the convergence-stats job (lazy localCheckpoint materialized
by the stats collect).

Runs both on curation_e2e's actual pair graph (md5 minhash pairs over
the exact-deduped sf0.1 corpus), interleaved, 3 reps; asserts final
label md5 equality and per-round fingerprint equality.
"""
import hashlib
import sys
import time

sys.path.insert(0, ".")
from pyspark.sql import DataFrame, functions as F  # noqa: E402
from globalweather_etl_spark.session import get_spark  # noqa: E402
from globalweather_etl_spark.sources import load_table  # noqa: E402
from globalweather_etl_spark.operators.dedup import (  # noqa: E402
    exact_dedup,
    minhash_lsh_pairs,
)
from globalweather_etl_spark.operators.components import (  # noqa: E402
    _canonical,
    _edge_stats,
    _large_star,
    _small_star,
    connected_components,
)
from globalweather_etl_spark.operators.ckpt import CheckpointRotator  # noqa: E402
import bench  # noqa: E402

spark = get_spark(
    app_name="ab-cc-round", master="local[32]", shuffle_partitions=32
)
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext
sf_dir = "/root/testdata/sf0.1"


def _fused_round(e: DataFrame) -> DataFrame:
    """One large-star + small-star round, output == _canonical(
    _small_star(_large_star(e))) row-for-row (set semantics)."""
    sym = e.select("u", "v").union(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    m = mins.select("u", F.least("u", "mn").alias("m"))
    ls = (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )
    # ls rows are distinct (u, v) with u > v >= component-min candidates
    # and no self-loops: exactly _small_star's `directed` frame, so its
    # filter/least-greatest/distinct are identity here.
    ss_mins = ls.groupBy("u").agg(F.min("v").alias("m"))
    rewired = (
        ls.join(ss_mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(ss_mins.select("u", F.col("m").alias("v")))
    )
    ss = rewired.filter(F.col("u") != F.col("v")).distinct()
    # ss rows are strictly (greater, lesser); _canonical's least/greatest
    # is the flip and its filter/distinct are identity on it.
    return ss.select(F.col("v").alias("u"), F.col("u").alias("v"))


def cc_fused(pairs: DataFrame, src="doc_a", dst="doc_b", max_rounds=25):
    e = _canonical(
        pairs.select(
            F.col(src).cast("long").alias("u"),
            F.col(dst).cast("long").alias("v"),
        )
    ).localCheckpoint(eager=False)
    prev = _edge_stats(e)  # materializes the lazy checkpoint
    rot = CheckpointRotator(pairs.sparkSession)
    rounds = 0
    fps = [prev]
    for _ in range(max_rounds):
        def _round(prev_e=e):
            ne = _fused_round(prev_e).localCheckpoint(eager=False)
            return ne, _edge_stats(ne)

        e, cur = rot.rotate(_round)
        rounds += 1
        fps.append(cur)
        if cur == prev:
            break
        prev = cur
    members = e.select(F.col("v").alias("node"), F.col("u").alias("component"))
    roots = e.select(
        F.col("u").alias("node"), F.col("u").alias("component")
    ).distinct()
    return members.union(roots).distinct(), rounds, fps


def labels_md5(comp: DataFrame) -> str:
    rows = sorted(
        (r["node"], r["component"]) for r in comp.collect()
    )
    return hashlib.md5(str(rows).encode()).hexdigest()[:10]


docs = load_table(spark, sf_dir, "documents")
exact = exact_dedup(docs, "doc_id", "text")
pairs = minhash_lsh_pairs(
    exact, "doc_id", "text", n=3, num_hashes=32, bands=8,
    threshold=0.8, max_doc_freq=64, hash_fn="md5",
).select("doc_a", "doc_b").localCheckpoint(eager=True)
n_pairs = pairs.count()
print(f"pair graph edges: {n_pairs}", flush=True)

for rep in range(3):
    anchor = bench._calibration_wall(spark)
    t0 = time.time()
    j0 = sc.statusTracker().getJobIdsForGroup() or []
    n0 = len(sc.statusTracker().getJobIdsForGroup(None) or [])
    old = connected_components(pairs)
    h_old = labels_md5(old)
    t_old = time.time() - t0

    t0 = time.time()
    new, rounds, fps = cc_fused(pairs)
    h_new = labels_md5(new)
    t_new = time.time() - t0
    print(
        f"rep{rep} anchor={anchor:.2f}: old={t_old:.2f} ({h_old}) "
        f"fused={t_new:.2f} ({h_new}) rounds={rounds} match={h_old==h_new}",
        flush=True,
    )
spark.stop()
