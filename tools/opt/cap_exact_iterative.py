"""Capture explain(formatted) + per-component timing for the
exact_iterative bench shapes (pagerank_exact / kmeans_exact /
semdedup_exact) at sf0.1. localCheckpoint is wrapped so each round's
REAL pre-checkpoint plan is captured (checkpoints truncate lineage,
so the final frame alone shows nothing)."""
import os, sys, time
sys.path.insert(0, ".")
tag = sys.argv[1] if len(sys.argv) > 1 else "x"
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
from pyspark.sql import functions as F
import pyspark.sql.classic.dataframe as D
from globalweather_etl_spark.session import get_spark
from globalweather_etl_spark.sources import load_table

spark = get_spark(master="local[32]", shuffle_partitions=32,
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.range(1000).selectExpr("sum(id)").collect()
MODE = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

def fmt(df):
    return df._jdf.queryExecution().explainString(MODE)

ckpt_plans = []
_orig = D.DataFrame.localCheckpoint
def _cap(self, eager=True):
    ckpt_plans.append(fmt(self))
    return _orig(self, eager)

from globalweather_etl_spark.operators.kmeans import kmeans_exact
from globalweather_etl_spark.operators.pagerank import pagerank_exact
from globalweather_etl_spark.operators.semdedup import semdedup_exact

def noop(df):
    df.write.format("noop").mode("overwrite").save()

def release():
    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()

li = load_table(spark, sf_dir, "lineitem")
edges = li.select(
    F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
    F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
)
emb = load_table(spark, sf_dir, "embeddings")

for rep in range(3):
    ckpt_plans.clear()
    D.DataFrame.localCheckpoint = _cap if rep == 0 else _orig
    t0 = time.perf_counter()
    pr = pagerank_exact(edges, n_iter=10)
    noop(pr)
    t1 = time.perf_counter()
    if rep == 0:
        # the LAST checkpointed plan of the loop = one full round
        with open(f"/root/repo/plans/r13/exact_iterative_pagerank_round_{tag}.txt", "w") as f:
            f.write(ckpt_plans[-1])
    D.DataFrame.localCheckpoint = _orig
    ks_a, ks_c = kmeans_exact(emb, 8, n_iter=3)
    noop(ks_a)
    t2 = time.perf_counter()
    sd = semdedup_exact(emb, 8, eps_pct=35, assigned=ks_a)
    noop(sd)
    t3 = time.perf_counter()
    print(f"rep{rep}: pagerank={t1-t0:.2f}s kmeans={t2-t1:.2f}s semdedup={t3-t2:.2f}s total={t3-t0:.2f}s", flush=True)
    if rep == 0:
        with open(f"/root/repo/plans/r13/exact_iterative_semdedup_{tag}.txt", "w") as f:
            f.write(fmt(sd))
        with open(f"/root/repo/plans/r13/exact_iterative_kmeans_assign_{tag}.txt", "w") as f:
            f.write(fmt(ks_a))
    release()
spark.stop()
