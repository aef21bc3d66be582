"""Isolated emb_ivf_topk profile: cold vs steady walls + stage split.

Usage: python tools/opt/profile_emb_ivf.py [sf_dir]
"""
import os
import sys
import time

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
os.environ.setdefault("SPARK_GRAFT_SF_DIR", sf_dir)

from pyspark.sql import SparkSession, functions as F  # noqa: E402

cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("profile_emb_ivf")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from globalweather_etl_spark.queries import q_emb_ivf_topk  # noqa: E402

sc = spark.sparkContext


def noop(df):
    df.write.format("noop").mode("overwrite").save()


walls = []
for i in range(5):
    t0 = time.time()
    sc.setJobDescription(f"emb_ivf_topk rep {i}")
    noop(q_emb_ivf_topk(spark, sf_dir))
    w = time.time() - t0
    walls.append(round(w, 3))
print("full-query walls:", walls)

# stage split on a warm session
from globalweather_etl_spark.sources.registry import load_table  # noqa: E402
from globalweather_etl_spark.operators.similarity import (  # noqa: E402
    ivf_cosine_topk,
)

emb = load_table(spark, sf_dir, "embeddings")
t0 = time.time()
n = emb.count()
print(f"corpus rows: {n} ({time.time()-t0:.3f}s)")

t0 = time.time()
top = ivf_cosine_topk(
    emb, emb.filter(F.col("vec_id") < 10), k=5, n_lists=16, n_probe=4,
    portable=True,
)
build = time.time() - t0
t0 = time.time()
noop(top)
print(f"build (incl centroid collect): {build:.3f}s  exec: {time.time()-t0:.3f}s")
spark.stop()

# COLD-phase split in a brand-new session: where do the ~8 cold seconds go?
spark2 = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("profile_emb_ivf_cold")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark2.sparkContext.setLogLevel("ERROR")
emb2 = load_table(spark2, sf_dir, "embeddings")
t0 = time.time()
top2 = ivf_cosine_topk(
    emb2, emb2.filter(F.col("vec_id") < 10), k=5, n_lists=16, n_probe=4,
    portable=True,
)
print(f"COLD build (incl centroid collect job): {time.time()-t0:.3f}s")
t0 = time.time()
top2.write.format("noop").mode("overwrite").save()
print(f"COLD first exec: {time.time()-t0:.3f}s")
t0 = time.time()
top2.write.format("noop").mode("overwrite").save()
print(f"COLD second exec: {time.time()-t0:.3f}s")
spark2.stop()
