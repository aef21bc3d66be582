"""Isolated 3-rep walls for the top remaining bench keys (one session,
anchor-paired): spot first-vs-steady anomalies and quantify this
round's CC change on minhash_cluster_full."""
import sys
import time

sys.path.insert(0, ".")
from globalweather_etl_spark.session import get_spark  # noqa: E402
from globalweather_etl_spark.queries import QUERIES  # noqa: E402
import bench  # noqa: E402

spark = get_spark(
    app_name="sweep-top", master="local[32]", shuffle_partitions=32
)
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"

KEYS = [
    ("minhash_cluster_full", "docs_minhash_lsh"),
    ("docs_web_kernel", "docs_exact_dedup"),
    ("docs_simhash", "docs_simhash"),
    ("docs_embedding_neardup", "docs_embedding_neardup"),
    ("ngram_overlap_full", "docs_ngram_jaccard"),
    ("docs_text_metrics", "docs_text_metrics"),
]


def release():
    for (rid, rdd) in spark.sparkContext._jsc.getPersistentRDDs().items():
        rdd.unpersist(False)
    spark.catalog.clearCache()


for key, qname in KEYS:
    walls = []
    for rep in range(3):
        a = bench._calibration_wall(spark)
        t0 = time.time()
        QUERIES[qname](spark, sf).write.format("noop").mode(
            "overwrite"
        ).save()
        walls.append(round(time.time() - t0, 2))
        release()
    print(f"{key}: walls={walls} anchor_last={a:.2f}", flush=True)
spark.stop()
