"""A/B: q_docs_decontaminate as-is vs thread-overlapped variant.

The three top-level branches (decontaminate `out`, fuzzy `fz`,
curate_documents `trace`) are independent until the final doc_id
joins; curate's connected-components phase runs eager driver jobs
that leave the cluster mostly idle. Variant B computes out/fz into
pinned localCheckpoints on worker threads WHILE the main thread runs
curate_documents (guide §2.6), then joins the checkpointed frames.
Asserts output md5 equality.
"""
import hashlib
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, ".")
from pyspark.sql import functions as F  # noqa: E402
from globalweather_etl_spark.session import get_spark  # noqa: E402
from globalweather_etl_spark.sources import load_table  # noqa: E402
from globalweather_etl_spark.operators.dedup import (  # noqa: E402
    decontaminate,
    fuzzy_decontaminate,
)
from globalweather_etl_spark.operators.ckpt import (  # noqa: E402
    concurrent_local_checkpoint,
)
from globalweather_etl_spark.plans.curation import curate_documents  # noqa: E402
from globalweather_etl_spark.queries import QUERIES  # noqa: E402
import bench  # noqa: E402

spark = get_spark(
    app_name="ab-cur-overlap", master="local[32]", shuffle_partitions=32
)
spark.sparkContext.setLogLevel("ERROR")
sf_dir = "/root/testdata/sf0.1"


def build_overlapped(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    bench_df = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id", "text")

    def _out():
        return concurrent_local_checkpoint(
            decontaminate(docs, bench_df, "doc_id", "text", n=5, hash_fn="md5")
        )

    marker = " eval answer option marker alpha beta gamma"
    fbench = docs.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(marker)).alias("text"),
    )

    def _fz():
        return concurrent_local_checkpoint(
            fuzzy_decontaminate(
                docs.select("doc_id", "text"), fbench, "doc_id", "text",
                n=5, num_hashes=32, bands=8, threshold=0.5, hash_fn="md5",
            ).select(
                "doc_id",
                F.round("fuzzy_containment", 9).alias("fuzzy_containment"),
                F.coalesce("matched_bench", F.lit(-1).cast("long"))
                .alias("matched_bench"),
                "is_fuzzy_contaminated",
            )
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        fut_out = pool.submit(_out)
        fut_fz = pool.submit(_fz)
        trace = curate_documents(
            docs, benchmark=bench_df, hash_fn="md5"
        ).curated.select(
            "doc_id",
            F.col("split").alias("cur_split"),
            F.col("n_tokens").cast("long").alias("cur_n_tokens"),
            "bin_id",
            "bin_offset",
        )
        out, fz = fut_out.result(), fut_fz.result()
    return (
        out.select(
            "doc_id", "lang", "n_contaminated_shingles", "is_contaminated"
        )
        .join(trace, "doc_id", "left")
        .join(fz, "doc_id")
        .select(
            "doc_id",
            "lang",
            "n_contaminated_shingles",
            "is_contaminated",
            "fuzzy_containment",
            "matched_bench",
            "is_fuzzy_contaminated",
            F.col("cur_split").isNotNull().alias("is_curated"),
            F.coalesce("cur_split", F.lit("")).alias("cur_split"),
            F.coalesce("cur_n_tokens", F.lit(-1).cast("long"))
            .alias("cur_n_tokens"),
            F.coalesce("bin_id", F.lit(-1).cast("long")).alias("bin_id"),
            F.coalesce("bin_offset", F.lit(-1).cast("long"))
            .alias("bin_offset"),
        )
    )


def release():
    for (rid, rdd) in spark.sparkContext._jsc.getPersistentRDDs().items():
        rdd.unpersist(False)
    spark.catalog.clearCache()


def out_md5(df) -> str:
    rows = sorted(tuple(r) for r in df.collect())
    return hashlib.md5(str(rows).encode()).hexdigest()[:10]


def noop(df):
    df.write.format("noop").mode("overwrite").save()


for rep in range(3):
    a = bench._calibration_wall(spark)
    t0 = time.time()
    noop(QUERIES["docs_decontaminate"](spark, sf_dir))
    t_old = time.time() - t0
    release()
    t0 = time.time()
    noop(build_overlapped(spark, sf_dir))
    t_new = time.time() - t0
    release()
    print(
        f"rep{rep} anchor={a:.2f}: plain={t_old:.2f} overlapped={t_new:.2f}",
        flush=True,
    )

h_old = out_md5(QUERIES["docs_decontaminate"](spark, sf_dir))
release()
h_new = out_md5(build_overlapped(spark, sf_dir))
release()
print(f"hash plain={h_old} overlapped={h_new} match={h_old==h_new}")
spark.stop()
