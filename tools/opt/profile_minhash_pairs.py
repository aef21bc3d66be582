"""Sub-phase profile of minhash_lsh_pairs in curation_e2e's md5 mode.

Phases: index build+cap, signature aggregate, banding+candidate join,
verify join. 3 reps in one session; calibration anchor next to each.
"""
import sys
import time

sys.path.insert(0, ".")
from pyspark.sql import functions as F  # noqa: E402
from globalweather_etl_spark.session import get_spark  # noqa: E402
from globalweather_etl_spark.sources import load_table  # noqa: E402
from globalweather_etl_spark.operators.dedup import (  # noqa: E402
    _banded_keys,
    _cap_hot_shingles,
    _hashed_shingles,
    _jaccard_join_sizes,
    _minhash_signed,
    exact_dedup,
)
import bench  # noqa: E402

spark = get_spark(
    app_name="profile-minhash-pairs", master="local[32]", shuffle_partitions=32
)
spark.sparkContext.setLogLevel("ERROR")
sf_dir = "/root/testdata/sf0.1"


def noop(df):
    df.write.format("noop").mode("overwrite").save()


for rep in range(3):
    anchor = bench._calibration_wall(spark)
    docs = load_table(spark, sf_dir, "documents")
    exact = exact_dedup(docs, "doc_id", "text")

    t0 = time.time()
    sh = _hashed_shingles(exact, "doc_id", "text", 3, hash_fn="md5")
    sh = _cap_hot_shingles(sh, 64)
    from pyspark import StorageLevel

    sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    n_idx = sh.count()
    t_index = time.time() - t0

    t0 = time.time()
    signed = _minhash_signed(sh, 32)
    noop(signed)
    t_sig = time.time() - t0

    t0 = time.time()
    banded = _banded_keys(signed, 8, 4, "md5")
    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    noop(candidates)
    t_cand = time.time() - t0

    t0 = time.time()
    sizes = signed.select("doc", "n_shingles")
    inter = (
        candidates.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc"))
        .join(
            sh.alias("sb"),
            (F.col("doc_b") == F.col("sb.doc"))
            & (F.col("sa.sh") == F.col("sb.sh")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    out = _jaccard_join_sizes(inter, sizes).filter(F.col("jaccard") >= 0.8)
    noop(out)
    t_verify = time.time() - t0

    sh.unpersist()
    print(
        f"rep{rep} anchor={anchor:.2f}: index={t_index:.2f} (rows={n_idx}) "
        f"sig={t_sig:.2f} cand={t_cand:.2f} verify={t_verify:.2f} "
        f"total={t_index+t_sig+t_cand+t_verify:.2f}",
        flush=True,
    )
spark.stop()
