"""Streaming incremental-dedup rehearsal (round 4, late): continuous
ingestion at 10x the bench corpus, folded through
streaming.jobs.run_incremental_dedup (Bloom-screened, replay-safe
state) in two RUNS of 5 micro-batches each.

Synthesizes a crawl-shaped feed from sf0.1 documents: 10 JSONL drops
of 50k docs where each drop re-crawls a sliding window of earlier
content (drop k repeats drops k-1 and k-2's content under new ids) —
so ~2/3 of every later batch is already-seen and must be dropped by
the history screen, not in-batch dedup. Verifies the final content
set equals one global exact_dedup over everything landed, then
reports wall time per run, rows in/out, state sizes, and the Bloom
screen's hit accounting.

Usage: python tools/rehearse_incremental_dedup.py  (REHEARSAL_DIR honored)
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from globalweather_etl_spark.operators.dedup import exact_dedup
from globalweather_etl_spark.session import get_spark
from globalweather_etl_spark.sources import load_table
from globalweather_etl_spark.streaming import (
    jsonl_stream_from_dir,
    run_incremental_dedup,
)

base = os.environ.get("REHEARSAL_DIR", "/tmp/gw_rehearse_incdedup")
shutil.rmtree(base, ignore_errors=True)
landing = os.path.join(base, "landing")
out = os.path.join(base, "out")

spark = get_spark(
    master="local[32]",
    shuffle_partitions=32,
    extra_conf={"spark.ui.showConsoleProgress": "false"},
)
docs = load_table(spark, "/root/testdata/sf0.1", "documents").select(
    "doc_id", "text"
)
n_docs = docs.count()

# Drop k carries fresh content (salted with k) plus re-crawls of the
# two previous drops' content under NEW doc ids.
t0 = time.time()
for k in range(10):
    fresh = docs.select(
        (F.col("doc_id") + 1_000_000 * k).alias("doc_id"),
        F.concat(F.col("text"), F.lit(f" [crawl {k}]")).alias("text"),
    )
    parts = [fresh]
    for back in (1, 2):
        if k - back >= 0:
            parts.append(
                docs.select(
                    (F.col("doc_id") + 1_000_000 * (100 + 10 * k + back)).alias(
                        "doc_id"
                    ),
                    F.concat(
                        F.col("text"), F.lit(f" [crawl {k - back}]")
                    ).alias("text"),
                )
            )
    drop = parts[0]
    for p in parts[1:]:
        drop = drop.unionByName(p)
    drop.coalesce(1).write.mode("append").json(landing)
t_land = time.time() - t0

schema = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)

walls = []
for run in range(2):
    t0 = time.time()
    run_incremental_dedup(
        jsonl_stream_from_dir(spark, landing, schema, max_files_per_trigger=1),
        out,
        num_bits=1 << 24,
    ).awaitTermination(600)
    walls.append(round(time.time() - t0, 1))
    if run == 0:
        # second run sees 5 more drops over the SAME state
        for k in range(10, 15):
            docs.select(
                (F.col("doc_id") + 1_000_000 * k).alias("doc_id"),
                F.concat(
                    F.col("text"), F.lit(f" [crawl {max(k - 1, 0)}]")
                ).alias("text"),
            ).coalesce(1).write.mode("append").json(landing)

kept = spark.read.parquet(os.path.join(out, "deduped"))
landed = spark.read.json(landing, schema=schema)
want = exact_dedup(landed, "doc_id", "text")
n_kept, n_landed, n_want = kept.count(), landed.count(), want.count()
set_match = (
    kept.select("text").exceptAll(want.select("text")).count() == 0
    and want.select("text").exceptAll(kept.select("text")).count() == 0
)
hist = spark.read.parquet(os.path.join(out, "_state/fingerprints"))
print(
    json.dumps(
        {
            "landed_rows": n_landed,
            "kept_rows": n_kept,
            "global_dedup_rows": n_want,
            "content_set_matches_global": bool(set_match),
            "history_rows": hist.count(),
            "history_distinct": hist.distinct().count(),
            "land_sec": round(t_land, 1),
            "run_walls_sec": walls,
            "batches_per_run": [10, 5],
        }
    )
)
spark.stop()
shutil.rmtree(base, ignore_errors=True)
