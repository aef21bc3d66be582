"""Curation rehearsal (round 4): JSONL -> curate -> shards -> manifest on
an amplified 100k-doc corpus (20x sf0.1 documents: per source doc, 10
exact replicas + 10 appended-marker near-dup variants), exercising
every stage's scale path with heavy duplication like a real crawl."""
import json, time
from pyspark.sql import functions as F, types as T
from globalweather_etl_spark.session import get_spark
from globalweather_etl_spark.sources import load_table, write_jsonl, read_jsonl, drop_corrupt
from globalweather_etl_spark.plans.curation import curate_documents
from globalweather_etl_spark.operators.sharding import write_shards, shard_manifest

t_all = time.time()
spark = get_spark(master="local[32]", shuffle_partitions=32,
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
docs = load_table(spark, "/root/testdata/sf0.1", "documents").select("doc_id", "lang", "text")
reps = spark.range(20).select(F.col("id").alias("rep"))
amplified = (
    docs.crossJoin(F.broadcast(reps))
    .select(
        (F.col("doc_id") * 100 + F.col("rep")).alias("doc_id"),
        "lang",
        F.when(F.col("rep") < 10, F.col("text"))
        .otherwise(F.concat(F.col("text"), F.lit(" v"), F.col("rep").cast("string")))
        .alias("text"),
    )
)
timings = {}
t = time.time()
import os
work = os.environ.get("REHEARSAL_DIR", "/tmp/rehearsal")
landing = f"{work}/landing"
write_jsonl(amplified, landing, partitions=32)
timings["write_jsonl"] = round(time.time() - t, 2)

schema = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("lang", T.StringType()),
    T.StructField("text", T.StringType()),
])
t = time.time()
ingested = drop_corrupt(read_jsonl(spark, landing, schema))
n_in = ingested.count()
timings["ingest_count"] = round(time.time() - t, 2)

bench = ingested.filter(F.col("doc_id") % 700 == 0).select("doc_id", "text")
t = time.time()
res = curate_documents(ingested, benchmark=bench)   # CC rounds run eagerly here
timings["curate_build_and_cc"] = round(time.time() - t, 2)

counts = {"ingested": n_in}
for stage in ("exact_deduped", "near_deduped", "quality_filtered", "decontaminated", "curated"):
    t = time.time()
    counts[stage] = getattr(res, stage).count()
    timings[f"count_{stage}"] = round(time.time() - t, 2)

t = time.time()
out = f"{work}/shards"
write_shards(res.curated, out, bins_per_shard=64)
timings["write_shards"] = round(time.time() - t, 2)

t = time.time()
m = shard_manifest(spark, out, token_col="bin_offset").collect()
timings["manifest"] = round(time.time() - t, 2)
timings["total_wall"] = round(time.time() - t_all, 2)

import subprocess
bytes_in = subprocess.run(["du", "-sb", landing], capture_output=True, text=True).stdout.split()[0]
bytes_out = subprocess.run(["du", "-sb", out], capture_output=True, text=True).stdout.split()[0]
print(json.dumps({"counts": counts, "timings_sec": timings,
                  "n_shards": len(m), "manifest_rows_sum": sum(r["n_rows"] for r in m),
                  "jsonl_bytes": int(bytes_in), "shard_bytes": int(bytes_out)}))
