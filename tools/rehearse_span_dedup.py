"""Duplicate-span-removal rehearsal (round 4, late): ExactSubstr-style
erasure at 20x the bench corpus. Synthesizes 100k pages from sf0.1
documents (20 reps x 5k docs): every page carries (a) a full-body
repeat (the same doc text appears in all 20 reps — the whole body is
a duplicated span for 19 of them), (b) a per-source syndicated
passage shared by ~5k pages, and (c) the passage's generic tail,
shared CORPUS-wide. remove_duplicate_spans(k=8) must erase all three
grains, keeping one copy each (min page id) — the only fully
untouched page is the global-min host. Reports wall time and removal
accounting.

Usage: python tools/rehearse_span_dedup.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from globalweather_etl_spark.operators.span_dedup import remove_duplicate_spans
from globalweather_etl_spark.session import get_spark
from globalweather_etl_spark.sources import load_table

spark = get_spark(
    master="local[32]",
    shuffle_partitions=32,
    extra_conf={"spark.ui.showConsoleProgress": "false",
                "spark.driver.memory": "8g"},
)
docs = load_table(spark, "/root/testdata/sf0.1", "documents").select(
    "doc_id", "source", "text"
)
reps = spark.range(20).select(F.col("id").alias("rep"))
passage = F.concat_ws(
    " ",
    F.lit("syndicated passage for"),
    F.col("source"),
    F.lit("repeated verbatim across every page of this feed"
          " with sixteen tokens total"),
)
pages = docs.crossJoin(F.broadcast(reps)).select(
    (F.col("doc_id") * 100 + F.col("rep")).alias("page_id"),
    F.concat_ws(
        " ", F.col("text"), passage, F.lit("p"), F.col("rep").cast("string")
    ).alias("text"),
)
n_pages = pages.count()

t0 = time.time()
out = remove_duplicate_spans(pages, "page_id", "text", k=8)
stats = out.agg(
    F.count(F.lit(1)).alias("pages"),
    F.sum("span_tokens_removed").alias("tokens_removed"),
    F.sum(F.when(F.col("span_tokens_removed") > 0, 1).otherwise(0)).alias(
        "pages_edited"
    ),
    F.sum("span_n_spans").alias("spans"),
).collect()[0]
wall = round(time.time() - t0, 1)

n_sources = docs.select("source").distinct().count()
print(
    json.dumps(
        {
            "pages": stats["pages"],
            "n_sources": n_sources,
            "pages_edited": stats["pages_edited"],
            "tokens_removed": int(stats["tokens_removed"]),
            "spans_removed": int(stats["spans"]),
            "wall_sec": wall,
        }
    )
)
spark.stop()
