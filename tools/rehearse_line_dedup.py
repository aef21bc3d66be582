"""Line-dedup rehearsal (round 4): boilerplate removal at 20x the bench
corpus. Synthesizes a crawl-shaped 100k-page corpus from sf0.1
documents — each page is a unique body line (real doc text + page-unique
suffix) wrapped in 3 boilerplate lines (per-source header/footer
shared by thousands of pages plus a per-rep banner shared by 5000) — then runs dedup_lines(min_doc_freq=2) and reports
wall time, line accounting, and the removed fraction.

Usage: python tools/rehearse_line_dedup.py  (REHEARSAL_DIR honored)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from globalweather_etl_spark.operators.line_dedup import dedup_lines
from globalweather_etl_spark.session import get_spark
from globalweather_etl_spark.sources import load_table

t_all = time.time()
spark = get_spark(
    master="local[32]",
    shuffle_partitions=32,
    extra_conf={"spark.ui.showConsoleProgress": "false"},
)
docs = load_table(spark, "/root/testdata/sf0.1", "documents").select(
    "doc_id", "source", "text"
)
reps = spark.range(20).select(F.col("id").alias("rep"))
pages = (
    docs.crossJoin(F.broadcast(reps))
    .select(
        (F.col("doc_id") * 100 + F.col("rep")).alias("page_id"),
        "source",
        "rep",
        F.concat_ws(
            "\n",
            F.concat(F.lit("=== "), F.col("source"), F.lit(" portal ===")),
            # body: unique per page (doc text + page-unique suffix)
            F.concat(F.col("text"), F.lit(" #"),
                     (F.col("doc_id") * 100 + F.col("rep")).cast("string")),
            F.concat(F.lit("banner v"), F.col("rep").cast("string")),
            F.concat(F.lit("Copyright 2024 "), F.col("source")),
        ).alias("text"),
    )
)

t = time.time()
cleaned = dedup_lines(pages, "page_id", "text", min_doc_freq=2)
stats = cleaned.agg(
    F.count("*").alias("pages"),
    F.sum("n_lines").alias("lines_in"),
    F.sum("n_dup_lines").alias("lines_removed"),
    F.sum(F.length("text")).alias("chars_out"),
).collect()[0]
wall = round(time.time() - t, 2)

print(
    json.dumps(
        {
            "pages": stats["pages"],
            "lines_in": stats["lines_in"],
            "lines_removed": stats["lines_removed"],
            "removed_frac": round(
                stats["lines_removed"] / stats["lines_in"], 4
            ),
            "chars_out": stats["chars_out"],
            "dedup_wall_sec": wall,
            "total_wall_sec": round(time.time() - t_all, 2),
        }
    )
)
