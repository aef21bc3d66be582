"""Rehearsal: cap_per_group + mix_corpora composition at 5M docs under
adversarial domain skew (the round-5 verdict's last stretch item).

Corpus: the same 5M-doc generator as tools/rehearse_dedup_scale.py,
plus a Zipf-shaped domain column where ONE mega-domain holds ~30% of
all documents — the exact shape cap_per_group's two-phase prune
exists for (a single row_number window over the raw table would send
the mega-domain to one reducer).

Measured:
1. cap_per_group(domain, doc_id, n=1000) — wall + exactness (every
   group emits min(group_size, n) rows) vs the naive single-window
   form's wall on the same data (the skew cost made visible).
2. The curation composition: cap → join back → mix_corpora of three
   weighted slices with allow_upsample (the scarce 'books' slice
   repeats epochs, Gopher/Llama style) — wall + per-source achieved
   proportions + epoch distribution of the upsampled source.

Run: python tools/rehearse_cap_mix.py [n_docs] (default 5_000_000)
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import Window, functions as F

from globalweather_etl_spark.session import get_spark

sys.path.insert(0, "tools")
from rehearse_dedup_scale import synth_corpus  # noqa: E402


def with_domains(docs):
    """Zipf-ish skew: ~30% of docs land on domain 0, the rest spread
    over 10k domains by a power-law-ish hash fold."""
    h = F.abs(F.xxhash64("doc_id", F.lit(777)))
    return docs.withColumn(
        "domain",
        F.when(h % 10 < 3, F.lit(0)).otherwise(
            (h % F.lit(10_000)) + 1
        ).cast("long"),
    )


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    spark = get_spark(
        master="local[32]",
        shuffle_partitions=128,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "48g",
        },
    )
    from globalweather_etl_spark.operators.mixing import mix_corpora
    from globalweather_etl_spark.operators.sampling import cap_per_group

    import tempfile

    d = tempfile.mkdtemp(prefix="cap_mix_") + "/docs"
    with_domains(synth_corpus(spark, n_docs)).repartition(128).write.parquet(d)
    docs = spark.read.parquet(d)
    n = docs.count()
    mega = docs.filter(F.col("domain") == 0).count()
    print(f"corpus: {n} docs, mega-domain holds {mega} ({mega/n:.1%})",
          flush=True)

    cap_n = 1000
    t0 = time.perf_counter()
    capped = cap_per_group(
        docs, F.col("domain"), F.col("doc_id"), cap_n
    )
    kept = capped.count()
    two_phase_s = time.perf_counter() - t0
    # exactness: every group emits min(group_size, cap)
    t0 = time.perf_counter()
    bad = (
        capped.groupBy("grp")
        .agg(F.count(F.lit(1)).alias("got"))
        .join(
            docs.groupBy("domain").agg(F.count(F.lit(1)).alias("have")),
            F.col("grp") == F.col("domain"),
        )
        .filter(F.col("got") != F.least(F.lit(cap_n), F.col("have")))
        .count()
    )
    verify_s = time.perf_counter() - t0
    assert bad == 0, f"{bad} groups with wrong cap counts"

    # naive single-window form on the same data (the skew baseline)
    t0 = time.perf_counter()
    w = Window.partitionBy("domain").orderBy("doc_id")
    naive = (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= cap_n)
        .count()
    )
    naive_s = time.perf_counter() - t0
    assert naive == kept
    print(
        {
            "cap_per_group": {
                "kept": kept,
                "two_phase_wall_s": round(two_phase_s, 1),
                "naive_window_wall_s": round(naive_s, 1),
                "verify_s": round(verify_s, 1),
            }
        },
        flush=True,
    )

    # --- composition: capped web + mid code slice + scarce books slice
    web = docs.join(
        capped.select(F.col("key").alias("doc_id")), "doc_id"
    ).select("doc_id", "text")
    code = (
        docs.filter(F.col("domain").between(1, 500))
        .select((F.col("doc_id") + 100_000_000).alias("doc_id"), "text")
    )
    books = (
        docs.filter(F.col("domain").between(9_900, 10_000))
        .select((F.col("doc_id") + 200_000_000).alias("doc_id"), "text")
    )
    target = 2_000_000
    t0 = time.perf_counter()
    mix = mix_corpora(
        {
            "web": (web, 0.5),
            "code": (code, 0.3),
            "books": (books, 0.2),
        },
        key=F.col("doc_id"),
        total_rows=target,
        allow_upsample=True,
    )
    shares = {
        r["mix_source"]: r["n"]
        for r in mix.groupBy("mix_source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    mix_s = time.perf_counter() - t0
    ep = (
        mix.filter(F.col("mix_source") == "books")
        .groupBy("mix_epoch")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.max("mix_epoch").alias("max_epoch"),
            F.min("n").alias("min_rows"),
            F.max("n").alias("max_rows"),
        )
        .collect()[0]
    )
    epochs = {
        "n_epochs": int(ep["max_epoch"]) + 1,
        "rows_per_epoch": [int(ep["min_rows"]), int(ep["max_rows"])],
    }
    total = sum(shares.values())
    print(
        {
            "mix": {
                "wall_s": round(mix_s, 1),
                "total": total,
                "shares": {
                    k: round(v / total, 4) for k, v in shares.items()
                },
                "books_epochs": epochs,
            }
        },
        flush=True,
    )


if __name__ == "__main__":
    main()
