"""Rehearsal: the dedup tier's candidate bounds at ~1000x the sf0.1
bench corpus, under ADVERSARIAL hot shingles.

The round-5 verdict's item 5: the ANN/semdedup/PQ tiers were rehearsed
at 25-100x, but the dedup caps (max_doc_freq, band-bucket spread) had
never been measured beyond the 5k-doc bench corpus.  This generates a
multi-million-document corpus IN-PLAN (seeded xxhash64 word picks — no
UDFs, no testdata mutation) whose every document shares a boilerplate
prefix: the shingles of that prefix have document frequency == corpus
size, so WITHOUT the hot-shingle cap the LSH inverted index would emit
O(n^2) candidate pairs from them alone.  10%% of documents are planted
near-duplicates (one word substituted), so the expected candidate count
is ~n/10 — measured candidates far above that mean the bound broke.

Measured per operator: wall seconds + candidate-pair count
(minhash-LSH with the cap, simhash, fuzzy decontamination against a
benchmark slice) + planted-pair recall for minhash.

Run: python tools/rehearse_dedup_scale.py [n_docs] (default 5_000_000)
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from globalweather_etl_spark.session import get_spark

VOCAB = 50_000
WORDS_PER_DOC = 24
BOILERPLATE = (
    "subscribe to our newsletter today click here for more breaking "
    "updates terms of service apply all rights reserved"
)


def synth_corpus(spark, n_docs: int):
    """n_docs rows (doc_id, text): a shared boilerplate prefix (the
    adversarial hot shingles) + 24 seeded pseudo-random words; docs with
    doc_id %% 10 == 1 are near-duplicates of doc_id-1 (the LAST word
    substituted, so >= threshold Jaccard overlap survives)."""
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    # docs %10==1 copy doc %10==0's words except the last one
    is_neardup = F.col("doc_id") % 10 == 1
    base_id = F.when(is_neardup, F.col("doc_id") - 1).otherwise(
        F.col("doc_id")
    )
    words = [
        F.concat(
            F.lit("w"),
            (F.abs(F.xxhash64(base_id, F.lit(k))) % VOCAB).cast("string"),
        )
        for k in range(WORDS_PER_DOC - 1)
    ]
    last = F.when(
        is_neardup, F.lit("substituted")
    ).otherwise(
        F.concat(
            F.lit("w"),
            (
                F.abs(F.xxhash64(base_id, F.lit(WORDS_PER_DOC - 1)))
                % VOCAB
            ).cast("string"),
        )
    )
    text = F.concat_ws(
        " ", F.lit(BOILERPLATE), *words, last
    )
    return base.select("doc_id", text.alias("text"))


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
    from globalweather_etl_spark.operators.dedup import (
        fuzzy_decontaminate,
        minhash_lsh_pairs,
        simhash_pairs,
    )

    docs = synth_corpus(spark, n_docs)
    # land the corpus once so every operator reads identical parquet
    # (and generation cost stays out of the measurements)
    import tempfile

    d = tempfile.mkdtemp(prefix="dedup_scale_") + "/docs"
    docs.repartition(128).write.parquet(d)
    docs = spark.read.parquet(d)
    print(f"corpus: {docs.count()} docs", flush=True)

    out = {}

    t0 = time.perf_counter()
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, num_hashes=32, bands=8,
        threshold=0.5, max_doc_freq=64,
    )
    n_pairs = pairs.count()
    planted = pairs.filter(
        (F.col("doc_b") == F.col("doc_a") + 1)
        & (F.col("doc_a") % 10 == 0)
    ).count()
    out["minhash_lsh"] = {
        "wall_s": round(time.perf_counter() - t0, 1),
        "pairs": n_pairs,
        "planted_recall": round(planted / (n_docs // 10), 4),
    }
    print(f"minhash: {out['minhash_lsh']}", flush=True)

    t0 = time.perf_counter()
    sp = simhash_pairs(docs, "doc_id", "text", n=3, max_hamming=3)
    out["simhash"] = {
        "wall_s": round(time.perf_counter() - t0, 1),
        "pairs": sp.count(),
    }
    out["simhash"]["wall_s"] = round(time.perf_counter() - t0, 1)
    print(f"simhash: {out['simhash']}", flush=True)

    bench = docs.filter(F.col("doc_id") % 1000 == 7).select(
        (F.col("doc_id") + 10 * n_docs).alias("doc_id"), "text"
    )
    t0 = time.perf_counter()
    fd = fuzzy_decontaminate(
        docs, bench, "doc_id", "text", n=5, num_hashes=32, bands=8,
        threshold=0.5, max_doc_freq=64,
    )
    n_contam = fd.filter(F.col("is_fuzzy_contaminated")).count()
    out["fuzzy_decontaminate"] = {
        "wall_s": round(time.perf_counter() - t0, 1),
        "bench_docs": bench.count(),
        "contaminated": n_contam,
    }
    print(f"fuzzy_decon: {out['fuzzy_decontaminate']}", flush=True)
    print(out)


if __name__ == "__main__":
    main()
