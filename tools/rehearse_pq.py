"""Product-quantization rehearsal at 100x the bench embedding corpus.

Synthesizes 50k 64-dim vectors executor-side (deterministic per-id
RandomState, 32 latent topics — the SemDeDup rehearsal generator, so
ANN has real cluster structure). Measures the three PQ stages
separately on local[32]:

- train wall (m=8, k=64, 4 Lloyd iterations — one scan + one bounded
  aggregate each);
- encode wall (narrow Arrow map; the count() forces materialization);
- ADC search wall for 16 queries over all codes, with TWO recall
  numbers: planted-duplicate retrieval (each query is a planted
  near-copy; its base must surface in the ADC top-10 — the metric
  with real signal, since the base is far closer than anything else)
  and exact-top10-in-ADC-top50 candidate recall (honest but weak on
  this generator: within a dense topic cluster the exact top-10 is
  barely separated from rank-100 — distance concentration — so no
  quantizer ranks it reliably; reported, not asserted);
- the storage ratio: code bytes vs raw float64 vector bytes;
- the IVF-PQ composition (ivfpq_topk, n_lists=32, n_probe=8): full
  train+encode+search wall for the same 16 queries, with the same
  planted-base metric — the probed-list pruning must not lose the
  near-copies' bases.

Usage: python tools/rehearse_pq.py [n_vectors] [m] [k]
Prints one JSON line; paste into docs/PERF.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.pq import encode_pq, pq_topk, train_pq
from globalweather_etl_spark.operators.similarity import cosine_topk
from globalweather_etl_spark.session import get_spark

DIM = 64
TOPICS = 32


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    spark = get_spark(
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    n_dup = max(16, n // 10)
    n_base = n - n_dup

    def gen(iterator):
        topics = np.random.RandomState(12345).randn(TOPICS, DIM)
        topics /= np.linalg.norm(topics, axis=1, keepdims=True)
        for pdf in iterator:
            out = []
            for vid in pdf["id"]:
                base = vid if vid < n_base else vid - n_base
                rs = np.random.RandomState(base)
                v = topics[base % TOPICS] + 0.35 * rs.randn(DIM)
                if vid >= n_base:  # planted near-copy of its base
                    v = v + 0.02 * np.random.RandomState(vid).randn(DIM)
                out.append([float(x) for x in v])
            pdf = pdf.copy()
            pdf["embedding"] = out
            yield pdf

    emb = (
        spark.range(n)
        .repartition(32)
        .mapInPandas(gen, "id long, embedding array<double>")
        .withColumnRenamed("id", "vec_id")
        .persist()
    )
    emb.count()

    t0 = time.perf_counter()
    books = train_pq(emb, m=m, k=k, iters=4, normalize=True)
    train_s = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    encoded = encode_pq(emb, books, normalize=True).select(
        "vec_id", "pq_codes"
    ).persist()
    encoded.count()
    encode_s = round(time.perf_counter() - t0, 2)

    queries = emb.filter(
        (F.col("vec_id") >= n_base) & (F.col("vec_id") < n_base + 16)
    )
    t0 = time.perf_counter()
    adc = pq_topk(encoded, queries, books, k=50, metric="cosine")
    rows = adc.collect()
    search_s = round(time.perf_counter() - t0, 2)
    got = {(r["query_id"], r["cand_id"]) for r in rows}
    top10 = {
        (r["query_id"], r["cand_id"]) for r in rows if r["rank"] <= 10
    }
    planted_found = sum(
        1 for q in range(n_base, n_base + 16) if (q, q - n_base) in top10
    )

    exact = cosine_topk(emb, queries, k=10)
    want = {(r["query_id"], r["cand_id"]) for r in exact.collect()}
    recall = len(got & want) / len(want)

    from globalweather_etl_spark.operators.pq import ivfpq_topk

    t0 = time.perf_counter()
    ivf = ivfpq_topk(
        emb, queries, k=10, n_lists=32, n_probe=8, m=m, k_codes=k,
        coarse_iters=2, pq_iters=3,
    )
    ivf_rows = ivf.collect()
    ivfpq_s = round(time.perf_counter() - t0, 2)
    ivf_top10 = {(r["query_id"], r["cand_id"]) for r in ivf_rows}
    ivf_planted = sum(
        1
        for q in range(n_base, n_base + 16)
        if (q, q - n_base) in ivf_top10
    )

    print(
        json.dumps(
            {
                "n_vectors": n,
                "dim": DIM,
                "m": m,
                "k": k,
                "train_s": train_s,
                "encode_s": encode_s,
                "adc_search_s_16q": search_s,
                "planted_base_in_adc_top10": f"{planted_found}/16",
                "exact10_in_adc50_recall": round(recall, 4),
                "compression_x": round(DIM * 8 / (m * 4), 1),
                "ivfpq_total_s_16q": ivfpq_s,
                "ivfpq_planted_base_in_top10": f"{ivf_planted}/16",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
