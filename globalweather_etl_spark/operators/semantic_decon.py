"""Semantic benchmark decontamination — the embedding-space screen
that catches what n-gram overlap misses.

`operators.dedup.decontaminate` (exact shingles) and
`fuzzy_decontaminate` (MinHash-LSH) both key on LEXICAL overlap; a
paraphrased eval question leaks through both. The published cure
(public background: the GPT-4 / Llama-style "embedding similarity
decontamination" reported in model cards, and the same radius-cut
SemDeDup applies within a corpus) is to flag every corpus document
whose embedding sits within a cosine radius of ANY benchmark
embedding.

Scale shape (100 TB corpus, bounded benchmark): benchmarks are
thousands-to-millions of rows — their normalized embedding matrix is
megabytes, so it ships ONCE in the scorer's closure and each corpus
batch pays one BLAS matmul (batch x dim @ dim x n_bench) in a narrow
Arrow map. The corpus never shuffles, nothing joins; the output is
the input plus (max_bench_cos, matched_bench_id, is_semantic_contaminated)
— the same contract as the lexical screens, so `plans/curation.py`-style
pipelines can stack all three. For benchmarks too large for a closure
matrix, fall back to the bucketed cross-table form
(`operators.similarity.lsh_range_pairs` over the union) — the trade
is a shuffle for unbounded bench size.

Float caveat: the Arrow scores are double matmuls — no bit-exact
cross-engine oracle for THAT path (same reason as kmeans/PQ, see
their docstrings); tests pin planted-paraphrase recall, clean-doc
pass-through, threshold monotonicity, NumPy parity on the scores,
and determinism. impl='expr' is the exception: sequential-fold
cosines against a broadcast benchmark frame, bit-exact in DuckDB —
graded as the sdc_* rows of tpch_scalar_checks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from globalweather_etl_spark.operators.partitioning import spread_for_compute
from globalweather_etl_spark.operators.similarity import _as_double
from globalweather_etl_spark.operators.vector_arrow import _stack

__all__ = ["semantic_decontaminate"]


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    eps: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_id_col: str | None = None,
    bench_vec_col: str | None = None,
    impl: str = "arrow",
) -> DataFrame:
    """The corpus unchanged plus three columns: ``max_bench_cos`` (max
    cosine to any benchmark embedding), ``matched_bench_id`` (the
    benchmark id attaining it; ties to the SMALLER bench row position,
    np.argmax first-occurrence), and ``is_semantic_contaminated``
    (max_bench_cos >= eps). Zero-norm corpus vectors surface with a
    NULL score (the batch matmul yields NaN, which the Arrow return
    path maps to SQL NULL) and are never flagged or attributed —
    matching the cosine semantics of the exact operators.

    impl='expr' (the ORACLE path): scores every (corpus, bench) pair
    with the sequential-fold cosine through a broadcast join and takes
    the per-corpus-row max with a window — bit-exact in DuckDB
    (list_dot_product twin). Two contract differences, both
    documented: ties break on the SMALLER BENCH ID (deterministic
    regardless of benchmark row order — the Arrow path's position rule
    depends on it), and ``id_col`` must be unique per corpus row (the
    window key). The Arrow matmul stays the scale path: the expr form
    materializes corpus x bench pair rows, the matmul never does."""
    if not 0.0 < eps <= 1.0:
        raise ValueError(f"eps must be in (0, 1], got {eps}")
    if impl not in ("arrow", "expr"):
        raise ValueError(f"unknown impl: {impl!r}")
    bench_id_col = bench_id_col or id_col
    bench_vec_col = bench_vec_col or vec_col
    if impl == "expr":
        from pyspark.sql import Window

        from globalweather_etl_spark.operators.similarity import (
            cosine,
            l2_norm,
        )

        bench2 = benchmark.select(
            F.col(bench_id_col).alias("__bid"),
            _as_double(F.col(bench_vec_col)).alias("__bvec"),
        )
        cvec = _as_double(F.col(vec_col))
        score = F.when(l2_norm(cvec) == 0.0, F.lit(None).cast("double")).otherwise(
            cosine(cvec, F.col("__bvec"))
        )
        w = Window.partitionBy(id_col).orderBy(
            F.desc_nulls_last("__cos"), F.asc("__bid")
        )
        return (
            spread_for_compute(corpus)
            .crossJoin(F.broadcast(bench2))
            .withColumn("__cos", score)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .withColumn("max_bench_cos", F.col("__cos"))
            .withColumn(
                "matched_bench_id",
                F.when(
                    F.col("max_bench_cos").isNotNull()
                    & ~F.isnan("max_bench_cos"),
                    F.col("__bid"),
                ),
            )
            .withColumn(
                "is_semantic_contaminated",
                F.coalesce(F.col("max_bench_cos") >= eps, F.lit(False)),
            )
            .drop("__bid", "__bvec", "__cos", "__rn")
        )
    rows = benchmark.select(
        F.col(bench_id_col).alias("__bid"),
        _as_double(F.col(bench_vec_col)).alias("__bvec"),
    ).collect()
    if not rows:
        raise ValueError("benchmark table is empty")
    bids = [r["__bid"] for r in rows]
    bm = np.array([np.asarray(r["__bvec"], dtype=np.float64) for r in rows])
    dim = bm.shape[1]
    norms = np.linalg.norm(bm, axis=1, keepdims=True)
    if (norms == 0).any():
        raise ValueError("benchmark contains a zero-norm embedding")
    bt = (bm / norms).T  # dim x n_bench

    @pandas_udf("struct<cos: double, pos: int>")
    def _best(vecs: pd.Series) -> pd.DataFrame:
        m = _stack(vecs, dim)
        mn = np.linalg.norm(m, axis=1, keepdims=True)
        scores = (m / mn) @ bt  # batch x n_bench; NaN rows stay NaN
        pos = np.argmax(np.nan_to_num(scores, nan=-2.0), axis=1)
        best = scores[np.arange(len(m)), pos]
        return pd.DataFrame({"cos": best, "pos": pos.astype(np.int32)})

    scored = (
        spread_for_compute(corpus)
        .withColumn("__best", _best(_as_double(F.col(vec_col))))
        .withColumn("max_bench_cos", F.col("__best.cos"))
        .withColumn("__pos", F.col("__best.pos"))
        .drop("__best")
    )
    # id lookup is a broadcast equi-join on the matched position, not a
    # literal array — a million-question benchmark would otherwise
    # inflate the expression tree
    spark = corpus.sparkSession
    lookup = spark.createDataFrame(
        [(i, b) for i, b in enumerate(bids)], ["__pos", "__bid"]
    )
    return (
        scored.join(F.broadcast(lookup), "__pos", "left")
        .withColumn(
            "matched_bench_id",
            # isnan(NULL) is FALSE in Spark, so the null check cannot
            # be folded into the isnan guard
            F.when(
                F.col("max_bench_cos").isNotNull()
                & ~F.isnan("max_bench_cos"),
                F.col("__bid"),
            ),
        )
        .withColumn(
            "is_semantic_contaminated",
            F.coalesce(F.col("max_bench_cos") >= eps, F.lit(False)),
        )
        .drop("__pos", "__bid")
    )
