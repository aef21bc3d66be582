"""Product quantization (PQ) — compressed-domain approximate nearest
neighbor search over an embedding column.

Public background: Jégou, Douze, Schmid, "Product Quantization for
Nearest Neighbor Search" (TPAMI 2011) — the FAISS `IndexPQ` recipe.
Each dim-d vector is split into ``m`` contiguous subvectors of
``d/m`` components; each subspace gets its own k-entry codebook
(k-means over the subvectors), and a vector is stored as ``m`` small
integer codes. Search uses asymmetric distance computation (ADC): per
query, precompute an (m x k) lookup table of subspace distances, then
score any stored vector with m table lookups — never touching the
original floats.

Why this is THE 100 TB embedding path: at m=8, k<=256 a 64-dim
float64 vector (512 bytes) becomes 8 one-byte codes — a 64x smaller
working set, which is the difference between an ANN sweep that
rescans raw parquet vectors and one whose encoded table fits in the
page cache of a modest cluster. The scan stage reads ONLY the codes
column (column pruning drops the raw vectors entirely).

Scale shape, stage by stage:
  train_pq    bounded-iteration Lloyd on all m subspaces JOINTLY —
              per iteration ONE narrow Arrow assignment scan + ONE
              (sub, code, pos) hash aggregate whose output is
              m*k*(d/m) = k*d rows regardless of corpus size; the
              codebook (k*d doubles) is the only driver state, same
              barrier-payload argument as operators/kmeans.py.
  encode_pq   one narrow Arrow map (argmin over k per subspace, BLAS
              batch matmul) — no shuffle, no join.
  pq_topk     broadcast the bounded query set as ADC lookup tables,
              score codes in a narrow Arrow map, per-query top-k via
              the same window-over-query pattern as cosine_topk
              (operators/similarity.py:51). The candidate table never
              shuffles; only (query, candidate, dist) survivors do.

Accuracy is the PQ trade (quantization error, controlled by m and k).
Lloyd-TRAINED codebooks have no exact cross-engine oracle (partition-
order float means, same reason the refinement in kmeans.py is
un-oracled), so tests pin: exact recovery when data lies ON a
codebook, reconstruction-error monotonicity in k, recall against the
exact brute-force ranking, cosine/L2 consistency, and determinism
(hash-min seeding, no RNG). The PORTABLE path (train_pq(portable=True,
iters=0) -> encode_pq(impl='expr') -> pq_topk(impl='expr')) IS
cross-engine bit-exact — md5-sampled raw-copy codebooks plus
order-fixed fold math — and is graded end-to-end against DuckDB as
the pq_* rows of tpch_scalar_checks (queries.py).

Codes are 0-based ints (ndarray indexing convention; ties in both
assignment and ADC break toward the SMALLER code/candidate id —
np.argmin's first-occurrence rule — so every stage is deterministic).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from globalweather_etl_spark.operators.partitioning import spread_for_compute
from globalweather_etl_spark.operators.similarity import _as_double, dot
from globalweather_etl_spark.operators.vector_arrow import _stack

__all__ = [
    "train_pq",
    "encode_pq",
    "decode_pq",
    "pq_topk",
    "ivfpq_topk",
    "ivfpq_encode_portable",
    "codebooks_to_df",
    "codebooks_from_df",
]


def _split_dims(dim: int, m: int) -> int:
    if m < 1 or dim % m != 0:
        raise ValueError(f"dim={dim} must divide evenly into m={m} subspaces")
    return dim // m


def _assign_codes_arrow(codebooks: np.ndarray):
    """Column function: vector -> array<int> of m codes. One batched
    ||x_s||^2 - 2 x_s.c + ||c||^2 argmin per subspace; ties to the
    smaller code (np.argmin first occurrence)."""
    m, k, dsub = codebooks.shape
    c_t = codebooks.transpose(0, 2, 1)  # m x dsub x k
    c_sq = (codebooks**2).sum(axis=2)  # m x k

    @pandas_udf("array<int>")
    def _assign(vecs: pd.Series) -> pd.Series:
        x = _stack(vecs, m * dsub).reshape(len(vecs), m, dsub)
        # dists[b, s, j] = -2 * x[b,s] . c[s,j] + ||c[s,j]||^2  (the
        # ||x||^2 term is constant per (b, s) and drops out of argmin)
        dots = np.einsum("bsd,sdk->bsk", x, c_t)
        codes = np.argmin(c_sq[None, :, :] - 2.0 * dots, axis=2).astype(np.int32)
        return pd.Series(list(codes))

    return _assign


def _assign_codes_expr(codebooks: np.ndarray, vec) -> "F.Column":
    """Expression-form encoder (the ORACLE path): vector -> array<int>
    of m codes with every double op a sequential left fold, so DuckDB's
      list_dot_product(c, c) - 2 * list_dot_product(x_s, c)
    reproduces each candidate distance bit-for-bit (the ||x_s||^2 term
    is constant per subspace and drops out of argmin, exactly as in
    _assign_codes_arrow). The ||c||^2 literal folds left-to-right in
    plain Python — IEEE doubles, identical to DuckDB's runtime fold.
    argmin is array_min over (dist, code) structs: struct ordering
    breaks ties toward the SMALLER code, matching both np.argmin's
    first-occurrence rule and the oracle's ORDER BY dist, code.

    O(m*k) fold expressions per row — fine for the bounded graded
    corpus; the Arrow path above is the 100 TB scale path (parity
    between the two is pinned in tests/test_pq.py)."""
    m, k, dsub = codebooks.shape
    codes = []
    for s in range(m):
        sub = F.slice(vec, s * dsub + 1, dsub)
        cands = []
        for j in range(k):
            comp = [float(x) for x in codebooks[s, j]]
            cc = 0.0
            for x in comp:
                cc = cc + x * x
            carr = F.array(*[F.lit(x) for x in comp])
            d = F.lit(cc) - F.lit(2.0) * dot(sub, carr)
            cands.append(F.struct(d.alias("d"), F.lit(j).alias("j")))
        codes.append(F.array_min(F.array(*cands))["j"])
    return F.array(*codes)


def train_pq(
    embeddings: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = False,
    portable: bool = False,
) -> np.ndarray:
    """Train per-subspace codebooks; returns the (m, k, d/m) ndarray
    (driver-resident, k*d doubles — kilobytes). Deterministic: seeds
    are the subvector slices of the k hash-min input vectors, then
    ``iters`` joint Lloyd steps (one scan + one bounded aggregate
    each). Empty Lloyd cells keep their previous centroid (the FAISS
    convention, as in vector_arrow.centroid_rows_to_matrix).

    normalize=True trains on L2-normalized vectors — the cosine
    regime: for unit vectors ||a-b||^2 = 2 - 2*cos(a,b), so L2 ADC
    ranks identically to cosine (pq_topk(metric='cosine') relies on
    this).

    portable=True is the ORACLE seeding (the ivf_cosine_topk
    convention): seeds are the k smallest md5-prefix hashes of the
    stringified id, and code j is the j-th seed in ID order — so
    DuckDB derives the identical codebook with
    row_number() OVER (ORDER BY vec_id) over the same hash-min
    sample. With iters=0 the codebooks are then raw subvector
    copies of parquet doubles and every later stage can be
    cross-engine bit-exact; Lloyd refinement (iters > 0) sums
    floats in partition order and is deliberately NOT part of the
    oracle surface (the kmeans.py argument)."""
    vec = _as_double(F.col(vec_col))
    if normalize:
        norm = F.sqrt(F.aggregate(vec, F.lit(0.0), lambda acc, y: acc + y * y))
        vec = F.transform(vec, lambda x: x / norm)
    cand = spread_for_compute(embeddings).select(
        F.col(id_col).alias("cand_id"), vec.alias("cvec")
    )
    head = cand.select(F.size("cvec").alias("d")).limit(1).collect()
    if not head:
        raise ValueError("embeddings table is empty")
    dim = head[0]["d"]
    dsub = _split_dims(dim, m)

    if portable:
        from globalweather_etl_spark.operators.dedup import _md5_long

        seed_key = _md5_long(F.col("cand_id").cast("string"))
    else:
        seed_key = F.xxhash64(F.col("cand_id").cast("string"))
    seeds = (
        cand.orderBy(seed_key, "cand_id")
        .limit(k)
        .select("cand_id", "cvec")
        .collect()
    )
    if portable:
        # code j = j-th seed in id order, mirroring the IVF oracle's
        # row_number() OVER (ORDER BY vec_id) numbering
        seeds = sorted(seeds, key=lambda r: r["cand_id"])
    if len(seeds) < k:
        raise ValueError(f"k={k} exceeds the {len(seeds)} input vectors")
    books = np.array(
        [[np.asarray(r["cvec"], dtype=np.float64)[s * dsub : (s + 1) * dsub]
          for r in seeds]
         for s in range(m)]
    )  # m x k x dsub

    for _ in range(iters):
        assigned = cand.select(
            "cvec", _assign_codes_arrow(books)(F.col("cvec")).alias("codes")
        )
        rows = (
            assigned.select(
                F.posexplode("codes").alias("sub", "code"), F.col("cvec")
            )
            .select(
                "sub",
                "code",
                F.posexplode(
                    F.slice(F.col("cvec"), F.col("sub") * dsub + 1, dsub)
                ).alias("pos", "comp"),
            )
            .groupBy("sub", "code", "pos")
            .agg(F.avg("comp").alias("mean"))
            .collect()
        )
        nxt = books.copy()
        for r in rows:
            nxt[r["sub"], r["code"], r["pos"]] = r["mean"]
        books = nxt
    return books


def encode_pq(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    code_col: str = "pq_codes",
    normalize: bool = False,
    impl: str = "arrow",
) -> DataFrame:
    """The input plus ``code_col`` (array<int>, m entries) — one
    narrow Arrow map. normalize must match the training choice.
    impl='expr' encodes with the order-fixed expression argmin
    (_assign_codes_expr) — the cross-engine-exact oracle path."""
    if impl not in ("arrow", "expr"):
        raise ValueError(f"unknown impl: {impl!r}")
    vec = _as_double(F.col(vec_col))
    if normalize:
        norm = F.sqrt(
            F.aggregate(vec, F.lit(0.0), lambda acc, y: acc + y * y)
        )
        vec = F.transform(_as_double(F.col(vec_col)), lambda x: x / norm)
    if impl == "expr":
        return df.withColumn(code_col, _assign_codes_expr(codebooks, vec))
    return df.withColumn(code_col, _assign_codes_arrow(codebooks)(vec))


def decode_pq(
    df: DataFrame,
    codebooks: np.ndarray,
    code_col: str = "pq_codes",
    out_col: str = "pq_decoded",
) -> DataFrame:
    """Reconstruct the quantized vector (concatenated codebook
    entries) — the decompression half of the storage story."""
    m, k, dsub = codebooks.shape

    @pandas_udf("array<double>")
    def _decode(codes: pd.Series) -> pd.Series:
        c = np.array([np.asarray(v, dtype=np.int64) for v in codes]).reshape(
            len(codes), m
        )
        rec = codebooks[np.arange(m)[None, :], c].reshape(len(codes), m * dsub)
        return pd.Series(list(rec))

    return df.withColumn(out_col, _decode(F.col(code_col)))


def pq_topk(
    encoded: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "pq_codes",
    metric: str = "l2",
    impl: str = "arrow",
) -> DataFrame:
    """ADC top-k: (query_id, cand_id, adc_dist[, adc_cos], rank) for
    every query vector, scored purely from candidate CODES.

    The bounded query set is collected into per-query (m x k) lookup
    tables (the broadcast-small-side assumption of cosine_topk);
    metric='cosine' requires codebooks trained with normalize=True
    and query vectors are normalized here — adc_cos = 1 - d/2.

    impl='expr' (the ORACLE path, metric='l2' only) scores the
    mathematically identical ADC objective through the reconstructed
    vector:  ||q - w||^2 = q.q - 2 q.w + w.w  where w is the
    concatenation of the chosen codebook entries (exact copies of
    codebook doubles, no arithmetic). All three dot products are
    sequential left folds and the codebook ships as a literal array,
    so DuckDB's list_dot_product twin reproduces every distance
    bit-for-bit. The LUT path above stays the scale path (codes-only
    scoring, kilobyte tables); LUT-vs-expr value parity is pinned in
    tests/test_pq.py."""
    if metric not in ("l2", "cosine"):
        raise ValueError(f"unknown metric: {metric!r}")
    if impl not in ("arrow", "expr"):
        raise ValueError(f"unknown impl: {impl!r}")
    m, kc, dsub = codebooks.shape
    if impl == "expr":
        if metric != "l2":
            raise ValueError("impl='expr' supports metric='l2' only")
        cb_flat = F.array(
            *[
                F.array(*[F.lit(float(x)) for x in codebooks[s, j]])
                for s in range(m)
                for j in range(kc)
            ]
        )
        w_arr = F.flatten(
            F.transform(
                F.col(code_col),
                lambda c, s: F.element_at(cb_flat, s * kc + c + F.lit(1)),
            )
        )
        qry = queries.select(
            F.col(id_col).alias("query_id"),
            _as_double(F.col(vec_col)).alias("qvec"),
        )
        cand = spread_for_compute(encoded).select(
            F.col(id_col).alias("cand_id"), w_arr.alias("w")
        )
        scored = (
            cand.crossJoin(F.broadcast(qry))
            .filter(F.col("cand_id") != F.col("query_id"))
            .select(
                "query_id",
                "cand_id",
                (
                    dot(F.col("qvec"), F.col("qvec"))
                    - F.lit(2.0) * dot(F.col("qvec"), F.col("w"))
                    + dot(F.col("w"), F.col("w"))
                ).alias("adc_dist"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.asc("adc_dist"), F.asc("cand_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select("query_id", "cand_id", "adc_dist", "rank")
        )
    qrows = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qvec")
    ).collect()
    if not qrows:
        raise ValueError("queries table is empty")
    qids = [r["query_id"] for r in qrows]
    qm = np.array([np.asarray(r["qvec"], dtype=np.float64) for r in qrows])
    if metric == "cosine":
        qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    qs = qm.reshape(len(qids), m, dsub)
    # lut[q, s, j] = ||q_s - c_sj||^2
    luts = (
        (qs[:, :, None, :] - codebooks[None, :, :, :]) ** 2
    ).sum(axis=3)  # n_q x m x k

    @pandas_udf("array<double>")
    def _adc(codes: pd.Series) -> pd.Series:
        c = np.array([np.asarray(v, dtype=np.int64) for v in codes]).reshape(
            len(codes), m
        )
        # dists[b, q] = sum_s luts[q, s, c[b, s]]: the (1, m) position
        # index broadcasts against the (batch, m) code matrix, giving
        # per_sub shape n_q x batch x m
        per_sub = luts[:, np.arange(m)[None, :], c]
        dists = per_sub.sum(axis=2).T
        return pd.Series(list(dists))

    scored = (
        spread_for_compute(encoded)
        .select(F.col(id_col).alias("cand_id"), _adc(F.col(code_col)).alias("ds"))
        .select("cand_id", F.posexplode("ds").alias("qpos", "adc_dist"))
        .withColumn(
            "query_id",
            F.element_at(
                F.array(*[F.lit(q) for q in qids]), F.col("qpos") + 1
            ),
        )
        .filter(F.col("cand_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("cand_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "adc_dist", "rank")
    )
    if metric == "cosine":
        out = out.withColumn("adc_cos", F.lit(1.0) - F.col("adc_dist") / 2.0)
    return out


def ivfpq_encode_portable(
    embeddings: DataFrame,
    n_lists: int = 8,
    m: int = 8,
    k_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Index-build half of the PORTABLE (oracle-mode) IVF-PQ pipeline;
    returns ``(encoded, centroids, codebooks)`` where encoded carries
    (id, list_id, pq_codes), centroids is the (cluster_id, centroid)
    frame, and codebooks the (m, k_codes, d/m) ndarray over RESIDUALS.

    Every value-producing step is order-fixed so DuckDB derives the
    identical index: coarse centroids from kmeans.portable_centroids
    (md5-sampled, fold-normalized, no Lloyd), coarse assignment an
    EXPRESSION argmax of fold dots (ties to the larger list — the
    Arrow argmax convention), residuals one zip_with subtraction, and
    residual codebooks/codes through train_pq(portable=True,
    iters=0) + encode_pq(impl='expr'). The Lloyd-trained Arrow
    pipeline in ivfpq_topk stays the scale path; this is the graded
    form behind the ivfpq_* rows of tpch_scalar_checks."""
    from globalweather_etl_spark.operators.kmeans import portable_centroids
    from globalweather_etl_spark.operators.similarity import _normalize

    cand = spread_for_compute(embeddings).select(
        F.col(id_col).alias("cand_id"),
        _normalize(_as_double(F.col(vec_col))).alias("nvec"),
    )
    cent = portable_centroids(embeddings, n_lists, id_col, vec_col)
    crows = sorted(cent.collect(), key=lambda r: r["cluster_id"])
    if len(crows) < n_lists:
        raise ValueError(
            f"n_lists={n_lists} exceeds the {len(crows)} input vectors"
        )
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    dot(
                        F.col("nvec"),
                        F.array(*[F.lit(float(x)) for x in r["centroid"]]),
                    ).alias("d"),
                    F.lit(int(r["cluster_id"])).alias("l"),
                )
                for r in crows
            ]
        )
    )["l"]
    assigned = cand.withColumn("list_id", best)
    cent2 = cent.select(
        F.col("cluster_id").alias("list_id"), F.col("centroid").alias("__cent")
    )
    residuals = assigned.join(F.broadcast(cent2), "list_id").select(
        "cand_id",
        "list_id",
        F.zip_with("nvec", "__cent", lambda a, b: a - b).alias("res"),
    )
    books = train_pq(
        residuals, m=m, k=k_codes, iters=0, id_col="cand_id",
        vec_col="res", portable=True,
    )
    encoded = encode_pq(residuals, books, vec_col="res", impl="expr").select(
        "cand_id", "list_id", "pq_codes"
    )
    return encoded, cent, books


def ivfpq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    m: int = 8,
    k_codes: int = 16,
    coarse_iters: int = 2,
    pq_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    portable: bool = False,
) -> DataFrame:
    """IVF-PQ (the FAISS billion-scale recipe, Jégou 2011 §V): coarse
    spherical-k-means lists prune the search space, PQ over the
    RESIDUAL (vector minus its list centroid) compresses what remains
    — residuals are smaller and better-centered than raw vectors, so
    the same codebook budget quantizes them more finely.

    Plan shape end to end: coarse fit/assign is operators/kmeans.py
    (narrow Arrow argmax, bounded Lloyd barriers); residuals are one
    zip_with against the broadcast centroid table; PQ train/encode as
    in train_pq/encode_pq (bounded aggregates, narrow maps). Search
    probes each query's n_probe nearest lists and scores ONLY those
    lists' codes with per-(query, list) ADC tables — the full n_q x
    n_lists x m x k table is kilobytes and ships in the UDF closure;
    candidates reach the scorer through one broadcast equi-join on
    list_id (the candidate table never shuffles). Cosine regime
    throughout: inputs are L2-normalized, adc_cos = 1 - dist/2.

    Returns (query_id, cand_id, adc_cos, rank) — rank by ADC score,
    ties to the smaller candidate id. Like pq_topk this is a
    candidate generator: exact rerank of the top-R survivors is one
    join back to the raw vectors.

    portable=True (the ORACLE path) swaps the whole pipeline for the
    cross-engine-exact composition: index from ivfpq_encode_portable
    (coarse_iters/pq_iters are ignored — no Lloyd by construction),
    probes = the n_probe best centroids per query by fold dot (ties
    to the SMALLER list, the numpy argsort first-occurrence rule the
    Arrow path uses), and scoring the exact-fold residual ADC
    1 - (u.u - 2 u.w + w.w)/2 where u = q_normalized - centroid and
    w is the residual reconstruction from codes. Bit-exact in DuckDB
    end to end."""
    from globalweather_etl_spark.operators.kmeans import fit_kmeans
    from globalweather_etl_spark.operators.similarity import _normalize
    from globalweather_etl_spark.operators.vector_arrow import (
        argmax_centroid_arrow,
        centroid_rows_to_matrix,
    )

    if portable:
        encoded, cent, books = ivfpq_encode_portable(
            embeddings, n_lists=n_lists, m=m, k_codes=k_codes,
            id_col=id_col, vec_col=vec_col,
        )
        mm, kc, dsub = books.shape
        cent2 = cent.select(
            F.col("cluster_id").alias("list_id"),
            F.col("centroid").alias("__cent"),
        )
        qn = queries.select(
            F.col(id_col).alias("query_id"),
            _normalize(_as_double(F.col(vec_col))).alias("qn"),
        )
        wp = Window.partitionBy("query_id").orderBy(
            F.desc("__d"), F.asc("list_id")
        )
        probes = (
            qn.crossJoin(F.broadcast(cent2))
            .withColumn("__d", dot(F.col("qn"), F.col("__cent")))
            .withColumn("__rn", F.row_number().over(wp))
            .filter(F.col("__rn") <= n_probe)
            .select("query_id", "qn", "list_id", "__cent")
        )
        cb_flat = F.array(
            *[
                F.array(*[F.lit(float(x)) for x in books[s, j]])
                for s in range(mm)
                for j in range(kc)
            ]
        )
        w_arr = F.flatten(
            F.transform(
                F.col("pq_codes"),
                lambda c, s: F.element_at(cb_flat, s * kc + c + F.lit(1)),
            )
        )
        u = F.zip_with("qn", "__cent", lambda a, b: a - b)
        scored = (
            probes.join(encoded, "list_id")
            .filter(F.col("cand_id") != F.col("query_id"))
            .withColumn("__u", u)
            .withColumn("__w", w_arr)
            .select(
                "query_id",
                "cand_id",
                (
                    F.lit(1.0)
                    - (
                        dot(F.col("__u"), F.col("__u"))
                        - F.lit(2.0) * dot(F.col("__u"), F.col("__w"))
                        + dot(F.col("__w"), F.col("__w"))
                    )
                    / F.lit(2.0)
                ).alias("adc_cos"),
            )
        )
        wr = Window.partitionBy("query_id").orderBy(
            F.desc("adc_cos"), F.asc("cand_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(wr).cast("int"))
            .filter(F.col("rank") <= k)
            .select("query_id", "cand_id", "adc_cos", "rank")
        )

    cand = spread_for_compute(embeddings).select(
        F.col(id_col).alias("cand_id"),
        _normalize(_as_double(F.col(vec_col))).alias("nvec"),
    )
    coarse = fit_kmeans(
        cand, n_lists, iters=coarse_iters, id_col="cand_id", vec_col="nvec"
    )
    crows = sorted(coarse.collect(), key=lambda r: r["cluster_id"])
    dim = len(crows[0]["centroid"])
    cmat = centroid_rows_to_matrix(
        [{"list_id": r["cluster_id"], "centroid": r["centroid"]} for r in crows],
        n_lists,
        dim,
    )
    assigned = cand.withColumn(
        "list_id", argmax_centroid_arrow(cmat)(F.col("nvec"))
    )
    cent = coarse.select(
        F.col("cluster_id").alias("list_id"),
        F.col("centroid").alias("__cent"),
    )
    residuals = assigned.join(F.broadcast(cent), "list_id").select(
        "cand_id",
        "list_id",
        F.zip_with("nvec", "__cent", lambda a, b: a - b).alias("res"),
    )
    books = train_pq(
        residuals, m=m, k=k_codes, iters=pq_iters, id_col="cand_id",
        vec_col="res",
    )
    encoded = encode_pq(residuals, books, vec_col="res").select(
        "cand_id", "list_id", "pq_codes"
    )

    qrows = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qvec")
    ).collect()
    if not qrows:
        raise ValueError("queries table is empty")
    qids = [r["query_id"] for r in qrows]
    qm = np.array([np.asarray(r["qvec"], dtype=np.float64) for r in qrows])
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    dsub = dim // m
    # q_res[q, l] = q - centroid_l, per probed-or-not list (bounded):
    q_res = (qm[:, None, :] - cmat[None, :, :]).reshape(
        len(qids), n_lists, m, dsub
    )
    # luts[q, l, s, j] = ||q_res[q, l, s] - books[s, j]||^2
    luts = ((q_res[:, :, :, None, :] - books[None, None, :, :, :]) ** 2).sum(
        axis=4
    )
    # probe lists: top n_probe by query-to-centroid dot
    probe_scores = qm @ cmat.T  # n_q x n_lists
    order = np.argsort(-probe_scores, axis=1)[:, :n_probe]
    spark = embeddings.sparkSession
    probes = spark.createDataFrame(
        [
            (qpos, qids[qpos], int(order[qpos, p]) + 1)
            for qpos in range(len(qids))
            for p in range(order.shape[1])
        ],
        ["qpos", "query_id", "list_id"],
    )

    @pandas_udf("double")
    def _adc_res(qpos: pd.Series, list_id: pd.Series, codes: pd.Series) -> pd.Series:
        c = np.array([np.asarray(v, dtype=np.int64) for v in codes]).reshape(
            len(codes), m
        )
        qp = qpos.to_numpy(dtype=np.int64)
        li = list_id.to_numpy(dtype=np.int64) - 1
        d = luts[qp[:, None], li[:, None], np.arange(m)[None, :], c].sum(axis=1)
        return pd.Series(d)

    scored = (
        encoded.join(F.broadcast(probes), "list_id")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            (
                F.lit(1.0)
                - _adc_res(F.col("qpos"), F.col("list_id"), F.col("pq_codes"))
                / 2.0
            ).alias("adc_cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("adc_cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "adc_cos", "rank")
    )


def codebooks_to_df(spark, codebooks: np.ndarray) -> DataFrame:
    """Persistable (sub, code, centroid) form — write as parquet next
    to the encoded table so any session (or engine) can decode."""
    m, k, _ = codebooks.shape
    return spark.createDataFrame(
        [
            (s, c, [float(x) for x in codebooks[s, c]])
            for s in range(m)
            for c in range(k)
        ],
        "sub int, code int, centroid array<double>",
    )


def codebooks_from_df(df: DataFrame) -> np.ndarray:
    """Inverse of codebooks_to_df (validates a full m x k grid)."""
    rows = df.collect()
    if not rows:
        raise ValueError("codebooks table is empty")
    m = max(r["sub"] for r in rows) + 1
    k = max(r["code"] for r in rows) + 1
    dsub = len(rows[0]["centroid"])
    books = np.full((m, k, dsub), np.nan)
    for r in rows:
        books[r["sub"], r["code"]] = np.asarray(r["centroid"], dtype=np.float64)
    if np.isnan(books).any():
        raise ValueError("codebooks table is missing (sub, code) entries")
    return books
