"""Similarity search over embedding columns (array<float>).

Three paths:
  cosine_topk      exact brute force — the baseline and the oracle target
  lsh_cosine_topk  random-hyperplane LSH bucketing (Charikar, STOC 2002;
                   multi-table amplification per Gionis/Indyk/Motwani,
                   VLDB 1999) — probe only candidates sharing a bucket
  ivf_cosine_topk  inverted-file coarse quantizer (the FAISS IVF-Flat
                   family; Sivic & Zisserman, ICCV 2003; Jégou et al.,
                   TPAMI 2011) — probe the n_probe nearest Voronoi cells

Everything is built-in higher-order functions (zip_with/aggregate) over
double-cast arrays — JVM-side, no UDF, so the dot products run inside
codegen and the oracle (DuckDB list_dot_product on DOUBLE[]) accumulates
in the same left-to-right order -> bit-identical scores.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.partitioning import (
    deliberate_single_partition,
    spread_for_compute,
)


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ a_i*b_i via zip_with + left-fold aggregate (sequential order —
    deterministic and engine-portable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    Plan shape: broadcast the (small) query set against the (huge)
    candidate table — a broadcast nested-loop scoring pass, no shuffle
    of the candidates; then per-query top-k. Top-k uses row_number over
    a window partitioned BY QUERY — parallelism = #queries, each
    partition holds only candidate scores, and ties break on candidate
    id for determinism."""
    embeddings = spread_for_compute(embeddings)
    cand = embeddings.select(
        F.col(id_col).alias("cand_id"), _as_double(F.col(vec_col)).alias("cvec")
    )
    qry = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qvec")
    )
    scored = (
        cand.crossJoin(F.broadcast(qry))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            cosine(F.col("qvec"), F.col("cvec")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )


def _check_dim(df: DataFrame, vec_col: str, dim: int) -> None:
    """Cheap eager guard: one limit(1) probe of the vector length."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()
    if row and row[0]["d"] != dim:
        raise ValueError(
            f"dim={dim} but '{vec_col}' vectors have length {row[0]['d']}"
        )


def lsh_signature(vec: Column, dim: int, num_planes: int = 16) -> Column:
    """Random-hyperplane signature (single table): see
    lsh_signature_multi."""
    return lsh_signature_multi(vec, F.lit(0), dim, num_planes)


def lsh_signature_multi(
    vec: Column, table: Column, dim: int, num_planes: int = 16
) -> Column:
    """Random-hyperplane signature: bit i = sign(vec . plane_i), folded
    into a BIGINT bucket key; `table` offsets the plane family so each
    hash table draws independent hyperplanes.

    Hyperplane component j of plane i derives from
    xxhash64(table*num_planes + i, j) mapped to [-1, 1) — deterministic,
    no RNG state, no driver-side arrays. Plane indices come from
    sequence() and components from a nested transform, so the expression
    tree is constant-size in (dim, num_planes) instead of materializing
    dim literals per plane — the naive unrolled form took seconds just
    to codegen."""
    plane_idx = F.transform(
        F.sequence(F.lit(0), F.lit(num_planes - 1)),
        lambda i: table * F.lit(num_planes) + i,
    )
    comp_idx = F.sequence(F.lit(0), F.lit(dim - 1))
    dots = F.transform(
        plane_idx,
        lambda i: F.aggregate(
            F.zip_with(
                vec,
                F.transform(
                    comp_idx,
                    lambda j: F.pmod(F.xxhash64(i, j), F.lit(2000001))
                    / F.lit(1000000.0)
                    - F.lit(1.0),
                ),
                lambda x, p: x * p,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    masks = F.array(*[F.lit(1 << i).cast("long") for i in range(num_planes)])
    return F.aggregate(
        F.zip_with(
            dots,
            masks,
            lambda d, m: F.when(d >= 0, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, m: acc.bitwiseOR(m),
    )


def _normalize(vec: Column) -> Column:
    n = l2_norm(vec)
    return F.transform(vec, lambda x: x / n)


def lloyd_step(assigned: DataFrame) -> DataFrame:
    """One distributed Lloyd iteration over ``(list_id, cvec)`` rows:
    component-wise mean per list, arrays rebuilt by position —
    groupBy (list, pos) keeps every stage distributed. Centroids are
    re-normalized (spherical k-means: the mean direction is the
    cosine-objective optimum). Shared by IVF refinement and the public
    k-means operator (operators/kmeans.py)."""
    comps = assigned.select("list_id", F.posexplode("cvec").alias("pos", "x"))
    return (
        comps.groupBy("list_id", "pos")
        .agg(F.avg("x").alias("x"))
        .groupBy("list_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "x"))),
                lambda s: s["x"],
            ).alias("centroid")
        )
        .select("list_id", _normalize(F.col("centroid")).alias("centroid"))
    )


def ivf_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    refine_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "arrow",
    portable: bool = False,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition vectors into
    n_lists Voronoi cells around centroids; each query scores only the
    cells of its n_probe nearest centroids — the coarse-quantizer ANN
    family (FAISS IVF-Flat).

    Centroids: the n_lists vectors with smallest xxhash64(id) — a
    deterministic uniform sample (no RNG state, reproducible).
    refine_iters > 0 runs Lloyd iterations fully distributed: explode
    assigned vectors to (list, pos, component), average per (list, pos),
    rebuild centroid arrays.

    portable=True draws the centroid sample by md5-prefix hash of the
    stringified id instead of xxhash64, so DuckDB selects the identical
    seed set — with refine_iters=0 the whole operator then has an exact
    cross-engine oracle (sampling, argmax assignment, probing, and
    exact-fold cosine scoring all mirror in SQL). Lloyd refinement is
    deliberately NOT part of the oracle surface: its distributed mean
    sums floats in partition order, which no cross-engine twin can
    reproduce bit-for-bit without an order-canonical (and
    memory-unscalable) fold.

    impl="arrow" (default, the scale path): the corpus-side assignment
    is one numpy argmax matmul per Arrow batch against the broadcast
    n_lists x dim centroid matrix — kilobytes of driver traffic,
    independent of corpus size, exactly how FAISS ships its coarse
    quantizer. This removes BOTH the per-vector interpreted dot
    products AND the argmax groupBy shuffle of the expression form
    (assignment becomes a narrow map). Candidate scoring stays
    expression cosine — see _bucketize for why the Arrow round-trip
    loses once vectors are already JVM-resident. impl="expr" keeps
    everything as built-in expressions: engine-portable, zero driver
    round-trips, but interpreted HOF math per row.

    Scale shape: assignment is a narrow scan stage; the probe join
    shuffles on list_id (n_lists spread); per-query work drops by
    ~n_probe/n_lists versus brute force. Recall tunes with n_probe.
    """
    cand = spread_for_compute(embeddings).select(
        F.col(id_col).alias("cand_id"), _as_double(F.col(vec_col)).alias("cvec")
    )
    qry = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qvec")
    )
    if portable:
        from globalweather_etl_spark.operators.dedup import _md5_long

        seed_key = _md5_long(F.col("cand_id").cast("string"))
    else:
        seed_key = F.xxhash64("cand_id")
    centroids = (
        cand.orderBy(seed_key)
        .limit(n_lists)
        .select(
            # Deliberately single-partition: numbering n_lists (<=
            # dozens) sampled centroids (see deliberate_single_partition
            # for why a plain lit(0) would not survive the optimizer).
            F.row_number()
            .over(
                Window.partitionBy(deliberate_single_partition()).orderBy(
                    "cand_id"
                )
            )
            .cast("int")
            .alias("list_id"),
            _normalize(F.col("cvec")).alias("centroid"),
        )
    )

    _lloyd_step = lloyd_step

    if impl == "arrow":
        from globalweather_etl_spark.operators.vector_arrow import (
            argmax_centroid_arrow,
            centroid_rows_to_matrix,
        )

        def _assign_mat(mat) -> DataFrame:
            return cand.select(
                "cand_id",
                "cvec",
                argmax_centroid_arrow(mat)(F.col("cvec")).alias("list_id"),
            )

        # An iterative algorithm needs a barrier per iteration anyway
        # (centroids_t+1 is a global aggregate of assignment_t) —
        # collecting the n_lists x dim matrix at each barrier instead of
        # keeping the chain lazy means the corpus-wide assignment runs
        # ONCE per iteration, not once per downstream action re-deriving
        # the whole lineage. Empty lists keep their previous centroid
        # (the FAISS convention). dim comes from the sampled rows — no
        # separate probe job.
        seed_rows = centroids.collect()
        if not seed_rows:
            raise ValueError("embeddings table is empty")
        dim = len(seed_rows[0]["centroid"])
        mat = centroid_rows_to_matrix(seed_rows, n_lists, dim)
        for _ in range(refine_iters):
            refined = _lloyd_step(_assign_mat(mat)).collect()
            mat = centroid_rows_to_matrix(refined, n_lists, dim, base=mat)
        spark = embeddings.sparkSession
        centroids = spark.createDataFrame(
            [(i + 1, [float(x) for x in mat[i]]) for i in range(n_lists)],
            "list_id int, centroid array<double>",
        )
        assigned = _assign_mat(mat)
    elif impl == "expr":

        def _assign(vectors: DataFrame, vid: str, vcol: str) -> DataFrame:
            """(id, vec) -> (id, vec, list_id of nearest centroid)."""
            scored = vectors.crossJoin(F.broadcast(centroids)).select(
                vid,
                vcol,
                "list_id",
                dot(F.col(vcol), F.col("centroid")).alias("score"),
            )
            return scored.groupBy(vid).agg(
                F.max_by("list_id", F.struct("score", "list_id")).alias("list_id"),
                F.first(vcol).alias(vcol),
            )

        for _ in range(refine_iters):
            centroids = _lloyd_step(_assign(cand, "cand_id", "cvec"))
        assigned = _assign(cand, "cand_id", "cvec")
    else:
        raise ValueError(f"unknown impl: {impl!r}")
    probe_w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("list_id")
    )
    probes = (
        qry.crossJoin(F.broadcast(centroids))
        .select(
            "query_id",
            "qvec",
            "list_id",
            dot(F.col("qvec"), F.col("centroid")).alias("score"),
        )
        .withColumn("__r", F.row_number().over(probe_w))
        .filter(F.col("__r") <= n_probe)
        .drop("__r", "score")
    )
    scored = (
        assigned.join(F.broadcast(probes), "list_id")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            cosine(F.col("qvec"), F.col("cvec")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )


def _bucketize(
    base: DataFrame,
    vcol: str,
    dim: int,
    num_planes: int,
    num_tables: int,
    impl: str,
    portable: bool = False,
):
    """(id-ish cols, vcol) -> same plus (table, bucket) rows, one per
    hash table; returns (bucketed_df, cosine_fn) for the chosen impl.

    arrow: ONE pandas-UDF matmul emits all num_tables bucket keys per
    row, then posexplode fans them out — num_tables x fewer signature
    computations than the expr path, which must re-derive the signature
    after exploding the table index (its HOFs can't emit arrays of
    buckets without quadratic codegen).

    Candidate VERIFICATION stays expression-based in both impls: the
    candidate vectors are already JVM-resident after the bucket join,
    and profiling showed the Arrow round-trip of two dim-sized arrays
    per pair (~1 KB/pair both ways) costs 2-3x more than the
    interpreted fold — the opposite economics of bucketing, where one
    matmul replaces dim x planes x tables interpreted ops per row and
    nothing extra crosses the Arrow boundary.

    portable=True is the ORACLE mode: planes derive from md5 prefixes
    (DuckDB computes the identical family in SQL), the L2 norm of each
    vector is precomputed ONCE per row with the same sequential fold
    the oracle's sqrt(list_dot_product(v,v)) uses, and verification is
    dot(a,b)/(nrm_a*nrm_b) — bit-identical to the oracle's cosine but
    one fold per pair instead of three. Bucket keys AND similarity
    values hash-match the cross-engine oracle. The default mode keeps
    the faster xxhash64 planes and normalized-dot verification (values
    differ from an engine oracle at the last ulp).

    Returns (bucketed_df, score_fn) where score_fn(va, vb, na, nb)
    builds the similarity from the two vector columns and (portable
    mode only) the two precomputed __nrm columns."""
    if impl == "arrow":
        from globalweather_etl_spark.operators.vector_arrow import (
            lsh_buckets_arrow,
            lsh_buckets_normalized_arrow,
        )

        # posexplode_OUTER everywhere below: the bucket array always
        # has exactly num_tables elements, and the non-outer form
        # pushes a size(..)>0 filter below the Generate that forces a
        # SECOND ArrowEvalPython evaluation of the UDF per row.
        if portable:
            buckets = lsh_buckets_arrow(
                base.sparkSession, dim, num_planes, num_tables, "md5"
            )
            bucketed = (
                base.withColumn("__bs", buckets(F.col(vcol)))
                .withColumn("__nrm", l2_norm(F.col(vcol)))
                .select("*", F.posexplode_outer("__bs").alias("table", "bucket"))
                .drop("__bs")
            )
            return bucketed, lambda va, vb, na, nb: dot(va, vb) / (na * nb)
        buckets = lsh_buckets_normalized_arrow(
            base.sparkSession, dim, num_planes, num_tables
        )
        # The UDF also emits the L2-normalized vector, which REPLACES
        # vcol: downstream verification then scores candidates with a
        # plain dot product (cosine of unit vectors) — a third of the
        # per-pair CPU of dot + two norms, the dominant cost once
        # collisions outnumber rows.
        bucketed = (
            base.withColumn("__o", buckets(F.col(vcol)))
            .withColumn(vcol, F.col("__o.nv"))
            .select("*", F.posexplode_outer("__o.bs").alias("table", "bucket"))
            .drop("__o")
        )
        return bucketed, lambda va, vb, na, nb: dot(va, vb)
    if impl == "expr":
        if portable:
            raise ValueError(
                "portable=True requires impl='arrow': the expression "
                "path would re-derive md5 plane components per ROW "
                "(dim x planes x tables md5 calls) instead of once"
            )
        tables = F.explode(
            F.array(*[F.lit(t) for t in range(num_tables)])
        ).alias("table")
        bucketed = base.select("*", tables).withColumn(
            "bucket",
            lsh_signature_multi(F.col(vcol), F.col("table"), dim, num_planes),
        )
        return bucketed, lambda va, vb, na, nb: cosine(va, vb)
    raise ValueError(f"unknown impl: {impl!r}")


def lsh_range_pairs(
    embeddings: DataFrame,
    threshold: float,
    dim: int,
    num_planes: int = 8,
    num_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "arrow",
    portable: bool = False,
) -> DataFrame:
    """Bucketed similarity RANGE search: every pair (a, b), a < b, with
    cosine(a, b) >= threshold — the scale path for the all-pairs theta
    self-join (q_emb_range_search keeps the brute form as the exact
    recall baseline in test_similarity.py; registry-side it backs both
    emb_lsh_range_search and the doc-level docs_embedding_neardup).

    Candidate generation is a SELF-join on (table, bucket): only pairs
    sharing a random-hyperplane bucket in >=1 of num_tables independent
    tables are ever scored, so the shuffle keys are high-cardinality
    bucket ids and the quadratic all-pairs stage disappears. Each
    candidate is then verified with the exact cosine — precision is
    exact; recall is 1-(1-p^planes)^tables with p = 1 - angle/pi, rising
    with num_tables and with the threshold (near-dup pairs land in the
    same bucket with high probability).

    A pair colliding in several tables is scored once per collision and
    deduped by first() — duplicate scores are identical, and aggregating
    an 8-byte double shuffles less than carrying the vectors through a
    pair-keyed groupBy.

    impl="arrow" (default): all num_tables bucket keys come from ONE
    numpy matmul per Arrow batch (then posexplode), and verification is
    a vectorized batch cosine — see operators/vector_arrow.py.
    impl="expr" computes the same buckets with portable built-in
    expressions (interpreted per row; the parity of the two paths is
    pinned by test)."""
    _check_dim(embeddings, vec_col, dim)
    e = spread_for_compute(embeddings)
    base = e.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    )
    bucketed, _cos = _bucketize(
        base, "v", dim, num_planes, num_tables, impl, portable
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            _cos(
                F.col("a.v"), F.col("b.v"), F.col("a.__nrm"), F.col("b.__nrm")
            ).alias("cos_sim"),
        )
        .groupBy("id_a", "id_b")
        .agg(F.first("cos_sim").alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def lsh_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    num_planes: int = 8,
    num_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "arrow",
    portable: bool = False,
) -> DataFrame:
    """Approximate top-k: score only candidates sharing an LSH bucket
    with the query in AT LEAST ONE of num_tables independent hash
    tables (multi-probe-free amplification: P(candidate) =
    1-(1-p^planes)^tables). At 100 TB the bucket joins replace the full
    scoring pass — shuffle keys are (table, bucket) ids, candidates are
    ~num_tables/2^num_planes of the table per query. Recall rises with
    num_tables and falls with num_planes; cost moves oppositely.

    impl="arrow"/"expr": vectorized numpy vs portable expressions for
    bucketing and scoring — see lsh_range_pairs.

    `dim` must equal the actual vector length: a mismatch would NULL the
    plane dots (zip_with pads with NULL) and silently collapse every
    vector into one bucket — i.e. num_tables full cross joins. Checked
    eagerly against one sampled row."""
    _check_dim(embeddings, vec_col, dim)
    embeddings = spread_for_compute(embeddings)

    cand, _cos = _bucketize(
        embeddings.select(
            F.col(id_col).alias("cand_id"), _as_double(F.col(vec_col)).alias("cvec")
        ),
        "cvec", dim, num_planes, num_tables, impl, portable,
    )
    qry, _ = _bucketize(
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qvec")
        ),
        "qvec", dim, num_planes, num_tables, impl, portable,
    )
    if portable:
        # both sides carry a __nrm column; disambiguate before the join
        cand = cand.withColumnRenamed("__nrm", "__nrm_c")
        qry = qry.withColumnRenamed("__nrm", "__nrm_q")
    scored = (
        cand.join(F.broadcast(qry), ["table", "bucket"])
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            _cos(
                F.col("qvec"), F.col("cvec"),
                F.col("__nrm_q") if portable else F.lit(None),
                F.col("__nrm_c") if portable else F.lit(None),
            ).alias("cos_sim"),
        )
        # a pair matching in several tables appears several times with
        # the same score — dedup by key, scores are identical
        .groupBy("query_id", "cand_id")
        .agg(F.first("cos_sim").alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )
