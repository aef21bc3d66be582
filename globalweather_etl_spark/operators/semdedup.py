"""SemDeDup: semantic deduplication via k-means clusters + intra-cluster
cosine dominance (public formulation: Abbas et al. 2023, arXiv
2303.09540).

The embedding-space complement of the lexical dedup families in
`operators.dedup`: two documents with no shared n-grams but
near-identical embeddings (translations, paraphrases, templated
rewrites) are semantic duplicates.  The published recipe: cluster the
embedding space, then compare pairs ONLY within a cluster, removing
all but one of every epsilon-similar group.

Semantics (pinned for tests):
- clustering comes from `operators.kmeans` (deterministic hash-min
  seeding) or a caller-supplied centroid table;
- within a cluster, item i is REMOVED iff some higher-priority item j
  has cosine(i, j) >= eps.  Priority is the keep policy:
  'far_from_centroid' (the paper's choice — keep the outlier, prune
  toward diversity; lower cluster_sim wins, ties by lower id) or
  'min_id' (stable archival choice).  Dominance needs no
  connected-components pass and one survivor per epsilon-group is
  guaranteed (the top-priority member is never dominated).

Scale shape (100 TB embeddings): assignment is a narrow Arrow map (no
shuffle, `operators.kmeans.assign_clusters`); the pair stage is ONE
equi-join keyed on cluster_id.  Per-cluster work is quadratic, so size
k to bound clusters (the paper uses ~100k clusters for web scale;
rule of thumb k ≈ N / 1000) — same per-bucket-quadratic contract as
`similarity.lsh_range_pairs`, with the same skew guidance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.kmeans import (
    assign_clusters,
    fit_kmeans,
)
from globalweather_etl_spark.operators.similarity import _as_double, cosine

__all__ = ["semdedup"]


def semdedup(
    embeddings: DataFrame,
    n_clusters: int,
    eps: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: str = "far_from_centroid",
    centroids: DataFrame | None = None,
    kmeans_iters: int = 5,
) -> DataFrame:
    """The input plus ``cluster_id``, ``cluster_sim`` and ``is_kept``
    (False = pruned as a semantic duplicate of a kept neighbor)."""
    if keep not in ("far_from_centroid", "min_id"):
        raise ValueError(f"keep must be far_from_centroid/min_id, got {keep!r}")
    if not -1.0 <= eps <= 1.0:
        raise ValueError(f"eps must be a cosine in [-1,1], got {eps}")
    if centroids is None:
        centroids = fit_kmeans(
            embeddings, n_clusters, iters=kmeans_iters,
            id_col=id_col, vec_col=vec_col,
        )
    assigned = assign_clusters(embeddings, centroids, id_col, vec_col)

    left = assigned.select(
        F.col("cluster_id"),
        F.col(id_col).alias("__i"),
        _as_double(F.col(vec_col)).alias("__vi"),
        F.col("cluster_sim").alias("__si"),
    )
    right = assigned.select(
        F.col("cluster_id"),
        F.col(id_col).alias("__j"),
        _as_double(F.col(vec_col)).alias("__vj"),
        F.col("cluster_sim").alias("__sj"),
    )
    if keep == "far_from_centroid":
        # j beats i: farther from the centroid, ties to the lower id
        dominates = (F.col("__sj") < F.col("__si")) | (
            (F.col("__sj") == F.col("__si")) & (F.col("__j") < F.col("__i"))
        )
    else:
        dominates = F.col("__j") < F.col("__i")
    dominated = (
        left.join(right, "cluster_id")
        .filter(F.col("__i") != F.col("__j"))
        .filter(dominates)
        .filter(cosine(F.col("__vi"), F.col("__vj")) >= F.lit(float(eps)))
        .select(F.col("__i").alias(id_col))
        .distinct()
        .withColumn("__dup", F.lit(True))
    )
    return (
        assigned.join(dominated, id_col, "left")
        .withColumn("is_kept", F.col("__dup").isNull())
        .drop("__dup")
    )
