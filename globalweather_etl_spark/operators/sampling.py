"""Deterministic sampling and dataset splitting.

Training-data pipelines need REPRODUCIBLE sampling: the same row must
land in the same split on every run, on any cluster, regardless of
partitioning — so no rand()/sample() (both seed per-partition). The
selector here is a pure function of the row's key: the first 4 hex
chars of md5(key || seed), compared lexicographically against hex
thresholds. md5 hex strings are identical in every engine, making the
operators DuckDB-oracle-checkable, and the selectivity resolution is
1/65536 per threshold step.

All operators are single filters/projections on the scan — no shuffle,
pushdown-friendly, trivially parallel at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.partitioning import (
    deliberate_single_partition,
)

_SPACE = 16**4  # 4 hex chars


def _hex_bucket(key: Column, seed: int) -> Column:
    """First 4 hex chars of md5(key || ':' || seed) — a uniform draw
    from 65536 lexicographically ordered buckets."""
    return F.substring(
        F.md5(F.concat(key.cast("string"), F.lit(f":{seed}"))), 1, 4
    )


def _threshold(fraction: float) -> str:
    """Hex threshold for `bucket < threshold`. A full fraction maps to
    'g' — lexicographically above every 4-hex-char bucket — because the
    naive '10000' (5 chars) would sort BELOW '2xxx'..'fxxx' and keep
    only ~6% of rows."""
    v = min(_SPACE, max(0, round(fraction * _SPACE)))
    return "g" if v >= _SPACE else format(v, "04x")


def sample_flag(key: Column, fraction: float, seed: int = 0) -> Column:
    """The membership predicate behind deterministic_sample, as a
    reusable boolean Column (e.g. to carry a sampled flag instead of
    filtering)."""
    return _hex_bucket(key, seed) < F.lit(_threshold(fraction))


def deterministic_sample(
    df: DataFrame, key: Column, fraction: float, seed: int = 0
) -> DataFrame:
    """Keep ~fraction of rows, chosen by key hash: stable across runs,
    partitionings, and engines."""
    return df.filter(sample_flag(key, fraction, seed))


def hash_split(
    df: DataFrame, key: Column, weights: dict[str, float], seed: int = 0
) -> DataFrame:
    """Append a `split` column assigning each row to one named split
    with the given weights (e.g. {"train": .8, "val": .1, "test": .1}).
    Splits are disjoint, exhaustive, and a row's split never changes
    when other rows come or go."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    bucket = _hex_bucket(key, seed)
    expr = None
    acc = 0.0
    *head, (last_name, _) = list(weights.items())
    for name, w in head:
        acc += w
        cond = bucket < F.lit(_threshold(acc))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(last_name) if expr is None else expr.otherwise(last_name)
    return df.withColumn("split", expr)


def shuffle_deterministic(df: DataFrame, key: Column, seed: int = 0) -> DataFrame:
    """Global deterministic shuffle (training order randomization):
    sort by a hash of the key with the key itself as tiebreak. One
    range-partition exchange; the order is a pure function of (keys,
    seed) provided `key` is unique per row (rows sharing a key value
    have no defined relative order)."""
    return df.orderBy(
        F.md5(F.concat(key.cast("string"), F.lit(f"#{seed}"))), key
    )


def stratified_sample(
    df: DataFrame,
    stratum: Column,
    key: Column,
    quota: int,
    seed: int = 0,
) -> DataFrame:
    """EXACT per-stratum quota sampling: for every distinct stratum
    value, keep the `quota` rows whose md5(key || seed) sorts lowest —
    a deterministic uniform draw (balanced language / domain / source
    mixes for training sets) that is reproducible across runs, engines,
    and partitionings.

    Returns (stratum, key, rank_in_stratum), rank 1..quota; callers
    join back (the result is quota * n_strata rows — broadcastable).

    Scale shape: exact quotas need a per-stratum ranking, but a single
    `row_number over (partition by stratum)` would hash-partition the
    FULL table by stratum — with a handful of strata (languages) that
    is a guaranteed hot-key shuffle at 100 TB. Instead, top-k prune in
    two phases, the same trick as the two-pass surrogate key:

      1. rank within (stratum, input partition id) — the exchange key
         includes the partition id, so the shuffle spreads every
         stratum over all reducers; keep local top-quota. Any superset
         of the global top-quota survives pruning regardless of row
         placement, so nondeterministic partition ids cannot change
         the result.
      2. rank the pruned set (<= quota * shuffle_partitions rows per
         stratum) per stratum — a shuffle of a tiny table.
    """
    from pyspark.sql import Window

    ok = F.md5(F.concat(key.cast("string"), F.lit(f":{seed}")))
    with_ok = df.select(
        stratum.alias("stratum"), key.alias("key"), ok.alias("__ok")
    )
    w_local = Window.partitionBy("stratum", "__pid").orderBy("__ok", "key")
    pruned = (
        with_ok.withColumn("__pid", F.spark_partition_id())
        .withColumn("__rn", F.row_number().over(w_local))
        .filter(F.col("__rn") <= quota)
        .drop("__pid", "__rn")
    )
    w_global = Window.partitionBy("stratum").orderBy("__ok", "key")
    return (
        pruned.withColumn(
            "rank_in_stratum", F.row_number().over(w_global).cast("long")
        )
        .filter(F.col("rank_in_stratum") <= quota)
        .drop("__ok")
    )


def weighted_sample_flag(
    key: Column, weight: Column, seed: int = 0
) -> Column:
    """Deterministic importance sampling: keep a row with probability
    `weight` (a per-row Column in [0, 1] — e.g. a quality score), as a
    pure function of (key, seed). The uniform draw is the md5 bucket
    scaled to [0, 1); rows with weight >= 1 are always kept, <= 0 never.

    Same reproducibility contract as sample_flag — membership is
    independent of partitioning, cluster shape, and engine (the DuckDB
    twin divides the same 4-hex-digit bucket by 65536) — but the keep
    rate follows the weight column instead of one global fraction:
    quality-weighted corpus downsampling in one scan-stage expression.
    """
    u = (
        F.conv(_hex_bucket(key, seed), 16, 10).cast("double")
        / F.lit(float(_SPACE))
    )
    return u < weight


def cap_per_group(
    df: DataFrame, group: Column, key: Column, n: int
) -> DataFrame:
    """Deterministic per-group cap: for every distinct `group` value,
    keep the `n` rows whose `key` sorts LOWEST. The domain-rebalancing
    primitive of web-corpus curation (public background: Common-Crawl
    pipelines cap documents per registered domain so mega-sites don't
    dominate the training mix); also per-source quotas, per-user example
    caps, etc. `key` must be unique per row (a doc id) so the result is
    total-order deterministic.

    Returns (group, key, rank_in_group), rank 1..n; callers join back
    on the key.

    Scale shape: same two-phase top-k prune as stratified_sample — a
    single `row_number over (partition by group)` would hash-partition
    the full table by a SKEWED key (one mega-domain = one hot reducer
    at 100 TB). Phase 1 ranks within (group, input partition id) and
    keeps the local top-n (any superset of the global top-n survives,
    so row placement cannot change the result); phase 2 ranks the
    pruned set — at most n * shuffle_partitions rows per group.
    """
    from pyspark.sql import Window

    with_k = df.select(group.alias("grp"), key.alias("key"))
    w_local = Window.partitionBy("grp", "__pid").orderBy("key")
    pruned = (
        with_k.withColumn("__pid", F.spark_partition_id())
        .withColumn("__rn", F.row_number().over(w_local))
        .filter(F.col("__rn") <= n)
        .drop("__pid", "__rn")
    )
    w_global = Window.partitionBy("grp").orderBy("key")
    return pruned.withColumn(
        "rank_in_group", F.row_number().over(w_global).cast("long")
    ).filter(F.col("rank_in_group") <= n)


def weighted_sample_exact(
    df: DataFrame,
    key: Column,
    weight: Column,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """EXACT-k weighted sampling WITHOUT replacement (public
    background: Efraimidis & Spirakis 2006, the A-Res reservoir key) —
    each row draws score = u^(1/w) from a deterministic uniform u and
    the k LARGEST scores win; inclusion probabilities then follow the
    weights, every sample has exactly k rows (given >= k positive
    weights), and no row repeats. The exact-size counterpart of
    `weighted_sample_flag` (Bernoulli, random size).

    u is a 48-bit md5 draw (key:es:seed), shifted to the open interval
    (0,1) — fine enough that score ties are measure-zero; rows with
    weight <= 0 or NULL never select. Deterministic per seed and
    engine-portable (DuckDB parity-tested; pow is the one libm call —
    cross-engine ulp differences only matter for scores within 1e-16,
    never observed).

    Returns (key, es_score, rank_in_sample), rank 1..k — callers join
    back on their key. Scale shape: the same two-phase top-k prune as
    stratified_sample/cap_per_group — local top-k per input partition
    (any superset of the global top-k survives, so nondeterministic
    partition ids cannot change the result), then one k*partitions-row
    global ranking. No global sort, no hot key."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    space = float(16**12)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(key.cast("string"), F.lit(f":es:{seed}"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(space)
    score = F.when(
        weight.isNotNull() & (weight > 0), F.pow(u, F.lit(1.0) / weight)
    )
    base = df.select(key.alias("key"), score.alias("es_score")).filter(
        F.col("es_score").isNotNull()
    )
    w_local = Window.partitionBy("__pid").orderBy(
        F.desc("es_score"), F.asc("key")
    )
    pruned = (
        base.withColumn("__pid", F.spark_partition_id())
        .withColumn("__rn", F.row_number().over(w_local))
        .filter(F.col("__rn") <= k)
        .drop("__pid", "__rn")
    )
    w_global = Window.partitionBy(
        deliberate_single_partition()
    ).orderBy(F.desc("es_score"), F.asc("key"))
    return (
        pruned.withColumn(
            "rank_in_sample", F.row_number().over(w_global).cast("long")
        )
        .filter(F.col("rank_in_sample") <= k)
    )
