"""Portable probabilistic sketches.

`hll_distinct_estimate` is a self-implemented HyperLogLog (Flajolet et
al. 2007) whose every step is deterministic AND bit-identical in DuckDB
SQL — the same md5-portability approach this repo uses for MinHash
bands, SimHash bits, LSH hyperplanes, and IVF seeds. Spark's builtin
`approx_count_distinct` (HLL++) is the production fast path, but its
register layout has no cross-engine twin, so it can only ever get a
rows-only correctness check. This operator trades a few points of
constant-factor speed for a full value-level oracle:

- hash: first 60 bits of md5 of the value's string form (DuckDB:
  ``CAST('0x' || substring(md5(x), 1, 15) AS BIGINT)``).
- bucket: low ``b`` bits; rho: leading-zero count of the remaining
  ``w = 60-b`` bits + 1, via the binary-string length trick
  ``bitlen(x) = length(bin(x))`` (both engines render bin() without
  leading zeros; DuckDB additionally ltrims '0' so bin(0) agrees).
- rho is capped (default 40) so every register's 2^-rho term is a
  dyadic rational and the register sum stays within float64's 53-bit
  mantissa span — the harmonic-mean sum is EXACT, hence independent of
  both engines' aggregation order. 2^-rho is computed as
  ``1.0 / (1L << rho)`` — integer shift then one correctly-rounded
  division — never pow(), which libms don't guarantee exact.
- small-range correction (linear counting ``m * ln(m/V)``) uses ln(),
  which IS libm-dependent; estimates are rounded to 6 decimals on both
  sides, so a last-ulp divergence only matters with probability ~1e-10
  and only when the correction branch is active (n <~ 2.5m).

Scale shape (100 TB): one map-side-combinable groupBy on the b-bit
bucket (m <= 2^b rows shuffle, regardless of input size), then an
m-row final aggregate — the textbook O(m)-memory streaming sketch as a
two-level Spark aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.dedup import _md5_long

# Standard HLL bias constants (Flajolet et al. 2007, Fig. 3).
_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _alpha(m: int) -> float:
    return _ALPHA.get(m, 0.7213 / (1 + 1.079 / m))


def hll_distinct_estimate(
    df: DataFrame,
    col: str | Column,
    b: int = 6,
    rho_cap: int = 40,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """1-row DataFrame: portable-HLL distinct-count estimate of ``col``.

    ``b`` register-index bits (m = 2^b registers; standard error
    ~1.04/sqrt(m), so b=6 -> ~13%). ``rho_cap`` bounds the register
    value so the harmonic sum is exact float64 (see module docstring);
    it must not exceed w = 60-b, and capping costs at most 2^-cap
    relative error — unobservable."""
    m = 1 << b
    w = 60 - b
    if not 0 < rho_cap <= w:
        raise ValueError(f"rho_cap must be in (0, {w}]")
    c = F.col(col) if isinstance(col, str) else col
    h = _md5_long(c.cast("string"))
    hashed = df.select(
        h.bitwiseAND(F.lit(m - 1)).alias("bucket"),
        F.least(
            F.lit(w + 1) - F.length(F.bin(F.shiftright(h, b))),
            F.lit(rho_cap),
        ).alias("rho_raw"),
    )
    per_bucket = hashed.groupBy("bucket").agg(F.max("rho_raw").alias("rho"))
    grid = df.sparkSession.range(m).select(F.col("id").alias("bucket"))
    registers = grid.join(per_bucket, "bucket", "left").select(
        F.coalesce(F.col("rho"), F.lit(0)).alias("rho")
    )
    two_pow_neg_rho = F.lit(1.0) / F.expr(
        "shiftleft(cast(1 as bigint), cast(rho as int))"
    ).cast("double")
    agg = registers.agg(
        F.sum(two_pow_neg_rho).alias("sum_inv"),
        F.sum(F.when(F.col("rho") == 0, 1).otherwise(0)).alias("n_empty"),
    )
    raw = F.lit(_alpha(m) * m * m) / F.col("sum_inv")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("n_empty") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("n_empty")),
    ).otherwise(raw)
    return agg.select(F.round(est, 6).alias(out_col))


def hll_distinct_by(
    df: DataFrame,
    group_cols: list[str],
    col: str | Column,
    b: int = 6,
    rho_cap: int = 40,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Per-group portable-HLL distinct counts: (group_cols...,
    out_col) — the GROUP BY form of hll_distinct_estimate, e.g.
    distinct users per day or distinct documents per source at 100 TB
    where count(DISTINCT x) per group would shuffle the raw values.

    Same registers, same estimate, and EXACTLY the global function's
    value on each group slice (tested), via the empty-register
    identity: a present bucket always has rho >= 1 (the 60-bit hash's
    top bits give bitlen <= w, so rho_raw >= 1), so the grid join the
    global form uses is replaced by sum_inv = sum(2^-rho) +
    (m - n_present) * 1.0 and n_empty = m - n_present — one fewer
    join, and the whole operator is two map-side-combinable hash
    aggregates on (group, bucket) then (group). All register terms
    are dyadic rationals, so the float sums are exact in any
    aggregation order — the property that makes the estimate
    hash-stable cross-engine and cross-cluster-shape."""
    m = 1 << b
    w = 60 - b
    if not 0 < rho_cap <= w:
        raise ValueError(f"rho_cap must be in (0, {w}]")
    if not group_cols:
        raise ValueError("group_cols must be non-empty; use "
                         "hll_distinct_estimate for the global form")
    c = F.col(col) if isinstance(col, str) else col
    h = _md5_long(c.cast("string"))
    hashed = df.select(
        *group_cols,
        h.bitwiseAND(F.lit(m - 1)).alias("bucket"),
        F.least(
            F.lit(w + 1) - F.length(F.bin(F.shiftright(h, b))),
            F.lit(rho_cap),
        ).alias("rho_raw"),
    )
    per_bucket = hashed.groupBy(*group_cols, "bucket").agg(
        F.max("rho_raw").alias("rho")
    )
    two_pow_neg_rho = F.lit(1.0) / F.expr(
        "shiftleft(cast(1 as bigint), cast(rho as int))"
    ).cast("double")
    agg = per_bucket.groupBy(*group_cols).agg(
        (
            F.sum(two_pow_neg_rho)
            + (F.lit(m) - F.count(F.lit(1))).cast("double")
        ).alias("sum_inv"),
        (F.lit(m) - F.count(F.lit(1))).cast("long").alias("n_empty"),
    )
    raw = F.lit(_alpha(m) * m * m) / F.col("sum_inv")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("n_empty") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("n_empty")),
    ).otherwise(raw)
    return agg.select(*group_cols, F.round(est, 6).alias(out_col))


def hll_oracle_sql(
    source: str,
    value_expr: str,
    b: int = 6,
    rho_cap: int = 40,
    out_col: str = "approx_distinct",
) -> str:
    """DuckDB twin of hll_distinct_estimate: identical hash, registers,
    exact dyadic harmonic sum, and correction branch. ``source`` is a
    table/subquery, ``value_expr`` the hashed SQL expression."""
    m = 1 << b
    w = 60 - b
    alpha = _alpha(m)
    return f"""
SELECT round(CASE WHEN {alpha} * {m} * {m} / sum_inv <= {2.5 * m}
                   AND n_empty > 0
             THEN {float(m)} * ln({float(m)} / n_empty)
             ELSE {alpha} * {m} * {m} / sum_inv END, 6) AS {out_col}
FROM (
  SELECT sum(1.0 / (CAST(1 AS BIGINT) << rho)) AS sum_inv,
         sum(CASE WHEN rho = 0 THEN 1 ELSE 0 END) AS n_empty
  FROM (
    SELECT coalesce(rb.rho, 0) AS rho
    FROM (SELECT unnest(range({m})) AS bucket) g
    LEFT JOIN (
      SELECT h & {m - 1} AS bucket,
        max(least({w + 1} - length(ltrim(bin(h >> {b}), '0')), {rho_cap}))
          AS rho
      FROM (SELECT CAST('0x' || substring(md5({value_expr}), 1, 15)
                        AS BIGINT) AS h
            FROM {source})
      GROUP BY h & {m - 1}) rb USING (bucket)))"""


# --------------------------------------------------- count-min sketch

def count_min_sketch(
    df: DataFrame,
    col: str | Column,
    depth: int = 4,
    width: int = 1024,
    weight: str | Column | None = None,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of the value
    stream in ``col``, as a SPARSE DataFrame ``(row, bucket, cnt)`` —
    absent (row, bucket) cells are zero.

    Portable hashing like every hash-seeded operator here: row ``i``
    uses the first 60 bits of ``md5(i || '|' || value)``, bucket =
    ``hash % width`` — bit-identical in DuckDB, so estimates have a
    full cross-engine oracle (graded in `docs_approx_stats`).

    Scale shape (100 TB): one projection fans each value into ``depth``
    (row, bucket) cells map-side, then ONE hash aggregate whose key
    space is at most depth x width cells — the O(d*w)-memory streaming
    sketch as a two-level Spark aggregation; the sketch itself is tiny
    and broadcastable however large the stream.  ``weight`` switches
    from occurrence counting to weighted sums (BIGINT weights).

    Mergeability (the property that makes CMS the cross-shard /
    cross-day rollup tool): two sketches with the same (depth, width)
    merge by unioning and re-summing — covered in tests.
    """
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be positive")
    c = F.col(col) if isinstance(col, str) else col
    w = (
        F.lit(1).cast("long")
        if weight is None
        else (F.col(weight) if isinstance(weight, str) else weight).cast(
            "long"
        )
    )
    cells = df.select(
        F.posexplode(
            F.array(
                *[
                    _md5_long(
                        F.concat(
                            F.lit(str(i)), F.lit("|"), c.cast("string")
                        )
                    )
                    % F.lit(width)
                    for i in range(depth)
                ]
            )
        ).alias("row", "bucket"),
        w.alias("w"),
    )
    return cells.groupBy("row", "bucket").agg(
        F.sum("w").cast("long").alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    col: str | Column,
    depth: int = 4,
    width: int = 1024,
    out_col: str = "cms_est",
) -> DataFrame:
    """Point-query the sketch: for each row of ``queries``, the minimum
    over the ``depth`` hash rows of the addressed cell — the classic
    never-underestimating CMS count.  The sketch side is broadcast
    (<= depth*width rows); the query stream never shuffles."""
    c = F.col(col) if isinstance(col, str) else col
    probes = queries.withColumn(
        "__cms",
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    (
                        _md5_long(
                            F.concat(
                                F.lit(str(i)), F.lit("|"), c.cast("string")
                            )
                        )
                        % F.lit(width)
                    ).alias("bucket"),
                )
                for i in range(depth)
            ]
        ),
    )
    exploded = probes.select(
        *queries.columns, F.explode("__cms").alias("p")
    ).select(*queries.columns, "p.row", "p.bucket")
    joined = exploded.join(
        F.broadcast(sketch), ["row", "bucket"], "left"
    ).withColumn("cnt", F.coalesce("cnt", F.lit(0).cast("long")))
    return joined.groupBy(*queries.columns).agg(
        F.min("cnt").cast("long").alias(out_col)
    )


def hll_registers(
    df: DataFrame,
    col: str | Column,
    b: int = 6,
    rho_cap: int = 40,
) -> DataFrame:
    """The portable HLL's MERGEABLE state as a DataFrame: (bucket,
    rho), absent buckets zero — the register form that makes
    distinct-counting incremental. Fold a stream of batches with
    hll_merge (register max is the union operation, associative and
    commutative), persist the tiny frame between batches (<= 2^b
    rows), and finalize any time with hll_estimate_from_registers —
    the count-distinct twin of the IVM mergeable-partial idea, and
    the reason every serious engine stores HLL sketches, not counts.

    The estimate from merged registers is IDENTICAL to running
    hll_distinct_estimate over the concatenated input (registers are
    a pure max over per-value draws — tested)."""
    m = 1 << b
    w = 60 - b
    if not 0 < rho_cap <= w:
        raise ValueError(f"rho_cap must be in (0, {w}]")
    c = F.col(col) if isinstance(col, str) else col
    h = _md5_long(c.cast("string"))
    return (
        df.select(
            h.bitwiseAND(F.lit(m - 1)).alias("bucket"),
            F.least(
                F.lit(w + 1) - F.length(F.bin(F.shiftright(h, b))),
                F.lit(rho_cap),
            ).alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two register sets built with the same (b, rho_cap):
    per-bucket max. Fold any number of batches in any order."""
    return (
        a.unionByName(b).groupBy("bucket").agg(F.max("rho").alias("rho"))
    )


def hll_estimate_from_registers(
    registers: DataFrame,
    b: int = 6,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Finalize (bucket, rho) registers into the 1-row estimate —
    the same harmonic sum + small-range correction as
    hll_distinct_estimate, via the empty-register identity (present
    buckets always have rho >= 1, see hll_distinct_by)."""
    m = 1 << b
    two_pow_neg_rho = F.lit(1.0) / F.expr(
        "shiftleft(cast(1 as bigint), cast(rho as int))"
    ).cast("double")
    agg = registers.filter(F.col("rho") > 0).agg(
        (
            F.sum(two_pow_neg_rho)
            + (F.lit(m) - F.count(F.lit(1))).cast("double")
        ).alias("sum_inv"),
        (F.lit(m) - F.count(F.lit(1))).cast("long").alias("n_empty"),
    )
    raw = F.lit(_alpha(m) * m * m) / F.col("sum_inv")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("n_empty") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("n_empty")),
    ).otherwise(raw)
    return agg.select(F.round(est, 6).alias(out_col))
