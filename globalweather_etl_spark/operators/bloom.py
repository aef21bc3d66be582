"""Distributed Bloom filters as DataFrames, and a Bloom-screened
incremental exact dedup for continuous ingestion.

Why: ``exact_dedup_incremental`` (operators/dedup.py) probes every
batch against the fingerprint HISTORY with a left anti equi-join. The
join itself is scale-safe (shuffle on a high-cardinality key, history
never broadcast), but at crawl scale the history is billions of rows
and the probe re-shuffles a slice of it every batch even though the
overwhelming majority of incoming fingerprints are NEW (a miss). The
classic fix (public background: Bloom 1970; the same screen Spark's
own runtime-filter join optimization and every LSM storage engine use)
is a Bloom filter maintained ALONGSIDE the history: rows the filter
rejects are *definitely* new and skip the history join entirely; only
the small "maybe" slice — true re-crawls plus the controlled
false-positive margin — pays for the anti-join.

Representation: a Bloom filter IS a DataFrame ``(word_idx BIGINT,
bits BIGINT)`` — 63 filter bits packed per row (the sign bit stays
clear so the words are portable non-negative BIGINTs in any engine),
absent rows all-zero.
That makes the filter a first-class dataset: written/read as parquet
between batches, merged with a ``bit_or`` aggregate, and probed with a
plain equi-join on ``word_idx`` — no driver-side bitset, no UDF, no
broadcast requirement (Spark broadcasts it when it is small; a
100-billion-bit filter at ~1.5 G rows/word-packed ~12 GB stays a
shuffle-hash join and STILL only shuffles k rows per probed document,
never the history).

Hashing is the repo's engine-portable 60-bit md5 scheme
(``CAST('0x' || substring(md5('bloom<i>|' || x), 1, 15) AS BIGINT) %
num_bits`` — reproducible in DuckDB and any engine with md5), so a
filter built by one engine can be probed by another.

Guarantees (tested in tests/test_bloom.py):
- no false negatives: every inserted value probes True;
- false-positive rate on non-members tracks the (1-e^{-kn/m})^k bound;
- ``exact_dedup_incremental_bloom`` returns BIT-IDENTICAL results to
  the unscreened ``exact_dedup_incremental`` on every batch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from globalweather_etl_spark.functions.text import fingerprint_md5
from globalweather_etl_spark.operators.dedup import exact_dedup

__all__ = [
    "bloom_build",
    "bloom_merge",
    "bloom_probe",
    "empty_bloom",
    "exact_dedup_incremental_bloom",
]

DEFAULT_NUM_BITS = 1 << 22
DEFAULT_NUM_HASHES = 5


def _positions(col: Column, num_bits: int, num_hashes: int) -> Column:
    """Array of ``num_hashes`` bit positions in [0, num_bits) for one
    value — independent 60-bit md5 draws under per-hash salts."""
    return F.array(
        *[
            F.pmod(
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"bloom{i}|"), col)), 1, 15),
                    16,
                    10,
                ).cast("long"),
                F.lit(num_bits).cast("long"),
            )
            for i in range(num_hashes)
        ]
    )


def _word_mask(pos_col: str):
    """(word_idx, mask) for a bit position: 63 bits packed per word —
    the sign bit stays clear so every mask/word is a non-negative
    BIGINT in ANY engine (DuckDB raises on a shift into bit 63; one
    unused bit per word buys exact cross-engine arithmetic)."""
    return (
        F.expr(f"{pos_col} DIV 63").alias("word_idx"),
        F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({pos_col} % 63 AS INT))").alias(
            "mask"
        ),
    )


def empty_bloom(spark: SparkSession) -> DataFrame:
    """A filter with no bits set (zero rows — absent words are zero)."""
    return spark.createDataFrame([], "word_idx BIGINT, bits BIGINT")


def bloom_build(
    df: DataFrame,
    col: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Build a Bloom filter over ``df[col]`` (nulls ignored).

    Plan shape: explode to k positions per row, ONE hash aggregate
    ``groupBy(word_idx).bit_or(mask)`` — map-side combined, at most
    ``num_bits/64`` output rows regardless of input size.
    """
    pos = df.filter(F.col(col).isNotNull()).select(
        F.explode(_positions(F.col(col), num_bits, num_hashes)).alias("pos")
    )
    return (
        pos.select(*_word_mask("pos"))
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union of two filters built with the same (num_bits, num_hashes):
    bitwise OR per word. Associative and commutative — fold batches in
    any order."""
    return (
        a.unionByName(b).groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    col: str,
    bloom: DataFrame,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
    flag_col: str = "bloom_maybe",
) -> DataFrame:
    """``df`` plus a boolean ``flag_col``: False = definitely NOT in
    the set the filter was built over; True = maybe (member or false
    positive). Null values probe False.

    Plan shape: distinct probe values explode to k (word_idx, mask)
    rows, LEFT-join the filter on ``word_idx`` (absent word = zero
    word = miss), one ``bool_and`` aggregate back to a per-value flag,
    then an equi-join of the flag onto ``df``. The filter side of the
    join is the only state touched — the history itself never moves.
    """
    vals = df.select(col).where(F.col(col).isNotNull()).distinct()
    exploded = vals.select(
        F.col(col),
        F.explode(_positions(F.col(col), num_bits, num_hashes)).alias("pos"),
    ).select(F.col(col), *_word_mask("pos"))
    flags = (
        exploded.join(bloom, "word_idx", "left")
        .groupBy(col)
        .agg(
            F.bool_and(
                F.coalesce(
                    F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask"),
                    F.lit(False),
                )
            ).alias(flag_col)
        )
    )
    return df.join(flags, col, "left").withColumn(
        flag_col, F.coalesce(F.col(flag_col), F.lit(False))
    )


def exact_dedup_incremental_bloom(
    new_docs: DataFrame,
    seen_fingerprints: DataFrame | None,
    seen_bloom: DataFrame | None,
    id_col: str,
    text_col: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Bloom-screened variant of ``exact_dedup_incremental``
    (operators/dedup.py:767) with identical output semantics.

    Returns ``(kept, new_history, new_bloom)``: the batch's
    genuinely-new documents, the fingerprint history with theirs
    appended, and the filter with theirs inserted — persist the last
    two and feed them to the next batch.

    Scale shape: the in-batch dedup is the standard fingerprint
    hash-groupBy. The HISTORY anti-join now sees only the Bloom
    "maybe" slice — on a fresh-content crawl that is the re-crawl
    fraction plus the filter's false-positive rate, typically orders
    of magnitude under the batch size — while the definite-new rows
    (filter miss: provably absent from history) bypass it. The filter
    update is one bounded-output aggregate + merge, NOT a rebuild
    from history.
    """
    batch_kept = exact_dedup(new_docs, id_col, text_col)
    fps = batch_kept.select(
        fingerprint_md5(F.col(text_col)).alias("fingerprint"), F.col(id_col)
    )
    if seen_fingerprints is None:
        fresh = fps
        base_bloom = empty_bloom(new_docs.sparkSession)
        base_history = None
    else:
        base_bloom = (
            seen_bloom
            if seen_bloom is not None
            else bloom_build(seen_fingerprints, "fingerprint", num_bits, num_hashes)
        )
        probed = bloom_probe(
            fps, "fingerprint", base_bloom, num_bits, num_hashes, "bloom_maybe"
        )
        certain_new = probed.filter(~F.col("bloom_maybe")).drop("bloom_maybe")
        maybe = probed.filter(F.col("bloom_maybe")).drop("bloom_maybe")
        confirmed_new = maybe.join(
            seen_fingerprints.select("fingerprint"), "fingerprint", "left_anti"
        )
        fresh = certain_new.unionByName(confirmed_new)
        base_history = seen_fingerprints.select("fingerprint")

    kept = batch_kept.join(fresh.select(id_col), id_col, "left_semi")
    fresh_fps = fresh.select("fingerprint")
    new_history = (
        fresh_fps if base_history is None else base_history.unionByName(fresh_fps)
    )
    new_bloom = bloom_merge(
        base_bloom, bloom_build(fresh_fps, "fingerprint", num_bits, num_hashes)
    )
    return kept, new_history, new_bloom
