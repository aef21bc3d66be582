"""Deduplication operators for large-scale training-data pipelines.

Four families, in increasing fuzziness:
  exact          hash-groupBy on a content fingerprint (md5)
  ngram_jaccard  exact Jaccard over word n-gram shingles (inverted-index
                 self-join — no all-pairs blowup)
  minhash_lsh    MinHash signatures + banded LSH bucketing (near-dup at
                 scale: candidate pairs only within matching bands)
  simhash        64-bit SimHash fingerprints + hamming-ball candidate
                 pairing via band rotation

Scale design notes (100 TB):
- Never all-pairs: every near-dup path first builds candidate pairs by
  joining on a bucket key (shingle, LSH band hash, simhash band), then
  verifies only candidates. Candidate-join keys are high-cardinality,
  so the shuffle is well spread; hot shingles can be frequency-capped.
- Everything is built-in expressions (xxhash64, aggregate, transform);
  the only shuffles are the groupBys/joins on bucket keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from globalweather_etl_spark.functions.text import fingerprint_md5, word_shingles

# Large prime < 2^31 for MinHash universal hashing; coefficients are
# fixed (seeded) so signatures are reproducible across runs.
_MH_PRIME = 2147483647


def exact_dedup_keepers(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """One row per distinct normalized content: fingerprint, the kept
    (minimum) id, and the duplicate count. Hash-groupBy — one shuffle on
    the fingerprint, partial aggregation map-side."""
    return (
        df.select(
            fingerprint_md5(F.col(text_col)).alias("fingerprint"),
            F.col(id_col),
        )
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The deduplicated dataset: keep the min-id row per fingerprint.
    Implemented as a broadcast-free semi-join against the keeper set on
    (fingerprint, id)."""
    keepers = exact_dedup_keepers(df, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keepers, id_col, "left_semi")


def exact_dedup_removed(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Rows dropped by exact dedup — left ANTI join against keepers."""
    keepers = exact_dedup_keepers(df, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keepers, id_col, "left_anti")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for every pair sharing >=1
    shingle: |A∩B| / (|A|+|B|-|A∩B|) >= threshold.

    Inverted-index pattern: explode distinct (id, shingle), self-join on
    shingle (ids ordered to emit each pair once), count intersections,
    then join per-doc shingle counts. Cost is sum over shingles of
    (docs-per-shingle choose 2) — bounded in real corpora; a hot-shingle
    cap (drop shingles appearing in > X% of docs) is the standard
    mitigation at 100 TB and composes here as one extra filter."""
    shingled = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), n))).alias(
            "shingle"
        ),
    )
    sizes = shingled.groupBy("doc").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = shingled.alias("a")
    b = shingled.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc"))
        .join(sb, F.col("doc_b") == F.col("sb.doc"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_common").cast("double")
                / (
                    F.col("sa.n_shingles") + F.col("sb.n_shingles") - F.col("n_common")
                ).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _minhash_signature(shingles, num_hashes: int):
    """MinHash signature as array<long>: h_i(x) = (a_i*x + b_i) mod P over
    xxhash64 shingle ids, min-reduced per hash function. Coefficients
    derive from the hash index (fixed seed), so the signature is a pure
    expression — computed in the scan stage, no shuffle."""
    sigs = []
    for i in range(num_hashes):
        a = 2 * i + 1  # odd multipliers
        b = 7919 * (i + 1)
        h = F.transform(
            shingles,
            lambda s: (
                (F.pmod(F.xxhash64(s), F.lit(_MH_PRIME)) * F.lit(a) + F.lit(b))
                % F.lit(_MH_PRIME)
            ),
        )
        sigs.append(F.array_min(h))
    return F.array(*sigs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    verify: bool = True,
) -> DataFrame:
    """MinHash + banded LSH near-dup candidate pairs.

    num_hashes/bands rows per band r=num_hashes/bands gives the classic
    S-curve: P(candidate) = 1-(1-j^r)^bands. Candidates are pairs whose
    signature agrees on ALL rows of >=1 band — found by exploding one
    (band_idx, band_hash) key per band and self-joining on it (shuffle
    is on band hashes: high cardinality, well spread).

    verify=True re-checks candidates with exact shingle Jaccard, making
    the output precision-exact (LSH only affects recall)."""
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    rows_per_band = num_hashes // bands
    shingles = F.array_distinct(word_shingles(F.col(text_col), n))
    signed = df.select(
        F.col(id_col).alias("doc"),
        _minhash_signature(shingles, num_hashes).alias("sig"),
    )
    banded = signed.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            F.slice(F.col("sig"), bi * rows_per_band + 1, rows_per_band)
                        ).alias("bhash"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc", "bk.band", "bk.bhash")
    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    if not verify:
        return candidates
    exact = ngram_jaccard_pairs(df, id_col, text_col, n=n, threshold=threshold)
    return candidates.join(
        exact,
        ["doc_a", "doc_b"],
        "inner",
    )


def simhash64(text, n: int = 3):
    """64-bit SimHash of word n-gram shingles: per-bit majority vote of
    shingle hashes, folded into one BIGINT with bitwise expressions —
    entirely in the scan stage."""
    shingles = F.array_distinct(word_shingles(text, n))
    hashes = F.transform(shingles, lambda s: F.xxhash64(s))
    bits = []
    for bit in range(64):
        # shiftleft instead of a python literal: 1 << 63 overflows the
        # signed long literal range.
        mask = F.shiftleft(F.lit(1).cast("long"), bit)
        votes = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(mask) != 0, 1).otherwise(-1),
        )
        bits.append(F.when(votes > 0, mask).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    max_hamming: int = 3,
    num_bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming.

    Pigeonhole bucketing: split the 64-bit fingerprint into num_bands
    16-bit bands; any pair within hamming distance < num_bands agrees
    exactly on >=1 band, so candidates come from equi-joins on
    (band_idx, band_value) — never all-pairs. Verification computes the
    true hamming distance via bit_count(xor)."""
    signed = df.select(
        F.col(id_col).alias("doc"), simhash64(F.col(text_col), n).alias("sh")
    )
    width = 64 // num_bands
    mask = (1 << width) - 1
    banded = signed.select(
        "doc",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("sh"), i * width)
                        .bitwiseAND(F.lit(mask).cast("long"))
                        .alias("bval"),
                    )
                    for i in range(num_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc", "sh", "bk.band", "bk.bval")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.bit_count(
                F.col("a.sh").bitwiseXOR(F.col("b.sh"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
