"""Deduplication operators for large-scale training-data pipelines.

Five families, in increasing fuzziness:
  exact          hash-groupBy on a content fingerprint (md5)
  decontaminate  n-gram membership against a benchmark/eval set
                 (broadcast shingle-set semi-probe — train/test leak
                 removal, not self-dedup)
  ngram_jaccard  exact Jaccard over word n-gram shingles (inverted-index
                 self-join — no all-pairs blowup)
  minhash_lsh    MinHash signatures + banded LSH bucketing (near-dup at
                 scale: candidate pairs only within matching bands)
  simhash        64-bit SimHash fingerprints + hamming-ball candidate
                 pairing via band rotation

(The sixth, embedding-cosine near-dup, lives on the similarity side:
queries.q_docs_embedding_neardup over operators.similarity.)

Algorithm lineage (public literature): MinHash resemblance — Broder,
"On the resemblance and containment of documents" (SEQUENCES 1997);
banded LSH S-curve — Leskovec/Rajaraman/Ullman, "Mining of Massive
Datasets" ch.3; SimHash — Charikar, "Similarity estimation techniques
from rounding algorithms" (STOC 2002) and Manku et al., "Detecting
near-duplicates for web crawling" (WWW 2007) for the hamming pigeonhole
trick.

Scale design notes (100 TB):
- Never all-pairs: every near-dup path first builds candidate pairs by
  joining on a bucket key (shingle, LSH band hash, simhash band), then
  verifies only candidates. Candidate-join keys are high-cardinality,
  so the shuffle is well spread; hot shingles can be frequency-capped.
- Everything is built-in expressions (xxhash64, aggregate, transform);
  the only shuffles are the groupBys/joins on bucket keys.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, functions as F

from globalweather_etl_spark.functions.text import fingerprint_md5, word_shingles
from globalweather_etl_spark.operators.partitioning import spread_for_compute

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


def _md5_long(col) -> Column:
    """First 60 bits of md5 as a positive BIGINT — an engine-portable
    hash: DuckDB mirrors it exactly as
    CAST('0x' || substring(md5(x), 1, 15) AS BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _shingle_hash(s, hash_fn: str) -> Column:
    """Shingle string -> 8-byte join key. "xxhash64" is the fast
    JVM-native default; "md5" is the engine-portable variant (same
    value computable in DuckDB), enabling cross-engine oracles for the
    hash-seeded near-dup operators."""
    if hash_fn == "xxhash64":
        return F.xxhash64(s)
    if hash_fn == "md5":
        return _md5_long(s)
    raise ValueError(f"unknown hash_fn: {hash_fn!r}")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
    cache_index: bool = True,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for every pair sharing >=1
    shingle: |A∩B| / (|A|+|B|-|A∩B|) >= threshold.

    Inverted-index pattern: explode distinct (id, shingle), self-join on
    shingle (ids ordered to emit each pair once), count intersections,
    then join per-doc shingle counts. Cost is sum over shingles of
    (docs-per-shingle choose 2) — one stop-phrase shingle shared by k
    docs costs k² candidate pairs, which at 100 TB is a catastrophic
    shuffle. ``max_doc_freq`` is the standard mitigation: shingles whose
    document frequency exceeds the cap are dropped BEFORE the self-join
    (similarity is then defined over the capped shingle space — sizes
    and intersections both exclude hot shingles, so the measure stays
    self-consistent). Output is identical to the uncapped form whenever
    no shingle's document frequency exceeds the cap (tested).

    Shingles are xxhash64-coded before the join: shuffle and join keys
    are 8-byte longs, not multi-word strings (64-bit collisions are
    negligible at any realistic corpus size).

    cache_index persists the hashed inverted index (memory, spilling to
    disk) — it feeds three plan branches (sizes, both self-join sides),
    so without the cache the shingle scan re-executes per branch. At
    corpus scale persisting the index is the standard trade: it is the
    operator's working set either way, and disk spill beats re-reading
    and re-shingling the raw text."""
    shingled = _hashed_shingles(df, id_col, text_col, n)
    if max_doc_freq is not None:
        shingled = _cap_hot_shingles(shingled, max_doc_freq)
    if cache_index:
        shingled = shingled.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = shingled.groupBy("doc").agg(F.count(F.lit(1)).alias("n_shingles"))
    inter = _intersections(shingled)
    return _jaccard_join_sizes(inter, sizes).filter(F.col("jaccard") >= threshold)


def _hashed_shingles(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    spread: bool = True,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Inverted-index rows (doc, sh): one row per distinct word n-gram
    per doc, shingle coded as an 8-byte long (see _shingle_hash).
    spread=False skips the partition check when the caller already
    spread the input (the check itself costs a driver-side plan
    analysis)."""
    if spread:
        df = spread_for_compute(df)
    return df.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.transform(
                F.array_distinct(word_shingles(F.col(text_col), n)),
                lambda s: _shingle_hash(s, hash_fn),
            )
        ).alias("sh"),
    )


def _hot_shingles(shingled: DataFrame, max_doc_freq: int) -> DataFrame:
    """The shingles whose document frequency exceeds ``max_doc_freq``
    (rows in ``shingled`` are distinct per (doc, sh), so a plain count
    per sh IS the document frequency). Tiny by construction — a cap is
    chosen so that only stop-phrases exceed it — so it broadcasts."""
    return (
        shingled.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") > max_doc_freq)
        .select("sh")
    )


def _cap_hot_shingles(shingled: DataFrame, max_doc_freq: int) -> DataFrame:
    """Drop shingles whose document frequency exceeds ``max_doc_freq``.

    The hot set broadcasts and the filter is a broadcast ANTI join —
    no extra shuffle of the index beyond the doc-freq aggregation,
    which shuffles on the same key (sh) the candidate self-join uses."""
    hot = _hot_shingles(shingled, max_doc_freq)
    return shingled.join(F.broadcast(hot), "sh", "left_anti")


def _intersections(shingled: DataFrame) -> DataFrame:
    """|A∩B| per doc pair sharing >=1 shingle, each pair emitted once."""
    a = shingled.alias("a")
    b = shingled.alias("b")
    return (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc") < F.col("b.doc")),
        )
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )


def _jaccard_join_sizes(inter: DataFrame, sizes: DataFrame) -> DataFrame:
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
    )


def _minhash_signed(shingled: DataFrame, num_hashes: int) -> DataFrame:
    """(doc, n_shingles, sig) from the hashed inverted index: MinHash
    h_i(x) = (a_i*x + b_i) mod P, min-reduced per hash function, plus
    the per-doc shingle count — ONE codegen'd hash aggregate.

    The affine family (a_i = 2i+1 odd, b_i = 7919(i+1)) is applied to
    pmod(sh, P), so every operand is non-negative and `%` computes the
    same values in Spark and DuckDB — the md5 hash mode exploits this
    for a cross-engine oracle.

    Why an aggregate and not a per-row array fold: Spark's higher-order
    functions (aggregate/zip_with/transform) are interpreted, not
    codegen'd — profiled 3.5x slower than this hash aggregate at equal
    output (tools/profile_bench.py). The aggregate shuffles one
    32-long row per doc after map-side partial mins, so the exchange is
    doc-count-sized regardless of corpus size — the right trade at
    100 TB, where CPU in the scan stage dominates. Docs with zero
    shingles (< n tokens) have no index rows and drop out naturally —
    they would otherwise share the sentinel signature and pair
    quadratically through one hot bucket."""
    h = F.pmod(F.col("sh"), F.lit(_MH_PRIME))
    mins = [
        F.min((h * F.lit(2 * i + 1) + F.lit(7919 * (i + 1))) % F.lit(_MH_PRIME)).alias(
            f"__m{i}"
        )
        for i in range(num_hashes)
    ]
    return (
        shingled.groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n_shingles"), *mins)
        .select(
            "doc",
            "n_shingles",
            F.array(*[F.col(f"__m{i}") for i in range(num_hashes)]).alias("sig"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_hits: int = 1,
    bench_text_col: str | None = None,
    hash_fn: str = "xxhash64",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination: flag every corpus document that shares
    at least ``min_hits`` distinct word ``n``-grams with ANY document in
    ``benchmark`` (an eval/test set that must not leak into training
    data). Returns the corpus unchanged plus two columns:
    ``n_contaminated_shingles`` (distinct shared n-grams) and
    ``is_contaminated``. Filter on the flag to produce the clean split;
    the standard practice (GPT-3 appendix C / PaLM-style n-gram overlap)
    uses long shingles, n in [8, 13], and min_hits=1.

    Scale shape (100 TB corpus, benchmark of thousands of docs): the
    benchmark's distinct shingle-hash set is kilobytes-to-megabytes and
    broadcast, so contamination hits are a map-side broadcast hash join
    in the corpus scan stage — the corpus itself never shuffles for the
    membership test; only the (doc, hit-count) aggregate and the final
    id-keyed join shuffle, both keyed by the high-cardinality doc id.
    Set broadcast_benchmark=False to let the planner choose (e.g. a
    benchmark too large to broadcast joins shuffle-side on the 8-byte
    shingle hash).

    Documents shorter than ``n`` words produce no shingles and are
    never flagged — the membership test is vacuous, not an error."""
    bench_sh = (
        _hashed_shingles(
            benchmark, id_col, bench_text_col or text_col, n, hash_fn=hash_fn
        )
        .select("sh")
        .distinct()
    )
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)
    hits = (
        _hashed_shingles(corpus, id_col, text_col, n, hash_fn=hash_fn)
        .join(bench_sh, "sh")
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n_contaminated_shingles"))
    )
    return (
        corpus.join(hits, corpus[id_col] == hits["doc"], "left")
        .drop("doc")
        .withColumn(
            "n_contaminated_shingles",
            F.coalesce(F.col("n_contaminated_shingles"), F.lit(0)),
        )
        .withColumn(
            "is_contaminated",
            F.col("n_contaminated_shingles") >= F.lit(min_hits),
        )
    )


def _banded_keys(
    signed: DataFrame, bands: int, rows_per_band: int, hash_fn: str
) -> DataFrame:
    """(doc, band, bhash) LSH bucket keys from MinHash signatures: one
    8-byte key per band. md5 mode hashes the comma-joined decimal
    rendering of the slice (string_agg-mirrorable in SQL); xxhash64
    hashes the slice array natively."""

    def _band_hash(sl):
        if hash_fn == "md5":
            return _md5_long(
                F.concat_ws(",", F.transform(sl, lambda x: x.cast("string")))
            )
        return F.xxhash64(sl)

    return signed.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        _band_hash(
                            F.slice(F.col("sig"), bi * rows_per_band + 1, rows_per_band)
                        ).alias("bhash"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc", "bk.band", "bk.bhash")


def fuzzy_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    bench_text_col: str | None = None,
    hash_fn: str = "xxhash64",
    max_doc_freq: int | None = None,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """FUZZY benchmark decontamination: flag corpus documents that
    NEAR-match an eval document, not just ones sharing verbatim
    n-grams (``decontaminate``). Paraphrased or lightly-edited
    benchmark leakage survives exact-overlap screens; the standard
    counter (the MinHash-based decontamination used alongside exact
    overlap in open-data pipelines, e.g. Dolma/RedPajama-style
    near-dedup against eval sets) is an LSH candidate pass between the
    corpus and the benchmark followed by an exact verify.

    The verify score is BENCHMARK-SIDE CONTAINMENT
    |shingles(doc) ∩ shingles(bench)| / |shingles(bench)| — a
    benchmark document pasted inside a long training document scores
    ~1.0 where symmetric Jaccard would dilute toward 0 (the same
    blind-spot argument as ngram_containment_pairs, applied to
    decontamination).

    Returns the corpus plus ``fuzzy_containment`` (best score over all
    benchmark docs, 0.0 if no candidate), ``matched_bench`` (the
    smallest NUMERIC benchmark id achieving it, NULL if none), and
    ``is_fuzzy_contaminated`` (score >= threshold). Corpus docs with
    fewer than ``n`` words have no shingles and are never flagged.

    Recall caveat, by design: candidate generation follows the MinHash
    S-curve on SYMMETRIC Jaccard, so a short benchmark doc buried
    verbatim inside a much longer training doc (high containment, low
    Jaccard) may never share a band. That verbatim-nesting case is
    exactly what the exact-overlap ``decontaminate`` catches with a
    handful of shared shingles — run both screens; this one exists for
    near-matches at comparable scale (paraphrases, light edits), where
    Jaccard and containment agree.

    Scale shape (100 TB corpus, thousands-of-docs benchmark): both
    sides build signatures from their own inverted index — the corpus
    side's aggregate shuffles one 32-long row per doc, nothing
    pairwise. The benchmark's banded keys (bands x |bench| rows,
    kilobytes) BROADCAST, so candidate generation is a map-side hash
    join in the corpus scan; only candidate (doc, bench) pairs reach
    the verify join, whose work scales with |candidates| x
    shingles-per-doc. The corpus never self-joins and never shuffles
    for the membership test; ``max_doc_freq`` caps hot corpus shingles
    exactly as in ``minhash_lsh_pairs``. hash_fn="md5" makes every
    stage DuckDB-mirrorable (graded in the docs_decontaminate slot).
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    rows_per_band = num_hashes // bands
    corp_sh = _hashed_shingles(
        spread_for_compute(corpus), id_col, text_col, n, spread=False, hash_fn=hash_fn
    )
    bench_sh = _hashed_shingles(
        benchmark, id_col, bench_text_col or text_col, n, hash_fn=hash_fn
    )
    if max_doc_freq is not None:
        # ONE hot set, computed from the corpus (the side that defines
        # "hot") and removed from BOTH sides. Capping only the corpus
        # desynchronizes the two MinHash signature spaces — an
        # identical (corpus doc, bench doc) pair would hash different
        # shingle sets, band collisions become probabilistic, and
        # contaminated documents slip through (measured: 8-11% of
        # planted identical matches missed at the 1M-doc rehearsal,
        # tools/rehearse_dedup_scale.py, before this fix).
        hot = _hot_shingles(corp_sh, max_doc_freq).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        corp_sh = corp_sh.join(F.broadcast(hot), "sh", "left_anti")
        bench_sh = bench_sh.join(F.broadcast(hot), "sh", "left_anti")
    # the corpus shingle index feeds BOTH the signature aggregate and
    # the candidate-verify join below — persist it so the word-split +
    # n-gram + hash scan runs once per action, not twice (the same
    # cache_index trade minhash_lsh_pairs documents; memory spilling
    # to disk, working-set-sized at any scale) — round 14, guide §5
    corp_sh = corp_sh.persist(StorageLevel.MEMORY_AND_DISK)
    bench_sh = bench_sh.persist(StorageLevel.MEMORY_AND_DISK)
    banded_c = _banded_keys(
        _minhash_signed(corp_sh, num_hashes), bands, rows_per_band, hash_fn
    )
    signed_b = _minhash_signed(bench_sh, num_hashes)
    banded_b = _banded_keys(signed_b, bands, rows_per_band, hash_fn)
    if broadcast_benchmark:
        banded_b = F.broadcast(banded_b)
    candidates = (
        banded_c.alias("c")
        .join(
            banded_b.alias("b"),
            (F.col("c.band") == F.col("b.band"))
            & (F.col("c.bhash") == F.col("b.bhash")),
        )
        .select(F.col("c.doc").alias("cdoc"), F.col("b.doc").alias("bdoc"))
        .distinct()
    )
    inter = (
        candidates.join(corp_sh.alias("sc"), F.col("cdoc") == F.col("sc.doc"))
        .join(
            bench_sh.alias("sb"),
            (F.col("bdoc") == F.col("sb.doc")) & (F.col("sc.sh") == F.col("sb.sh")),
        )
        .groupBy("cdoc", "bdoc")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    scored = inter.join(
        signed_b.select(F.col("doc").alias("bdoc"), "n_shingles"), "bdoc"
    ).select(
        "cdoc",
        "bdoc",
        (F.col("n_common").cast("double") / F.col("n_shingles").cast("double")).alias(
            "containment"
        ),
    )
    # best benchmark match per corpus doc; ties -> smallest bench id
    best = scored.groupBy("cdoc").agg(
        F.max(
            F.struct(F.col("containment"), (-F.col("bdoc")).alias("nb"))
        ).alias("top")
    )
    flags = best.select(
        F.col("cdoc").alias(id_col),
        F.col("top.containment").alias("fuzzy_containment"),
        (-F.col("top.nb")).alias("matched_bench"),
    )
    return (
        corpus.join(flags, id_col, "left")
        .withColumn(
            "fuzzy_containment", F.coalesce(F.col("fuzzy_containment"), F.lit(0.0))
        )
        .withColumn(
            "is_fuzzy_contaminated",
            F.col("fuzzy_containment") >= F.lit(float(threshold)),
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    verify: bool = True,
    hash_fn: str = "xxhash64",
    max_doc_freq: int | None = None,
    cache_index: bool = True,
) -> DataFrame:
    """MinHash + banded LSH near-dup candidate pairs.

    num_hashes/bands rows per band r=num_hashes/bands gives the classic
    S-curve: P(candidate) = 1-(1-j^r)^bands. Candidates are pairs whose
    signature agrees on ALL rows of >=1 band — found by exploding one
    (band_idx, band_hash) key per band and self-joining on it (shuffle
    is on band hashes: high cardinality, well spread).

    verify=True re-checks candidates with exact shingle Jaccard, making
    the output precision-exact (LSH only affects recall).

    hash_fn="md5" swaps xxhash64 for the md5-prefix hash everywhere
    (shingle ids AND band keys), making the whole operator — signatures,
    bucketing, verification — exactly mirrorable in DuckDB SQL, i.e. a
    real cross-engine oracle instead of a rows-only check. xxhash64
    stays the default for raw scan-stage speed.

    max_doc_freq caps hot shingles (see ngram_jaccard_pairs): shingles
    above the cap are dropped before signatures AND verification, so
    stop-phrases can neither glue unrelated docs into shared buckets nor
    blow up the verify join.

    Signatures, shingle counts, and the verification index all derive
    from ONE hashed inverted index (see _minhash_signed); cache_index
    persists it (memory, spilling to disk) since the verify path reads
    it from three plan branches — see ngram_jaccard_pairs."""
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    rows_per_band = num_hashes // bands
    df = spread_for_compute(df)
    shingled = _hashed_shingles(
        df, id_col, text_col, n, spread=False, hash_fn=hash_fn
    )
    if max_doc_freq is not None:
        shingled = _cap_hot_shingles(shingled, max_doc_freq)
    if cache_index and verify:
        shingled = shingled.persist(StorageLevel.MEMORY_AND_DISK)
    signed = _minhash_signed(shingled, num_hashes)

    banded = _banded_keys(signed, bands, rows_per_band, hash_fn)
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
    # Verify CANDIDATES ONLY (not a full all-pairs exact Jaccard): join
    # each candidate pair back to its two shingle sets and count the
    # intersection. Work scales with |candidates| x shingles-per-doc —
    # the whole point of LSH at 100 TB. `shingled` is the capped index
    # when a cap is set, so verification is consistent with bucketing;
    # sizes ride along from the signature aggregate (no extra groupBy).
    sizes = signed.select("doc", "n_shingles")
    inter = (
        candidates.join(
            shingled.alias("sa"), F.col("doc_a") == F.col("sa.doc")
        )
        .join(
            shingled.alias("sb"),
            (F.col("doc_b") == F.col("sb.doc"))
            & (F.col("sa.sh") == F.col("sb.sh")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return _jaccard_join_sizes(inter, sizes).filter(F.col("jaccard") >= threshold)


# Two's-complement bit masks 2^0..2^63 (bit 63 is the sign bit, hence
# the negative literal — same long value shiftleft(1L, 63) produces).
_BIT_MASKS = [(1 << b) if b < 63 else -(1 << 63) for b in range(64)]


def simhash64(text, n: int = 3):
    """64-bit SimHash of word n-gram shingles: per-bit majority vote of
    shingle hashes, folded into one BIGINT with bitwise expressions —
    entirely in the scan stage.

    One left-fold with an array<int>[64] vote accumulator (zip_with
    against a 64-mask literal array), then one fold ORing winning masks.
    A single O(64·S) pass with a small fixed expression tree — the naive
    form (64 independent aggregate() expressions) re-walks the shingle
    array 64 times and its codegen compiles ~64× slower."""
    shingles = F.array_distinct(word_shingles(text, n))
    hashes = F.transform(shingles, lambda s: F.xxhash64(s))
    masks = F.array(*[F.lit(m).cast("long") for m in _BIT_MASKS])
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(masks, lambda m: F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1)),
            lambda a, v: a + v,
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes,
            masks,
            lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, m: acc.bitwiseOR(m),
    )


def _balanced_or(cols: list[Column]) -> Column:
    """bitwiseOR-reduce as a balanced tree (depth log2 n, not n).
    Catalyst's tree traversals over a 64-deep left chain make plan
    analysis measurably slow (seconds); the balanced form is
    semantically identical and shallow."""
    while len(cols) > 1:
        cols = [
            cols[i].bitwiseOR(cols[i + 1]) if i + 1 < len(cols) else cols[i]
            for i in range(0, len(cols), 2)
        ]
    return cols[0]


def _simhash_bits(hash_fn: str) -> int:
    """Fingerprint width per hash mode: xxhash64 fills all 64 bits; the
    md5-prefix hash yields 60 usable bits (15 hex chars)."""
    return 64 if hash_fn == "xxhash64" else 60


def simhash_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(doc, sh, n_shingles) SimHash fingerprints via explode +
    hash-aggregate.

    Same bits as simhash64(), but the majority vote runs inside a
    codegen'd hash aggregate (partial map-side combine, one shuffled
    row per doc) instead of a per-row higher-order fold — HOFs are
    interpreted, so at corpus scale the aggregate form is the fast
    path.

    hash_fn="md5" draws shingle hashes from the engine-portable
    60-bit md5 prefix (see _md5_long) instead of xxhash64 — DuckDB
    computes identical per-shingle values, so the whole fingerprint
    (and the pairs query over it) gains an exact cross-engine oracle;
    the fingerprint then uses 60 bits instead of 64.

    The per-bit set-counts are PACKED TWO PER AGGREGATE COLUMN (bits i
    and i+half in the low/high 32-bit lanes of one 64-bit sum): each
    shingle contributes ((h>>i)&1) + ((h>>(i+half))&1)<<32, so a lane
    overflows only past 2^31 distinct shingles in one document — not a
    real document. Halving the aggregate width halves both the
    aggregate work and the Catalyst planning time of the widest plan in
    the dedup family. The majority vote per bit is then
    2*set_count > n_shingles (strictly-greater matches the +1/-1 vote
    form: votes = 2*set - n > 0). Docs with zero shingles (< n tokens)
    surface as NULL sums via explode_outer and fingerprint to 0,
    identical to the expression form."""
    n_bits = _simhash_bits(hash_fn)
    half = n_bits // 2
    df = spread_for_compute(df)
    hashed = df.select(
        F.col(id_col).alias("doc"),
        F.explode_outer(
            F.transform(
                F.array_distinct(word_shingles(F.col(text_col), n)),
                lambda s: _shingle_hash(s, hash_fn),
            )
        ).alias("h"),
    )
    one = F.lit(1).cast("long")
    votes = [
        F.sum(
            F.shiftrightunsigned(F.col("h"), i).bitwiseAND(one)
            + F.shiftleft(
                F.shiftrightunsigned(F.col("h"), i + half).bitwiseAND(one), 32
            )
        ).alias(f"v{i}")
        for i in range(half)
    ]
    lane_mask = F.lit((1 << 32) - 1).cast("long")
    cnt = F.col("n_shingles")
    bit_terms = []
    for i in range(half):
        v = F.coalesce(F.col(f"v{i}"), F.lit(0).cast("long"))
        lo = v.bitwiseAND(lane_mask)
        hi = F.shiftrightunsigned(v, 32)
        for bit, ones in ((i, lo), (i + half, hi)):
            m = F.lit(_BIT_MASKS[bit]).cast("long")
            bit_terms.append(
                F.when(ones * 2 > cnt, m).otherwise(F.lit(0).cast("long"))
            )
    return (
        hashed.groupBy("doc")
        .agg(*votes, F.count("h").alias("n_shingles"))
        .select("doc", _balanced_or(bit_terms).alias("sh"), "n_shingles")
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    max_hamming: int = 3,
    num_bands: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming.

    Pigeonhole bucketing: split the fingerprint (64 bits, or 60 in
    hash_fn="md5" mode — see simhash_fingerprints) into num_bands
    bands; any pair within hamming distance < num_bands agrees exactly
    on >=1 band, so candidates come from equi-joins on (band_idx,
    band_value) — never all-pairs. Verification computes the true
    hamming distance via bit_count(xor).

    Docs with zero shingles (< n tokens) are excluded — they would all
    share fingerprint 0 and pair quadratically at hamming 0 despite
    having no comparable content."""
    if max_hamming >= num_bands:
        raise ValueError(
            f"pigeonhole requires max_hamming < num_bands: a pair at "
            f"distance {max_hamming} can differ in every one of "
            f"{num_bands} bands and would be silently missed"
        )
    n_bits = _simhash_bits(hash_fn)
    if n_bits % num_bands:
        raise ValueError(f"num_bands must divide {n_bits} in {hash_fn} mode")
    signed = simhash_fingerprints(df, id_col, text_col, n, hash_fn).filter(
        F.col("n_shingles") > 0
    ).drop("n_shingles")
    width = n_bits // num_bands
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


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int | None = None,
    cache_index: bool = True,
) -> DataFrame:
    """Asymmetric n-gram containment: |A∩B| / min(|A|, |B|) >=
    threshold — catches SUB-document duplication (one document quoted
    or embedded inside another) that Jaccard misses: a page containing
    a full copy of a short document has low Jaccard (the long page
    dilutes the union) but containment ~1.0.

    Output: (doc_a, doc_b, containment, contained) with doc_a < doc_b;
    `contained` is the id of the smaller (by shingle count, ties ->
    lower id) document — the one to drop or flag downstream.

    Identical index/candidate machinery (and scale shape) as
    ngram_jaccard_pairs: hashed inverted index, optional hot-shingle
    cap applied BEFORE the self-join, intersection counts, size join —
    only the final score differs.
    """
    shingled = _hashed_shingles(df, id_col, text_col, n)
    if max_doc_freq is not None:
        shingled = _cap_hot_shingles(shingled, max_doc_freq)
    if cache_index:
        shingled = shingled.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = shingled.groupBy("doc").agg(F.count(F.lit(1)).alias("n_shingles"))
    inter = _intersections(shingled)
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    scored = (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc"))
        .join(sb, F.col("doc_b") == F.col("sb.doc"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_common").cast("double")
                / F.least("sa.n_shingles", "sb.n_shingles").cast("double")
            ).alias("containment"),
            F.when(
                F.col("sa.n_shingles") < F.col("sb.n_shingles"), F.col("doc_a")
            )
            .when(
                F.col("sb.n_shingles") < F.col("sa.n_shingles"), F.col("doc_b")
            )
            .otherwise(F.least("doc_a", "doc_b"))
            .alias("contained"),
        )
    )
    return scored.filter(F.col("containment") >= threshold)


def ngram_overlap_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    jaccard_threshold: float = 0.5,
    containment_threshold: float = 0.8,
    max_doc_freq: int | None = None,
    cache_index: bool = True,
) -> DataFrame:
    """Jaccard AND containment near-dup tests in ONE pass: pairs passing
    either test, each score reported when its own threshold is met and
    ``-1`` sentinels otherwise.

    Bit-identical to
    ``ngram_jaccard_pairs(...).join(ngram_containment_pairs(...),
    ["doc_a", "doc_b"], "full_outer")`` with coalesced sentinels
    (tested), at HALF the cost: both scores are ratios of the same
    (|A∩B|, |A|, |B|) triple, so running the two operators separately
    builds the same hashed inverted index and pays the same candidate
    self-join twice. At 100 TB the self-join is the dominant shuffle —
    any production near-dup audit that wants both measures should use
    this form. Output columns: (doc_a, doc_b, jaccard double,
    containment double, contained long); `contained` is the smaller
    (by shingle count, ties -> lower id) document of a containment
    pair, -1 for jaccard-only pairs.
    """
    shingled = _hashed_shingles(df, id_col, text_col, n)
    if max_doc_freq is not None:
        shingled = _cap_hot_shingles(shingled, max_doc_freq)
    if cache_index:
        shingled = shingled.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = shingled.groupBy("doc").agg(F.count(F.lit(1)).alias("n_shingles"))
    inter = _intersections(shingled)
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (
        F.col("sa.n_shingles") + F.col("sb.n_shingles") - F.col("n_common")
    ).cast("double")
    con = F.col("n_common").cast("double") / F.least(
        "sa.n_shingles", "sb.n_shingles"
    ).cast("double")
    contained = (
        F.when(F.col("sa.n_shingles") < F.col("sb.n_shingles"), F.col("doc_a"))
        .when(F.col("sb.n_shingles") < F.col("sa.n_shingles"), F.col("doc_b"))
        .otherwise(F.least("doc_a", "doc_b"))
    )
    scored = (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc"))
        .join(sb, F.col("doc_b") == F.col("sb.doc"))
        .select(
            "doc_a",
            "doc_b",
            jac.alias("__j"),
            con.alias("__c"),
            contained.alias("__contained"),
        )
    )
    j_ok = F.col("__j") >= F.lit(float(jaccard_threshold))
    c_ok = F.col("__c") >= F.lit(float(containment_threshold))
    return scored.filter(j_ok | c_ok).select(
        "doc_a",
        "doc_b",
        F.when(j_ok, F.col("__j")).otherwise(F.lit(-1.0)).alias("jaccard"),
        F.when(c_ok, F.col("__c")).otherwise(F.lit(-1.0)).alias("containment"),
        F.when(c_ok, F.col("__contained").cast("long"))
        .otherwise(F.lit(-1).cast("long"))
        .alias("contained"),
    )


def exact_dedup_incremental(
    new_docs: DataFrame,
    seen_fingerprints: DataFrame | None,
    id_col: str,
    text_col: str,
) -> tuple[DataFrame, DataFrame]:
    """Continuous-ingestion exact dedup: dedup the incoming batch
    internally (min-id keeper, exactly like exact_dedup), then drop
    every survivor whose normalized-content fingerprint is already in
    ``seen_fingerprints`` — the historical state table a long-running
    crawl pipeline carries batch to batch (one `fingerprint` string
    column, e.g. the second return value of the previous call).

    Returns (kept, updated_fingerprints): the batch's genuinely-new
    documents, and the history with their fingerprints added — write
    it out and feed it to the next batch. With batches processed in
    ascending id order, folding batches through this function keeps
    exactly the same CONTENT set as one global exact_dedup over the
    concatenated corpus (tested); the history table grows by one
    md5 row per distinct content ever seen.

    Scale shape: the in-batch dedup is the standard fingerprint
    hash-groupBy; the history probe is a left ANTI equi-join on the
    fingerprint — a shuffle join on a high-cardinality key (the
    history at crawl scale is billions of rows: never broadcast,
    never collected). seen_fingerprints=None starts a fresh history.
    """
    batch_kept = exact_dedup(new_docs, id_col, text_col)
    fps = batch_kept.select(
        fingerprint_md5(F.col(text_col)).alias("fingerprint"), F.col(id_col)
    )
    if seen_fingerprints is None:
        kept_ids = fps.select(id_col)
        new_history = fps.select("fingerprint")
    else:
        seen = seen_fingerprints.select("fingerprint")
        fresh = fps.join(seen, "fingerprint", "left_anti")
        kept_ids = fresh.select(id_col)
        new_history = seen.unionByName(fresh.select("fingerprint"))
    kept = batch_kept.join(kept_ids, id_col, "left_semi")
    return kept, new_history


def minhash_dedup_incremental(
    new_docs: DataFrame,
    seen_signatures: DataFrame | None,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    hash_fn: str = "xxhash64",
    max_doc_freq: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Continuous-ingestion NEAR-dedup: the fuzzy counterpart of
    ``exact_dedup_incremental``. Dedup the incoming batch internally
    (MinHash-LSH pairs -> connected components -> min-id canonical,
    exactly the batch near-dedup ``curate_documents`` runs), then drop
    every survivor that near-matches a document ALREADY IN HISTORY.

    The history is a SIGNATURE store — one ``(doc, sig)`` row of
    ``num_hashes`` longs per document ever kept, NOT the documents or
    their shingle sets. Probing re-derives band keys from the stored
    signatures (a cheap scan-stage transform), LSH-joins the batch
    against them, and verifies candidates with the classic MinHash
    estimator: est_J = (matching signature components) / num_hashes,
    an unbiased Jaccard estimate with std ~= sqrt(J(1-J)/num_hashes)
    (~0.09 at 32 hashes — the standard precision/state trade; raise
    num_hashes for a sharper gate). In-batch verification still uses
    exact shingle Jaccard (the text is at hand there).

    Returns ``(kept, new_signatures)``: the genuinely-new documents
    and the signature store with their rows appended — persist it and
    feed it to the next batch. Docs with fewer than ``n`` words have
    no signature: they always survive the near-dup screen and add no
    history row (screen them with the exact incremental dedup, which
    has no length floor).

    Scale shape: signatures/bands are the usual one-aggregate one-
    transform chain on both sides; the history is touched ONLY through
    the band-key equi-join (shuffle keyed on 8-byte band hashes — high
    cardinality, never broadcast, never rewritten beyond the O(new)
    append) and the candidate signature lookups (two id-keyed joins).
    """
    from globalweather_etl_spark.operators.components import neardup_clusters

    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    rows_per_band = num_hashes // bands

    in_batch_pairs = minhash_lsh_pairs(
        new_docs, id_col, text_col, n, num_hashes, bands, threshold,
        verify=True, hash_fn=hash_fn, max_doc_freq=max_doc_freq,
    ).select("doc_a", "doc_b")
    clustered = neardup_clusters(new_docs, in_batch_pairs, id_col=id_col)
    batch_kept = new_docs.join(
        clustered.filter(F.col("is_canonical") == 1).select(id_col),
        id_col,
        "left_semi",
    )

    sh = _hashed_shingles(batch_kept, id_col, text_col, n, hash_fn=hash_fn)
    if max_doc_freq is not None:
        sh = _cap_hot_shingles(sh, max_doc_freq)
    signed = _minhash_signed(sh, num_hashes).select("doc", "sig")

    if seen_signatures is None:
        # nothing to screen against: every in-batch canonical survives;
        # docs too short to sign simply carry no history row
        return batch_kept, signed

    hist = seen_signatures.select(
        F.col("doc").alias("hdoc"), F.col("sig").alias("hsig")
    )
    banded_new = _banded_keys(signed, bands, rows_per_band, hash_fn)
    banded_hist = _banded_keys(
        hist.select(F.col("hdoc").alias("doc"), F.col("hsig").alias("sig")),
        bands,
        rows_per_band,
        hash_fn,
    ).select(F.col("doc").alias("hdoc"), "band", "bhash")
    cand = (
        banded_new.join(banded_hist, ["band", "bhash"])
        .select("doc", "hdoc")
        .distinct()
    )
    est = (
        cand.join(signed, "doc")
        .join(hist, "hdoc")
        .select(
            "doc",
            (
                F.size(
                    F.filter(
                        F.zip_with(
                            F.col("sig"), F.col("hsig"), lambda a, b: a == b
                        ),
                        lambda x: x,
                    )
                ).cast("double")
                / F.lit(float(num_hashes))
            ).alias("est_j"),
        )
    )
    dup_ids = (
        est.filter(F.col("est_j") >= F.lit(float(threshold)))
        .select(F.col("doc").alias(id_col))
        .distinct()
    )
    kept = batch_kept.join(dup_ids, id_col, "left_anti")
    fresh_sigs = signed.join(
        dup_ids.select(F.col(id_col).alias("doc")), "doc", "left_anti"
    )
    return kept, seen_signatures.unionByName(fresh_sigs)
