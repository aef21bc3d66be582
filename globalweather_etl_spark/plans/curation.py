"""End-to-end training-corpus curation: one call from raw documents to
packed, split, decontaminated training data.

The flagship composition of the LLM-pipeline operators — the order is
the one production curation runs use, each stage shrinking the data the
next stage pays for:

  1. exact dedup        (cheapest; removes byte-identical copies first)
  2. near-dedup         (MinHash+LSH pairs -> connected components ->
                         min-id canonical per cluster)
  3. quality filter     (scan-stage expressions; drop low-quality docs)
  4. decontamination    (drop docs overlapping the benchmark/eval set)
  5. split assignment   (deterministic hash split train/val/test)
  6. token packing      (bin_id/bin_offset within each split)

Every stage is deterministic (md5-keyed), so the whole pipeline is
reproducible row-for-row on any cluster shape. Stages share the scale
shapes documented in docs/SCALE.md; nothing here adds a new shuffle
beyond its constituent operators.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from globalweather_etl_spark.functions.text import quality_score, token_count
from globalweather_etl_spark.operators.components import neardup_clusters
from globalweather_etl_spark.operators.dedup import (
    decontaminate,
    exact_dedup,
    minhash_lsh_pairs,
)
from globalweather_etl_spark.operators.packing import pack_by_budget
from globalweather_etl_spark.operators.sampling import hash_split


@dataclass
class CurationResult:
    """Per-stage outputs (all lazy DataFrames) plus the final corpus.

    counts() triggers one count per stage — use in tests/audits, not in
    the hot path."""

    exact_deduped: DataFrame
    near_deduped: DataFrame
    quality_filtered: DataFrame
    decontaminated: DataFrame
    curated: DataFrame  # final: split + bin assignment columns
    dropped: dict = field(default_factory=dict)
    _persisted: list = field(default_factory=list)

    def unpersist(self) -> None:
        """Release the stage caches held when curate_documents ran with
        persist=True (no-op otherwise)."""
        for df in self._persisted:
            df.unpersist()

    def counts(self) -> dict:
        return {
            "exact_deduped": self.exact_deduped.count(),
            "near_deduped": self.near_deduped.count(),
            "quality_filtered": self.quality_filtered.count(),
            "decontaminated": self.decontaminated.count(),
            "curated": self.curated.count(),
        }


def curate_documents(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.3,
    neardup_threshold: float = 0.8,
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    max_doc_freq: int | None = 64,
    decontaminate_n: int = 8,
    splits: dict[str, float] | None = None,
    token_budget: int = 2048,
    seed: int = 7,
    quality_sampling: bool = False,
    hash_fn: str = "xxhash64",
    persist: bool = True,
    html_input: bool = False,
) -> CurationResult:
    """Run the full curation pipeline; see module docstring for the
    stage order and rationale. `benchmark` is the eval set to
    decontaminate against (None skips stage 4).

    html_input=True prepends stage 0: boilerplate-strip the text
    column (functions/html.py strip_html — scan-stage regex kernel,
    zero UDFs) so every downstream signal — dedup fingerprints,
    near-dup shingles, quality scores, decontamination n-grams, token
    counts — operates on the VISIBLE text, not markup. This is the
    WET-generation front door a web-corpus run needs: two pages with
    identical content but different chrome dedup as identical, and
    quality no longer rewards tag soup.

    quality_sampling=True replaces the hard `min_quality` floor with
    deterministic importance sampling: each document survives with
    probability equal to its quality score (soft filtering — common
    when a hard threshold would bias the corpus toward one register).
    Still a pure function of (doc id, seed), so runs reproduce.

    persist=True (default) persists the two multiply-consumed stage
    outputs MEMORY_AND_DISK: the exact-dedup survivors feed THREE plan
    branches (the LSH pair build, the connected-components vertex set,
    and the canonical-keeper join) and the split corpus feeds TWO (the
    token packer and the final join-back) — without the cache each
    branch re-executes the whole upstream chain, so the one-call
    pipeline pays the dedup groupBy and the quality/decontamination
    scans several times over. At 100 TB both frames are the pipeline's
    working set either way; disk spill beats recomputation (same trade
    as cache_index in the dedup operators). Results are bit-identical
    with persist=False (every stage is md5-keyed deterministic; tested)
    — call .unpersist() on the CurationResult to release executor
    storage when done.
    """
    from pyspark import StorageLevel

    splits = splits or {"train": 0.9, "val": 0.05, "test": 0.05}

    # 0. optional HTML -> visible text (scan-stage; fuses into the
    # same parquet scan stage 1 reads, so it costs no extra pass)
    if html_input:
        from globalweather_etl_spark.functions.html import strip_html

        docs = docs.withColumn(text_col, strip_html(F.col(text_col)))

    # 1. exact dedup (keeps min-id per byte-identical content)
    exact = exact_dedup(docs, id_col, text_col)
    if persist:
        exact = exact.persist(StorageLevel.MEMORY_AND_DISK)

    # 2. near-dedup: banded-LSH candidate pairs, componentized, min-id
    # canonical kept. Pairs come from the already-exact-deduped corpus
    # so identical twins don't re-enter as near-dup pairs.
    pairs = minhash_lsh_pairs(
        exact,
        id_col,
        text_col,
        n=shingle_n,
        num_hashes=num_hashes,
        bands=bands,
        threshold=neardup_threshold,
        max_doc_freq=max_doc_freq,
        hash_fn=hash_fn,
    ).select(F.col("doc_a"), F.col("doc_b"))
    clusters = neardup_clusters(exact, pairs, id_col=id_col)
    near = exact.join(
        clusters.filter(F.col("is_canonical") == 1).select(id_col),
        id_col,
        "inner",
    )

    # 3. quality floor or soft quality sampling (scan-stage either way)
    if quality_sampling:
        from globalweather_etl_spark.operators.sampling import (
            weighted_sample_flag,
        )

        # Salt the key: the split draw in stage 5 uses the same
        # (id, seed) md5 bucket, and an unsalted quality draw would
        # correlate survival with split assignment (test/val sit in the
        # high buckets, so they'd only ever receive quality > ~0.95
        # docs). The salt decorrelates the two draws.
        quality = near.filter(
            weighted_sample_flag(
                F.concat(F.col(id_col).cast("string"), F.lit("|quality")),
                quality_score(F.col(text_col)),
                seed=seed,
            )
        )
    else:
        quality = near.filter(
            quality_score(F.col(text_col)) >= F.lit(min_quality)
        )

    # 4. benchmark decontamination (broadcast shingle-set probe)
    if benchmark is not None:
        flagged = decontaminate(
            quality, benchmark, id_col, text_col, n=decontaminate_n,
            hash_fn=hash_fn,
        )
        decon = flagged.filter(~F.col("is_contaminated")).drop(
            "n_contaminated_shingles", "is_contaminated"
        )
    else:
        decon = quality

    # 5 + 6. split assignment, then token packing WITHIN each split so
    # bins never straddle train/val/test — one scan for all splits:
    # pack_by_budget(partition_cols=["split"]) restarts its distributed
    # prefix sum per split (round 4; previously a per-split
    # filter/pack/union loop re-scanned the corpus once per split).
    split_df = hash_split(decon, F.col(id_col), splits, seed=seed)
    if persist:
        split_df = split_df.persist(StorageLevel.MEMORY_AND_DISK)
    packed = pack_by_budget(
        split_df,
        id_col,
        token_count(F.col(text_col)),
        budget=token_budget,
        partition_cols=["split"],
    )
    # n_tokens rides along: write_shards' manifest sums it per shard,
    # and trainers budget sequences by it.
    curated = split_df.join(
        packed.select(id_col, "n_tokens", "bin_id", "bin_offset"),
        id_col,
        "inner",
    )

    return CurationResult(
        exact_deduped=exact,
        near_deduped=near,
        quality_filtered=quality,
        decontaminated=decon,
        curated=curated,
        _persisted=[exact, split_df] if persist else [],
    )


def corpus_report(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One-row corpus health report: size, token totals, quality and
    repetition distribution, exact-dup rate, PII exposure. The
    pre-flight audit before running curate_documents (and the
    post-flight check after).

    Cost: one scan-stage aggregation over pure expressions plus one
    md5-fingerprint distinct count (the only shuffle). percentile_approx
    is O(1)-memory per partition — report cost is independent of corpus
    size beyond the scan.
    """
    from globalweather_etl_spark.functions.text import (
        bpe_token_estimate,
        dup_word_fraction,
        fingerprint_md5,
        pii_counts,
        quality_score,
    )

    t = F.col(text_col)
    pii = pii_counts(t)
    q = F.round(quality_score(t), 9)
    per_doc = docs.select(
        F.col(id_col),
        fingerprint_md5(t).alias("__fp"),
        token_count(t).alias("__tok"),
        bpe_token_estimate(t).alias("__bpe"),
        q.alias("__q"),
        dup_word_fraction(t).alias("__dw"),
        (pii["EMAIL"] + pii["IP"] + pii["PHONE"]).alias("__pii"),
    )
    from globalweather_etl_spark.functions.aggregates import exact_avg

    return per_doc.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.count_distinct("__fp").cast("long").alias("n_unique_contents"),
        F.sum("__tok").cast("long").alias("total_tokens"),
        F.sum("__bpe").cast("long").alias("total_bpe_tokens"),
        # exact_avg, not avg: float AVG depends on partial-agg order
        # (partitioning, AQE), which would make the report — and its
        # oracle hash — non-reproducible across cluster shapes.
        exact_avg(F.col("__q")).alias("mean_quality"),
        F.round(
            F.percentile_approx("__q", 0.5, 10000).cast("double"), 9
        ).alias("median_quality"),
        exact_avg(F.col("__dw")).alias("mean_dup_word_frac"),
        F.sum("__pii").cast("long").alias("total_pii_hits"),
    ).withColumn(
        "exact_dup_rate",
        F.round(
            F.lit(1.0)
            - F.col("n_unique_contents").cast("double")
            / F.col("n_docs").cast("double"),
            9,
        ),
    )
