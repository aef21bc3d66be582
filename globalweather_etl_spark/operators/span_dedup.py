"""Exact duplicate-SPAN removal — the 9th dedup family: edit inside
documents at token-span grain.

Public background: Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better" (ExactSubstr) — verbatim passages repeated
across documents (syndicated paragraphs, quoted licenses, templated
sections) survive document-level near-dedup (each host doc is unique
as a whole) AND line-level dedup (the passage need not align to
lines). The reference method removes every duplicated substring above
a length floor, keeping one copy. Their implementation is a
single-node suffix array; this is the distributed reformulation at
token grain:

1. fingerprint every k-token window (one scan-stage ``transform``
   over the split array — the same sliding-window construction as
   ``word_shingles`` — then one posexplode);
2. a window's key is duplicated when it occurs in >= ``min_doc_freq``
   distinct documents; the MIN doc id per duplicated key KEEPS its
   copy (the package-wide keep-first policy), every other occurrence
   marks its k-token interval for removal;
3. per document, the union of marked intervals is erased and the
   surviving tokens reassemble in order (whitespace-normalized — the
   token grain means original inter-token whitespace inside erased
   regions is not reconstructible, and normalizing is what training
   pipelines do here anyway).

Every duplicated window >= k tokens is covered by construction (a
repeat of length L >= k contributes L-k+1 marked starts whose
intervals tile it); repeats shorter than k are below the floor and
untouched — exactly the ExactSubstr contract with k as the floor.

Scale shape (100 TB): window fingerprints are 8-byte hashes built
scan-stage (no string shuffles); document frequency is one distinct +
one hash aggregate keyed on the fingerprint; keeper assignment rides
the same aggregate (min doc id); the mark join is a plain equi-join
on the fingerprint (high cardinality — NOT broadcast, syndicated-
passage sets are huge on real crawls); interval union + erasure is
one per-doc aggregate (collect marked starts, sort, fold) — state per
doc is its marked-start list, bounded by its own length. Three
shuffles total (df aggregate, mark join, per-doc rebuild), no window
over a global ordering, no suffix array.

Token-coverage semantics are pinned for the DuckDB twin
(tests/test_span_dedup.py): token t of doc d is removed iff some
marked start p of d satisfies p <= t < p + k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.dedup import _shingle_hash
from globalweather_etl_spark.operators.partitioning import spread_for_compute

__all__ = ["duplicate_span_starts", "remove_duplicate_spans"]


def _window_keys(docs: DataFrame, id_col: str, text_col: str, k: int, hash_fn: str) -> DataFrame:
    """(doc, p, gh): the 8-byte fingerprint of the k-token window
    starting at 0-based token position p. Scan-stage array build, one
    posexplode."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    grams = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(k - 1)),
            lambda i: _shingle_hash(F.concat_ws(" ", F.slice(toks, i, k)), hash_fn),
        ),
    ).otherwise(F.array().cast("array<long>"))
    return spread_for_compute(docs).select(
        F.col(id_col).alias("doc"), F.posexplode(grams).alias("p", "gh")
    )


def duplicate_span_starts(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 16,
    min_doc_freq: int = 2,
    hash_fn: str = "xxhash64",
    cache_index: bool = True,
) -> DataFrame:
    """(doc, p) marks: 0-based token positions whose k-window is a
    duplicate this document does NOT keep (the min-id document per
    duplicated window keeps its copy). The building block —
    ``remove_duplicate_spans`` erases them; audits can count them.

    ``cache_index`` persists the window-fingerprint index (memory,
    spilling to disk): it feeds two plan branches (the doc-frequency/
    keeper aggregate and the mark join), which would otherwise re-scan
    and re-fingerprint the corpus — the same trade ngram_jaccard_pairs
    makes for its inverted index."""
    wk = _window_keys(docs, id_col, text_col, k, hash_fn)
    if cache_index:
        from pyspark import StorageLevel

        wk = wk.persist(StorageLevel.MEMORY_AND_DISK)
    dup = (
        wk.select("doc", "gh")
        .distinct()
        .groupBy("gh")
        .agg(
            F.count(F.lit(1)).alias("__df"),
            F.min("doc").alias("__keeper"),
        )
        .filter(F.col("__df") >= F.lit(int(min_doc_freq)))
        .select("gh", "__keeper")
    )
    return (
        wk.join(dup, "gh")
        .filter(F.col("doc") != F.col("__keeper"))
        .select("doc", "p")
        .distinct()
    )


def remove_duplicate_spans(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 16,
    min_doc_freq: int = 2,
    hash_fn: str = "xxhash64",
    out_col: str | None = None,
    cache_index: bool = True,
) -> DataFrame:
    """The corpus with duplicated spans erased: input columns with
    ``text_col`` replaced (or written to ``out_col``) by the surviving
    tokens joined with single spaces, plus per-doc accounting:
    ``span_n_tokens`` (tokens before), ``span_tokens_removed``, and
    ``span_n_spans`` (maximal erased intervals). Docs with no marks
    keep their token stream (whitespace-normalized) and zero counts.
    """
    out_col = out_col or text_col
    marks = duplicate_span_starts(
        docs, id_col, text_col, k, min_doc_freq, hash_fn, cache_index
    )
    per_doc = marks.groupBy("doc").agg(
        F.array_sort(F.collect_list("p")).alias("starts")
    )
    toks = F.split(F.trim(F.col("__text")), r"\s+")
    starts = F.coalesce(F.col("starts"), F.array().cast("array<int>"))
    # token t removed iff EXISTS start s: s <= t < s + k
    removed_flags = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 1),
        lambda t: F.exists(starts, lambda s: (s <= t) & (t < s + F.lit(k))),
    )
    n_spans = F.size(
        F.filter(
            F.sequence(F.lit(0), F.size(starts) - 1),
            lambda i: (i == 0)
            | (F.element_at(starts, i + 1) > F.element_at(starts, i) + F.lit(k - 1)),
        )
    )
    keep = [c for c in docs.columns if c != text_col or out_col != text_col]
    tagged = docs.withColumn("__text", F.col(text_col)).join(
        per_doc, F.col(id_col) == F.col("doc"), "left"
    )
    empty_text = F.trim(F.col("__text")) == ""
    return tagged.select(
        *keep,
        F.when(empty_text, F.lit("")).otherwise(
            F.array_join(
                F.filter(
                    F.zip_with(
                        toks, removed_flags, lambda tk, rm: F.when(~rm, tk)
                    ),
                    lambda x: x.isNotNull(),
                ),
                " ",
            )
        ).alias(out_col),
        F.when(empty_text, F.lit(0))
        .otherwise(F.size(toks))
        .cast("long")
        .alias("span_n_tokens"),
        F.size(F.filter(removed_flags, lambda x: x))
        .cast("long")
        .alias("span_tokens_removed"),
        F.when(F.col("starts").isNull(), F.lit(0))
        .otherwise(n_spans)
        .cast("long")
        .alias("span_n_spans"),
    )
