"""Line-level (paragraph) corpus deduplication.

Web corpora carry massive CROSS-document line duplication — navigation
bars, cookie banners, license footers — that document-level dedup never
sees (every page is unique as a whole, the boilerplate lines are not).
The standard curation fix (public background: CCNet, Wenzek et al. 2020;
RefinedWeb, Penedo et al. 2023 — both dedup at paragraph/line grain
before document-level near-dedup) removes every line whose normalized
form appears in at least ``min_doc_freq`` distinct documents, then
reassembles the surviving lines in order.

Scale shape (100 TB): one explode to (doc, pos, line), line keys coded
as md5 strings; document frequency is ONE hash aggregate over distinct
(doc, key) — map-side combined, keyed on the high-cardinality line key
(no hot reducer). The duplicated-key set is joined back with a plain
equi-join on that same key (NOT broadcast: on a real crawl the
boilerplate set is itself huge — the join stays a shuffle join on the
line key and AQE handles the skewed empty/boilerplate keys), and the
reassembly is one aggregate keyed on the document id. Three shuffles
total, all on high-cardinality keys, no window over a global ordering.

Semantics pinned for the oracle (globalweather_etl_spark/oracles.py):

- lines are ``split(text, '\\n')`` — every engine agrees;
- the dedup key is the line with every whitespace run collapsed to a
  single space, then trimmed and lowercased (collapse-BEFORE-trim so
  tab-only padding trims away too — ``trim`` alone strips only spaces
  in both Spark and DuckDB);
- WHITESPACE-ONLY lines are never counted and never removed — blank
  lines are document structure, not boilerplate, and counting them
  would mark every blank line a duplicate;
- a line repeated within one document counts ONCE toward document
  frequency (distinct (doc, key));
- surviving lines keep their original text and order; documents whose
  every line is removed keep an empty string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.partitioning import spread_for_compute

# Normalized form of one line (NULL-safe: split never yields NULL
# elements): collapse whitespace runs, then trim, then lowercase.
def _line_norm(line):
    return F.lower(F.trim(F.regexp_replace(line, r"\s+", " ")))


# md5 coding keeps shuffle/join keys fixed-width.
def _line_key(line):
    return F.md5(_line_norm(line))


def line_doc_freq(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Document frequency per normalized line key: (line_key, doc_freq).
    Whitespace-only lines are excluded. One explode + one distinct
    aggregate, both keyed on the line key."""
    lines = spread_for_compute(docs).select(
        F.col(id_col).alias("__doc"),
        F.explode(F.split(F.col(text_col), r"\n")).alias("__line"),
    )
    return (
        lines.filter(_line_norm(F.col("__line")) != "")
        .select("__doc", _line_key(F.col("__line")).alias("line_key"))
        .distinct()
        .groupBy("line_key")
        .agg(F.count(F.lit(1)).cast("long").alias("doc_freq"))
    )


def dedup_lines(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_doc_freq: int = 2,
    out_col: str | None = None,
) -> DataFrame:
    """Remove every line whose normalized form appears in at least
    ``min_doc_freq`` distinct documents; reassemble the rest in order.

    Returns the input columns with ``text_col`` replaced by the cleaned
    text (or written to ``out_col`` if given) plus per-document
    accounting: ``n_lines`` (non-blank lines before), ``n_dup_lines``
    (lines removed). Blank lines are preserved verbatim and excluded
    from both counts. See module docstring for the pinned semantics and
    the 100 TB shuffle shape.
    """
    out_col = out_col or text_col
    df_freq = line_doc_freq(docs, id_col, text_col).filter(
        F.col("doc_freq") >= F.lit(int(min_doc_freq))
    )
    lines = spread_for_compute(docs).select(
        F.col(id_col).alias("__doc"),
        F.posexplode(F.split(F.col(text_col), r"\n")).alias(
            "__pos", "__line"
        ),
    )
    is_blank = _line_norm(F.col("__line")) == ""
    keyed = lines.withColumn(
        "line_key",
        F.when(is_blank, F.lit(None)).otherwise(_line_key(F.col("__line"))),
    )
    # Left join: blank lines (NULL key) never match and are always kept.
    flagged = keyed.join(df_freq, "line_key", "left").select(
        "__doc",
        "__pos",
        "__line",
        F.col("doc_freq").isNotNull().alias("__dup"),
        F.col("line_key").isNotNull().alias("__counted"),
    )
    rebuilt = flagged.groupBy("__doc").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("__dup"),
                            F.struct(
                                F.col("__pos").alias("p"),
                                F.col("__line").alias("l"),
                            ),
                        )
                    )
                ),
                lambda s: s["l"],
            ),
        ).alias("__clean"),
        F.sum(F.when(F.col("__counted"), 1).otherwise(0))
        .cast("long")
        .alias("n_lines"),
        F.sum(F.when(F.col("__dup"), 1).otherwise(0))
        .cast("long")
        .alias("n_dup_lines"),
    )
    keep = [c for c in docs.columns if c != text_col or out_col != text_col]
    return (
        docs.join(
            rebuilt.withColumnRenamed("__doc", id_col), id_col, "inner"
        )
        .select(
            *keep,
            F.col("__clean").alias(out_col),
            "n_lines",
            "n_dup_lines",
        )
    )


def dedup_lines_within(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """WITHIN-document repeated-line removal: drop every line whose
    normalized form already occurred EARLIER IN THE SAME DOCUMENT
    (keep the first occurrence, preserve order) — the intra-doc
    counterpart of ``dedup_lines``'s cross-document boilerplate pass,
    targeting scraper artifacts that repeat a nav block / list item
    dozens of times inside one page (the transform behind the
    ``dup_line_fraction`` Gopher SIGNAL in functions/text.py).

    Same key semantics as the cross-doc pass (collapse whitespace,
    trim, lowercase; whitespace-only lines are structure — never
    counted, never removed).

    Returns the input columns with the cleaned text in ``out_col``
    (default: replace ``text_col``) plus ``n_lines_within`` (non-blank
    lines before) and ``n_dup_within`` (lines removed).

    Scale shape: ZERO shuffles — duplication is judged inside one
    row, so the whole transform is a single scan-stage higher-order
    ``aggregate`` over the split array (seen-key set folded left to
    right). Per-doc cost is O(lines x distinct-lines) via
    array_contains; documents are bounded (a 10k-line outlier is ~1e8
    comparisons worst-case on ONE row, not a stage barrier), and no
    state leaves the row.
    """
    out_col = out_col or text_col
    line = F.split(F.col(text_col), r"\n")
    zero = F.struct(
        F.array().cast("array<string>").alias("seen"),
        F.array().cast("array<string>").alias("kept"),
        F.lit(0).alias("n_lines"),
        F.lit(0).alias("n_dup"),
    )

    def _step(acc, ln):
        key = F.md5(F.lower(F.trim(F.regexp_replace(ln, r"\s+", " "))))
        blank = F.lower(F.trim(F.regexp_replace(ln, r"\s+", " "))) == ""
        dup = F.array_contains(acc["seen"], key)
        return F.when(
            blank,
            F.struct(
                acc["seen"].alias("seen"),
                F.concat(acc["kept"], F.array(ln)).alias("kept"),
                acc["n_lines"].alias("n_lines"),
                acc["n_dup"].alias("n_dup"),
            ),
        ).when(
            dup,
            F.struct(
                acc["seen"].alias("seen"),
                acc["kept"].alias("kept"),
                (acc["n_lines"] + 1).alias("n_lines"),
                (acc["n_dup"] + 1).alias("n_dup"),
            ),
        ).otherwise(
            F.struct(
                F.concat(acc["seen"], F.array(key)).alias("seen"),
                F.concat(acc["kept"], F.array(ln)).alias("kept"),
                (acc["n_lines"] + 1).alias("n_lines"),
                acc["n_dup"].alias("n_dup"),
            )
        )

    folded = F.aggregate(line, zero, _step)
    keep = [c for c in docs.columns if c != text_col or out_col != text_col]
    return docs.select(
        *keep,
        F.array_join(folded["kept"], "\n").alias(out_col),
        folded["n_lines"].cast("long").alias("n_lines_within"),
        folded["n_dup"].cast("long").alias("n_dup_within"),
    )
