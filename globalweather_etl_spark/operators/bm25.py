"""BM25 lexical search over a document corpus — the sparse-retrieval
complement to the dense-ANN stack in operators/similarity.py.

Index = two aggregates over the exploded token stream:
  tf(doc, term)   — count per (doc, term)            [one shuffle]
  df(term), N, avgdl — corpus statistics              [term-grain]

Query scoring joins the (tiny, broadcast) query-term set against the
tf table — the corpus is touched only at its (doc, term) grain, no
per-query scan — then sums the standard Okapi BM25 contribution per
(query, doc) and window-top-ks per query.

Scale shape: tf is the inverted index (doc-term grain, high
cardinality both ways); stop-like terms can be capped with
max_doc_ratio exactly like the dedup operators' hot-shingle cap —
a df filter, applied identically in the oracle. All expressions are
engine-portable (ln, plain arithmetic), so results are
DuckDB-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from globalweather_etl_spark.functions.text import tokens


def bm25_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """(tf, stats): tf = (id, term, tf, dl); stats = (term, df, n_docs,
    avgdl). Terms are lowercased whitespace tokens — the same unit the
    dedup/shingle operators use.

    Fully lazy: n_docs/avgdl live in a 1-row aggregate broadcast into
    stats, so building the index launches no driver actions (the two
    eager collects of the first version are gone). Documents whose text
    yields zero tokens still count toward n_docs and pull avgdl down —
    they hold dl=0 via a left join from the corpus — and an empty corpus
    is safe: avgdl coalesces to 1.0 instead of float(None) raising.
    """
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").cast("long").alias("tf"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").cast("long").alias("dl"))
    corpus_dl = (
        docs.select(id_col)
        .join(dl, id_col, "left")
        .select(id_col, F.coalesce(F.col("dl"), F.lit(0)).cast("long").alias("dl"))
    )
    tf = tf.join(dl, id_col)
    corpus_stats = corpus_dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.coalesce(F.avg("dl"), F.lit(1.0)).cast("double").alias("avgdl"),
    )
    stats = (
        tf.groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
        .crossJoin(F.broadcast(corpus_stats))
    )
    return tf, stats


def bm25_topk(
    docs: DataFrame,
    queries: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    max_doc_ratio: float | None = None,
) -> DataFrame:
    """Top-k BM25 documents per query string.

    Output: (query, doc_id, score rounded to 9, rank 1..k), ties broken
    by doc id for determinism. max_doc_ratio drops terms appearing in
    more than that fraction of documents (stop-term cap — bounds the
    posting lists the same way max_doc_freq bounds shingle buckets).
    """
    tf, stats = bm25_index(docs, id_col, text_col)
    if max_doc_ratio is not None:
        stats = stats.filter(
            F.col("df") <= F.lit(float(max_doc_ratio)) * F.col("n_docs")
        )
    qterms = [
        (qi, t)
        for qi, q in enumerate(queries)
        for t in dict.fromkeys(q.lower().split())  # unique, order kept
    ]
    qdf = tf.sparkSession.createDataFrame(qterms, "query_id int, term string")
    # idf with the +1 inside ln (Lucene-style, always positive)
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    contrib = idf * (
        F.col("tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * F.col("dl") / F.col("avgdl")
            )
        )
    )
    scored = (
        tf.join(stats, "term")
        .join(F.broadcast(qdf), "term")
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum(contrib), 9).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.col(id_col).asc()
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
    qnames = tf.sparkSession.createDataFrame(
        list(enumerate(queries)), "query_id int, query string"
    )
    return out.join(F.broadcast(qnames), "query_id").select(
        "query", id_col, "score", "rank"
    )


def rrf_fuse(
    rankings: list[DataFrame],
    on: list[str],
    k: int = 10,
    c: int = 60,
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of ranked lists (hybrid retrieval: BM25 +
    dense ANN): score(item) = sum over lists of 1/(c + rank), top-k per
    group re-ranked. `on` = grouping + item key columns shared by all
    inputs (e.g. ["query", "doc_id"]); the first column is the group
    (per-query fusion), the rest identify the item.

    Plan shape: a union of the (already tiny, top-k-sized) ranked
    lists, one aggregate, one per-group window — cost is bounded by
    k * n_lists * n_groups rows regardless of corpus size.
    """
    group, item = on[0], on[1:]
    parts = [df.select(*on, F.col(rank_col).alias("__r")) for df in rankings]
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    fused = (
        unioned.groupBy(*on)
        .agg(
            F.round(
                F.sum(F.lit(1.0) / (F.lit(float(c)) + F.col("__r"))), 9
            ).alias("rrf_score")
        )
    )
    w = Window.partitionBy(group).orderBy(
        F.desc("rrf_score"), *[F.col(cname).asc() for cname in item]
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
