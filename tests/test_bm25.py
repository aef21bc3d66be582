"""BM25: hand-computed scores on a micro-corpus + DuckDB parity on the
real documents table."""

from __future__ import annotations

import math

from globalweather_etl_spark.operators.bm25 import bm25_topk
from globalweather_etl_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_hand_computed_scores(spark):
    rows = [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "cherry cherry cherry date"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(docs, ["apple", "cherry date"], k=3)
    got = {
        (r["query"], r["doc_id"]): (r["score"], r["rank"])
        for r in out.collect()
    }
    # reference implementation
    corpus = {i: t.split() for i, t in rows}
    N, avgdl = 3, sum(len(v) for v in corpus.values()) / 3
    k1, b = 1.2, 0.75

    def idf(term):
        df = sum(term in v for v in corpus.values())
        return math.log((N - df + 0.5) / (df + 0.5) + 1.0)

    def score(q, d):
        s = 0.0
        toks = corpus[d]
        for t in dict.fromkeys(q.split()):
            tf = toks.count(t)
            if tf:
                s += idf(t) * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(toks) / avgdl)
                )
        return round(s, 9)

    assert got[("apple", 1)][0] == score("apple", 1)
    assert set(k for k in got if k[0] == "apple") == {("apple", 1)}
    want_cd = {d: score("cherry date", d) for d in (2, 3)}
    assert got[("cherry date", 3)][0] == want_cd[3]
    assert got[("cherry date", 2)][0] == want_cd[2]
    assert got[("cherry date", 3)][1] == 1  # doc 3 outranks doc 2


def test_duckdb_parity_on_testdata(spark):
    import duckdb

    docs = load_table(spark, SF_DIR, "documents")
    queries = ["table scan join", "spark window"]
    got = {
        (r["query"], r["doc_id"]): (r["score"], r["rank"])
        for r in bm25_topk(docs, queries, k=5).collect()
    }
    con = duckdb.connect()
    qlit = " UNION ALL ".join(
        f"SELECT {qi} AS query_id, '{q}' AS query" for qi, q in enumerate(queries)
    )
    want = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(f"""
WITH docs AS (SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')),
toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
  FROM docs),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
stats AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
g AS (SELECT (SELECT count(*) FROM docs) AS n_docs,
             (SELECT avg(dl) FROM dl) AS avgdl),
q AS ({qlit}),
qt AS (SELECT query_id, query, unnest(string_split(lower(query), ' ')) AS term
       FROM q),
scored AS (
  SELECT qt.query_id, tf.doc_id,
    round(sum(
      ln((g.n_docs - s.df + 0.5) / (s.df + 0.5) + 1.0)
      * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / g.avgdl))
    ), 9) AS score
  FROM tf JOIN stats s USING (term) JOIN dl USING (doc_id)
  JOIN qt ON qt.term = tf.term CROSS JOIN g
  GROUP BY 1, 2),
ranked AS (
  SELECT q.query, doc_id, score,
    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id)
      AS rank
  FROM scored JOIN q USING (query_id))
SELECT query, doc_id, score, rank FROM ranked WHERE rank <= 5""").fetchall()
    }
    assert got == want


def test_rrf_fusion_hand_computed(spark):
    from globalweather_etl_spark.operators.bm25 import rrf_fuse

    lex = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)],
        "query string, doc_id long, rank long",
    )
    dense = spark.createDataFrame(
        [("q", 3, 1), ("q", 1, 2), ("q", 4, 3)],
        "query string, doc_id long, rank long",
    )
    out = rrf_fuse([lex, dense], on=["query", "doc_id"], k=4, c=60)
    got = {r["doc_id"]: (r["rrf_score"], r["rank"]) for r in out.collect()}
    s = lambda *ranks: round(sum(1.0 / (60 + r) for r in ranks), 9)
    # doc1: ranks 1+2; doc3: ranks 3+1; doc2: 2; doc4: 3
    assert got[1][0] == s(1, 2)
    assert got[3][0] == s(3, 1)
    assert got[2][0] == s(2)
    assert got[4][0] == s(3)
    # doc1 and doc3 tie exactly (1/61+1/62 both) -> doc_id tiebreak
    assert got[1][1] == 1 and got[3][1] == 2
    assert got[2][1] == 3 and got[4][1] == 4


def test_empty_corpus_and_zero_token_docs(spark):
    from pyspark.sql import functions as F

    from globalweather_etl_spark.operators.bm25 import bm25_index

    empty = spark.createDataFrame([], "doc_id long, text string")
    tf, stats = bm25_index(empty)  # must not raise (lazy, no collect)
    assert tf.count() == 0 and stats.count() == 0
    assert bm25_topk(empty, ["anything"], k=3).count() == 0

    # Docs absent from the token stream (NULL text: split(NULL) is NULL
    # and explode drops it) still count toward n_docs and pull avgdl
    # down via the corpus left join. Empty strings tokenize to one ''
    # term (split-of-trim semantics, same as the DuckDB twin) -> dl=1.
    docs = spark.createDataFrame(
        [(1, "a b"), (2, ""), (3, None)], "doc_id long, text string"
    )
    _, stats = bm25_index(docs)
    row = stats.select("n_docs", "avgdl").limit(1).collect()[0]
    assert row["n_docs"] == 3
    assert row["avgdl"] == 1.0  # (2 + 1 + 0) / 3


def test_index_is_lazy_no_jobs(spark):
    """bm25_index must launch zero Spark jobs (the stats live in a
    lazy 1-row aggregate, not driver-side collects)."""
    from globalweather_etl_spark.operators.bm25 import bm25_index

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    docs = spark.createDataFrame([(1, "x y"), (2, "y z")], "doc_id long, text string")
    bm25_index(docs)
    after = tracker.getJobIdsForGroup(None)
    assert before == after
