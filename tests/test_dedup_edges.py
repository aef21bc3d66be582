"""Dedup operator edge cases: empty/short docs, exact duplicates,
disjoint docs — the boundary behavior the corpus-scale runs never hit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.dedup import (
    decontaminate,
    exact_dedup,
    exact_dedup_keepers,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprints,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "The  Quick Brown   Fox jumps over the lazy dog"),  # ws/case dup
        (4, "completely different content with no overlap at all here"),
        (5, "the quick brown fox jumps over the sleepy dog"),  # near-dup of 1
        (6, "xy"),  # < n tokens -> zero shingles
        (7, ""),  # empty
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_normalizes_whitespace_and_case(docs):
    kept = sorted(r["doc_id"] for r in exact_dedup(docs, "doc_id", "text").collect())
    # 1,2,3 collapse to keeper 1; everything else unique
    assert kept == [1, 4, 5, 6, 7]
    keepers = exact_dedup_keepers(docs, "doc_id", "text")
    dup = {r["keep_id"]: r["dup_count"] for r in keepers.collect()}
    assert dup[1] == 3


def test_ngram_jaccard_exact_dups_score_one(docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.0).collect()
    }
    assert pairs[(1, 2)] == 1.0
    # near-dup shares most shingles but not all
    assert 0.0 < pairs[(1, 5)] < 1.0
    # disjoint/short/empty docs never pair
    assert all(4 not in p and 6 not in p and 7 not in p for p in pairs)


def test_minhash_finds_exact_dup_pair(docs):
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", n=3, num_hashes=32, bands=8, threshold=0.5
        ).collect()
    }
    assert (1, 2) in pairs  # identical signatures always collide


def test_short_docs_never_pair_in_simhash_or_minhash(docs):
    """Docs with zero shingles (ids 6, 7) must not appear in near-dup
    pairs — they'd otherwise all collide on sentinel fingerprints."""
    from globalweather_etl_spark.operators.dedup import simhash_pairs

    sim = simhash_pairs(docs, "doc_id", "text", n=3, max_hamming=3).collect()
    mh = minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, num_hashes=32, bands=8,
        threshold=0.5, verify=False,
    ).collect()
    for r in list(sim) + list(mh):
        assert r["doc_a"] not in (6, 7) and r["doc_b"] not in (6, 7)


def test_simhash_pigeonhole_guard(docs):
    from globalweather_etl_spark.operators.dedup import simhash_pairs

    with pytest.raises(ValueError):
        simhash_pairs(docs, "doc_id", "text", max_hamming=4, num_bands=4)


def test_simhash_empty_and_short_docs_fingerprint_zero(docs):
    fps = {r["doc"]: r["sh"] for r in simhash_fingerprints(docs, "doc_id", "text").collect()}
    assert fps[6] == 0 and fps[7] == 0
    assert fps[1] == fps[2] != 0


def test_exact_dedup_preserves_all_columns(docs):
    out = exact_dedup(docs.withColumn("extra", F.lit("x")), "doc_id", "text")
    assert set(out.columns) == {"doc_id", "text", "extra"}


@pytest.fixture(scope="module")
def stop_shingle_docs(spark):
    """Every doc ends with the same stop-phrase 'terms of service apply'
    (a planted hot shingle chain); only 1/2 and 3/4 share real content."""
    rows = [
        (1, "alpha beta gamma delta epsilon terms of service apply"),
        (2, "alpha beta gamma delta zeta terms of service apply"),
        (3, "one two three four five six terms of service apply"),
        (4, "one two three four five seven terms of service apply"),
        (5, "red orange yellow green blue terms of service apply"),
        (6, "north south east west center terms of service apply"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hot_shingle_cap_identical_below_cap(docs):
    """With a cap no shingle exceeds, output is identical to uncapped."""
    base = sorted(
        tuple(r)
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.0
        ).collect()
    )
    capped = sorted(
        tuple(r)
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.0, max_doc_freq=1000
        ).collect()
    )
    assert base == capped


def test_hot_shingle_cap_bounds_candidates(stop_shingle_docs):
    """A planted stop-shingle in every doc pairs all (6 choose 2)=15 docs
    uncapped; the cap drops the hot shingles so only genuinely similar
    pairs remain — bounded candidate count, not quadratic."""
    uncapped = ngram_jaccard_pairs(
        stop_shingle_docs, "doc_id", "text", n=3, threshold=0.0
    ).collect()
    assert len(uncapped) == 15  # every pair glued by the stop-phrase
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            stop_shingle_docs, "doc_id", "text", n=3, threshold=0.0,
            max_doc_freq=2,
        ).collect()
    }
    assert set(capped) == {(1, 2), (3, 4)}
    # similarity is over the capped shingle space: 1/2 share 3 of their
    # remaining shingles-with-df<=2
    assert all(0.0 < j <= 1.0 for j in capped.values())


def test_minhash_cap_excludes_stop_shingles(stop_shingle_docs):
    """Capped MinHash: stop-shingle-only docs (5, 6) drop out of every
    band bucket; real near-dups (1/2, 3/4) still pair."""
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(
            stop_shingle_docs, "doc_id", "text", n=3, num_hashes=32,
            bands=16, threshold=0.0, max_doc_freq=2,
        ).collect()
    }
    assert (1, 2) in pairs and (3, 4) in pairs
    assert all(5 not in p and 6 not in p for p in pairs)


def test_minhash_md5_mode_matches_xxhash_on_verified_pairs(docs):
    """hash_fn only changes candidate RECALL (different signatures);
    verified jaccard values for pairs found by both must be identical,
    and the guaranteed identical pair (1,2) appears in both."""
    xx = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", n=3, num_hashes=32, bands=8, threshold=0.5
        ).collect()
    }
    md = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", n=3, num_hashes=32, bands=8,
            threshold=0.5, hash_fn="md5",
        ).collect()
    }
    assert (1, 2) in xx and (1, 2) in md
    for pair in set(xx) & set(md):
        assert xx[pair] == md[pair]


class TestDecontaminate:
    """Benchmark decontamination: hand-computable 3-gram overlaps."""

    @pytest.fixture(scope="class")
    def frames(self, spark):
        corpus = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "completely different text with no overlap at all"),
                (3, "a b"),  # shorter than n=3 words -> zero shingles
                (4, "x y z w v"),  # exact copy of a benchmark doc
            ],
            "doc_id long, text string",
        )
        benchmark = spark.createDataFrame(
            [
                # shares exactly 3 shingles with doc 1: "the quick
                # brown", "quick brown fox", "brown fox jumps"
                (100, "the quick brown fox jumps straight home"),
                (101, "x y z w v"),
            ],
            "doc_id long, text string",
        )
        return corpus, benchmark

    def _counts(self, out):
        return {
            r["doc_id"]: (r["n_contaminated_shingles"], r["is_contaminated"])
            for r in out.collect()
        }

    def test_exact_overlap_counts(self, frames):
        corpus, benchmark = frames
        got = self._counts(
            decontaminate(corpus, benchmark, "doc_id", "text", n=3)
        )
        assert got == {
            1: (3, True),
            2: (0, False),
            3: (0, False),
            4: (3, True),
        }

    def test_min_hits_threshold(self, frames):
        corpus, benchmark = frames
        got = self._counts(
            decontaminate(corpus, benchmark, "doc_id", "text", n=3, min_hits=4)
        )
        assert not any(flag for _, flag in got.values())

    def test_preserves_corpus_rows_and_columns(self, frames):
        corpus, benchmark = frames
        out = decontaminate(corpus, benchmark, "doc_id", "text", n=3)
        assert out.count() == corpus.count()
        assert out.columns == corpus.columns + [
            "n_contaminated_shingles",
            "is_contaminated",
        ]

    def test_md5_hash_parity(self, frames):
        """The engine-portable hash yields identical counts (no hash
        family dependence in the membership semantics)."""
        corpus, benchmark = frames
        a = self._counts(decontaminate(corpus, benchmark, "doc_id", "text", n=3))
        b = self._counts(
            decontaminate(
                corpus, benchmark, "doc_id", "text", n=3, hash_fn="md5"
            )
        )
        assert a == b

    def test_benchmark_side_broadcast(self, frames):
        """The membership probe must be a broadcast hash join (the
        corpus never shuffles for it) unless explicitly disabled."""
        corpus, benchmark = frames
        plan = decontaminate(
            corpus, benchmark, "doc_id", "text", n=3
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


def test_containment_catches_subdocument_duplication(spark):
    """A short doc fully embedded in a long page: Jaccard low,
    containment 1.0 — plus DuckDB parity for the score."""
    import duckdb

    from globalweather_etl_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i}" for i in range(60))
    rows = [(1, short), (2, filler + " " + short + " " + filler)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    cont = ngram_containment_pairs(docs, "doc_id", "text", n=3, threshold=0.8)
    got = [(r["doc_a"], r["doc_b"], r["containment"], r["contained"])
           for r in cont.collect()]
    assert len(got) == 1
    a, b, c, contained = got[0]
    assert (a, b, contained) == (1, 2, 1)
    assert c == 1.0  # every shingle of doc1 appears in doc2

    jac = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8)
    assert jac.count() == 0  # Jaccard misses it at the same threshold

    # DuckDB twin of the containment score on distinct word trigrams
    con = duckdb.connect()
    want, = con.execute("""
WITH docs(doc_id, text) AS (VALUES (1, ?), (2, ?)),
toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
         FROM docs),
sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
       FROM toks, unnest(generate_series(1, len(t) - 2)) AS g(i)),
sizes AS (SELECT doc_id, count(*) AS ns FROM sh GROUP BY 1),
inter AS (SELECT count(*) AS c FROM sh a JOIN sh b
          ON a.s = b.s AND a.doc_id = 1 AND b.doc_id = 2)
SELECT CAST(c AS DOUBLE) / least(
  (SELECT ns FROM sizes WHERE doc_id = 1),
  (SELECT ns FROM sizes WHERE doc_id = 2)) FROM inter
""", [short, rows[1][1]]).fetchone()
    assert c == want


def test_overlap_pairs_matches_full_outer_of_singles(spark):
    """ngram_overlap_pairs (one index/self-join pass) is bit-identical
    to the full-outer union of ngram_jaccard_pairs and
    ngram_containment_pairs with -1 sentinels — on real testdata, so
    jaccard-only, containment-only, and both-pass pairs all occur."""
    from pyspark.sql import functions as F

    from globalweather_etl_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_overlap_pairs,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    kw = dict(n=3, max_doc_freq=64)
    jac = ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5, **kw)
    con = ngram_containment_pairs(docs, "doc_id", "text", threshold=0.8, **kw)
    want = sorted(
        (
            r["doc_a"], r["doc_b"], r["jaccard"], r["containment"],
            r["contained"],
        )
        for r in jac.join(con, ["doc_a", "doc_b"], "full_outer")
        .select(
            "doc_a",
            "doc_b",
            F.coalesce("jaccard", F.lit(-1.0)).alias("jaccard"),
            F.coalesce("containment", F.lit(-1.0)).alias("containment"),
            F.coalesce(
                F.col("contained").cast("long"), F.lit(-1).cast("long")
            ).alias("contained"),
        )
        .collect()
    )
    got_df = ngram_overlap_pairs(
        docs, "doc_id", "text",
        jaccard_threshold=0.5, containment_threshold=0.8, **kw,
    )
    got = sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"], r["containment"],
         r["contained"])
        for r in got_df.collect()
    )
    assert got == want
    assert len(got) > 0
    # all three sentinel shapes occur in the fixture corpus
    kinds = {
        (row[2] == -1.0, row[3] == -1.0) for row in got
    }
    assert (False, True) in kinds or (False, False) in kinds
    assert [f.name for f in got_df.schema.fields] == [
        "doc_a", "doc_b", "jaccard", "containment", "contained",
    ]


def test_exact_dedup_incremental_folds_to_global(spark):
    """Folding id-ordered batches through exact_dedup_incremental keeps
    exactly the same CONTENT set as one global exact_dedup, and the
    history grows by one fingerprint per distinct content."""
    from globalweather_etl_spark.functions.text import fingerprint_md5
    from globalweather_etl_spark.operators.dedup import (
        exact_dedup_incremental,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    # amplify so cross-batch duplicates exist: each doc appears in both
    # batches (ids 2k / 2k+1 share text)
    dup = docs.select(
        (F.col("doc_id") * 2).alias("doc_id"), "text"
    ).unionByName(
        docs.select((F.col("doc_id") * 2 + 1).alias("doc_id"), "text")
    )
    b1 = dup.filter(F.col("doc_id") % 2 == 0)   # all even ids
    b2 = dup.filter(F.col("doc_id") % 2 == 1)   # duplicates of batch 1

    k1, h1 = exact_dedup_incremental(b1, None, "doc_id", "text")
    k2, h2 = exact_dedup_incremental(b2, h1, "doc_id", "text")

    # batch 2 is pure duplication of batch 1 content
    assert k2.count() == 0
    # content set == global dedup's content set
    global_fps = sorted(
        r["fp"]
        for r in exact_dedup(dup, "doc_id", "text")
        .select(fingerprint_md5(F.col("text")).alias("fp"))
        .collect()
    )
    incr_fps = sorted(
        r["fp"]
        for r in k1.unionByName(k2)
        .select(fingerprint_md5(F.col("text")).alias("fp"))
        .collect()
    )
    assert incr_fps == global_fps
    # history = one row per distinct content, no duplicates
    hist = [r["fingerprint"] for r in h2.collect()]
    assert sorted(hist) == global_fps
    assert len(set(hist)) == len(hist)


def test_exact_dedup_incremental_mixed_batches(spark):
    """New content in batch 2 survives; repeated content does not; the
    batch's own internal duplicates collapse first."""
    from globalweather_etl_spark.operators.dedup import (
        exact_dedup_incremental,
    )

    b1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    )
    b2 = spark.createDataFrame(
        [(10, "alpha"), (11, "gamma"), (12, "GAMMA"), (13, "delta")],
        "doc_id long, text string",
    )
    k1, h1 = exact_dedup_incremental(b1, None, "doc_id", "text")
    k2, h2 = exact_dedup_incremental(b2, h1, "doc_id", "text")
    assert sorted(r["doc_id"] for r in k1.collect()) == [1, 2]
    # 10 repeats 'alpha'; 11/12 collapse (case-normalized) keeping 11
    assert sorted(r["doc_id"] for r in k2.collect()) == [11, 13]
    assert h2.count() == 4  # alpha beta gamma delta


def test_minhash_dedup_incremental(spark):
    """Fuzzy incremental dedup: near-matches of HISTORY content are
    dropped via the signature store alone (no shingle state), fresh
    content survives, and the store grows by kept signatures only."""
    from globalweather_etl_spark.operators.dedup import (
        minhash_dedup_incremental,
    )

    base = (
        "the quick brown fox jumps over the lazy dog near the quiet river "
        "while the patient heron watches from the tall reeds every morning"
    )
    other = (
        "completely different prose about distributed shuffle hash joins "
        "and adaptive query execution planning for very large clusters"
    )
    b1 = spark.createDataFrame(
        [
            (1, base),
            (2, base.replace("every morning", "each evening")),  # in-batch near-dup
            (3, other),
            (4, "too short"),
        ],
        "doc_id long, text string",
    )
    k1, h1 = minhash_dedup_incremental(
        b1, None, "doc_id", "text", n=3, num_hashes=32, bands=16, threshold=0.5
    )
    kept1 = sorted(r["doc_id"] for r in k1.collect())
    assert kept1 == [1, 3, 4]  # 2 collapsed into 1 in-batch; short doc kept
    assert sorted(r["doc"] for r in h1.collect()) == [1, 3]  # no sig for doc 4

    b2 = spark.createDataFrame(
        [
            (10, base.replace("quick", "rapid")),  # near-match of history doc 1
            (11, "entirely novel content about parquet footer statistics "
                 "pruning row groups with zone maps and bloom filters"),
            (12, "short again"),
        ],
        "doc_id long, text string",
    )
    k2, h2 = minhash_dedup_incremental(
        b2, h1, "doc_id", "text", n=3, num_hashes=32, bands=16, threshold=0.5
    )
    kept2 = sorted(r["doc_id"] for r in k2.collect())
    assert kept2 == [11, 12]
    assert sorted(r["doc"] for r in h2.collect()) == [1, 3, 11]

    # determinism
    k2b, _ = minhash_dedup_incremental(
        b2, h1, "doc_id", "text", n=3, num_hashes=32, bands=16, threshold=0.5
    )
    assert sorted(map(tuple, k2.collect())) == sorted(map(tuple, k2b.collect()))


def test_minhash_incremental_estimator_matches_python(spark):
    """The est_J gate equals the component-agreement fraction computed
    outside Spark for a known pair."""
    from globalweather_etl_spark.operators.dedup import (
        _hashed_shingles,
        _minhash_signed,
        minhash_dedup_incremental,
    )

    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    sigs = {
        r["doc"]: r["sig"]
        for r in _minhash_signed(
            _hashed_shingles(df, "doc_id", "text", 3), 32
        ).collect()
    }
    agree = sum(x == y for x, y in zip(sigs[1], sigs[2])) / 32.0

    hist_df = spark.createDataFrame([(1, a)], "doc_id long, text string")
    _, h = minhash_dedup_incremental(hist_df, None, "doc_id", "text", n=3)
    probe = spark.createDataFrame([(2, b)], "doc_id long, text string")
    for thr, expect_kept in [(agree + 0.01, True), (agree - 0.01, False)]:
        k, _ = minhash_dedup_incremental(
            probe, h, "doc_id", "text", n=3, threshold=thr
        )
        assert (k.count() == 1) == expect_kept
