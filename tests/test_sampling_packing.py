"""Sampling/split/packing contracts: reproducibility under
repartitioning, split exhaustiveness, bin-fill quality."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.functions.text import token_count
from globalweather_etl_spark.operators.packing import pack_by_budget
from globalweather_etl_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
    shuffle_deterministic,
)
from globalweather_etl_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents")


def test_sample_stable_under_repartition(docs):
    a = {r["doc_id"] for r in deterministic_sample(docs, F.col("doc_id"), 0.3).collect()}
    b = {
        r["doc_id"]
        for r in deterministic_sample(
            docs.repartition(7), F.col("doc_id"), 0.3
        ).collect()
    }
    assert a == b
    assert 0.2 < len(a) / docs.count() < 0.4


def test_sample_monotone_in_fraction(docs):
    small = {r["doc_id"] for r in deterministic_sample(docs, F.col("doc_id"), 0.1).collect()}
    big = {r["doc_id"] for r in deterministic_sample(docs, F.col("doc_id"), 0.5).collect()}
    assert small <= big  # growing the fraction only ADDS rows


def test_sample_full_fraction_keeps_everything(docs):
    """fraction=1.0 must keep 100% of rows (regression: the threshold
    used to overflow to 5 hex chars and keep ~6%)."""
    assert deterministic_sample(docs, F.col("doc_id"), 1.0).count() == docs.count()


def test_hash_split_with_zero_weight_tail(docs):
    """Cumulative weight hitting 1.0 before the last split must not
    leak rows into a zero-weight split."""
    out = hash_split(
        docs, F.col("doc_id"), {"train": 0.9, "val": 0.1, "test": 0.0}
    )
    counts = dict(
        (r["split"], r["count"]) for r in out.groupBy("split").count().collect()
    )
    assert counts.get("test", 0) == 0
    assert counts["train"] + counts.get("val", 0) == docs.count()


def test_hash_split_disjoint_exhaustive_stable(docs):
    out = hash_split(docs, F.col("doc_id"), {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = dict(
        (r["split"], r["count"]) for r in out.groupBy("split").count().collect()
    )
    assert sum(counts.values()) == docs.count()
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    again = hash_split(
        docs.repartition(5), F.col("doc_id"), {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    a = {(r["doc_id"], r["split"]) for r in out.select("doc_id", "split").collect()}
    b = {(r["doc_id"], r["split"]) for r in again.select("doc_id", "split").collect()}
    assert a == b


def test_pack_bins_fill_to_budget(docs):
    budget = 2048
    packed = pack_by_budget(docs, "doc_id", token_count(F.col("text")), budget)
    bins = packed.groupBy("bin_id").agg(
        F.sum("n_tokens").alias("tok"), F.count(F.lit(1)).alias("n")
    )
    rows = sorted((r["bin_id"], r["tok"]) for r in bins.collect())
    # every bin except the last holds >= budget - max_doc and < budget + max_doc
    max_doc = packed.agg(F.max("n_tokens")).collect()[0][0]
    for bin_id, tok in rows[:-1]:
        assert budget - max_doc <= tok < budget + max_doc
    # assignment covers every doc exactly once
    assert packed.count() == docs.count()
    assert packed.select("doc_id").distinct().count() == docs.count()


def test_pack_stable_under_partitioning(docs):
    budget = 1024
    a = pack_by_budget(docs, "doc_id", token_count(F.col("text")), budget,
                       num_partitions=3)
    b = pack_by_budget(docs.repartition(9), "doc_id", token_count(F.col("text")),
                       budget, num_partitions=11)
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb


def test_approx_stats_within_error_bounds(spark, docs):
    from globalweather_etl_spark.queries import q_docs_approx_stats

    row = q_docs_approx_stats(spark, SF_DIR).collect()[0]
    exact_distinct = docs.select("text").distinct().count()
    # Portable HLL with b=6 (m=64 registers): standard error
    # 1.04/sqrt(64) ~ 13%; assert 3 sigma.
    assert (
        abs(row["approx_distinct_docs"] - exact_distinct)
        <= 0.39 * exact_distinct
    )
    q10, q50, q90 = row["chars_p10"], row["chars_p50"], row["chars_p90"]
    assert q10 <= q50 <= q90
    lo, hi = docs.agg(F.min("n_chars"), F.max("n_chars")).collect()[0]
    assert lo <= q10 and q90 <= hi
    # Builtin HLL++ (the production fast path the portable sketch
    # mirrors semantically) keeps its tighter default-rsd bound.
    builtin = docs.agg(
        F.approx_count_distinct("text").alias("acd")
    ).collect()[0]["acd"]
    assert abs(builtin - exact_distinct) <= 0.1 * exact_distinct


def test_portable_hll_matches_python_reference(spark, docs):
    """Bit-level replica: the Spark portable HLL must equal a plain
    hashlib/float reference on the same rows (not just be 'close')."""
    import hashlib

    from globalweather_etl_spark.operators.sketches import (
        _alpha,
        hll_distinct_estimate,
    )

    b, cap = 6, 40
    m, w = 1 << b, 60 - b
    regs = [0] * m
    for (text,) in docs.select("text").collect():
        h = int(hashlib.md5(text.encode()).hexdigest()[:15], 16)
        rho = min(w + 1 - ((h >> b).bit_length() or 0), cap)
        bucket = h & (m - 1)
        regs[bucket] = max(regs[bucket], rho)
    sum_inv = sum(1.0 / (1 << r) for r in regs)
    v = regs.count(0)
    raw = _alpha(m) * m * m / sum_inv
    import math as _math

    expected = (
        m * _math.log(m / v) if (raw <= 2.5 * m and v > 0) else raw
    )
    got = hll_distinct_estimate(docs, "text", b=b, rho_cap=cap).collect()[
        0
    ][0]
    assert got == round(expected, 6)


def test_shuffle_deterministic_is_stable_permutation(docs):
    a = [r["doc_id"] for r in shuffle_deterministic(docs, F.col("doc_id")).collect()]
    b = [
        r["doc_id"]
        for r in shuffle_deterministic(docs.repartition(4), F.col("doc_id")).collect()
    ]
    assert a == b
    assert sorted(a) != a  # actually permuted
    assert len(a) == docs.count()


def test_stratified_sample_exact_quota_and_determinism(docs):
    from globalweather_etl_spark.operators.sampling import stratified_sample

    out = stratified_sample(
        docs, F.col("lang"), F.col("doc_id"), quota=10, seed=3
    ).collect()
    by_stratum: dict[str, list] = {}
    for r in out:
        by_stratum.setdefault(r["stratum"], []).append(r)
    for rows in by_stratum.values():
        assert len(rows) == 10
        assert sorted(r["rank_in_stratum"] for r in rows) == list(range(1, 11))
    # Identical keep-set under a different physical partitioning: the
    # two-phase prune may not depend on partition placement.
    again = stratified_sample(
        docs.repartition(13), F.col("lang"), F.col("doc_id"), quota=10, seed=3
    ).collect()
    assert {(r["stratum"], r["key"], r["rank_in_stratum"]) for r in again} == {
        (r["stratum"], r["key"], r["rank_in_stratum"]) for r in out
    }


def test_stratified_sample_matches_naive_single_window(docs):
    """The skew-proof two-phase prune must equal the textbook
    row_number-over-stratum form."""
    from pyspark.sql import Window

    from globalweather_etl_spark.operators.sampling import stratified_sample

    ok = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":3")))
    w = Window.partitionBy("lang").orderBy(ok, "doc_id")
    naive = {
        (r["lang"], r["doc_id"], r["rn"])
        for r in docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("lang", "doc_id", "rn")
        .collect()
    }
    two_phase = {
        (r["stratum"], r["key"], r["rank_in_stratum"])
        for r in stratified_sample(
            docs, F.col("lang"), F.col("doc_id"), quota=10, seed=3
        ).collect()
    }
    assert two_phase == naive


def test_stratified_sample_quota_exceeding_stratum_keeps_all(spark):
    from globalweather_etl_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "stratum_in string, k long"
    )
    out = stratified_sample(
        df, F.col("stratum_in"), F.col("k"), quota=100
    ).collect()
    assert len(out) == 3


def test_weighted_sample_rates_and_determinism(spark):
    from globalweather_etl_spark.operators.sampling import weighted_sample_flag

    df = spark.range(0, 20000).select(
        F.col("id"),
        # three weight bands: 0.1, 0.5, 0.9
        (F.when(F.col("id") % 3 == 0, 0.1)
         .when(F.col("id") % 3 == 1, 0.5)
         .otherwise(0.9)).alias("w"),
    )
    kept = df.filter(weighted_sample_flag(F.col("id"), F.col("w"), seed=3))
    rates = {
        r["w"]: r["n"]
        for r in kept.groupBy("w").agg(F.count("*").alias("n")).collect()
    }
    # ~6667 per band; binomial 3-sigma bounds
    assert 530 <= rates[0.1] <= 810
    assert 3150 <= rates[0.5] <= 3510
    assert 5820 <= rates[0.9] <= 6180
    # deterministic under repartition
    again = df.repartition(13).filter(
        weighted_sample_flag(F.col("id"), F.col("w"), seed=3)
    )
    assert {r["id"] for r in again.collect()} == {r["id"] for r in kept.collect()}
    # boundary weights
    allk = spark.range(5).filter(
        weighted_sample_flag(F.col("id"), F.lit(1.0))
    ).count()
    none = spark.range(5).filter(
        weighted_sample_flag(F.col("id"), F.lit(0.0))
    ).count()
    assert (allk, none) == (5, 0)


def test_weighted_sample_duckdb_parity(spark):
    import duckdb

    from globalweather_etl_spark.operators.sampling import weighted_sample_flag

    df = spark.range(0, 2000).select(
        F.col("id"), (F.col("id") % 100 / 100.0).alias("w")
    )
    got = {r["id"] for r in
           df.filter(weighted_sample_flag(F.col("id"), F.col("w"), 9)).collect()}
    con = duckdb.connect()
    want = {r[0] for r in con.execute("""
SELECT id FROM (SELECT unnest(generate_series(0, 1999)) AS id)
WHERE CAST(CAST('0x' || substring(md5(CAST(id AS VARCHAR) || ':9'), 1, 4)
      AS INTEGER) AS DOUBLE) / 65536.0 < (id % 100) / 100.0
""").fetchall()}
    assert got == want


def test_pack_partition_cols_matches_per_group_packing(spark):
    """partition_cols packing must be bit-identical to filtering each
    group out and packing it alone (the order key is group-blind)."""
    from globalweather_etl_spark.operators.packing import pack_by_budget
    from globalweather_etl_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    grouped = docs.withColumn(
        "grp",
        F.when(F.col("doc_id") % 3 == 0, "a")
        .when(F.col("doc_id") % 3 == 1, "b")
        .otherwise("c"),
    )
    one_pass = {
        (r["grp"], r["doc_id"]): (r["bin_id"], r["bin_offset"])
        for r in pack_by_budget(
            grouped, "doc_id", F.col("n_chars").cast("long"), budget=4096,
            partition_cols=["grp"],
        ).collect()
    }
    per_group = {}
    for g in ("a", "b", "c"):
        part = grouped.filter(F.col("grp") == g)
        for r in pack_by_budget(
            part, "doc_id", F.col("n_chars").cast("long"), budget=4096
        ).collect():
            per_group[(g, r["doc_id"])] = (r["bin_id"], r["bin_offset"])
    assert one_pass == per_group


def test_pack_partition_cols_bins_never_straddle_groups(spark):
    from globalweather_etl_spark.operators.packing import pack_by_budget

    rows = [(i, "x" if i < 50 else "y") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out = pack_by_budget(
        df, "doc_id", F.lit(10), budget=64, partition_cols=["grp"]
    )
    # every (grp, bin) pair's tokens fit the budget start: bin 0 of
    # each group restarts at offset 0
    firsts = (
        out.groupBy("grp", "bin_id").agg(F.min("bin_offset").alias("mn"))
        .filter(F.col("bin_id") == 0)
        .collect()
    )
    assert {r["grp"]: r["mn"] for r in firsts} == {"x": 0, "y": 0}


class TestCapPerGroup:
    def test_hand_fixture(self, spark):
        from globalweather_etl_spark.operators.sampling import cap_per_group

        rows = [(d, i) for d in ("a.com", "b.org") for i in range(5)]
        rows += [("c.net", 99)]
        df = spark.createDataFrame(
            [(g, g + ":" + str(i)) for g, i in rows], "grp string, id string"
        )
        got = sorted(
            (r["grp"], r["key"], r["rank_in_group"])
            for r in cap_per_group(
                df, F.col("grp"), F.col("id"), 2
            ).collect()
        )
        assert got == [
            ("a.com", "a.com:0", 1),
            ("a.com", "a.com:1", 2),
            ("b.org", "b.org:0", 1),
            ("b.org", "b.org:1", 2),
            ("c.net", "c.net:99", 1),
        ]

    def test_placement_independent_and_matches_naive_window(self, spark):
        """Two-phase prune == single global window, under adversarial
        repartitionings (the prune must keep a superset of the global
        top-n regardless of row placement)."""
        from pyspark.sql import Window

        from globalweather_etl_spark.operators.sampling import cap_per_group

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select(F.col("source").alias("g"), F.col("doc_id").alias("k"))
        w = Window.partitionBy("g").orderBy("k")
        want = sorted(
            (r["g"], r["k"], r["rn"])
            for r in docs.withColumn(
                "rn", F.row_number().over(w).cast("long")
            )
            .filter(F.col("rn") <= 7)
            .collect()
        )
        for part in (docs, docs.repartition(1), docs.repartition(17, "k"),
                     docs.sort(F.col("k").desc())):
            got = sorted(
                (r["grp"], r["key"], r["rank_in_group"])
                for r in cap_per_group(
                    part, F.col("g"), F.col("k"), 7
                ).collect()
            )
            assert got == want


class TestMaterializeSequences:
    def test_order_and_accounting(self, spark):
        import duckdb

        from globalweather_etl_spark.operators.packing import (
            materialize_sequences,
            pack_by_budget,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "text")
        from globalweather_etl_spark.functions.text import token_count
        from pyspark.sql import functions as F

        packed = pack_by_budget(
            docs, "doc_id", token_count(F.col("text")), budget=256
        ).join(docs, "doc_id")
        seqs = materialize_sequences(packed, "text")
        got = {
            r["bin_id"]: (r["seq_text"], r["n_docs"], r["n_tokens_total"])
            for r in seqs.collect()
        }
        assert len(got) > 1

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.001/documents.parquet')"
        )
        want = {
            r[0]: (r[1], r[2], r[3])
            for r in con.execute(
                r"""
WITH t AS (
  SELECT doc_id, text,
    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
      AS n_tokens,
    md5(CAST(doc_id AS VARCHAR)) AS ok
  FROM documents),
c AS (
  SELECT doc_id, text, n_tokens,
    COALESCE(SUM(n_tokens) OVER (ORDER BY ok, doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
  FROM t),
p AS (
  SELECT doc_id, text, n_tokens,
    CAST(prior // 256 AS BIGINT) AS bin_id,
    CAST(prior % 256 AS BIGINT) AS bin_offset
  FROM c)
SELECT bin_id,
  string_agg(text, chr(10) || chr(10) ORDER BY bin_offset) AS seq,
  count(*)::BIGINT, sum(n_tokens)::BIGINT
FROM p GROUP BY bin_id"""
            ).fetchall()
        }
        assert got == want


# ---------------------- exact-k weighted sampling (A-Res keys)


def test_weighted_exact_k_and_determinism(spark):
    from globalweather_etl_spark.operators.sampling import (
        weighted_sample_exact,
    )

    df = spark.range(500).select(
        F.col("id"), ((F.col("id") % 9) + 1).cast("double").alias("w")
    )
    a = weighted_sample_exact(df, F.col("id"), F.col("w"), k=25, seed=3)
    rows = a.collect()
    assert len(rows) == 25
    assert sorted(r["rank_in_sample"] for r in rows) == list(range(1, 26))
    assert len({r["key"] for r in rows}) == 25  # without replacement
    b = weighted_sample_exact(df, F.col("id"), F.col("w"), k=25, seed=3)
    assert {r["key"] for r in b.collect()} == {r["key"] for r in rows}


def test_weighted_exact_nonpositive_weights_never_selected(spark):
    from globalweather_etl_spark.operators.sampling import (
        weighted_sample_exact,
    )

    df = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (3, -2.0), (4, None), (5, 3.0)],
        "id long, w double",
    )
    got = {
        r["key"]
        for r in weighted_sample_exact(
            df, F.col("id"), F.col("w"), k=5
        ).collect()
    }
    assert got == {1, 5}  # only the positive-weight rows can appear


def test_weighted_exact_duckdb_twin(spark):
    from globalweather_etl_spark.operators.sampling import (
        weighted_sample_exact,
    )

    df = spark.range(300).select(
        F.col("id"), ((F.col("id") % 7) + 0.5).alias("w")
    )
    got = [
        (r["key"], r["rank_in_sample"])
        for r in weighted_sample_exact(df, F.col("id"), F.col("w"), k=20,
                                       seed=11)
        .orderBy("rank_in_sample")
        .collect()
    ]
    import duckdb as _dd

    rows = _dd.connect().execute(
        """
WITH t AS (SELECT unnest(range(300)) AS id),
s AS (
  SELECT id,
    pow((CAST('0x' || substring(md5(id || ':es:11'), 1, 12) AS BIGINT)
         + 0.5) / 281474976710656.0,
        1.0 / ((id % 7) + 0.5)) AS sc
  FROM t)
SELECT id, row_number() OVER (ORDER BY sc DESC, id) AS rk
FROM s ORDER BY sc DESC, id LIMIT 20"""
    ).fetchall()
    assert got == [(r[0], r[1]) for r in rows]


def test_weighted_exact_inclusion_tracks_weights(spark):
    """Pure-Python replication across 200 seeds: the weight-4 item of a
    {1,1,4}-weighted triple should win the k=1 draw ~4/6 of the time."""
    import hashlib

    def winner(seed):
        best = None
        for item, w in (("a", 1.0), ("b", 1.0), ("c", 4.0)):
            h = hashlib.md5(f"{item}:es:{seed}".encode()).hexdigest()[:12]
            u = (int(h, 16) + 0.5) / 16**12
            s = u ** (1.0 / w)
            if best is None or s > best[1]:
                best = (item, s)
        return best[0]

    wins = sum(1 for seed in range(200) if winner(seed) == "c")
    # E[wins] = 200 * 4/6 = 133; 4 sigma ~ 27
    assert 106 <= wins <= 160, wins
