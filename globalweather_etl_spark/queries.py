"""Driver-contract query registry: one Spark callable per implemented
operator from SURVEY.md §2 (+ north-star extensions), each paired with a
DuckDB oracle in oracles.py.

Every callable takes (spark, sf_dir) and returns a DataFrame whose
column names AND types match the oracle exactly (the driver's compare
sorts columns by name and hashes values).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from globalweather_etl_spark.functions import date_parts
from globalweather_etl_spark.functions.aggregates import exact_avg
from globalweather_etl_spark.functions.text import (
    avg_word_len,
    char_count,
    fingerprint_md5,
    lang_id,
    punct_count,
    quality_score,
    rolling_fingerprint,
    token_count,
)
from globalweather_etl_spark.multimodal import (
    byte_histogram,
    decode_image,
    media_from_documents,
    payload_digest,
)
from globalweather_etl_spark.operators.dedup import (
    exact_dedup,
    exact_dedup_keepers,
    exact_dedup_removed,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from globalweather_etl_spark.operators.similarity import (
    _as_double,
    cosine,
    cosine_topk,
    ivf_cosine_topk,
    lsh_cosine_topk,
    lsh_range_pairs,
)
from globalweather_etl_spark.operators.asof import asof_join
from globalweather_etl_spark.operators.packing import pack_by_budget
from globalweather_etl_spark.operators.resample import resample_last
from globalweather_etl_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
)
from globalweather_etl_spark.operators.surrogate_key import surrogate_key
from globalweather_etl_spark.plans import dashboard as dash
from globalweather_etl_spark.plans import pipeline as pl
from globalweather_etl_spark.sources import (
    AS_OF_DATE,
    load_table,
    weather_staging_from_events,
)
from globalweather_etl_spark.streaming.windows import (
    session_stats,
    sliding_stats,
    tumbling_stats,
)


def _warehouse(spark: SparkSession, sf_dir: str) -> pl.WeatherWarehouse:
    staging = weather_staging_from_events(load_table(spark, sf_dir, "events"))
    return pl.build_warehouse(spark, staging, AS_OF_DATE)


# ------------------------------------------------------------- weather ELT

def q_pipeline_dim_date(spark, sf_dir):
    return _warehouse(spark, sf_dir).dim_date


def q_pipeline_dim_location(spark, sf_dir):
    return _warehouse(spark, sf_dir).dim_location


def q_pipeline_dim_weather_band(spark, sf_dir):
    return _warehouse(spark, sf_dir).dim_weather_band


def q_pipeline_dim_precipitation_type(spark, sf_dir):
    return _warehouse(spark, sf_dir).dim_precipitation_type


def q_pipeline_dim_source(spark, sf_dir):
    return pl.build_dim_source(spark)


def q_pipeline_fact(spark, sf_dir):
    return _warehouse(spark, sf_dir).fact


def q_pipeline_validate_null_fk(spark, sf_dir):
    return pl.validate_null_fk(_warehouse(spark, sf_dir).fact)


def q_pipeline_validate_temp_range(spark, sf_dir):
    return pl.validate_temp_range(_warehouse(spark, sf_dir).fact)


def q_pipeline_normalized_location(spark, sf_dir):
    return _warehouse(spark, sf_dir).normalized_location


def q_pipeline_normalized_date(spark, sf_dir):
    return _warehouse(spark, sf_dir).normalized_date


def q_pipeline_normalized_weather_day(spark, sf_dir):
    return _warehouse(spark, sf_dir).normalized_weather_day


def q_dashboard_q1(spark, sf_dir):
    wh = _warehouse(spark, sf_dir)
    return dash.q1(wh.fact, wh.dim_date)


def q_dashboard_q2(spark, sf_dir):
    wh = _warehouse(spark, sf_dir)
    return dash.q2(wh.fact, wh.dim_location)


def q_dashboard_q3(spark, sf_dir):
    return dash.q3(_warehouse(spark, sf_dir).fact)


def q_dashboard_q4(spark, sf_dir):
    return dash.q4(_warehouse(spark, sf_dir).fact)


def q_dashboard_q5(spark, sf_dir):
    return dash.q5(_warehouse(spark, sf_dir).fact)


# ---------------------------------------------------------- TPC-H operators

def price_band(price: Column) -> Column:
    """CASE classification over part prices — same shape (and boundary-gap
    quirk: 950<p<951 falls to ELSE) as the reference's weather band."""
    return (
        F.when(price < 920, F.lit("Budget"))
        .when(price.between(920, 950), F.lit("Standard"))
        .when(price.between(951, 980), F.lit("Premium"))
        .otherwise(F.lit("Luxury"))
    )


def q_tpch_star_join_revenue(spark, sf_dir):
    """5-way star join (J1/J5 analogue): big⋈big shuffle join for
    lineitem⋈orders, then broadcast-hash for the dimension chain."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    revenue = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
        "decimal(25,10)"
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(customer), F.col("o_custkey") == customer["c_custkey"])
        .join(F.broadcast(nation), F.col("c_nationkey") == nation["n_nationkey"])
        .join(F.broadcast(region), F.col("n_regionkey") == region["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(revenue).cast("double"), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_tpch_q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: the canonical multi-aggregate scan — date filter
    pushed to the parquet reader, 8 aggregates in one two-phase hash
    aggregation over a tiny group space. Decimal accumulation keeps
    sums/averages bit-identical to the oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    dsum = lambda c: F.round(  # noqa: E731 - local aggregation shorthand
        F.sum(c.cast("decimal(25,10)")).cast("double"), 4
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(disc_price * (F.lit(1) + F.col("l_tax"))).alias("sum_charge"),
            exact_avg(F.col("l_quantity")).alias("avg_qty"),
            exact_avg(F.col("l_extendedprice")).alias("avg_price"),
            exact_avg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_tpch_price_band_distinct(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    return part.select(price_band(F.col("p_retailprice")).alias("PRICE_BAND")).distinct()


def q_tpch_price_band_counts(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    return (
        part.groupBy(price_band(F.col("p_retailprice")).alias("PRICE_BAND"))
        .agg(F.count(F.lit(1)).alias("N_PARTS"))
        .orderBy(F.desc("N_PARTS"))
    )


def q_tpch_topk_customers(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .groupBy("c_name")
        .agg(exact_avg(F.col("o_totalprice")).alias("AVG_ORDER_VALUE"))
        .orderBy(F.desc("AVG_ORDER_VALUE"), F.asc("c_name"))
        .limit(15)
    )


def q_tpch_order_date_parts(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    parts = date_parts(d)
    return orders.select(
        d.alias("ORDER_DATE"),
        parts["YEAR"].alias("YEAR"),
        parts["MONTH"].alias("MONTH"),
        parts["DAY"].alias("DAY"),
        parts["DAY_OF_WEEK"].alias("DAY_OF_WEEK"),
        parts["WEEK_OF_YEAR"].alias("WEEK_OF_YEAR"),
        F.dayofyear(d).cast("int").alias("DAY_OF_YEAR"),
    ).distinct()


def q_tpch_events_lag_delta(spark, sf_dir):
    """W2 analogue: LAG delta per user ordered by time (event_id
    tiebreak makes the ordering total -> deterministic)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("VALUE_DELTA"),
    )


def q_tpch_events_rolling_sum(spark, sf_dir):
    """W3 analogue: trailing 7-ROW sum per user (decimal-exact)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-6, 0)
    return events.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.round(
            F.sum(F.col("value").cast("decimal(25,10)")).over(w).cast("double"), 9
        ).alias("VALUE_7ROW_SUM"),
    )


def q_tpch_events_window_suite(spark, sf_dir):
    """Window-function coverage beyond the reference's three shapes:
    LEAD, RANK, and a time-based RANGE frame (trailing 1 hour by event
    time — observations-independent, unlike the 7-ROW frame). The RANGE
    frame orders by unix microseconds so Spark's numeric rangeBetween
    and the oracle's numeric RANGE bound are identical."""
    events = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_rank = Window.partitionBy("user_id").orderBy(F.desc("value"))
    w_hour = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lead("value").over(w_seq).alias("NEXT_VALUE"),
        F.rank().over(w_rank).cast("long").alias("VALUE_RANK"),
        F.round(
            F.sum(F.col("value").cast("decimal(25,10)")).over(w_hour).cast("double"),
            9,
        ).alias("VALUE_1H_SUM"),
    )


def q_tpch_surrogate_key(spark, sf_dir):
    """W1 analogue via the SCALABLE two-pass strategy — proves the
    distributed surrogate key is bit-identical to ROW_NUMBER."""
    customer = load_table(spark, sf_dir, "customer")
    distinct = customer.select("c_mktsegment", "c_nationkey").distinct()
    return surrogate_key(
        distinct,
        order_cols=["c_mktsegment", "c_nationkey"],
        key_col="SEGMENT_KEY",
        strategy="distributed",
        num_partitions=8,
    ).select("SEGMENT_KEY", "c_mktsegment", "c_nationkey")


def q_tpch_set_ops(spark, sf_dir):
    """Set operators (INTERSECT / EXCEPT semantics): customers holding
    both an urgent and a low-priority order, minus any with an 'F'
    status order — one count at the end keeps the oracle tiny."""
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    failed = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    both = urgent.intersect(low).subtract(failed)
    return both.agg(F.count(F.lit(1)).alias("n_customers"))


def q_tpch_pivot_status(spark, sf_dir):
    """PIVOT: order counts by priority x status as columns. Spark plans
    a single aggregation with conditional counts — mirrored in the
    oracle by FILTER aggregates."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("n_f"),
            F.coalesce("O", F.lit(0)).alias("n_o"),
            F.coalesce("P", F.lit(0)).alias("n_p"),
        )
        .orderBy("o_orderpriority")
    )


def q_tpch_rollup_counts(spark, sf_dir):
    """ROLLUP (hierarchical grouping sets): order counts by
    (priority, orderstatus), per-priority subtotals, and a grand total
    in one pass — Spark expands grouping sets map-side into a single
    aggregation, no N-pass union."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderpriority", "o_orderstatus").agg(
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def q_tpch_distinct_agg(spark, sf_dir):
    """Distinct aggregates: suppliers and parts per order priority."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("o_orderpriority")
    )


def q_tpch_outer_join_coverage(spark, sf_dir):
    """Full-outer join (beyond the reference's inner-only surface):
    customers without orders vs. orphan orders, in one pass."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    j = customer.join(
        orders, customer["c_custkey"] == orders["o_custkey"], "full_outer"
    )
    return j.agg(
        F.count_if(F.col("o_orderkey").isNull()).alias("customers_without_orders"),
        F.count_if(F.col("c_custkey").isNull()).alias("orphan_orders"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q_tpch_countif_ratio(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            (
                F.count_if(F.col("o_totalprice") > 250000)
                * F.lit(100.0)
                / F.count(F.lit(1))
            ).alias("PCT_HIGH_VALUE")
        )
        .orderBy("o_orderpriority")
    )


def q_tpch_global_validation(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("N_ROWS"),
        F.min("l_quantity").alias("MIN_QTY"),
        F.max("l_quantity").alias("MAX_QTY"),
        F.min("l_extendedprice").alias("MIN_PRICE"),
        F.max("l_extendedprice").alias("MAX_PRICE"),
    )


def q_tpch_constant_join(spark, sf_dir):
    """S4 + J4 analogue: FROM-less constant row, constant-key join."""
    orders = load_table(spark, sf_dir, "orders")
    src = spark.range(1).select(
        F.lit(1).alias("SOURCE_KEY"), F.lit("Weather Source LLC").alias("PROVIDER")
    )
    return (
        orders.crossJoin(F.broadcast(src))
        .groupBy("PROVIDER")
        .agg(F.count(F.lit(1)).alias("N_ORDERS"))
    )


# -------------------------------------- event-time windows (streaming kin)
# Same builders serve readStream inputs (globalweather_etl_spark.streaming);
# run here in batch so the window SEMANTICS are DuckDB-oracle-checkable,
# while tests/test_streaming.py separately proves batch==stream parity.

def q_events_tumbling_daily(spark, sf_dir):
    return tumbling_stats(load_table(spark, sf_dir, "events"), "1 day")


def q_events_sliding_day_12h(spark, sf_dir):
    return sliding_stats(load_table(spark, sf_dir, "events"), "1 day", "12 hours")


def q_events_session_30m(spark, sf_dir):
    return session_stats(load_table(spark, sf_dir, "events"), "30 minutes")


def q_events_asof_last_signup(spark, sf_dir):
    """As-of join: each click event annotated with the user's most
    recent signup event at or before it (NULL when none precedes)."""
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    signups = events.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("ts").alias("signup_ts"),
        F.col("value").alias("signup_value"),
    )
    return asof_join(
        clicks, signups, ["user_id"], "ts", "signup_ts",
        ["signup_ts", "signup_value"],
    )


def q_events_resample_hourly(spark, sf_dir):
    """Hourly forward-filled grid per user (sequence+explode grid
    composed with the as-of join — no custom code, one shuffle)."""
    events = load_table(spark, sf_dir, "events")
    return resample_last(
        events.select("user_id", "ts", "value"),
        by=["user_id"], ts_col="ts", value_cols=["ts", "value"],
        interval="1 hour",
    )


def q_events_interval_join(spark, sf_dir):
    """Interval (range) join: clicks paired with same-user signups in
    the trailing hour — the batch form of the watermark-bounded
    stream-stream join (parity in test_streaming.py)."""
    from globalweather_etl_spark.streaming import clicks_with_recent_signup

    events = load_table(spark, sf_dir, "events")
    return clicks_with_recent_signup(
        events.filter(F.col("event_type") == "click"),
        events.filter(F.col("event_type") == "signup"),
        within="1 hour",
    )


def q_events_daily_band_counts(spark, sf_dir):
    """The streaming dashboard job's exact body, run in batch for the
    oracle (stream==batch parity is tested in test_streaming.py)."""
    from globalweather_etl_spark.streaming import daily_weather_band_counts

    return daily_weather_band_counts(load_table(spark, sf_dir, "events"))


# ------------------------------------------- dedup / text / similarity

def q_docs_exact_dedup_keepers(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup_keepers(docs, "doc_id", "text")


def q_docs_exact_dedup(spark, sf_dir):
    """The deduplicated corpus itself — LEFT SEMI join against keepers."""
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs, "doc_id", "text").select("doc_id", "lang", "n_chars")


def q_docs_exact_dedup_removed(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup_removed(docs, "doc_id", "text").select("doc_id")


def q_docs_token_stats(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        token_count(t).alias("n_tokens"),
        char_count(t).alias("n_chars_measured"),
        punct_count(t).alias("n_punct"),
        avg_word_len(t).alias("avg_word_len"),
    )


def q_docs_lang_stats(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
        )
        .orderBy("lang")
    )


def q_docs_lang_id(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        lang_id(F.col("text")).alias("detected_lang"),
    )


def q_docs_stopword_scores(spark, sf_dir):
    """Per-language stopword hit counts — the raw signal behind lang_id."""
    from globalweather_etl_spark.functions.text import stopword_score

    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        stopword_score(t, "en").alias("sw_en"),
        stopword_score(t, "de").alias("sw_de"),
        stopword_score(t, "fr").alias("sw_fr"),
        stopword_score(t, "es").alias("sw_es"),
    )


def q_docs_approx_stats(spark, sf_dir):
    """Rows-only: sketch aggregates (HyperLogLog++ distinct count,
    quantile sketch) — the O(1)-memory corpus statistics a 100 TB
    pipeline runs instead of exact distinct/percentile. Error bounds
    versus exact values are asserted in test_sampling_packing.py;
    sketches have no cross-engine twin (DuckDB's HLL differs)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.approx_count_distinct(fingerprint_md5(F.col("text"))).alias(
            "approx_distinct_docs"
        ),
        F.percentile_approx("n_chars", [0.1, 0.5, 0.9], 10000).alias(
            "chars_quantiles"
        ),
        F.count(F.lit(1)).alias("n_docs"),
    )


def q_docs_quality_score(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.round(quality_score(F.col("text")), 9).alias("quality"),
    )


def q_docs_rolling_fingerprint(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", rolling_fingerprint(F.col("text")).alias("fingerprint")
    )


def q_docs_ngram_jaccard(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)


def q_docs_minhash_lsh(spark, sf_dir):
    """Full cross-engine-checkable MinHash+LSH: hash_fn="md5" derives
    shingle ids AND band keys from md5 prefixes, which DuckDB computes
    bit-identically — so signatures, banding, candidate pairs, and the
    exact-Jaccard verification all hash-match the oracle (previously a
    rows-only check). Precision is exact because candidates are verified
    with true Jaccard — recall is the LSH S-curve."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, num_hashes=32, bands=8, threshold=0.5,
        hash_fn="md5",
    )


def q_docs_simhash(spark, sf_dir):
    """Rows-only check (xxhash64-based fingerprints)."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_pairs(docs, "doc_id", "text", n=3, max_hamming=3)


def q_emb_cosine_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return cosine_topk(emb, queries, k=5)


def q_emb_lsh_range_search(spark, sf_dir):
    """Rows-only: LSH-bucketed range search — the at-scale path for
    q_emb_range_search (whose brute all-pairs form stays as the exact
    oracle baseline). Precision exact via verification; recall floors
    are pinned in test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_range_pairs(emb, threshold=0.4, dim=64, num_planes=4, num_tables=6)


def q_emb_range_search(spark, sf_dir):
    """Similarity range 'join': all pairs with cosine >= 0.4 — this
    brute-force form is the exact oracle baseline; the LSH-bucketed
    variant (q_emb_lsh_range_search) is the at-scale path."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    a = e.alias("a")
    b = e.alias("b")
    cos = cosine(F.col("a.v"), F.col("b.v"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.4)
    )


def q_emb_ivf_topk(spark, sf_dir):
    """Rows-only: IVF coarse-quantizer ANN with one distributed Lloyd
    refinement (recall vs brute force asserted in test_similarity)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ivf_cosine_topk(
        emb, queries, k=5, n_lists=16, n_probe=4, refine_iters=1
    )


def q_emb_lsh_topk(spark, sf_dir):
    """Rows-only check: LSH-bucketed ANN (deterministic hyperplanes)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return lsh_cosine_topk(emb, queries, k=5, dim=64, num_planes=8)


# ------------------------------------------- sampling / splits / packing

def q_docs_deterministic_sample(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return deterministic_sample(docs, F.col("doc_id"), 0.25, seed=7).select(
        "doc_id", "lang"
    )


def q_docs_hash_split(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return hash_split(
        docs, F.col("doc_id"), {"train": 0.8, "val": 0.1, "test": 0.1}, seed=7
    ).select("doc_id", "split")


def q_docs_pack_by_budget(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return pack_by_budget(docs, "doc_id", token_count(F.col("text")), budget=2048)


# --------------------------------------------------- multimodal columns

def _media(spark, sf_dir):
    return media_from_documents(load_table(spark, sf_dir, "documents"))


def q_media_metadata_stats(spark, sf_dir):
    """Metadata-only scan: answers about the corpus without reading
    payload bytes (column pruning keeps the binary column untouched)."""
    m = _media(spark, sf_dir)
    return m.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        F.sum(F.col("metadata.width")).alias("sum_width"),
        F.sum(F.col("metadata.n_frames")).alias("sum_frames"),
    )


def q_media_payload_digest(spark, sf_dir):
    return payload_digest(_media(spark, sf_dir))


def q_media_byte_histogram(spark, sf_dir):
    """Arrow-batched mapInPandas feature extraction; oracle-checkable
    because the synthesized corpus is ASCII (bytes == codepoints)."""
    return byte_histogram(_media(spark, sf_dir), bins=16)


def q_media_decode_image(spark, sf_dir):
    """Rows-only: the (stubbed) decode path — schema/batch plumbing is
    real, codec is the deterministic fake (no PIL in container)."""
    return decode_image(_media(spark, sf_dir), fake=True)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "pipeline_dim_date": q_pipeline_dim_date,
    "pipeline_dim_location": q_pipeline_dim_location,
    "pipeline_dim_weather_band": q_pipeline_dim_weather_band,
    "pipeline_dim_precipitation_type": q_pipeline_dim_precipitation_type,
    "pipeline_dim_source": q_pipeline_dim_source,
    "pipeline_fact": q_pipeline_fact,
    "pipeline_validate_null_fk": q_pipeline_validate_null_fk,
    "pipeline_validate_temp_range": q_pipeline_validate_temp_range,
    "pipeline_normalized_location": q_pipeline_normalized_location,
    "pipeline_normalized_date": q_pipeline_normalized_date,
    "pipeline_normalized_weather_day": q_pipeline_normalized_weather_day,
    "dashboard_q1": q_dashboard_q1,
    "dashboard_q2": q_dashboard_q2,
    "dashboard_q3": q_dashboard_q3,
    "dashboard_q4": q_dashboard_q4,
    "dashboard_q5": q_dashboard_q5,
    "tpch_star_join_revenue": q_tpch_star_join_revenue,
    "tpch_q1_pricing_summary": q_tpch_q1_pricing_summary,
    "tpch_price_band_distinct": q_tpch_price_band_distinct,
    "tpch_price_band_counts": q_tpch_price_band_counts,
    "tpch_topk_customers": q_tpch_topk_customers,
    "tpch_order_date_parts": q_tpch_order_date_parts,
    "tpch_events_lag_delta": q_tpch_events_lag_delta,
    "tpch_events_rolling_sum": q_tpch_events_rolling_sum,
    "tpch_events_window_suite": q_tpch_events_window_suite,
    "tpch_surrogate_key": q_tpch_surrogate_key,
    "tpch_set_ops": q_tpch_set_ops,
    "tpch_pivot_status": q_tpch_pivot_status,
    "tpch_rollup_counts": q_tpch_rollup_counts,
    "tpch_distinct_agg": q_tpch_distinct_agg,
    "tpch_outer_join_coverage": q_tpch_outer_join_coverage,
    "tpch_countif_ratio": q_tpch_countif_ratio,
    "tpch_global_validation": q_tpch_global_validation,
    "tpch_constant_join": q_tpch_constant_join,
    "events_tumbling_daily": q_events_tumbling_daily,
    "events_sliding_day_12h": q_events_sliding_day_12h,
    "events_session_30m": q_events_session_30m,
    "events_daily_band_counts": q_events_daily_band_counts,
    "events_asof_last_signup": q_events_asof_last_signup,
    "events_resample_hourly": q_events_resample_hourly,
    "events_interval_join": q_events_interval_join,
    "docs_exact_dedup_keepers": q_docs_exact_dedup_keepers,
    "docs_exact_dedup": q_docs_exact_dedup,
    "docs_exact_dedup_removed": q_docs_exact_dedup_removed,
    "docs_token_stats": q_docs_token_stats,
    "docs_lang_stats": q_docs_lang_stats,
    "docs_lang_id": q_docs_lang_id,
    "docs_deterministic_sample": q_docs_deterministic_sample,
    "docs_hash_split": q_docs_hash_split,
    "docs_pack_by_budget": q_docs_pack_by_budget,
    "docs_stopword_scores": q_docs_stopword_scores,
    "docs_quality_score": q_docs_quality_score,
    "docs_approx_stats": q_docs_approx_stats,
    "docs_rolling_fingerprint": q_docs_rolling_fingerprint,
    "docs_ngram_jaccard": q_docs_ngram_jaccard,
    "docs_minhash_lsh": q_docs_minhash_lsh,
    "docs_simhash": q_docs_simhash,
    "media_metadata_stats": q_media_metadata_stats,
    "media_payload_digest": q_media_payload_digest,
    "media_byte_histogram": q_media_byte_histogram,
    "media_decode_image": q_media_decode_image,
    "emb_cosine_topk": q_emb_cosine_topk,
    "emb_range_search": q_emb_range_search,
    "emb_lsh_range_search": q_emb_lsh_range_search,
    "emb_lsh_topk": q_emb_lsh_topk,
    "emb_ivf_topk": q_emb_ivf_topk,
}
