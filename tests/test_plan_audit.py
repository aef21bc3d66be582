"""Registry-wide physical-plan audit.

Every one of the 50 registered queries is built (lazily, sf0.001 — no
execution) and its physical plan is scanned for the three anti-patterns
that silently destroy a 100 TB run:

- ``CartesianProduct``: an unbroadcast all-pairs join. Never acceptable;
  even the O(n^2) oracle-baseline range search keeps its small side
  broadcast.
- ``BatchEvalPython``: a row-at-a-time Python UDF in the plan. The only
  sanctioned Python execution is Arrow-batched (``ArrowEvalPython`` /
  ``MapInPandas`` / ``FlatMapGroupsInPandas``).
- ``BroadcastNestedLoopJoin`` outside the explicit allowlist below.
  A BNLJ is the *right* plan when the broadcast side is O(1) rows
  (constant-source joins, 1-row validation scalars) or a deliberately
  small broadcast-query/centroid matrix (exact-ANN baselines). It is a
  catastrophe when Spark falls back to it for a big x big theta join —
  this test makes any new occurrence a loud failure instead of a quiet
  100x regression.

The allowlist documents WHY each entry is safe, so a reviewer can audit
the exceptions in one place.
"""

from __future__ import annotations

import pytest

from globalweather_etl_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"

# Queries whose plans legitimately contain BroadcastNestedLoopJoin,
# with the broadcast side and why it is O(small).
BNLJ_ALLOWED: dict[str, str] = {
    # The DIM_SOURCE constant-key join (SURVEY J4, ETL:120): the
    # broadcast side is the literal 1-row constant source.
    "pipeline_fact": "1-row constant DIM_SOURCE join",
    "dashboard_q1": "1-row constant DIM_SOURCE join (via fact)",
    "dashboard_q2": "1-row constant DIM_SOURCE join (via fact)",
    "dashboard_q3": "1-row constant DIM_SOURCE join (via fact)",
    "dashboard_q4": "1-row constant DIM_SOURCE join (via fact)",
    "dashboard_q5": "1-row constant DIM_SOURCE join (via fact)",
    # Two global 1-row aggregates stitched side by side.
    "pipeline_validation": "joins two 1-row validation aggregates",
    # The histogram quantile threshold (operators/quantiles.py) is a
    # 1-row frame cross-joined broadcast onto every doc.
    "docs_sample_split": "1-row quantile-threshold broadcast cross join",
    "tpch_scalar_checks": "joins 1-row global-aggregate scalars",
    # 1-row portable-HLL estimate x 1-row quantile/count aggregate.
    "docs_approx_stats": "joins two 1-row sketch aggregates",
    # Exact-ANN baselines: corpus x broadcast(query-set). The query set
    # is dimension-sized by contract (limit-guarded in similarity.py).
    "emb_cosine_topk": "corpus x broadcast small query set (exact baseline)",
    # BM25's lazy index: term-df aggregate x broadcast of the 1-row
    # (n_docs, avgdl) corpus aggregate (bm25_index round-4 rewrite).
    "docs_rolling_fingerprint": "1-row corpus-stats broadcast (bm25_index)",
    # The bigram LM's lazy vocab size: transition chain x broadcast of
    # the 1-row (v) aggregate (operators/lm.py bigram_lm_score).
    "docs_text_metrics": "1-row LM vocab-size broadcast cross join",
    # IVF assignment: corpus x broadcast(n_lists x dim centroid matrix).
    "emb_ivf_topk": "corpus x broadcast centroid matrix (n_lists rows)",
}

FORBIDDEN_ALWAYS = ("CartesianProduct", "BatchEvalPython")


def _formatted_plan(spark, df) -> str:
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_scale_antipatterns(spark, name):
    plan = _formatted_plan(spark, QUERIES[name](spark, SF_DIR))
    for pat in FORBIDDEN_ALWAYS:
        assert pat not in plan, (
            f"{name}: {pat} in physical plan — this is a scale-killer "
            f"(unbroadcast all-pairs join or row-at-a-time Python UDF)"
        )
    if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWED:
        pytest.fail(
            f"{name}: BroadcastNestedLoopJoin appeared in a query not on "
            f"the audited allowlist — verify the broadcast side is O(1)/"
            f"dimension-sized and add it to BNLJ_ALLOWED with a reason, "
            f"or fix the join"
        )


def test_bnlj_allowlist_is_tight(spark):
    """Every allowlist entry must still be needed — a stale entry would
    quietly re-admit a future BNLJ regression for that query."""
    stale = []
    for name in BNLJ_ALLOWED:
        plan = _formatted_plan(spark, QUERIES[name](spark, SF_DIR))
        if "BroadcastNestedLoopJoin" not in plan:
            stale.append(name)
    assert not stale, f"allowlist entries no longer exhibit BNLJ: {stale}"


# --- round-3 non-registry surfaces: same anti-pattern gate -----------


def _extension_plans(spark):
    """Physical plans of the round-3 composition surfaces that aren't
    registry queries: curation pipeline stages, corpus report, mixing,
    quantization. Lazy builds, no execution."""
    from pyspark.sql import functions as F

    from globalweather_etl_spark.operators.mixing import mix_corpora
    from globalweather_etl_spark.operators.quantize import (
        dequantize_embeddings,
        quantize_embeddings,
    )
    from globalweather_etl_spark.plans.curation import (
        corpus_report,
        curate_documents,
    )
    from globalweather_etl_spark.sources import load_table

    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    res = curate_documents(
        docs, benchmark=docs.filter(F.col("doc_id") % 7 == 0)
    )
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    return {
        "curation_curated": res.curated,
        "curation_decontaminated": res.decontaminated,
        "corpus_report": corpus_report(docs),
        "mix_corpora": mix_corpora(
            {"x": (a, 1.0), "y": (b, 1.0)}, F.col("doc_id"), total_rows=100
        ),
        "quantize_roundtrip": dequantize_embeddings(
            quantize_embeddings(emb, "embedding"), "embedding"
        ),
    }


def test_extension_surfaces_no_scale_antipatterns(spark):
    failures = []
    for name, df in _extension_plans(spark).items():
        plan = _formatted_plan(spark, df)
        for pat in FORBIDDEN_ALWAYS:
            if pat in plan:
                failures.append(f"{name}: {pat}")
        # corpus_report joins two 1-row aggregates -> BNLJ is fine
        # there; everything else must not BNLJ.
        if "BroadcastNestedLoopJoin" in plan and name != "corpus_report":
            failures.append(f"{name}: BroadcastNestedLoopJoin")
    assert not failures, failures


# --- round-5 non-registry surfaces: same anti-pattern gate -----------


def _round5_plans(spark):
    """Lazy physical plans of the round-5 operator surfaces that are
    not registry queries: fuzzy join / entity resolution, transitions,
    co-occurrence, profiling, TWAP, exact weighted sampling, PQ
    encode, semantic decontamination, grouped HLL."""
    import numpy as np
    from pyspark.sql import functions as F

    from globalweather_etl_spark.operators.fuzzy_join import (
        fuzzy_join,
        fuzzy_self_pairs,
    )
    from globalweather_etl_spark.operators.paths import (
        cooccurrence,
        transition_matrix,
    )
    from globalweather_etl_spark.operators.pq import encode_pq
    from globalweather_etl_spark.operators.profile import column_profile
    from globalweather_etl_spark.operators.resample import (
        time_weighted_avg,
    )
    from globalweather_etl_spark.operators.sampling import (
        weighted_sample_exact,
    )
    from globalweather_etl_spark.operators.semantic_decon import (
        semantic_decontaminate,
    )
    from globalweather_etl_spark.operators.sketches import hll_distinct_by
    from globalweather_etl_spark.sources import load_table

    part = load_table(spark, SF_DIR, "part")
    events = load_table(spark, SF_DIR, "events")
    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    books = np.zeros((8, 4, 8))
    return {
        "fuzzy_self_pairs": fuzzy_self_pairs(part, "p_name", 1),
        "fuzzy_join_two_table": fuzzy_join(
            part, part, "p_name", "p_brand", 1
        ),
        "transition_matrix": transition_matrix(events),
        "cooccurrence": cooccurrence(events),
        "column_profile": column_profile(docs),
        "time_weighted_avg": time_weighted_avg(
            events, ["user_id"], "ts", "value"
        ),
        "weighted_sample_exact": weighted_sample_exact(
            docs, F.col("doc_id"), F.col("n_chars").cast("double"), k=10
        ),
        "pq_encode": encode_pq(emb, books),
        "semantic_decon": semantic_decontaminate(
            emb, emb.limit(3), eps=0.9
        ),
        "hll_distinct_by": hll_distinct_by(docs, ["lang"], "text"),
    }


def test_round5_surfaces_no_scale_antipatterns(spark):
    failures = []
    for name, df in _round5_plans(spark).items():
        plan = _formatted_plan(spark, df)
        for pat in FORBIDDEN_ALWAYS:
            if pat in plan:
                failures.append(f"{name}: {pat}")
        # cooccurrence/TWAP-style 1-row total cross joins are BNLJ by
        # construction (broadcast side is ONE row); everything else
        # must not BNLJ.
        if "BroadcastNestedLoopJoin" in plan and name not in (
            "cooccurrence",
        ):
            failures.append(f"{name}: BroadcastNestedLoopJoin")
    assert not failures, failures


# --- round-6/7 non-registry surfaces: same anti-pattern gate ----------


def _round67_plans(spark, tmp_path):
    """Lazy physical plans of the round-6/7 surfaces that aren't
    registry queries: the lakehouse read paths (zone-map range/box
    reads, Bloom+zone-map point lookups, DV-applied scans, CDC feeds),
    the HTML-aware curation entry, and the quality classifier's
    featurization/scoring.

    The lakehouse plans need a COMMITTED table, so a tiny (64-row)
    setup executes first; the audited frames — the read paths a 100 TB
    consumer runs — stay lazy. The write-side interiors (write_zordered
    pre-aggregate, build_stats, apply_batch_cdc's fold) execute during
    setup of this gate and of the registry slots that grade them
    (tpch_scalar_checks zb_*, events_daily_band_counts), so a
    scale-killer there still fails the suite at build time; this gate
    pins the read-back plans."""
    import numpy as np
    from pyspark.sql import Row, functions as F

    from globalweather_etl_spark.functions.html import (
        strip_html,
        visible_text_ratio,
    )
    from globalweather_etl_spark.operators.quality_classifier import (
        QualityModel,
        hashed_features,
        score_quality,
    )
    from globalweather_etl_spark.plans.curation import curate_documents
    from globalweather_etl_spark.sources import load_table
    from globalweather_etl_spark.sources.snapshots import SnapshotTable

    docs = load_table(spark, SF_DIR, "documents")
    st = SnapshotTable(spark, str(tmp_path) + "/gate")
    st.write_zordered(
        spark.createDataFrame(
            [Row(k=i, d=i % 8, v=float(i)) for i in range(64)]
        ),
        zorder_by=["k", "d"],
        n_files=4,
        mode="overwrite",
    )
    st.build_stats(cols=["k", "d"])
    st.build_file_index("k")
    v_del = st.delete_where("k = 7")["version"]
    st.build_stats(cols=["k", "d"])  # re-pin stats to the DV'd head
    v_app = st.write(
        spark.createDataFrame([Row(k=100, d=0, v=1.0)]), mode="append"
    )
    model = QualityModel(
        weights=np.zeros(64), bias=0.0, dim=64, ngrams=2, hash_fn="md5"
    )
    return {
        "zm_read_range": st.read_range("k", 3, 9),
        "zm_read_box": st.read_box([("k", 3, 9), ("d", 1, 3)]),
        "bloom_zm_point_lookup": st.read_where("k", 5),
        "dv_applied_read": st.read(version=v_del),
        # read_since needs an append-only window (refuses the delete)
        "cdc_read_since": st.read_since(v_del, version=v_app),
        "cdc_read_changes": st.read_changes(1, keys=["k"]),
        "html_strip": docs.select(
            strip_html(F.col("text")).alias("t"),
            visible_text_ratio(F.col("text")).alias("r"),
        ),
        "html_curation": curate_documents(
            docs, html_input=True, persist=False
        ).curated,
        "qc_featurize": hashed_features(
            docs, "doc_id", "text", dim=64, hash_fn="md5"
        ),
        "qc_score": score_quality(docs, model, "text"),
        "sequence_match": _seq_plan(spark),
    }


def _seq_plan(spark):
    from globalweather_etl_spark.operators.sequence_match import (
        compile_steps,
        encode_sequences,
        match_pattern,
    )
    from globalweather_etl_spark.sources import load_table

    al = {"view": "v", "click": "c", "purchase": "p",
          "signup": "s", "error": "e"}
    enc = encode_sequences(
        load_table(spark, SF_DIR, "events"),
        ["user_id"], ["ts", "event_id"], "event_type", al,
    )
    return match_pattern(
        enc, compile_steps(["view+", "click", "purchase"], al)
    )


def test_round67_surfaces_no_scale_antipatterns(spark, tmp_path):
    failures = []
    for name, df in _round67_plans(spark, tmp_path).items():
        plan = _formatted_plan(spark, df)
        for pat in FORBIDDEN_ALWAYS:
            if pat in plan:
                failures.append(f"{name}: {pat}")
        if "BroadcastNestedLoopJoin" in plan:
            failures.append(f"{name}: BroadcastNestedLoopJoin")
    assert not failures, failures
