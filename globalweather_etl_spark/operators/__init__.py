from globalweather_etl_spark.operators.dedup import (
    decontaminate,
    fuzzy_decontaminate,
    exact_dedup,
    exact_dedup_incremental,
    exact_dedup_keepers,
    exact_dedup_removed,
    minhash_dedup_incremental,
    minhash_lsh_pairs,
    ngram_containment_pairs,
    ngram_jaccard_pairs,
    ngram_overlap_pairs,
    simhash64,
    simhash_fingerprints,
    simhash_pairs,
)
from globalweather_etl_spark.operators.dsir import (
    dsir_grams,
    dsir_log_ratios,
    dsir_resample_topk,
    dsir_score,
    dsir_score_expr,
)
from globalweather_etl_spark.operators.geo import (
    haversine_km,
    planar_knn_join,
    planar_knn_join_complete,
    planar_point_in_polygon_join,
    sphere_point_in_polygon_join,
    planar_radius_join,
    sphere_knn_join_km,
    sphere_radius_join_km,
)
from globalweather_etl_spark.operators.timeseries import (
    holt_winters,
    series_monitor,
    series_monitor_big,
)
from globalweather_etl_spark.operators.anomaly import (
    array_median,
    rolling_anomalies,
)
from globalweather_etl_spark.operators.asof import asof_join
from globalweather_etl_spark.operators.bloom import (
    bloom_build,
    bloom_merge,
    bloom_probe,
    empty_bloom,
    exact_dedup_incremental_bloom,
)
from globalweather_etl_spark.operators.bm25 import bm25_index, bm25_topk, rrf_fuse
from globalweather_etl_spark.operators.bpe import bpe_encode, bpe_vocab, learn_bpe
from globalweather_etl_spark.operators.chunking import chunk_documents
from globalweather_etl_spark.operators.components import (
    connected_components,
    neardup_clusters,
)
from globalweather_etl_spark.operators.funnel import funnel
from globalweather_etl_spark.operators.fuzzy_join import (
    fuzzy_join,
    fuzzy_self_pairs,
    resolve_entities,
)
from globalweather_etl_spark.operators.paths import (
    cooccurrence,
    session_rollup,
    session_transitions,
    transition_matrix,
)
from globalweather_etl_spark.operators.pq import (
    decode_pq,
    encode_pq,
    ivfpq_encode_portable,
    ivfpq_topk,
    pq_topk,
    train_pq,
)
from globalweather_etl_spark.operators.expectations import (
    ExpectationSuite,
    expect_between,
    expect_completeness,
    expect_fk,
    expect_in_set,
    expect_matches,
    expect_not_null,
    expect_row_count,
    expect_unique,
)
from globalweather_etl_spark.operators.pagerank import (
    pagerank,
    pagerank_exact,
)
from globalweather_etl_spark.operators.paths import session_paths, top_paths
from globalweather_etl_spark.operators.semantic_decon import (
    semantic_decontaminate,
)
from globalweather_etl_spark.operators.semdedup import (
    semdedup,
    semdedup_exact,
)
from globalweather_etl_spark.operators.skew_report import (
    key_skew_report,
    skew_summary,
)
from globalweather_etl_spark.operators.sketches import (
    cms_estimate,
    count_min_sketch,
    hll_distinct_by,
    hll_distinct_estimate,
    hll_estimate_from_registers,
    hll_merge,
    hll_registers,
)
from globalweather_etl_spark.operators.table_diff import (
    apply_diff,
    diff_summary,
    table_diff,
)
from globalweather_etl_spark.operators.tfidf import hashed_tfidf, idf_table
from globalweather_etl_spark.operators.ivm import (
    IncrementalAggregate,
    Measure,
)
from globalweather_etl_spark.operators.kmeans import (
    assign_clusters,
    cluster_sizes,
    fit_kmeans,
    kmeans_exact,
    portable_centroids,
)
from globalweather_etl_spark.operators.layout import (
    file_ranges,
    files_for_range,
    write_range_clustered,
    zorder_key,
)
from globalweather_etl_spark.operators.lm import (
    BigramLM,
    bigram_lm_score,
    train_bigram_lm,
)
from globalweather_etl_spark.operators.line_dedup import (
    dedup_lines,
    dedup_lines_within,
    line_doc_freq,
)
from globalweather_etl_spark.operators.mixing import mix_corpora
from globalweather_etl_spark.operators.packing import (
    materialize_sequences,
    pack_by_budget,
)
from globalweather_etl_spark.operators.partitioning import spread_for_compute
from globalweather_etl_spark.operators.profile import column_profile
from globalweather_etl_spark.operators.quantiles import (
    bucketed_quantile_threshold,
    quantile_keep_flag,
)
from globalweather_etl_spark.operators.quantize import (
    dequantize_embeddings,
    quantize_embeddings,
)
from globalweather_etl_spark.operators.repetition import top_ngram_stats
from globalweather_etl_spark.operators.retention import retention_cohorts
from globalweather_etl_spark.operators.resample import (
    resample_interpolate,
    resample_last,
    time_weighted_avg,
)
from globalweather_etl_spark.operators.sampling import (
    cap_per_group,
    deterministic_sample,
    hash_split,
    shuffle_deterministic,
    stratified_sample,
    weighted_sample_exact,
    weighted_sample_flag,
)
from globalweather_etl_spark.operators.scd import apply_scd2
from globalweather_etl_spark.operators.sequence_match import (
    compile_steps,
    encode_sequences,
    match_pattern,
)
from globalweather_etl_spark.operators.sessionize import sessionize
from globalweather_etl_spark.operators.sharding import shard_manifest, write_shards
from globalweather_etl_spark.operators.similarity import (
    cosine,
    cosine_topk,
    dot,
    ivf_cosine_topk,
    l2_norm,
    lsh_cosine_topk,
    lsh_signature,
    lsh_signature_multi,
)
from globalweather_etl_spark.operators.skew import salted_join
from globalweather_etl_spark.operators.span_dedup import (
    duplicate_span_starts,
    remove_duplicate_spans,
)
from globalweather_etl_spark.operators.surrogate_key import surrogate_key
from globalweather_etl_spark.operators.quality_classifier import (
    QualityModel,
    hashed_features,
    score_quality,
    train_quality_classifier,
)

__all__ = [
    "array_median",
    "dsir_grams",
    "dsir_log_ratios",
    "dsir_resample_topk",
    "dsir_score",
    "dsir_score_expr",
    "haversine_km",
    "holt_winters",
    "planar_knn_join",
    "planar_knn_join_complete",
    "planar_point_in_polygon_join",
    "sphere_point_in_polygon_join",
    "planar_radius_join",
    "sphere_knn_join_km",
    "sphere_radius_join_km",
    "series_monitor",
    "series_monitor_big",
    "rolling_anomalies",
    "QualityModel",
    "hashed_features",
    "score_quality",
    "train_quality_classifier",
    "IncrementalAggregate",
    "Measure",
    "session_paths",
    "session_rollup",
    "top_paths",
    "apply_diff",
    "hashed_tfidf",
    "idf_table",
    "ExpectationSuite",
    "expect_between",
    "expect_completeness",
    "expect_fk",
    "expect_in_set",
    "expect_matches",
    "expect_not_null",
    "expect_row_count",
    "expect_unique",
    "pagerank",
    "pagerank_exact",
    "semantic_decontaminate",
    "semdedup",
    "semdedup_exact",
    "key_skew_report",
    "skew_summary",
    "cms_estimate",
    "count_min_sketch",
    "hll_distinct_by",
    "hll_distinct_estimate",
    "hll_estimate_from_registers",
    "hll_merge",
    "hll_registers",
    "diff_summary",
    "table_diff",
    "apply_scd2",
    "asof_join",
    "bloom_build",
    "bloom_merge",
    "bloom_probe",
    "empty_bloom",
    "exact_dedup_incremental_bloom",
    "bm25_index",
    "bpe_encode",
    "bpe_vocab",
    "learn_bpe",
    "BigramLM",
    "bigram_lm_score",
    "train_bigram_lm",
    "bm25_topk",
    "chunk_documents",
    "connected_components",
    "cosine",
    "deterministic_sample",
    "hash_split",
    "pack_by_budget",
    "quantize_embeddings",
    "resample_interpolate",
    "resample_last",
    "time_weighted_avg",
    "retention_cohorts",
    "rrf_fuse",
    "shuffle_deterministic",
    "cosine_topk",
    "dot",
    "decontaminate",
    "fuzzy_decontaminate",
    "dequantize_embeddings",
    "exact_dedup",
    "exact_dedup_keepers",
    "exact_dedup_removed",
    "ivf_cosine_topk",
    "l2_norm",
    "lsh_cosine_topk",
    "lsh_signature",
    "lsh_signature_multi",
    "mix_corpora",
    "minhash_dedup_incremental",
    "minhash_lsh_pairs",
    "neardup_clusters",
    "assign_clusters",
    "cluster_sizes",
    "fit_kmeans",
    "kmeans_exact",
    "portable_centroids",
    "funnel",
    "bucketed_quantile_threshold",
    "cap_per_group",
    "column_profile",
    "cooccurrence",
    "dedup_lines",
    "dedup_lines_within",
    "exact_dedup_incremental",
    "file_ranges",
    "fuzzy_join",
    "fuzzy_self_pairs",
    "resolve_entities",
    "files_for_range",
    "line_doc_freq",
    "materialize_sequences",
    "ngram_containment_pairs",
    "ngram_overlap_pairs",
    "duplicate_span_starts",
    "remove_duplicate_spans",
    "quantile_keep_flag",
    "ngram_jaccard_pairs",
    "decode_pq",
    "encode_pq",
    "ivfpq_topk",
    "ivfpq_encode_portable",
    "pq_topk",
    "train_pq",
    "salted_join",
    "session_transitions",
    "transition_matrix",
    "simhash64",
    "simhash_fingerprints",
    "simhash_pairs",
    "spread_for_compute",
    "stratified_sample",
    "surrogate_key",
    "top_ngram_stats",
    "weighted_sample_exact",
    "weighted_sample_flag",
    "write_range_clustered",
    "zorder_key",
    "compile_steps",
    "encode_sequences",
    "match_pattern",
    "sessionize",
    "shard_manifest",
    "write_shards",
]
