"""Structured Streaming surface (north-star extension — the reference
is purely batch, SURVEY.md §2.8).

Design: every aggregation builder in windows.py is written against the
unified DataFrame API, so the SAME function body serves batch DataFrames
(oracle-checkable against DuckDB) and streaming DataFrames (wired to
readStream sources with watermarks). Streaming-only machinery — sources,
watermarking, stateful processing, sinks — lives in sources.py /
stateful.py / jobs.py.
"""

from globalweather_etl_spark.streaming.jobs import (
    clean_documents,
    clicks_with_optional_signup,
    run_ivm_refresh,
    clicks_with_recent_signup,
    daily_weather_band_counts,
    drain_to_memory,
    enriched_country_counts,
    run_daily_event_metrics,
    run_incremental_dedup,
    run_incremental_neardedup,
)
from globalweather_etl_spark.streaming.snapshot_source import (
    SnapshotStreamDataSource,
    register_snapshot_stream,
    snapshot_stream,
)
from globalweather_etl_spark.streaming.sources import (
    EVENTS_SCHEMA,
    events_stream_from_dir,
    jsonl_stream_from_dir,
)
from globalweather_etl_spark.streaming.stateful import (
    running_user_totals,
    streaming_anomalies,
    streaming_dedup,
    streaming_holt_winters,
    streaming_series_monitor,
)
from globalweather_etl_spark.streaming.windows import (
    session_stats,
    sliding_stats,
    tumbling_stats,
    with_watermark,
)

__all__ = [
    "clean_documents",
    "EVENTS_SCHEMA",
    "clicks_with_optional_signup",
    "run_ivm_refresh",
    "clicks_with_recent_signup",
    "daily_weather_band_counts",
    "drain_to_memory",
    "enriched_country_counts",
    "events_stream_from_dir",
    "jsonl_stream_from_dir",
    "register_snapshot_stream",
    "run_daily_event_metrics",
    "run_incremental_dedup",
    "run_incremental_neardedup",
    "running_user_totals",
    "streaming_anomalies",
    "streaming_holt_winters",
    "streaming_series_monitor",
    "snapshot_stream",
    "SnapshotStreamDataSource",
    "streaming_dedup",
    "session_stats",
    "sliding_stats",
    "tumbling_stats",
    "with_watermark",
]
