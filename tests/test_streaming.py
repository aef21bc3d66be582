"""Structured Streaming parity tests: every streaming result is compared
against the identical batch computation on the same data — the unified
API means the logical plan is shared, so this checks the incremental
execution path (state, triggers, sinks), not a reimplementation."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from globalweather_etl_spark.sources import load_table
from globalweather_etl_spark.streaming import (
    drain_to_memory,
    events_stream_from_dir,
    run_daily_event_metrics,
    running_user_totals,
    session_stats,
    sliding_stats,
    streaming_dedup,
    tumbling_stats,
    with_watermark,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def landing(spark, tmp_path_factory):
    """Re-land the events table as a 4-file parquet directory (micro-ts)
    — the streaming file source needs a directory, and multiple files
    let maxFilesPerTrigger force multi-batch incremental runs."""
    path = str(tmp_path_factory.mktemp("landing") / "events")
    load_table(spark, SF_DIR, "events").repartition(4).write.parquet(path)
    return path


@pytest.fixture(scope="module")
def batch_events(spark, landing):
    return spark.read.parquet(landing)


def _drain(spark, stream_df, name, mode="complete"):
    q = drain_to_memory(stream_df, name, output_mode=mode)
    q.awaitTermination(120)
    return spark.table(name)


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


def test_tumbling_stream_equals_batch(spark, landing, batch_events):
    stream = events_stream_from_dir(spark, landing)
    got = _drain(spark, tumbling_stats(stream, "1 day"), "t_tumble")
    want = tumbling_stats(batch_events, "1 day")
    assert _rows(got, "window_start", "event_type") == _rows(
        want, "window_start", "event_type"
    )


def test_sliding_stream_equals_batch(spark, landing, batch_events):
    stream = events_stream_from_dir(spark, landing)
    got = _drain(spark, sliding_stats(stream, "1 day", "12 hours"), "t_slide")
    want = sliding_stats(batch_events, "1 day", "12 hours")
    assert _rows(got, "window_start", "event_type") == _rows(
        want, "window_start", "event_type"
    )


def test_session_stream_equals_batch(spark, landing, batch_events):
    stream = with_watermark(events_stream_from_dir(spark, landing), "ts", "1 hour")
    got = _drain(spark, session_stats(stream, "30 minutes"), "t_session")
    want = session_stats(batch_events, "30 minutes")
    assert _rows(got, "user_id", "session_start") == _rows(
        want, "user_id", "session_start"
    )


def test_append_mode_emits_closed_windows_only(spark, landing, batch_events, tmp_path):
    """Append + watermark: exactly the windows whose end precedes the
    final watermark are written; nothing is duplicated or invented."""
    q = run_daily_event_metrics(
        spark, landing, str(tmp_path), watermark_delay="1 hour"
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "daily_event_metrics"))
    want = tumbling_stats(batch_events, "1 day")
    max_ts = batch_events.agg(F.max("ts")).collect()[0][0]
    watermark = max_ts - dt.timedelta(hours=1)
    closed = want.filter(
        F.col("window_start") + F.expr("INTERVAL 1 DAY") <= F.lit(watermark)
    )
    assert _rows(got, "window_start", "event_type") == _rows(
        closed, "window_start", "event_type"
    )


def test_running_totals_accumulate_across_batches(spark, landing, batch_events):
    """maxFilesPerTrigger=1 forces 4 micro-batches; the state must carry
    totals across them. Update-mode memory sink keeps every emission —
    the LAST row per user must equal the batch aggregate."""
    stream = events_stream_from_dir(spark, landing, max_files_per_trigger=1)
    q = drain_to_memory(running_user_totals(stream), "t_totals", output_mode="update")
    q.awaitTermination(120)
    emitted = spark.table("t_totals")
    # update-mode memory sink appends per batch in order; the final
    # emission per user is the max n_events row.
    final = (
        emitted.groupBy("user_id")
        .agg(F.max_by(F.struct("n_events", "total_value"), "n_events").alias("s"))
        .select("user_id", "s.n_events", "s.total_value")
    )
    want = batch_events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value")
    )
    got_rows = {r["user_id"]: r for r in final.collect()}
    for w in want.collect():
        g = got_rows[w["user_id"]]
        assert g["n_events"] == w["n_events"]
        assert g["total_value"] == pytest.approx(w["total_value"], rel=1e-9)


def test_weather_band_counts_stream_equals_batch(spark, landing, batch_events):
    """The reference's weather-band dashboard shape, incrementally: the
    same kernel + window body must produce identical counts from the
    stream as from the batch table."""
    from globalweather_etl_spark.streaming import daily_weather_band_counts

    stream = events_stream_from_dir(spark, landing)
    got = _drain(spark, daily_weather_band_counts(stream), "t_bands")
    want = daily_weather_band_counts(batch_events)
    assert _rows(got, "window_start", "weather_band") == _rows(
        want, "window_start", "weather_band"
    )


def test_stream_static_join_equals_batch(spark, landing, batch_events):
    """Stream-static enrichment join: identical counts from the stream
    and the batch table against the same static dimension."""
    from globalweather_etl_spark.streaming import enriched_country_counts

    user_dim = (
        batch_events.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.concat(F.lit("C"), (F.col("user_id") % 5).cast("string")).alias(
                "country"
            ),
        )
    )
    stream = events_stream_from_dir(spark, landing)
    got = _drain(spark, enriched_country_counts(stream, user_dim), "t_country")
    want = enriched_country_counts(batch_events, user_dim)
    assert _rows(got, "window_start", "country") == _rows(
        want, "window_start", "country"
    )


def test_stream_stream_interval_join_equals_batch(spark, landing, batch_events):
    """Stream-stream interval join with watermarks on both sides must
    reproduce the batch interval join (append mode: interval-join
    output needs no aggregation finalization, every matched pair emits
    exactly once)."""
    from globalweather_etl_spark.streaming import clicks_with_recent_signup

    def split(df):
        return (
            df.filter(F.col("event_type") == "click"),
            df.filter(F.col("event_type") == "signup"),
        )

    s_clicks, s_signups = split(events_stream_from_dir(spark, landing))
    got_q = drain_to_memory(
        clicks_with_recent_signup(
            with_watermark(s_clicks, "ts", "1 hour"),
            with_watermark(s_signups, "ts", "2 hours"),
            within="1 hour",
        ),
        "t_ssjoin",
        output_mode="append",
    )
    got_q.awaitTermination(120)
    got = spark.table("t_ssjoin")
    b_clicks, b_signups = split(batch_events)
    want = clicks_with_recent_signup(b_clicks, b_signups, within="1 hour")
    assert _rows(got, "click_id", "signup_id") == _rows(
        want, "click_id", "signup_id"
    )
    assert got.count() > 0


def test_streaming_dedup_drops_replayed_files(spark, batch_events, tmp_path):
    """Land the same events twice (a replayed upstream); exact streaming
    dedup must restore the original cardinality."""
    dup_dir = str(tmp_path / "dup_landing")
    batch_events.repartition(2).write.parquet(dup_dir)
    batch_events.repartition(3).write.mode("append").parquet(dup_dir)
    stream = events_stream_from_dir(spark, dup_dir)
    got = _drain(
        spark,
        streaming_dedup(stream, ["event_id"]).groupBy().count(),
        "t_dedup",
        mode="complete",
    )
    assert got.collect()[0]["count"] == batch_events.count()


def test_jsonl_stream_equals_batch(spark, tmp_path):
    """Streaming JSONL ingestion drains the same rows a batch
    read_jsonl sees over the same landing directory."""
    from pyspark.sql import types as T

    from globalweather_etl_spark.sources import (
        drop_corrupt,
        read_jsonl,
        write_jsonl,
    )
    from globalweather_etl_spark.streaming import jsonl_stream_from_dir

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "lang", "text")
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path, partitions=3)

    stream = jsonl_stream_from_dir(
        spark, path, schema, max_files_per_trigger=1
    ).groupBy("lang").count()
    got = _drain(spark, stream, "jsonl_counts")
    want = drop_corrupt(read_jsonl(spark, path, schema)).groupBy("lang").count()
    assert _rows(got, "lang") == _rows(want, "lang")


def test_clean_documents_stream_equals_batch(spark, tmp_path):
    """The streaming corpus cleaner must produce exactly the batch
    result over the same landed JSONL."""
    from pyspark.sql import types as T

    from globalweather_etl_spark.sources import (
        drop_corrupt,
        read_jsonl,
        write_jsonl,
    )
    from globalweather_etl_spark.streaming import (
        clean_documents,
        jsonl_stream_from_dir,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "lang", "text")
    path = str(tmp_path / "docs_landing")
    write_jsonl(docs, path, partitions=3)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = clean_documents(
        jsonl_stream_from_dir(spark, path, schema, max_files_per_trigger=1),
        min_quality=0.5,
    )
    got = _drain(spark, stream, "clean_docs_stream", mode="append")
    want = clean_documents(
        drop_corrupt(read_jsonl(spark, path, schema)), min_quality=0.5
    )
    assert _rows(got, "doc_id") == _rows(want, "doc_id")
    assert got.count() > 0


def test_incremental_dedup_stream_matches_global(spark, tmp_path):
    """Folding micro-batches through run_incremental_dedup keeps the
    same CONTENT set as one global exact_dedup over everything landed,
    across TWO runs sharing state (continuous ingestion)."""
    from pyspark.sql import types as T

    from globalweather_etl_spark.operators.dedup import exact_dedup
    from globalweather_etl_spark.streaming import (
        jsonl_stream_from_dir,
        run_incremental_dedup,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    mk = lambda rows: spark.createDataFrame(rows, schema)

    # run 1: two files with in-file and cross-file duplicate content
    mk([(i, f"t-{i % 8}") for i in range(20)]).coalesce(1).write.mode(
        "append"
    ).json(landing)
    mk([(100 + i, f"t-{i % 15}") for i in range(30)]).coalesce(1).write.mode(
        "append"
    ).json(landing)
    run_incremental_dedup(
        jsonl_stream_from_dir(spark, landing, schema, max_files_per_trigger=1),
        out,
        num_bits=1 << 14,
    ).awaitTermination(120)

    def contents():
        return sorted(
            r["text"] for r in spark.read.parquet(out + "/deduped").collect()
        )

    everything = spark.read.json(landing, schema=schema)
    want = sorted(r["text"] for r in exact_dedup(everything, "doc_id", "text").collect())
    assert contents() == want

    # run 2 over the same state: new file, mostly already-seen content
    mk([(200 + i, f"t-{i % 40}") for i in range(40)]).coalesce(1).write.mode(
        "append"
    ).json(landing)
    run_incremental_dedup(
        jsonl_stream_from_dir(spark, landing, schema, max_files_per_trigger=1),
        out,
        num_bits=1 << 14,
    ).awaitTermination(120)

    everything = spark.read.json(landing, schema=schema)
    want = sorted(r["text"] for r in exact_dedup(everything, "doc_id", "text").collect())
    assert contents() == want
    # each distinct content exactly once — no duplicates ever emitted
    assert len(set(contents())) == len(contents())


def test_incremental_neardedup_stream(spark, tmp_path):
    """Near-matches of earlier micro-batches' content are dropped by
    the streaming fuzzy screen across two runs sharing state."""
    from pyspark.sql import types as T

    from globalweather_etl_spark.streaming import (
        jsonl_stream_from_dir,
        run_incremental_neardedup,
    )

    base = (
        "the quick brown fox jumps over the lazy dog near the quiet river "
        "while the patient heron watches from the tall reeds every morning"
    )
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    mk = lambda rows: spark.createDataFrame(rows, schema)

    mk([(1, base), (2, "totally different words about adaptive query "
                       "execution and shuffle partition coalescing")]).coalesce(
        1
    ).write.mode("append").json(landing)
    mk([(10, base.replace("every morning", "each evening")),  # near-dup of 1
        (11, "fresh novel content mentioning parquet zone maps and "
             "row group pruning statistics")]).coalesce(1).write.mode(
        "append"
    ).json(landing)
    run_incremental_neardedup(
        jsonl_stream_from_dir(spark, landing, schema, max_files_per_trigger=1),
        out, n=3, num_hashes=32, bands=16, threshold=0.5,
    ).awaitTermination(120)

    def kept_ids():
        return sorted(
            r["doc_id"]
            for r in spark.read.parquet(out + "/neardeduped").collect()
        )

    assert kept_ids() == [1, 2, 11]

    # run 2 over the same state: another near-match + one new doc
    mk([(20, base.replace("quick", "rapid")),
        (21, "yet another unseen document about broadcast hash join "
             "thresholds and skew salting strategies")]).coalesce(
        1
    ).write.mode("append").json(landing)
    run_incremental_neardedup(
        jsonl_stream_from_dir(spark, landing, schema, max_files_per_trigger=1),
        out, n=3, num_hashes=32, bands=16, threshold=0.5,
    ).awaitTermination(120)
    assert kept_ids() == [1, 2, 11, 21]


def test_stream_stream_left_outer_join(spark, tmp_path):
    """LEFT OUTER stream-stream join: matched pairs emit immediately;
    an unmatched click emits its NULL row only after the watermark
    passes its eviction time. Staggered files (maxFilesPerTrigger=1)
    advance the watermark across micro-batches so the eviction is
    actually exercised; far-future sentinel clicks push the watermark
    but are themselves still unexpired, so assertions restrict to the
    first-day rows — where the stream must match the batch left join
    exactly."""
    import datetime as dt
    import time as _time

    from globalweather_etl_spark.streaming import (
        clicks_with_optional_signup,
        events_stream_from_dir,
    )

    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    landing = str(tmp_path / "lo_landing")

    def _write(rows, name):
        spark.createDataFrame(
            [
                (i, ts, u, et, 1.0, "{}")
                for i, (ts, u, et) in enumerate(rows, start=hash(name) % 1000 * 100)
            ],
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).coalesce(1).write.mode("append").parquet(landing)
        _time.sleep(1.1)  # distinct mod-times -> deterministic batch order

    # batch 1: user 1 clicks with NO signup (must surface as NULL row);
    # user 2 signup then click inside the window (must match)
    _write(
        [
            (t0, 1, "click"),
            (t0, 2, "signup"),
            (t0 + dt.timedelta(minutes=10), 2, "click"),
        ],
        "b1",
    )
    # batches 2 + 3: far-future sentinels on BOTH event types — each
    # branch's watermark node sits behind its filter, so only events of
    # its own type advance it, and the join's state watermark is the
    # min of the two. b2 advances both past batch 1's eviction horizon;
    # b3 triggers the eviction scan that emits the NULL row.
    _write(
        [
            (t0 + dt.timedelta(days=10), 99, "click"),
            (t0 + dt.timedelta(days=10), 99, "signup"),
        ],
        "b2",
    )
    _write(
        [
            (t0 + dt.timedelta(days=20), 98, "click"),
            (t0 + dt.timedelta(days=20), 98, "signup"),
        ],
        "b3",
    )

    stream = events_stream_from_dir(spark, landing, max_files_per_trigger=1)
    s_clicks = with_watermark(
        stream.filter(F.col("event_type") == "click"), "ts", "1 hour"
    )
    s_signups = with_watermark(
        stream.filter(F.col("event_type") == "signup"), "ts", "1 hour"
    )
    q = drain_to_memory(
        clicks_with_optional_signup(s_clicks, s_signups, within="1 hour"),
        "t_lojoin",
        output_mode="append",
    )
    q.awaitTermination(180)
    got = spark.table("t_lojoin").filter(
        F.col("click_ts") < t0 + dt.timedelta(days=1)
    )

    batch = spark.read.parquet(landing)
    want = clicks_with_optional_signup(
        batch.filter(F.col("event_type") == "click"),
        batch.filter(F.col("event_type") == "signup"),
        within="1 hour",
    ).filter(F.col("click_ts") < t0 + dt.timedelta(days=1))

    key = lambda df: sorted(
        (r["user_id"], r["click_ts"], r["signup_ts"]) for r in df.collect()
    )
    assert key(got) == key(want)
    # the NULL row for user 1 was genuinely emitted by eviction
    assert got.filter(
        (F.col("user_id") == 1) & F.col("signup_id").isNull()
    ).count() == 1
    # and user 2's match carries a real signup
    assert got.filter(
        (F.col("user_id") == 2) & F.col("signup_id").isNotNull()
    ).count() == 1


def test_stream_stream_left_outer_late_match_dropped_not_retracted(
    spark, tmp_path
):
    """The outer join's emitted rows are FINAL: once eviction has
    produced a click's NULL row, a same-user signup arriving from
    behind the watermark is DROPPED — it must neither retract the NULL
    row nor emit a contradicting matched row (the double-emission
    anomaly append mode forbids). This is the flip side of the
    eviction test above: that one proves the NULL row arrives, this
    one proves it stays exactly-once under late data."""
    import datetime as dt
    import time as _time

    from globalweather_etl_spark.streaming import (
        clicks_with_optional_signup,
        events_stream_from_dir,
    )

    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    landing = str(tmp_path / "lo_late_landing")

    def _write(rows, name):
        spark.createDataFrame(
            [
                (i, ts, u, et, 1.0, "{}")
                for i, (ts, u, et) in enumerate(
                    rows, start=hash(name) % 1000 * 100
                )
            ],
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).coalesce(1).write.mode("append").parquet(landing)
        _time.sleep(1.1)  # distinct mod-times -> deterministic batch order

    # b1: user 1 clicks with no signup yet; user 3 is the control match
    _write(
        [
            (t0, 1, "click"),
            (t0, 3, "signup"),
            (t0 + dt.timedelta(minutes=10), 3, "click"),
        ],
        "b1",
    )
    # b2 advances both sides' watermarks far past b1's eviction
    # horizon; b3's trigger runs the eviction scan that emits user 1's
    # NULL row
    _write(
        [
            (t0 + dt.timedelta(days=10), 99, "click"),
            (t0 + dt.timedelta(days=10), 99, "signup"),
        ],
        "b2",
    )
    _write(
        [
            (t0 + dt.timedelta(days=20), 98, "click"),
            (t0 + dt.timedelta(days=20), 98, "signup"),
        ],
        "b3",
    )
    # b4: the LATE signup — inside user 1's click window by event time,
    # but days behind the watermark by arrival time. A sentinel rides
    # along so the batch demonstrably processes.
    _write(
        [
            (t0 - dt.timedelta(minutes=5), 1, "signup"),
            (t0 + dt.timedelta(days=30), 97, "click"),
            (t0 + dt.timedelta(days=30), 97, "signup"),
        ],
        "b4",
    )

    stream = events_stream_from_dir(spark, landing, max_files_per_trigger=1)
    s_clicks = with_watermark(
        stream.filter(F.col("event_type") == "click"), "ts", "1 hour"
    )
    s_signups = with_watermark(
        stream.filter(F.col("event_type") == "signup"), "ts", "1 hour"
    )
    q = drain_to_memory(
        clicks_with_optional_signup(s_clicks, s_signups, within="1 hour"),
        "t_lojoin_late",
        output_mode="append",
    )
    q.awaitTermination(180)
    got = spark.table("t_lojoin_late").filter(
        F.col("click_ts") < t0 + dt.timedelta(days=1)
    )
    rows = sorted(
        (r["user_id"], r["signup_id"] is not None) for r in got.collect()
    )
    # user 1: exactly ONE row, still the NULL row — the late signup
    # neither matched nor retracted; user 3: exactly one matched row
    assert rows == [(1, False), (3, True)]


def test_incremental_dedup_replay_after_state_append_keeps_output(
    spark, tmp_path
):
    """The crash-replay hazard: a batch that appended its fingerprints
    to state but crashed before its checkpoint committed is replayed —
    it must NOT see its own fingerprints as history (that would
    recompute kept as empty and overwrite its output with nothing,
    silently losing those documents forever). Deleting the checkpoint
    replays batch 0 over the same single file, which is exactly the
    state-already-written replay shape."""
    import shutil

    from pyspark.sql import types as T

    from globalweather_etl_spark.streaming import (
        jsonl_stream_from_dir,
        run_incremental_dedup,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    spark.createDataFrame(
        [(i, f"content-{i % 5}") for i in range(12)], schema
    ).coalesce(1).write.mode("append").json(landing)

    def run():
        run_incremental_dedup(
            jsonl_stream_from_dir(spark, landing, schema),
            out,
            num_bits=1 << 14,
        ).awaitTermination(120)

    run()
    first = sorted(
        r["text"] for r in spark.read.parquet(out + "/deduped").collect()
    )
    assert first == [f"content-{i}" for i in range(5)]

    # simulate the replay: state + outputs survive, the checkpoint does
    # not — batch 0 reruns over the same file with its state partition
    # already on disk
    shutil.rmtree(str(tmp_path / "out" / "_checkpoints"))
    run()
    replayed = sorted(
        r["text"] for r in spark.read.parquet(out + "/deduped").collect()
    )
    assert replayed == first  # nothing lost, nothing duplicated


def test_incremental_neardedup_replay_after_state_append(spark, tmp_path):
    """Same replay shape for the fuzzy screen: a replayed batch must
    not match against its OWN signatures and drop everything it kept."""
    import shutil

    from pyspark.sql import types as T

    from globalweather_etl_spark.streaming import (
        jsonl_stream_from_dir,
        run_incremental_neardedup,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the "
                "quiet river while the heron watches from tall reeds"),
            (2, "completely different prose about adaptive query "
                "execution and shuffle partition coalescing at scale"),
        ],
        schema,
    ).coalesce(1).write.mode("append").json(landing)

    def run():
        run_incremental_neardedup(
            jsonl_stream_from_dir(spark, landing, schema),
            out, n=3, num_hashes=32, bands=16, threshold=0.5,
        ).awaitTermination(120)

    run()
    kept = lambda: sorted(
        r["doc_id"]
        for r in spark.read.parquet(out + "/neardeduped").collect()
    )
    assert kept() == [1, 2]
    shutil.rmtree(str(tmp_path / "out" / "_checkpoints"))
    run()
    assert kept() == [1, 2]


def test_streaming_anomalies_equal_batch(spark, tmp_path):
    """Streaming rolling-MAD anomaly flags == the batch operator on
    the same prefix, with state carried across 4 time-ordered
    micro-batches and only O(window) values per key in the store."""
    from globalweather_etl_spark.operators.anomaly import (
        rolling_anomalies,
    )
    from globalweather_etl_spark.streaming.stateful import (
        streaming_anomalies,
    )

    events = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    # land as 4 SEQUENTIAL time slices (mtime order == ts order), so
    # per-key arrival order across micro-batches matches (ts,
    # event_id) — the operator's documented in-order contract
    sliced = events.withColumn(
        "__slice",
        F.ntile(4).over(Window.orderBy("ts", "event_id")),
    )
    land = str(tmp_path / "anom_landing")
    for s in range(1, 5):
        sliced.filter(F.col("__slice") == s).drop(
            "__slice"
        ).coalesce(1).write.mode("append").parquet(land)
    stream = events_stream_from_dir(
        spark, land, max_files_per_trigger=1
    )
    got = _drain(
        spark,
        streaming_anomalies(stream, window_rows=7),
        "t_anom",
        mode="append",
    )
    want = rolling_anomalies(
        events, "value", ["ts", "event_id"], ["user_id"], window_rows=7
    ).select(
        "user_id", "event_id",
        F.col("VALUE_ROLL_MED").alias("roll_med"),
        F.col("VALUE_ROLL_MAD").alias("roll_mad"),
        F.col("VALUE_ROBUST_Z").alias("robust_z"),
        F.col("VALUE_IS_ANOMALY").alias("is_anomaly"),
    )
    assert got.count() == events.count()
    gm = {
        (r["user_id"], r["event_id"]): r
        for r in got.collect()
    }
    for w in want.collect():
        g = gm[(w["user_id"], w["event_id"])]
        assert g["roll_med"] == w["roll_med"]
        assert g["roll_mad"] == w["roll_mad"]
        assert g["robust_z"] == w["robust_z"]
        assert g["is_anomaly"] == w["is_anomaly"]


def test_stream_static_spatial_join_equals_batch(
    spark, landing, batch_events
):
    """Stream-static SPATIAL enrichment (round 11): planar_radius_join
    with a streaming left side is a plain explode + equi-join +
    filter, so it streams stateless-ly — the drained pairs must equal
    the batch run exactly (exact integer distances)."""
    from globalweather_etl_spark.operators.geo import planar_radius_join

    # static right side: a handful of "poi" points on a small plane
    pois = spark.createDataFrame(
        [(i, (i * 37) % 100, (i * 61) % 100) for i in range(12)],
        "poi_id long, px long, py long",
    )

    def pts(df):
        return df.select(
            "event_id",
            (F.col("event_id") % 100).alias("ex"),
            (F.col("event_id") * 7 % 100).alias("ey"),
        )

    def run(src):
        return planar_radius_join(
            pts(src), pois, radius=9,
            left_cols=("ex", "ey"), right_cols=("px", "py"),
        )

    stream = events_stream_from_dir(spark, landing)
    got = _drain(spark, run(stream), "t_geo", mode="append")
    want = run(batch_events)
    assert want.count() > 0  # non-degenerate
    assert _rows(got, "event_id", "poi_id") == _rows(
        want, "event_id", "poi_id"
    )


def test_running_totals_transform_with_state_parity(
    spark, landing, batch_events
):
    """The transformWithState twin (streaming/tws.py) matches both the
    applyInPandasWithState form and the batch aggregate — one twin
    migrated behind the same semantics, per the Spark-4 evaluation."""
    from globalweather_etl_spark.streaming.tws import (
        ROCKSDB_PROVIDER,
        running_user_totals_tws,
        tws_available,
    )

    if not tws_available():
        pytest.skip(
            "transformWithState needs the protobuf package "
            "(absent in this container; env-gated like the "
            "multimodal codecs)"
        )
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    try:
        stream = events_stream_from_dir(
            spark, landing, max_files_per_trigger=1
        )
        q = drain_to_memory(
            running_user_totals_tws(stream),
            "t_totals_tws",
            output_mode="update",
        )
        q.awaitTermination(120)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    emitted = spark.table("t_totals_tws")
    final = (
        emitted.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("n_events", "total_value"), "n_events"
            ).alias("s")
        )
        .select("user_id", "s.n_events", "s.total_value")
    )
    want = batch_events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    )
    got_rows = {r["user_id"]: r for r in final.collect()}
    assert len(got_rows) == want.count()
    for w in want.collect():
        g = got_rows[w["user_id"]]
        assert g["n_events"] == w["n_events"]
        assert g["total_value"] == pytest.approx(
            w["total_value"], rel=1e-9
        )
