"""Incremental view maintenance (operators/ivm.py): bit-identical to
from-scratch recompute after N batches, file-pruned refreshes,
exactly-once replays, and the real-events composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.ivm import (
    IncrementalAggregate,
    Measure,
)
from globalweather_etl_spark.sources import load_table

MEASURES = [
    Measure("n_events", "count"),
    Measure("total_value", "sum", "value"),
    Measure("avg_value", "avg", "value"),
    Measure("min_value", "min", "value"),
    Measure("max_value", "max", "value"),
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def agg(spark, tmp_path):
    return IncrementalAggregate(
        spark, str(tmp_path / "ivm"), ["event_type"], MEASURES
    )


def test_incremental_equals_recompute_on_real_events(spark, agg):
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    # 4 insert-only batches sliced by id
    for i in range(4):
        agg.apply_batch(events.filter(F.col("event_id") % 4 == i))
    assert _rows(agg.read()) == _rows(agg.recompute(events))


def test_untouched_groups_ride_by_reference(spark, agg, tmp_path):
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    agg.apply_batch(events)
    head = agg.table.latest_version()
    m_before = agg.table._manifest(head)
    # a batch touching only ONE group must not rewrite every file:
    # cluster the state by group first so groups live in separate files
    agg.table.write_clustered(
        agg.table.read(), cluster_by=["event_type"], n_files=4
    )
    m_clustered = agg.table._manifest(agg.table.latest_version())
    one_type = events.filter(F.col("event_type") == "click").limit(50)
    res = agg.apply_batch(one_type)
    assert res["files_kept"] > 0
    kept = set(m_clustered["files"]) & set(
        agg.table._manifest(res["version"])["files"]
    )
    assert kept, "files of untouched groups must carry by reference"
    # and the state is still exactly the recompute
    full = events.unionByName(one_type)
    assert _rows(agg.read()) == _rows(agg.recompute(full))


def test_exactly_once_replay_skipped(spark, agg):
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    b0 = events.filter(F.col("event_id") % 2 == 0)
    agg.apply_batch(b0, batch_id=7)
    before = _rows(agg.read())
    out = agg.apply_batch(b0, batch_id=7)  # checkpoint-recovery replay
    assert out == {"skipped": 7}
    assert _rows(agg.read()) == before


def test_multi_group_keys_and_decimal_exactness(spark, tmp_path):
    agg = IncrementalAggregate(
        spark,
        str(tmp_path / "ivm2"),
        ["event_type", "user_id"],
        [Measure("s", "sum", "value"), Measure("a", "avg", "value")],
    )
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    # adversarial slicing: 7 uneven batches
    for i in range(7):
        agg.apply_batch(events.filter(F.col("event_id") % 7 == i))
    assert _rows(agg.read()) == _rows(agg.recompute(events))


def test_measure_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="needs a source column"):
        Measure("x", "sum")
    with pytest.raises(ValueError, match="kind"):
        Measure("x", "median", "v")
    with pytest.raises(ValueError, match="duplicate"):
        IncrementalAggregate(
            spark, str(tmp_path / "d"), ["g"],
            [Measure("x", "count"), Measure("x", "count")],
        )


def test_streaming_ivm_refresh_equals_batch_recompute(spark, tmp_path):
    """Drive the continuous aggregate from a file stream with
    maxFilesPerTrigger=1 (4 micro-batches); the state must equal the
    from-scratch recompute over everything landed."""
    from globalweather_etl_spark.streaming import (
        events_stream_from_dir,
        run_ivm_refresh,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    landing = str(tmp_path / "landing")
    for i in range(4):
        events.filter(F.col("event_id") % 4 == i).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
    state_path = str(tmp_path / "ivm_stream")
    q = run_ivm_refresh(
        events_stream_from_dir(spark, landing, max_files_per_trigger=1),
        state_path,
        ["event_type"],
        MEASURES,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)
    agg = IncrementalAggregate(spark, state_path, ["event_type"], MEASURES)
    landed = spark.read.parquet(landing)
    assert _rows(agg.read()) == _rows(agg.recompute(landed))
    # >1 batch actually folded (not a single-batch degenerate run)
    assert agg.table.latest_version() >= 2


def test_approx_distinct_measure_incremental_equals_recompute(spark, tmp_path):
    """HLL-register measure: incremental state after 5 adversarial
    batches EXACTLY equals the from-scratch sketch, and matches the
    standalone grouped HLL operator."""
    from globalweather_etl_spark.operators.sketches import hll_distinct_by

    agg = IncrementalAggregate(
        spark,
        str(tmp_path / "ivm_hll"),
        ["event_type"],
        [Measure("n", "count"), Measure("uu", "approx_distinct", "user_id")],
    )
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    for i in range(5):
        agg.apply_batch(events.filter(F.col("event_id") % 5 == i))
    assert _rows(agg.read()) == _rows(agg.recompute(events))
    want = {
        r["event_type"]: r["approx_distinct"]
        for r in hll_distinct_by(events, ["event_type"], "user_id").collect()
    }
    got = {r["event_type"]: r["uu"] for r in agg.read().collect()}
    assert got == want


def test_streaming_refresh_with_approx_distinct(spark, tmp_path):
    from globalweather_etl_spark.streaming import (
        events_stream_from_dir,
        run_ivm_refresh,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    landing = str(tmp_path / "landing2")
    for i in range(3):
        events.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
    measures = [
        Measure("n", "count"),
        Measure("uu", "approx_distinct", "user_id"),
    ]
    state = str(tmp_path / "ivm_hll_stream")
    q = run_ivm_refresh(
        events_stream_from_dir(spark, landing, max_files_per_trigger=1),
        state,
        ["event_type"],
        measures,
        checkpoint_dir=str(tmp_path / "ck2"),
    )
    q.awaitTermination(180)
    agg = IncrementalAggregate(spark, state, ["event_type"], measures)
    landed = spark.read.parquet(landing)
    assert _rows(agg.read()) == _rows(agg.recompute(landed))
