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


# ------------------------------------------------- round 6: retraction

CDC_MEASURES = [
    Measure("n_events", "count"),
    Measure("total_value", "sum", "value"),
    Measure("avg_value", "avg", "value"),
]


@pytest.fixture()
def cdc_agg(spark, tmp_path):
    return IncrementalAggregate(
        spark, str(tmp_path / "ivm_cdc"), ["event_type"], CDC_MEASURES
    )


def _with_op(df, op):
    return df.withColumn("__op", F.lit(op))


def test_cdc_updates_and_deletes_equal_net_recompute(spark, cdc_agg):
    """The MERGE-driven change-stream shape: inserts, then an update
    wave (delete old row + insert new row), then a delete wave — the
    maintained state must be BIT-identical to the from-scratch
    aggregate over the net surviving rows."""
    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "event_type", "value"
    )
    # batch 0/1: insert everything in two slices
    for i in range(2):
        cdc_agg.apply_batch_cdc(
            _with_op(events.filter(F.col("event_id") % 2 == i), 1)
        )
    # batch 2: UPDATE value -> value+10 for event_id%5==0
    upd = events.filter(F.col("event_id") % 5 == 0)
    cdc_agg.apply_batch_cdc(
        _with_op(upd, -1).unionByName(
            _with_op(upd.withColumn("value", F.col("value") + 10), 1)
        )
    )
    # batch 3: DELETE event_id%3==0 (their post-update rows)
    dele = events.withColumn(
        "value",
        F.when(
            F.col("event_id") % 5 == 0, F.col("value") + 10
        ).otherwise(F.col("value")),
    ).filter(F.col("event_id") % 3 == 0)
    cdc_agg.apply_batch_cdc(_with_op(dele, -1))

    net = (
        events.withColumn(
            "value",
            F.when(
                F.col("event_id") % 5 == 0, F.col("value") + 10
            ).otherwise(F.col("value")),
        )
        .filter(F.col("event_id") % 3 != 0)
    )
    assert _rows(cdc_agg.read()) == _rows(cdc_agg.recompute(net))


def test_cdc_group_retracted_to_zero_leaves_state(spark, cdc_agg):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 5.0)],
        "event_id long, event_type string, value double",
    )
    cdc_agg.apply_batch_cdc(_with_op(df, 1))
    assert {r["event_type"] for r in cdc_agg.read().collect()} == {"a", "b"}
    # retract every 'b' row: the group must VANISH, not linger at 0
    cdc_agg.apply_batch_cdc(
        _with_op(df.filter(F.col("event_type") == "b"), -1)
    )
    out = {r["event_type"]: r["n_events"] for r in cdc_agg.read().collect()}
    assert out == {"a": 2}
    # and the state table itself holds no ghost row
    assert cdc_agg.table.read().filter(
        F.col("event_type") == "b"
    ).count() == 0


def test_cdc_rejects_non_maintainable_measures(spark, tmp_path):
    agg = IncrementalAggregate(
        spark, str(tmp_path / "ivm_mm"), ["event_type"],
        [Measure("m", "min", "value")],
    )
    df = spark.createDataFrame(
        [(1, "a", 1.0)], "event_id long, event_type string, value double"
    )
    with pytest.raises(ValueError, match="not self-maintainable"):
        agg.apply_batch_cdc(_with_op(df, 1))


def test_cdc_negative_retraction_fails_before_commit(spark, cdc_agg):
    df = spark.createDataFrame(
        [(1, "a", 10.0)], "event_id long, event_type string, value double"
    )
    cdc_agg.apply_batch_cdc(_with_op(df, 1), batch_id=0)
    head = cdc_agg.table.latest_version()
    # delete twice what exists: loud failure, no commit
    doubled = _with_op(df, -1).unionByName(
        _with_op(df.withColumn("event_id", F.lit(99)), -1)
    )
    with pytest.raises(ValueError, match="below zero"):
        cdc_agg.apply_batch_cdc(doubled, batch_id=1)
    assert cdc_agg.table.latest_version() == head


def test_cdc_bad_op_rejected(spark, cdc_agg):
    df = spark.createDataFrame(
        [(1, "a", 1.0)], "event_id long, event_type string, value double"
    )
    with pytest.raises(ValueError, match="must be \\+1 or -1"):
        cdc_agg.apply_batch_cdc(df.withColumn("__op", F.lit(2)))
    # a NULL op must ALSO fail loudly — the former pre-check was a
    # plain filter whose NULL predicate silently passed NULL ops,
    # which the op-weighted sums would then drop (round-7 fix: the
    # guard rides the partial aggregate and counts NULLs as bad)
    with pytest.raises(ValueError, match="must be \\+1 or -1"):
        cdc_agg.apply_batch_cdc(
            df.withColumn("__op", F.lit(None).cast("int"))
        )
    # the diagnostic names the ACTUAL bad value, not a NULL picked
    # off a valid row (any_value without ignoreNulls — r7 advisory)
    mixed = spark.createDataFrame(
        [(1, "a", 1.0, 1), (2, "a", 2.0, 5)],
        "event_id long, event_type string, value double, __op int",
    )
    with pytest.raises(ValueError, match="got '5'"):
        cdc_agg.apply_batch_cdc(mixed)


def test_cdc_replay_skipped(spark, cdc_agg):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 4.0)],
        "event_id long, event_type string, value double",
    )
    cdc_agg.apply_batch_cdc(_with_op(df, 1), batch_id=3)
    before = _rows(cdc_agg.read())
    assert cdc_agg.apply_batch_cdc(_with_op(df, 1), batch_id=3) == {
        "skipped": 3
    }
    assert _rows(cdc_agg.read()) == before


def test_cdc_composes_with_insert_only_batches(spark, cdc_agg):
    """A table maintained by apply_batch can absorb a later retraction
    wave via apply_batch_cdc — the two paths share one state schema."""
    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "event_type", "value"
    )
    cdc_agg.apply_batch(events)
    gone = events.filter(F.col("event_id") % 4 == 1)
    cdc_agg.apply_batch_cdc(_with_op(gone, -1))
    net = events.filter(F.col("event_id") % 4 != 1)
    assert _rows(cdc_agg.read()) == _rows(cdc_agg.recompute(net))


def test_ivm_stream_replay_with_vacuum_racing(spark, tmp_path):
    """run_ivm_refresh driven from a landing dir, with vacuum running
    between batches and the CHECKPOINT lost afterwards: the full-stream
    replay must be skipped batch-for-batch (high-water ivm stamp
    survives the dropped manifests) and the state must equal the
    from-scratch recompute."""
    import shutil

    from pyspark.sql import types as T

    from globalweather_etl_spark.streaming import jsonl_stream_from_dir
    from globalweather_etl_spark.streaming.jobs import run_ivm_refresh

    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    landing = str(tmp_path / "landing")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    measures = [
        Measure("n", "count"),
        Measure("total", "sum", "value"),
    ]
    rows1 = [("click", 1.0), ("view", 2.0), ("click", 3.0)]
    rows2 = [("view", 5.0), ("buy", 7.0)]
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "append"
    ).json(landing)
    run_ivm_refresh(
        jsonl_stream_from_dir(spark, landing, schema),
        state, ["event_type"], measures, ckpt,
    ).awaitTermination(120)

    ia = IncrementalAggregate(spark, state, ["event_type"], measures)
    # vacuum races the stream between micro-batches: stamped manifests
    # from batch 0 are dropped
    ia.table.vacuum(keep_last=1, unreferenced_grace=0.0)

    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "append"
    ).json(landing)
    run_ivm_refresh(
        jsonl_stream_from_dir(spark, landing, schema),
        state, ["event_type"], measures, ckpt,
    ).awaitTermination(120)
    want = _rows(
        ia.recompute(spark.createDataFrame(rows1 + rows2, schema))
    )
    assert _rows(ia.read()) == want

    # checkpoint lost: the whole stream replays from batch 0 — every
    # batch must be skipped by the carried stamp, state unchanged
    ia.table.vacuum(keep_last=1, unreferenced_grace=0.0)
    shutil.rmtree(ckpt)
    run_ivm_refresh(
        jsonl_stream_from_dir(spark, landing, schema),
        state, ["event_type"], measures, ckpt,
    ).awaitTermination(120)
    assert _rows(ia.read()) == want


# ------------------------------------------- round 8: mixed-slice folds

MIXED_MEASURES = CDC_MEASURES + [
    Measure("min_value", "min", "value"),
    Measure("max_value", "max", "value"),
    Measure("n_ids", "approx_distinct", "event_id"),
]


@pytest.fixture()
def mixed_agg(spark, tmp_path):
    return IncrementalAggregate(
        spark, str(tmp_path / "ivm_mixed"), ["event_type"],
        MIXED_MEASURES,
    )


def test_mixed_fold_equals_recompute_with_phantom_churn(
    spark, mixed_agg
):
    """The graded-query shape on one state: append slices feed ALL
    measures; a phantom CDC wave (inserted batch 1, retracted batch 2,
    in groups no real row occupies) feeds only the retractable ones
    and must leave NO trace — the final state equals the from-scratch
    recompute over the real rows alone, min/max/HLL included."""
    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "event_type", "value"
    )
    phantom = events.filter(F.col("event_id") % 3 == 0).withColumn(
        "event_type", F.concat(F.lit("PH-"), F.col("event_type"))
    )
    slices = [events.filter(F.col("event_id") % 3 == i) for i in range(3)]
    mixed_agg.apply_batch_mixed(slices[0], batch_id=0)
    mixed_agg.apply_batch_mixed(
        slices[1], cdc=_with_op(phantom, 1), batch_id=1
    )
    # mid-stream: phantom groups live in the retractable family with
    # NULL min/max (no insert-slice rows ever touched them)
    mid = {
        r["event_type"]: (r["n_events"], r["min_value"])
        for r in mixed_agg.read().collect()
    }
    assert any(k.startswith("PH-") for k in mid)
    assert all(
        v[1] is None for k, v in mid.items() if k.startswith("PH-")
    )
    mixed_agg.apply_batch_mixed(
        slices[2], cdc=_with_op(phantom, -1), batch_id=2
    )
    assert _rows(mixed_agg.read()) == _rows(mixed_agg.recompute(events))
    # phantom groups are DELETED, not zeroed
    assert mixed_agg.table.read().filter(
        F.col("event_type").startswith("PH-")
    ).count() == 0


def test_mixed_equals_two_state_composition(spark, tmp_path):
    """One mixed state must produce exactly what the round-7 shape
    (a CDC-capable state joined to an insert-only state) produced."""
    events = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "event_type", "value"
    )
    phantom = events.limit(200).withColumn(
        "event_type", F.concat(F.lit("X-"), F.col("event_type"))
    )
    one = IncrementalAggregate(
        spark, str(tmp_path / "one"), ["event_type"], MIXED_MEASURES
    )
    one.apply_batch_mixed(events, cdc=_with_op(phantom, 1), batch_id=0)
    one.apply_batch_mixed(None, cdc=_with_op(phantom, -1), batch_id=1)
    r_cdc = IncrementalAggregate(
        spark, str(tmp_path / "r_cdc"), ["event_type"], CDC_MEASURES
    )
    r_ins = IncrementalAggregate(
        spark, str(tmp_path / "r_ins"), ["event_type"],
        [m for m in MIXED_MEASURES if m not in CDC_MEASURES],
    )
    r_cdc.apply_batch_cdc(
        _with_op(events, 1).unionByName(_with_op(phantom, 1)),
        batch_id=0,
    )
    r_cdc.apply_batch_cdc(_with_op(phantom, -1), batch_id=1)
    r_ins.apply_batch(events, batch_id=0)
    joined = r_cdc.read().join(r_ins.read(), ["event_type"])
    assert _rows(one.read().select(*joined.columns)) == _rows(joined)


def test_mixed_retracting_insert_slice_rows_fails_loudly(
    spark, mixed_agg
):
    """The contract: a -1 CDC row may only retract a row added via
    the CDC slice. Retracting an insert-slice row would strand its
    min/max/HLL contribution — detected by the cumulative CDC net
    going negative, and nothing commits."""
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0)],
        "event_id long, event_type string, value double",
    )
    mixed_agg.apply_batch_mixed(df, batch_id=0)
    head = mixed_agg.table.latest_version()
    with pytest.raises(ValueError, match="CDC-slice"):
        mixed_agg.apply_batch_mixed(
            None, cdc=_with_op(df.limit(1), -1), batch_id=1
        )
    assert mixed_agg.table.latest_version() == head


def test_mixed_replay_skipped_and_bad_op(spark, mixed_agg):
    df = spark.createDataFrame(
        [(1, "a", 10.0)], "event_id long, event_type string, value double"
    )
    mixed_agg.apply_batch_mixed(df, batch_id=0)
    before = _rows(mixed_agg.read())
    assert mixed_agg.apply_batch_mixed(df, batch_id=0) == {"skipped": 0}
    assert _rows(mixed_agg.read()) == before
    with pytest.raises(ValueError, match="must be \\+1 or -1"):
        mixed_agg.apply_batch_mixed(
            None, cdc=df.withColumn("__op", F.lit(7)), batch_id=1
        )


def test_mixed_pure_cdc_bootstrap_yields_empty_sketch(spark, tmp_path):
    """A mixed state whose FIRST commit is pure CDC must store the
    empty sketch (estimate 0), not NULL register arrays (round-8
    review find: the null-filled bootstrap finalized to NULL)."""
    agg = IncrementalAggregate(
        spark, str(tmp_path / "boot"), ["event_type"], MIXED_MEASURES
    )
    df = spark.createDataFrame(
        [(1, "a", 10.0)], "event_id long, event_type string, value double"
    )
    agg.apply_batch_mixed(None, cdc=_with_op(df, 1), batch_id=0)
    row = agg.read().collect()[0]
    assert row["n_events"] == 1
    assert row["n_ids"] == 0.0  # empty sketch: no insert-slice rows
    assert row["min_value"] is None
    # a later insert fold folds into the zero registers normally
    agg.apply_batch_mixed(df, batch_id=1)
    row2 = agg.read().collect()[0]
    assert row2["n_events"] == 2 and row2["n_ids"] > 0
