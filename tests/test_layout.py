"""Range-clustered write layout: disjoint file ranges, content
round-trip, pruning effectiveness vs a random layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from globalweather_etl_spark.operators.layout import (
    file_ranges,
    files_for_range,
    write_range_clustered,
)
from globalweather_etl_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_clustered_files_are_disjoint_and_roundtrip(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    out = str(tmp_path / "clustered")
    write_range_clustered(events, out, ["ts"], num_files=8)

    ranges = file_ranges(out, "ts")
    assert len(ranges) >= 2
    # disjoint: sorted by min, each file's max < next file's min
    # (ties at boundaries allowed: <=)
    rs = sorted(ranges, key=lambda r: r[1])
    for (_, _, amax), (_, bmin, _) in zip(rs, rs[1:]):
        assert amax <= bmin

    # identical content (layout, not content)
    got = spark.read.parquet(out)
    assert got.count() == events.count()
    a = sorted(tuple(r) for r in got.collect())
    b = sorted(tuple(r) for r in events.collect())
    assert a == b


def test_range_prune_touches_few_files(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events").select("event_id", "ts")
    clustered = str(tmp_path / "c")
    random = str(tmp_path / "r")
    write_range_clustered(events, clustered, ["ts"], num_files=8)
    # random layout: hash-exchange on a high-entropy key
    events.repartition(8, "event_id").write.parquet(random)

    lo, hi = events.agg(F.min("ts"), F.max("ts")).first()
    span = hi - lo
    qlo, qhi = lo + span / 3, lo + span / 3 + span / 20  # ~5% slice

    n_clustered = len(files_for_range(clustered, "ts", qlo, qhi))
    n_random = len(files_for_range(random, "ts", qlo, qhi))
    total = len(file_ranges(random, "ts"))
    # random layout: every file intersects; clustered: a small subset
    assert n_random == total
    assert n_clustered <= max(2, total // 3)

    # the pruned file subset still contains every matching row
    sel = files_for_range(clustered, "ts", qlo, qhi)
    got = (
        spark.read.parquet(*[f"{clustered}/{f}" for f in sel])
        .filter((F.col("ts") >= qlo) & (F.col("ts") <= qhi))
        .count()
    )
    want = events.filter((F.col("ts") >= qlo) & (F.col("ts") <= qhi)).count()
    assert got == want and want > 0


def test_composite_key_and_validation(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events").select("user_id", "ts")
    out = str(tmp_path / "ck")
    write_range_clustered(events, out, ["user_id", "ts"], num_files=4)
    assert len(file_ranges(out, "user_id")) >= 2
    try:
        write_range_clustered(events, out, [])
        raise AssertionError("empty cluster_cols must raise")
    except ValueError:
        pass
