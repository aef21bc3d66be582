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


def test_zorder_key_hand_computed(spark):
    from pyspark.sql import functions as F

    from globalweather_etl_spark.operators.layout import zorder_key

    df = spark.createDataFrame([(3, 5)], "x int, y int")
    # x=011, y=101 interleaved (x bit b -> pos 2b, y bit b -> pos 2b+1):
    # pos0=x0=1, pos1=y0=1, pos2=x1=1, pos3=y1=0, pos4=x2=0, pos5=y2=1
    # = 1 + 2 + 4 + 32 = 39
    got = df.select(
        zorder_key([F.col("x"), F.col("y")], bits=3).alias("z")
    ).first()["z"]
    assert got == 39


def test_zorder_clustering_prunes_2d_boxes(spark, tmp_path):
    """On a 64x64 grid clustered 16 files by z-key, an aligned 8x8 box
    maps to ONE contiguous z-range and touches a small file subset; an
    x-only clustering answers y-box queries with every file."""
    from pyspark.sql import functions as F

    from globalweather_etl_spark.operators.layout import zorder_key

    grid = (
        spark.range(64 * 64)
        .select(
            (F.col("id") % 64).cast("int").alias("x"),
            (F.col("id") / 64).cast("int").alias("y"),
        )
        .withColumn("z", zorder_key([F.col("x"), F.col("y")], bits=6))
    )
    zpath = str(tmp_path / "z")
    xpath = str(tmp_path / "x")
    write_range_clustered(grid, zpath, ["z"], num_files=16)
    write_range_clustered(grid, xpath, ["x"], num_files=16)

    # aligned 8x8 box: x,y in [8,15] -> z in [zorder(8,8), zorder(15,15)]
    lo = spark.createDataFrame([(8, 8), (15, 15)], "x int, y int").select(
        zorder_key([F.col("x"), F.col("y")], bits=6).alias("z")
    ).collect()
    zlo, zhi = lo[0]["z"], lo[1]["z"]
    n_z = len(files_for_range(zpath, "z", zlo, zhi))
    assert n_z <= 4  # 64 cells of 4096 -> a sliver of the z-line

    # x-clustered layout cannot prune a y-box at all
    n_x_for_y = len(files_for_range(xpath, "x", 0, 63))  # y predicate
    assert n_x_for_y == len(file_ranges(xpath, "x"))

    # and the z-range really contains every box cell
    sel = files_for_range(zpath, "z", zlo, zhi)
    got = (
        spark.read.parquet(*[f"{zpath}/{f}" for f in sel])
        .filter(
            (F.col("x").between(8, 15)) & (F.col("y").between(8, 15))
        )
        .count()
    )
    assert got == 64
