"""Range-clustered write layout: disjoint file ranges, content
round-trip, pruning effectiveness vs a random layout."""

from __future__ import annotations

import pytest
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


# ------------------------------------------------ Hilbert curve


def test_hilbert_automaton_matches_reference_exhaustively():
    """The 4-state automaton (and its chunked LUT) must reproduce the
    classic rotate/reflect xy2d EXACTLY — exhaustive at 8 bits
    (65,536 cells), sampled at 16."""
    import random

    from globalweather_etl_spark.operators.layout import (
        _hilbert_lut,
        hilbert_xy2d,
    )

    states, lut = _hilbert_lut()
    assert len(states) == 4 and len(lut) == 1024

    def lut_xy2d(bits, x, y):
        si, d = 0, 0
        for c in range(bits // 4):
            byte = 0
            for j in range(4):
                level = bits - 1 - (4 * c + j)
                byte |= ((x >> level) & 1) << (7 - 2 * j)
                byte |= ((y >> level) & 1) << (6 - 2 * j)
            enc = lut[si * 256 + byte]
            d = (d << 8) | (enc >> 2)
            si = enc & 3
        return d

    assert all(
        lut_xy2d(8, x, y) == hilbert_xy2d(8, x, y)
        for x in range(256)
        for y in range(256)
    )
    rng = random.Random(7)
    for _ in range(500):
        x, y = rng.randrange(1 << 16), rng.randrange(1 << 16)
        assert lut_xy2d(16, x, y) == hilbert_xy2d(16, x, y)


def test_hilbert_key_expression_matches_reference(spark):
    """The Spark expression (element_at LUT chunks) equals the pure
    reference on a deterministic sample, at both bit widths."""
    import random

    from pyspark.sql import functions as F

    from globalweather_etl_spark.operators.layout import (
        hilbert_key,
        hilbert_xy2d,
    )

    rng = random.Random(13)
    for bits in (8, 16):
        pts = [
            (rng.randrange(1 << bits), rng.randrange(1 << bits))
            for _ in range(300)
        ]
        df = spark.createDataFrame(pts, "x long, y long")
        rows = df.select(
            "x", "y",
            hilbert_key([F.col("x"), F.col("y")], bits=bits).alias("h"),
        ).collect()
        for r in rows:
            assert r["h"] == hilbert_xy2d(bits, r["x"], r["y"])


def test_hilbert_key_validates_inputs(spark):
    from pyspark.sql import functions as F

    from globalweather_etl_spark.operators.layout import hilbert_key

    with pytest.raises(ValueError, match="2-D"):
        hilbert_key([F.col("x")], bits=8)
    with pytest.raises(ValueError, match="multiple of 4"):
        hilbert_key([F.col("x"), F.col("y")], bits=6)
    with pytest.raises(ValueError, match="exceeds"):
        hilbert_key([F.col("x"), F.col("y")], bits=32)


def test_hilbert_locality_beats_or_matches_morton(spark, tmp_path):
    """The reason to exist: over aligned boxes on a 64x64 grid
    clustered into 16 files, the Hilbert layout's touched-file count
    must be <= Morton's in aggregate (its curve ranges are contiguous
    where Morton jumps)."""
    from pyspark.sql import functions as F

    from globalweather_etl_spark.operators.layout import (
        hilbert_key,
        zorder_key,
    )

    # bits=8 for hilbert (multiple of 4); 64x64 grid fits either way
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).cast("long").alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
    )
    hpath, zpath = str(tmp_path / "h"), str(tmp_path / "z")
    write_range_clustered(
        grid.withColumn(
            "k", hilbert_key([F.col("x"), F.col("y")], bits=8)
        ),
        hpath, ["k"], num_files=16,
    )
    write_range_clustered(
        grid.withColumn(
            "k", zorder_key([F.col("x"), F.col("y")], bits=8)
        ),
        zpath, ["k"], num_files=16,
    )

    from globalweather_etl_spark.operators.layout import hilbert_xy2d

    def zorder_ref(x, y, bits=8):
        out = 0
        for b in range(bits):
            out |= ((x >> b) & 1) << (2 * b)
            out |= ((y >> b) & 1) << (2 * b + 1)
        return out

    total_h = total_z = 0
    for bx in range(0, 64, 16):
        for by in range(0, 64, 16):
            cells = [
                (x, y)
                for x in range(bx, bx + 16)
                for y in range(by, by + 16)
            ]
            hvals = [hilbert_xy2d(8, x, y) for x, y in cells]
            zvals = [zorder_ref(x, y) for x, y in cells]
            total_h += len(
                files_for_range(hpath, "k", min(hvals), max(hvals))
            )
            total_z += len(
                files_for_range(zpath, "k", min(zvals), max(zvals))
            )
    assert total_h <= total_z
    assert total_h <= 16 * 4  # each 16x16 box touches a file sliver
