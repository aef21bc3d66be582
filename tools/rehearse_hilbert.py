"""Hilbert vs Morton clustering rehearsal: file-touch counts and read
walls through the REAL snapshot path (write_zordered -> build_stats ->
read_box) at millions of rows.

What this measures (the 100 TB claim under test): a Hilbert layout's
box reads should touch FEWER files than Morton's on the same data,
same file count, same zone maps — locality is the entire reason the
curve option exists, and at 100 TB "files touched" IS the query cost
(each file is an object-store GET + a footer parse + a scan). The
rehearsal runs a grid of 2-D date x key boxes against both layouts
and reports candidate-file counts from the zone-map planner plus the
end-to-end read walls.

Usage: python tools/rehearse_hilbert.py [n_rows] [n_files]
Prints one JSON line; paste into docs/PERF.md.
"""

from __future__ import annotations

import datetime as dt
import json
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from globalweather_etl_spark.session import get_spark  # noqa: E402
from globalweather_etl_spark.sources.snapshots import (  # noqa: E402
    SnapshotTable,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark(
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    base = tempfile.mkdtemp(prefix="hilbert-rehearsal-")
    # two independent axes: 2 years of dates x a key space — uniform,
    # so the comparison isolates CURVE locality, not skew handling
    df = spark.range(n).select(
        F.date_add(
            F.lit("2024-01-01").cast("date"),
            F.pmod(F.xxhash64("id"), F.lit(730)).cast("int"),
        ).alias("d"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100_000)).alias("u"),
        (F.col("id") % 997).cast("double").alias("val"),
    )

    tables = {}
    walls = {}
    for curve in ("morton", "hilbert"):
        t = SnapshotTable(spark, f"{base}/{curve}")
        t0 = time.monotonic()
        t.write_zordered(
            df, ["d", "u"], n_files=n_files, bits=16, mode="overwrite",
            curve=curve,
        )
        t.build_stats(cols=["d", "u"])
        walls[f"{curve}_write_s"] = round(time.monotonic() - t0, 2)
        tables[curve] = t

    # 3x3 grid of boxes: month-scale date bands x 10% key bands
    boxes = []
    for i in range(3):
        d_lo = dt.date(2024, 1, 1) + dt.timedelta(days=60 + 200 * i)
        for j in range(3):
            boxes.append(
                (
                    ("d", d_lo, d_lo + dt.timedelta(days=45)),
                    ("u", 10_000 * (j + 1), 10_000 * (j + 2)),
                )
            )

    out = {"n_rows": n, "n_files": n_files, **walls}
    for curve, t in tables.items():
        touched = 0
        rows = 0
        t0 = time.monotonic()
        for box in boxes:
            cands = t.files_for_range(
                box[0][0], box[0][1], box[0][2]
            )
            cands2 = t.files_for_range(
                box[1][0], box[1][1], box[1][2]
            )
            touched += len(set(cands) & set(cands2))
            rows += t.read_box(list(box)).count()
        out[f"{curve}_files_touched"] = touched
        out[f"{curve}_rows"] = rows
        out[f"{curve}_read_s"] = round(time.monotonic() - t0, 2)
    out["hilbert_vs_morton_files"] = round(
        out["hilbert_files_touched"] / max(1, out["morton_files_touched"]),
        3,
    )
    assert out["hilbert_rows"] == out["morton_rows"]  # same answers
    print(json.dumps(out))


if __name__ == "__main__":
    main()
