"""series_monitor_big rehearsal: ONE series x 10M rows (round 11).

The guarded sequential fold (series_monitor) holds a whole series in
one aggregation buffer — the single unbounded-per-group shape the r10
verdict flagged. This drives the segmented two-level fold on the
pathological input (one key, 10M rows), checks it completes with
bounded per-task memory (segment_rows = 262,144 -> ~39 affine
partials at the second level), and cross-checks EWMA/Holt against a
NumPy sequential reference to 1e-6 (float associativity differs; the
recursion is a contraction so error decays).

Also verifies the guard: series_monitor with max_series_rows below
10M must fail LOUDLY, not OOM silently.

Usage: python tools/rehearse_series_big.py [n_rows]
Prints one JSON line; paste into docs/PERF.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
from pyspark.sql import functions as F

from globalweather_etl_spark.session import get_spark
from globalweather_etl_spark.operators.timeseries import (
    series_monitor,
    series_monitor_big,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark(
        app_name="rehearse-series-big",
        master="local[8]",
        shuffle_partitions=16,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    # one series: deterministic pseudo-random walk around 50
    df = spark.range(0, n, 1, 32).select(
        F.lit(1).alias("user_id"),
        F.col("id").alias("seq"),
        (
            F.lit(50.0)
            + (F.hash(F.col("id").cast("string")) % 1000) / 100.0
        ).alias("value"),
    )
    t0 = time.perf_counter()
    row = series_monitor_big(
        df, "value", ["seq"], ["user_id"], segment_rows=262_144
    ).collect()[0]
    big_wall = time.perf_counter() - t0

    # NumPy sequential reference on the same values
    t0 = time.perf_counter()
    vals = np.array(
        df.orderBy("seq").select("value").toPandas()["value"],
        dtype=np.float64,
    )
    alpha, beta = 0.3, 0.1
    s = vals[0]
    level, trend = vals[0], 0.0
    for v in vals[1:]:
        s = alpha * v + (1 - alpha) * s
        nl = alpha * v + (1 - alpha) * (level + trend)
        trend = beta * (nl - level) + (1 - beta) * trend
        level = nl
    ref_wall = time.perf_counter() - t0
    assert abs(row["ewma"] - s) < 1e-6, (row["ewma"], s)
    assert abs(row["holt_level"] - level) < 1e-6
    assert abs(row["holt_trend"] - trend) < 1e-6
    assert row["n"] == n

    # the guard fails loudly below the limit (checked on a slice that
    # still FITS in the aggregation buffer: the guard is a
    # post-collection check — past genuine OOM scale the collect
    # itself dies first, which is exactly why series_monitor_big
    # exists)
    guard_msg = None
    try:
        series_monitor(
            df.limit(min(n, 2_000_000)),
            "value", ["seq"], ["user_id"], max_series_rows=1000,
        ).collect()
    except Exception as e:  # noqa: BLE001
        guard_msg = "max_series_rows" in str(e)

    print(
        json.dumps(
            {
                "metric": "series_big_rehearsal",
                "n_rows": n,
                "big_wall_s": round(big_wall, 2),
                "numpy_ref_wall_s": round(ref_wall, 2),
                "ewma_abs_err": abs(row["ewma"] - s),
                "holt_level_abs_err": abs(row["holt_level"] - level),
                "guard_raises_loudly": bool(guard_msg),
            }
        )
    )


if __name__ == "__main__":
    main()
