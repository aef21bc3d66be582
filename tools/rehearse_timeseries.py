"""Time-series operator rehearsal: rolling anomalies + EWMA/CUSUM at
millions of rows over many series.

What this measures (the 100 TB claims under test):

- **One exchange each, parallel across series**: rolling_anomalies
  plans one Window exchange+sort on the series key;
  series_monitor one groupBy exchange. Wall must scale with
  rows/core, not series count (100k series x 50 points and 1k series
  x 5000 points are both fine shapes).
- **Bounded state**: the anomaly window carries O(window_rows) per
  row; the monitor fold carries one ordered array per group inside
  the aggregation buffer — no driver collection anywhere.
- **Detection sanity at scale**: the salted drift/spike series (known
  ids) must be flagged, the clean majority must not drown them.

Usage: python tools/rehearse_timeseries.py [n_rows] [n_series]
Prints one JSON line; paste into docs/PERF.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from globalweather_etl_spark.operators.anomaly import (  # noqa: E402
    rolling_anomalies,
)
from globalweather_etl_spark.operators.timeseries import (  # noqa: E402
    series_monitor,
)
from globalweather_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_series = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    spark = get_spark(
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    # deterministic synthetic: gaussian-ish base via hash folds, a
    # +25 level shift salted into every 1000th series' second half,
    # and a 9999 spike at one position of every 500th series
    base = spark.range(n).select(
        (F.col("id") % n_series).alias("sid"),
        (F.col("id") / n_series).cast("long").alias("seq"),
        (
            F.lit(50.0)
            + (F.pmod(F.xxhash64("id"), F.lit(201)) - 100)
            / F.lit(100.0)
        ).alias("value"),
    )
    half = n // n_series // 2
    df = base.withColumn(
        "value",
        F.when(
            (F.col("sid") % 1000 == 0) & (F.col("seq") >= half),
            F.col("value") + 25.0,
        )
        .when(
            (F.col("sid") % 500 == 0)
            & (F.col("sid") % 1000 != 0)
            & (F.col("seq") == half),
            F.lit(9999.0),
        )
        .otherwise(F.col("value")),
    )
    df.persist()
    df.count()

    t0 = time.monotonic()
    anomalies = rolling_anomalies(
        df, "value", ["seq"], ["sid"], window_rows=7
    )
    # recall: the salted 9999 spikes must be flagged AT their position
    spike_hits = anomalies.filter(
        (F.col("sid") % 500 == 0)
        & (F.col("sid") % 1000 != 0)
        & (F.col("seq") == half)
        & F.col("VALUE_IS_ANOMALY")
    ).count()
    total_flags = anomalies.filter(F.col("VALUE_IS_ANOMALY")).count()
    wall_anom = round(time.monotonic() - t0, 2)

    t1 = time.monotonic()
    mon = series_monitor(
        df, "value", ["seq"], ["sid"], slack_k=2.0, threshold_h=40.0
    )
    drifted = mon.filter(F.col("cusum_alarms") > 0).count()
    wall_mon = round(time.monotonic() - t1, 2)

    print(
        json.dumps(
            {
                "rehearsal": "timeseries",
                "n_rows": n,
                "n_series": n_series,
                "anomaly_wall_s": wall_anom,
                "monitor_wall_s": wall_mon,
                "spike_recall_hits": spike_hits,
                "total_flags": total_flags,
                "series_with_cusum_alarms": drifted,
                "expected_drift_series": n_series // 1000,
                "expected_spike_series": n_series // 500
                - n_series // 1000,
            }
        )
    )


if __name__ == "__main__":
    main()
