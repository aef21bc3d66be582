"""IVM rehearsal: continuous aggregate vs recompute-per-refresh at
2M events.

Synthesizes n events (expression-only: id-derived type/user/value)
arriving as ``n_batches`` equal insert-only batches, and maintains a
(event_type, user_id % buckets) aggregate with count/sum/avg/min/max
measures two ways:

- **incremental** (operators/ivm.py): per batch, one partial
  aggregate + a file-pruned merge of the touched groups;
- **recompute**: the warehouse-default full groupBy over ALL data
  landed so far, once per refresh — what a dashboard pays without
  IVM.

Reports both cumulative walls, the ratio (the IVM payoff grows with
history length — recompute is O(total), refresh is O(batch)), and
verifies the final incremental state is BIT-identical to the final
recompute.

Usage: python tools/rehearse_ivm.py [n_events] [n_batches]
Prints one JSON line; paste into docs/PERF.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from globalweather_etl_spark.operators.ivm import (
    IncrementalAggregate,
    Measure,
)
from globalweather_etl_spark.session import get_spark

MEASURES = [
    Measure("n", "count"),
    Measure("s", "sum", "value"),
    Measure("a", "avg", "value"),
    Measure("lo", "min", "value"),
    Measure("hi", "max", "value"),
]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "16g",
        },
    )
    import tempfile

    root = tempfile.mkdtemp(prefix="ivm_rehearsal_")

    def batch_df(i):
        return (
            spark.range(i * n // n_batches, (i + 1) * n // n_batches)
            .select(
                F.concat(F.lit("t"), (F.col("id") % 7).cast("string")).alias(
                    "event_type"
                ),
                (F.col("id") % 1000).alias("user_bucket"),
                ((F.col("id") * 37) % 9973).cast("double").alias("value"),
            )
        )

    agg = IncrementalAggregate(
        spark, f"{root}/state", ["event_type", "user_bucket"], MEASURES
    )
    inc_walls = []
    for i in range(n_batches):
        t0 = time.perf_counter()
        agg.apply_batch(batch_df(i), batch_id=i)
        inc_walls.append(time.perf_counter() - t0)
    t_inc = sum(inc_walls)

    # recompute baseline: land batches as raw parquet, full groupBy per
    # refresh over everything so far
    rec_walls = []
    for i in range(n_batches):
        batch_df(i).write.mode("append").parquet(f"{root}/raw")
        t0 = time.perf_counter()
        agg.recompute(spark.read.parquet(f"{root}/raw")).count()
        rec_walls.append(time.perf_counter() - t0)
    t_rec = sum(rec_walls)

    inc_rows = sorted(tuple(r) for r in agg.read().collect())
    rec_rows = sorted(
        tuple(r)
        for r in agg.recompute(spark.read.parquet(f"{root}/raw")).collect()
    )
    print(
        json.dumps(
            {
                "n_events": n,
                "n_batches": n_batches,
                "n_groups": 7000,
                "incremental_total_s": round(t_inc, 2),
                "recompute_total_s": round(t_rec, 2),
                "inc_first_last_s": [round(inc_walls[0], 2),
                                     round(inc_walls[-1], 2)],
                "rec_first_last_s": [round(rec_walls[0], 2),
                                     round(rec_walls[-1], 2)],
                "speedup_x": round(t_rec / t_inc, 2),
                "state_bit_identical": inc_rows == rec_rows,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
