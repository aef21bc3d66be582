"""Capture the executed per-round plan of pagerank_exact (round 14
evidence): runs the operator on the bench's supplier->part graph with a
hook that dumps the LAST round's state-materialization plan.

Usage: python tools/opt/capture_pagerank_plan.py <out.txt>
"""

from __future__ import annotations

import io
import contextlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from pyspark.sql import functions as F


def main() -> None:
    out_path = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from globalweather_etl_spark.session import get_spark
    from globalweather_etl_spark.sources import load_table
    import importlib

    pr = importlib.import_module(
        "globalweather_etl_spark.operators.pagerank"
    )

    spark = get_spark(
        app_name="plan-capture-pagerank",
        master="local[8]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
    )

    captured: list[str] = []
    orig_ckpt = None

    # hook: wrap DataFrame.localCheckpoint to dump the plan being
    # materialized (the round's state build) before checkpointing
    from pyspark.sql.classic.dataframe import DataFrame

    orig_ckpt = DataFrame.localCheckpoint

    def hooked(self, eager=True, storageLevel=None):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            self.explain("formatted")
        captured.append(buf.getvalue())
        if storageLevel is None:
            return orig_ckpt(self, eager=eager)
        return orig_ckpt(self, eager=eager, storageLevel=storageLevel)

    DataFrame.localCheckpoint = hooked
    try:
        pr.pagerank_exact(edges, n_iter=3).write.format("noop").mode(
            "overwrite"
        ).save()
    finally:
        DataFrame.localCheckpoint = orig_ckpt
    with open(out_path, "w") as f:
        f.write(
            "== pagerank_exact per-round state materialization plan "
            "(LAST round of n_iter=3; all rounds share the shape) ==\n\n"
        )
        f.write(captured[-1])
    print(f"wrote {out_path} ({len(captured)} round plans captured)")


if __name__ == "__main__":
    main()
