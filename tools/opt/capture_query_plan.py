"""Dump the formatted plan of one registry query to a file (round-14
plan evidence).

Usage: python tools/opt/capture_query_plan.py <query> <out.txt>
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main() -> None:
    name, out_path = sys.argv[1], sys.argv[2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from globalweather_etl_spark.queries import QUERIES
    from globalweather_etl_spark.session import get_spark

    spark = get_spark(
        app_name="plan-capture",
        master="local[8]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    df = QUERIES[name](spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(out_path, "w") as f:
        f.write(f"== {name} formatted plan ==\n\n")
        f.write(buf.getvalue())
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
