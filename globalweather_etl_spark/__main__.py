"""CLI: run the full ELT rebuild + validation + dashboards.

    python -m globalweather_etl_spark --sf-dir /root/testdata/sf0.001 \
        --out /tmp/warehouse [--master local[8]] [--json]

Mirrors the reference's operating procedure end to end: execute the
statement sequence of sql/ETL_GlobalWeather_DB.sql (staging -> dims ->
fact, materialized per layer), run both validation queries, then the
five Dashboard.sql queries over the materialized star.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="globalweather_etl_spark")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                   help="landing zone with events.parquet")
    p.add_argument("--out", default=None,
                   help="warehouse output dir (default: temp dir)")
    p.add_argument("--master", default="local[*]")
    p.add_argument("--json", action="store_true",
                   help="emit one JSON object instead of readable text")
    p.add_argument("--top", type=int, default=5,
                   help="rows to show per dashboard (text mode)")
    args = p.parse_args(argv)

    from globalweather_etl_spark.plans import dashboard as dash
    from globalweather_etl_spark.plans import build_warehouse, materialize
    from globalweather_etl_spark.session import get_spark
    from globalweather_etl_spark.sources import (
        AS_OF_DATE,
        load_table,
        weather_staging_from_events,
    )

    spark = get_spark(
        app_name="globalweather-cli",
        master=args.master,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    out_dir = args.out or tempfile.mkdtemp(prefix="gw_warehouse_")
    staging = weather_staging_from_events(load_table(spark, args.sf_dir, "events"))
    wh = materialize(build_warehouse(spark, staging, AS_OF_DATE), out_dir)
    validation = wh.validate()

    dashboards = {
        "q1_avg_temp_by_date": dash.q1(wh.fact, wh.dim_date),
        "q2_top15_cities": dash.q2(wh.fact, wh.dim_location),
        "q3_temp_by_precip_type": dash.q3(wh.fact),
        "q4_forecasts_per_band": dash.q4(wh.fact),
        "q5_pct_rainy_locations": dash.q5(wh.fact),
    }
    results = {
        name: [r.asDict() for r in df.collect()] for name, df in dashboards.items()
    }

    if args.json:
        print(json.dumps(
            {"warehouse": out_dir, "validation": validation,
             "dashboards": results},
            default=str))
    else:
        print(f"warehouse written to {out_dir}")
        print(f"validation: {validation}")
        for name, rows in results.items():
            print(f"\n{name} ({len(rows)} rows, first {args.top}):")
            for r in rows[: args.top]:
                print("  ", r)
    # No spark.stop(): process exit tears the session down for CLI use,
    # and in-process callers (tests) share the getOrCreate session.
    return 0


if __name__ == "__main__":
    sys.exit(main())
