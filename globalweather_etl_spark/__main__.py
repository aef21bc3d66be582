"""CLI: run the full ELT rebuild + validation + dashboards, or the
corpus-curation pipeline.

    python -m globalweather_etl_spark --sf-dir /root/testdata/sf0.001 \
        --out /tmp/warehouse [--master local[8]] [--json]

    python -m globalweather_etl_spark --mode curate \
        --sf-dir /root/testdata/sf0.001 --out /tmp/curated [--json] \
        [--benchmark-mod 7] [--min-quality 0.3] [--token-budget 2048]

etl mode mirrors the reference's operating procedure end to end:
execute the statement sequence of sql/ETL_GlobalWeather_DB.sql
(staging -> dims -> fact, materialized per layer), run both validation
queries, then the five Dashboard.sql queries over the materialized
star. curate mode runs plans/curation.py over the documents table and
writes the packed, split corpus as parquet partitioned by split.
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
    p.add_argument("--mode", choices=["etl", "curate", "snapshot"],
                   default="etl",
                   help="etl: warehouse rebuild + dashboards; "
                        "curate: corpus curation over documents; "
                        "snapshot: audited commit of documents into a "
                        "versioned table + history/diff report")
    p.add_argument("--transactional", action="store_true",
                   help="etl: publish the rebuild as ONE multi-table "
                        "transaction into a SnapshotCatalog at --out — "
                        "readers see all ten tables flip at once "
                        "(sources/catalog.py)")
    p.add_argument("--benchmark-mod", type=int, default=None,
                   help="curate: decontaminate against the doc_id %% N "
                        "== 0 slice (default: no decontamination)")
    p.add_argument("--min-quality", type=float, default=0.3,
                   help="curate: quality-score floor")
    p.add_argument("--token-budget", type=int, default=2048,
                   help="curate: tokens per packed bin")
    args = p.parse_args(argv)

    if args.mode == "curate":
        return _curate(args)
    if args.mode == "snapshot":
        return _snapshot(args)

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
    versions = None
    if args.transactional:
        from globalweather_etl_spark.plans import (
            materialize_transactional,
        )
        from globalweather_etl_spark.sources.catalog import (
            SnapshotCatalog,
        )

        wh, versions = materialize_transactional(
            build_warehouse(spark, staging, AS_OF_DATE),
            SnapshotCatalog(spark, out_dir),
        )
    else:
        wh = materialize(
            build_warehouse(spark, staging, AS_OF_DATE), out_dir
        )
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
             **({"versions": versions} if versions else {}),
             "dashboards": results},
            default=str))
    else:
        print(f"warehouse written to {out_dir}")
        if versions:
            print(f"transactional versions: {versions}")
        print(f"validation: {validation}")
        for name, rows in results.items():
            print(f"\n{name} ({len(rows)} rows, first {args.top}):")
            for r in rows[: args.top]:
                print("  ", r)
    # No spark.stop(): process exit tears the session down for CLI use,
    # and in-process callers (tests) share the getOrCreate session.
    return 0


def _snapshot(args) -> int:
    """Audited snapshot commit of the documents table into a versioned
    SnapshotTable at --out (write-audit-publish; one full snapshot
    per run, so doc_id stays a key across versions), then the history and
    — from the second commit on — the head-vs-parent diff summary."""
    import tempfile as _tf

    from globalweather_etl_spark.operators.expectations import (
        ExpectationSuite,
        expect_not_null,
        expect_row_count,
        expect_unique,
    )
    from globalweather_etl_spark.operators.table_diff import diff_summary
    from globalweather_etl_spark.session import get_spark
    from globalweather_etl_spark.sources import SnapshotTable, load_table

    spark = get_spark(
        app_name="globalweather-snapshot",
        master=args.master,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    out_dir = args.out or _tf.mkdtemp(prefix="gw_snapshots_")
    docs = load_table(spark, args.sf_dir, "documents")
    suite = ExpectationSuite(
        [
            expect_row_count(min_rows=1),
            expect_not_null("doc_id"),
            expect_unique(["doc_id"]),
        ]
    )
    t = SnapshotTable(spark, out_dir)
    version = t.write_audited(docs, suite, mode="overwrite")
    history = [
        {"version": h.version, "mode": h.mode, "n_files": h.n_files,
         "n_rows": h.n_rows}
        for h in t.history()
    ]
    diff = None
    if version > 1:
        [row] = diff_summary(
            t.diff(version - 1, version, ["doc_id"])
        ).collect()
        diff = {k: row[k] for k in
                ("n_inserted", "n_deleted", "n_updated", "n_unchanged")}
    if args.json:
        print(json.dumps({"table": out_dir, "committed_version": version,
                          "history": history, "head_vs_parent": diff}))
    else:
        print(f"committed v{version} at {out_dir}")
        for h in history:
            print(f"  v{h['version']}: {h['n_rows']} rows ({h['mode']})")
        if diff:
            print(f"  head vs parent: {diff}")
    return 0


def _curate(args) -> int:
    import tempfile as _tf

    from pyspark.sql import functions as F

    from globalweather_etl_spark.plans import curate_documents
    from globalweather_etl_spark.session import get_spark
    from globalweather_etl_spark.sources import load_table

    spark = get_spark(
        app_name="globalweather-curate",
        master=args.master,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    out_dir = args.out or _tf.mkdtemp(prefix="gw_curated_")
    docs = load_table(spark, args.sf_dir, "documents")
    benchmark = (
        docs.filter(F.col("doc_id") % args.benchmark_mod == 0)
        if args.benchmark_mod
        else None
    )
    res = curate_documents(
        docs,
        benchmark=benchmark,
        min_quality=args.min_quality,
        token_budget=args.token_budget,
    )
    res.curated.write.mode("overwrite").partitionBy("split").parquet(out_dir)
    counts = res.counts()
    if args.json:
        print(json.dumps({"curated_dir": out_dir, "stages": counts}))
    else:
        print(f"curated corpus written to {out_dir}")
        for stage, n in counts.items():
            print(f"  {stage}: {n}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
