"""Local driver-sim: run every queries() entry against its oracle_sql()
via DuckDB on the same parquet, compare row count + schema + sorted
values. Usage: python tools/check_correctness.py [sf_dir] [name ...]"""

from __future__ import annotations

import math
import os
import sys
import time

# Pin the PROCESS timezone before any session exists: PySpark collect()
# renders TimestampType via host-local time, DuckDB returns naive UTC
# wall times — on a non-UTC host every timestamp column would
# spuriously mismatch.
os.environ["TZ"] = "UTC"
time.tzset()

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entry_mod
from globalweather_etl_spark.session import get_spark
from globalweather_etl_spark.sources.registry import TESTDATA_TABLES


def normalize(rows, columns):
    """Sort columns by name, then rows; stringify for comparison.

    The sort key is lowercased to match the case-insensitive column-name
    equality check below: a case-sensitive sort could order the same
    columns differently between engines that report identifier case
    differently, misaligning values."""
    idx = sorted(range(len(columns)), key=lambda i: columns[i].lower())
    out = []
    for row in rows:
        vals = []
        for i in idx:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(repr(v))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [columns[i] for i in idx], out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    unknown = only - set(queries)
    if unknown:
        print(f"unknown query name(s): {sorted(unknown)}")
        return 2
    n_pass = n_fail = n_rows_only = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(s_rows)} rows")
            n_rows_only += 1
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [c[0] for c in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sc, sn = normalize(s_rows, s_cols)
        dc, dn = normalize(d_rows, d_cols)
        if len(sn) != len(dn):
            print(f"FAIL {name}: row count {len(sn)} vs {len(dn)}")
            n_fail += 1
            continue
        if [c.lower() for c in sc] != [c.lower() for c in dc]:
            print(f"FAIL {name}: columns {sc} vs {dc}")
            n_fail += 1
            continue
        if sn != dn:
            bad = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            print(f"FAIL {name}: {sum(a != b for a, b in zip(sn, dn))} value "
                  f"mismatches of {len(sn)}; first: {bad}")
            n_fail += 1
            continue
        print(f"PASS {name}: {len(sn)} rows")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
