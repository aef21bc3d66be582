"""Local driver-sim: run every queries() entry against its oracle_sql()
via DuckDB on the same parquet, and compare BOTH ways:

- string mode (round-1 checker): row tuples stringified and sorted —
  catches value errors but masks dtype differences.
- pandas mode (driver-faithful, added round 3): Spark `toPandas()` vs
  DuckDB `fetchdf()`, columns sorted case-insensitively, frames
  `sort_values`-canonicalized, then stringified per-cell and hashed.
  This reproduces the grading driver's comparison class: a list-typed
  cell raises `unhashable type: 'list'` in sort_values exactly like the
  driver's `_canon` (round-2 media_features / docs_approx_stats errs),
  and a DuckDB HUGEINT sum arriving as float64 ('3.0' vs '3') breaks
  the hash exactly like round-2 media_metadata_stats. Queries with no
  oracle still get their Spark side canonicalized — the driver does
  too, and errs there even for rows-only entries.

Usage: python tools/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
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
    """String mode: sort columns by name, then rows; stringify.

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


def _cell_str(v) -> str:
    """Dtype-sensitive but engine-bridging cell rendering.

    - int64 3 renders '3', float64 3.0 renders '3.0' — dtype mismatches
      (the HUGEINT-sum class) are CAUGHT.
    - Nulls unify: Spark `toPandas()` yields None/NaT where DuckDB
      `fetchdf()` yields NaN/NaT for the same SQL NULL.
    - Dates unify: Spark DATE arrives as datetime.date objects, DuckDB
      DATE as midnight datetime64 — same engine-level type, rendered
      identically ('2026-08-13').
    """
    import datetime

    import pandas as pd

    if v is None or v is pd.NaT:
        return "∅"
    if isinstance(v, float) and math.isnan(v):
        return "∅"
    if isinstance(v, pd.Timestamp):
        if v == v.normalize():
            return str(v.date())
        return str(v)
    if isinstance(v, datetime.datetime):
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return str(v.date())
        return str(v)
    return str(v)


def canon_pandas(pdf):
    """Driver-faithful canonicalization of a typed pandas frame:
    case-insensitive column sort, whole-frame sort_values (raises on
    unhashable cells — intentionally, that IS the driver behavior),
    then per-cell dtype-sensitive rendering."""
    cols = sorted(pdf.columns, key=str.lower)
    pdf = pdf[cols]
    if len(pdf):
        pdf = pdf.sort_values(by=cols, kind="mergesort")
    pdf = pdf.reset_index(drop=True)
    return pdf.apply(lambda col: col.map(_cell_str))


def pandas_hash(str_pdf) -> str:
    payload = "\x1f".join(
        "\x1e".join(row) for row in str_pdf.itertuples(index=False, name=None)
    )
    return hashlib.md5(payload.encode()).hexdigest()


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
            s_pdf = sdf.toPandas()
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        # Pandas canonicalization of the Spark side runs even for
        # rows-only entries (the driver's does).
        try:
            s_canon = canon_pandas(s_pdf)
        except Exception as e:
            print(f"FAIL {name}: spark-side pandas canon error "
                  f"(driver would err too): {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(s_rows)} rows (canon ok)")
            n_rows_only += 1
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [c[0] for c in res.description]
            d_pdf = res.fetchdf()
            res2 = con.execute(oracles[name])
            d_rows = res2.fetchall()
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
        # Driver-faithful hash on dtype-preserved frames.
        try:
            d_canon = canon_pandas(d_pdf)
        except Exception as e:
            print(f"FAIL {name}: oracle-side pandas canon error: "
                  f"{type(e).__name__}: {e}")
            n_fail += 1
            continue
        sh, dh = pandas_hash(s_canon), pandas_hash(d_canon)
        if sh != dh:
            diff_cols = [
                c for c in s_canon.columns
                if not s_canon[c].equals(d_canon[c])
            ]
            examples = {
                c: (s_canon[c].iloc[0], d_canon[c].iloc[0])
                for c in diff_cols[:3]
                if len(s_canon)
            }
            print(f"FAIL {name}: values match as strings but pandas "
                  f"dtype-hash differs (driver would fail); "
                  f"cols {diff_cols[:5]} e.g. {examples}")
            n_fail += 1
            continue
        print(f"PASS {name}: {len(sn)} rows (string + pandas hash)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
