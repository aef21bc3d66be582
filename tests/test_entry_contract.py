"""Driver-contract invariants for __spark_entry__: the grading driver
assumes these exactly; a drift here silently zeroes a round's grades.

Heavy execution (all 50 queries vs oracles) lives in
tools/check_correctness.py; this test pins the cheap structural
contract on every pytest run.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


def test_registry_keys_and_sizes():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    # driver grades at most 50; every query needs its oracle twin
    assert len(q) == 50
    assert set(o) == set(q)
    assert all(isinstance(sql, str) and sql.strip() for sql in o.values())


def test_oracles_are_valid_duckdb_sql():
    """Every oracle must at least PREPARE against the real tables —
    catches typos/renames without paying full execution."""
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    bad = []
    for name, sql in entry_mod.oracle_sql().items():
        try:
            con.execute(f"SELECT * FROM ({sql}) LIMIT 0")
        except Exception as e:  # noqa: BLE001 - collecting all failures
            bad.append((name, str(e).splitlines()[0]))
    assert not bad, bad


def test_entry_runs_and_is_stable(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    again = entry_mod.entry(spark).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    assert df.schema == entry_mod.entry(spark).schema
