"""asof_join edge semantics: inclusive ties, no-match NULLs, per-key
isolation — pinned explicitly (the DuckDB oracle covers the bulk)."""

from __future__ import annotations

import datetime as dt

import pytest

from globalweather_etl_spark.operators.asof import asof_join


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


@pytest.fixture(scope="module")
def joined(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts(9)),    # before any right row -> NULL
            (2, "u1", _ts(10)),   # exact tie with right at 10:00 -> matches it
            (3, "u1", _ts(11)),   # between 10:00 and 12:00 -> 10:00
            (4, "u1", _ts(13)),   # after 12:00 -> 12:00
            (5, "u2", _ts(12)),   # other key: only u2's rows visible
        ],
        "id long, k string, t timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(10), 100.0),
            ("u1", _ts(12), 120.0),
            ("u2", _ts(11), 999.0),
        ],
        "k string, rt timestamp, v double",
    )
    out = asof_join(left, right, ["k"], "t", "rt", ["rt", "v"])
    return {r["id"]: r for r in out.collect()}


def test_no_preceding_row_gives_null(joined):
    assert joined[1]["v"] is None and joined[1]["rt"] is None


def test_equal_timestamps_match_inclusively(joined):
    assert joined[2]["v"] == 100.0


def test_latest_preceding_wins(joined):
    assert joined[3]["v"] == 100.0
    assert joined[4]["v"] == 120.0 and joined[4]["rt"] == _ts(12)


def test_keys_are_isolated(joined):
    assert joined[5]["v"] == 999.0
    assert len(joined) == 5  # every left row exactly once


def test_null_value_in_matched_row_is_not_torn(spark):
    """The matched right row travels as a unit: a NULL value in the
    latest preceding row must surface as NULL, never spliced with an
    older row's value (regression: per-column carry-forward)."""
    left = spark.createDataFrame(
        [(1, "u", _ts(13))], "id long, k string, t timestamp"
    )
    right = spark.createDataFrame(
        [("u", _ts(10), 5.0), ("u", _ts(12), None)],
        "k string, rt timestamp, v double",
    )
    row = asof_join(left, right, ["k"], "t", "rt", ["rt", "v"]).collect()[0]
    assert row["rt"] == _ts(12)
    assert row["v"] is None
