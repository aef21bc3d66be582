"""SCD-2 merge and incremental fact materialization: the two
maintenance paths a real warehouse needs that the reference's
full-rebuild never exercises."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.scd import apply_scd2
from globalweather_etl_spark.plans import (
    build_warehouse,
    materialize,
    materialize_fact_incremental,
)
from globalweather_etl_spark.sources import (
    AS_OF_DATE,
    load_table,
    weather_staging_from_events,
)

D0 = dt.date(2024, 1, 1)
D1 = dt.date(2024, 2, 1)


@pytest.fixture()
def dim(spark):
    rows = [
        ("P1", "CityA", "US", D0, None, True),
        ("P2", "CityB", "US", D0, None, True),
        ("P3", "CityC", "CA", D0, None, True),
        # pre-existing history row for P1 (already closed)
        ("P1", "OldCityA", "US", dt.date(2023, 1, 1), D0, False),
    ]
    return spark.createDataFrame(
        rows,
        "POSTAL_CODE string, CITY_NAME string, COUNTRY string, "
        "VALID_FROM date, VALID_TO date, IS_CURRENT boolean",
    )


def test_apply_scd2_classifies_all_cases(spark, dim):
    snapshot = spark.createDataFrame(
        [
            ("P1", "CityA", "US"),       # unchanged
            ("P2", "CityB-renamed", "US"),  # changed
            ("P4", "CityD", "US"),       # new key
            # P3 absent -> retired
        ],
        "POSTAL_CODE string, CITY_NAME string, COUNTRY string",
    )
    out = apply_scd2(
        dim, snapshot, ["POSTAL_CODE"], ["CITY_NAME", "COUNTRY"], as_of=D1
    )
    rows = {
        (r["POSTAL_CODE"], r["CITY_NAME"], r["IS_CURRENT"]): r
        for r in out.collect()
    }
    assert len(rows) == 6  # 1 history + 1 unchanged + 2 closed + 2 opened
    # unchanged current row keeps its original VALID_FROM, stays open
    assert rows[("P1", "CityA", True)]["VALID_FROM"] == D0
    # changed key: old version closed at as_of, new version opened
    assert rows[("P2", "CityB", False)]["VALID_TO"] == D1
    assert rows[("P2", "CityB-renamed", True)]["VALID_FROM"] == D1
    # retired key closed, no replacement
    assert rows[("P3", "CityC", False)]["VALID_TO"] == D1
    assert ("P3", "CityC", True) not in rows
    # brand-new key opened
    assert rows[("P4", "CityD", True)]["VALID_FROM"] == D1
    # pre-existing history untouched
    assert rows[("P1", "OldCityA", False)]["VALID_TO"] == D0
    # invariant: exactly one current row per live key
    cur = out.filter("IS_CURRENT").groupBy("POSTAL_CODE").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_apply_scd2_preserves_null_is_current_rows(spark, dim):
    """NULL IS_CURRENT rows are history, not silently dropped."""
    with_null = dim.union(
        spark.createDataFrame(
            [("P9", "CityX", "US", dt.date(2022, 1, 1), dt.date(2023, 1, 1), None)],
            dim.schema,
        )
    )
    snapshot = dim.filter("IS_CURRENT").select(
        "POSTAL_CODE", "CITY_NAME", "COUNTRY"
    )
    out = apply_scd2(
        with_null, snapshot, ["POSTAL_CODE"], ["CITY_NAME", "COUNTRY"], as_of=D1
    )
    assert out.count() == with_null.count()
    kept = out.filter("POSTAL_CODE = 'P9'").collect()
    assert len(kept) == 1 and kept[0]["IS_CURRENT"] is not True


def test_apply_scd2_idempotent_on_same_snapshot(spark, dim):
    snapshot = dim.filter("IS_CURRENT").select(
        "POSTAL_CODE", "CITY_NAME", "COUNTRY"
    )
    out = apply_scd2(
        dim, snapshot, ["POSTAL_CODE"], ["CITY_NAME", "COUNTRY"], as_of=D1
    )
    # same snapshot -> nothing closes, nothing opens
    assert out.count() == dim.count()
    assert out.filter("IS_CURRENT").count() == 3
    assert out.filter(F.col("VALID_TO") == D1).count() == 0


def test_incremental_fact_rewrites_only_target_dates(spark, tmp_path):
    staging = weather_staging_from_events(
        load_table(spark, "/root/testdata/sf0.001", "events")
    )
    wh = build_warehouse(spark, staging, AS_OF_DATE)
    mat = materialize(wh, str(tmp_path))
    full = {
        tuple(r)
        for r in mat.fact.select("DATE_KEY", "LOCATION_KEY", "AVG_TEMP_F",
                                 "PRECIPITATION_7D_SUM").collect()
    }
    target = [dt.date(2024, 1, 10), dt.date(2024, 1, 11)]
    fact2 = materialize_fact_incremental(wh, str(tmp_path), target)
    got = {
        tuple(r)
        for r in fact2.select("DATE_KEY", "LOCATION_KEY", "AVG_TEMP_F",
                              "PRECIPITATION_7D_SUM").collect()
    }
    # rebuilding two days from the same staging must be a no-op:
    # identical rows everywhere, INCLUDING the lookback-dependent
    # 7-row precipitation sums inside the rewritten partitions
    assert got == full
