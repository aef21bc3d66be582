"""End-to-end pipeline tests on the hand-built weather fixture."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.plans import (
    build_warehouse,
    q2,
    q5,
)

AS_OF = dt.date(2024, 2, 1)


@pytest.fixture(scope="module")
def wh(spark, weather_fixture):
    return build_warehouse(spark, weather_fixture, AS_OF)


def test_dim_date_parts(wh):
    row = (
        wh.dim_date.filter(F.col("DATE_KEY") == dt.date(2024, 1, 1))
        .collect()[0]
        .asDict()
    )
    assert row == {
        "DATE_KEY": dt.date(2024, 1, 1),
        "FULL_DATE": dt.date(2024, 1, 1),
        "YEAR": 2024,
        "MONTH": 1,
        "DAY": 1,
        "DAY_OF_WEEK": 1,  # Monday, ISO
        "WEEK_OF_YEAR": 1,
        "DAY_OF_YEAR": 1,
    }


def test_dim_location_surrogate_keys_dense_and_ordered(wh):
    rows = wh.dim_location.orderBy("LOCATION_KEY").collect()
    keys = [r["LOCATION_KEY"] for r in rows]
    assert keys == list(range(1, len(rows) + 1))
    tuples = [(r["POSTAL_CODE"], r["CITY_NAME"], r["COUNTRY"]) for r in rows]
    assert tuples == sorted(tuples)
    # SCD-1 bookkeeping columns (ETL:43-45)
    assert all(r["VALID_FROM"] == AS_OF for r in rows)
    assert all(r["VALID_TO"] is None for r in rows)
    assert all(r["IS_CURRENT"] is True for r in rows)


def test_dim_location_fanout_grain(wh):
    """Postal 40004 has two (city, country) pairs -> two dim rows."""
    assert wh.dim_location.filter(F.col("POSTAL_CODE") == "40004").count() == 2


def test_dim_weather_band_members(wh):
    bands = {r["WEATHER_BAND"] for r in wh.dim_weather_band.collect()}
    assert bands == {"Freezing", "Cold", "Mild", "Warm", "Hot"}


def test_dim_precipitation_type_members(wh):
    types = {r["PRECIPITATION_TYPE"] for r in wh.dim_precipitation_type.collect()}
    assert types == {"Snow", "Rain", "None"}


def test_dim_source_single_row(wh):
    rows = wh.dim_source.collect()
    assert len(rows) == 1
    assert rows[0].asDict() == {
        "SOURCE_KEY": 1,
        "PROVIDER": "Weather Source LLC",
        "DATASET_NAME": "Frostbyte",
        "INGEST_METHOD": "Snowflake Marketplace",
    }


def test_fact_fanout_doubles_rows(wh, weather_fixture):
    """J2 joins on POSTAL_CODE alone (ETL:116-118); postal 40004's 2
    staging rows/day each match 2 dim rows -> 4 fact rows/day."""
    n_staging = weather_fixture.filter(F.col("POSTAL_CODE") == "40004").count()
    n_fact = (
        wh.fact.join(
            wh.dim_location.filter(F.col("POSTAL_CODE") == "40004"),
            "LOCATION_KEY",
        ).count()
    )
    assert n_staging == 4 and n_fact == 8


def test_fact_lag_first_row_null(wh):
    """TEMP_DAY_DELTA is NULL on each location's first date (LAG)."""
    loc = (
        wh.dim_location.filter(
            (F.col("POSTAL_CODE") == "30003") & (F.col("CITY_NAME") == "Gapville")
        ).collect()[0]["LOCATION_KEY"]
    )
    rows = (
        wh.fact.filter(F.col("LOCATION_KEY") == loc)
        .orderBy("DATE_KEY")
        .collect()
    )
    assert rows[0]["TEMP_DAY_DELTA"] is None
    # consecutive days: temp = 40 + day -> delta 1.0
    assert rows[1]["TEMP_DAY_DELTA"] == 1.0
    # the gap (jan 5 -> jan 8): LAG skips to previous OBSERVATION, delta 3.0
    assert rows[5]["DATE_KEY"] == dt.date(2024, 1, 8)
    assert rows[5]["TEMP_DAY_DELTA"] == 3.0


def test_fact_7row_sum_is_rows_not_range(wh):
    """Gapville has precip=1.0 on 10 observed days with a 2-day calendar
    gap; a ROWS frame sums the last 7 OBSERVATIONS regardless of gap."""
    loc = (
        wh.dim_location.filter(F.col("POSTAL_CODE") == "30003").collect()[0][
            "LOCATION_KEY"
        ]
    )
    rows = (
        wh.fact.filter(F.col("LOCATION_KEY") == loc)
        .orderBy("DATE_KEY")
        .collect()
    )
    sums = [r["PRECIPITATION_7D_SUM"] for r in rows]
    # running count capped at 7 observations x 1.0 each
    assert sums == [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 7.0, 7.0, 7.0]


def test_fact_identical_without_broadcast_hints(spark, weather_fixture, wh):
    """broadcast_dims=False (the dims-outgrew-broadcast configuration)
    must produce the identical fact via shuffle joins."""
    from globalweather_etl_spark.plans.pipeline import (
        build_dim_date,
        build_dim_location,
        build_dim_precipitation_type,
        build_dim_source,
        build_dim_weather_band,
        build_fact_weather_day,
    )

    fact2 = build_fact_weather_day(
        weather_fixture,
        build_dim_date(weather_fixture),
        build_dim_location(weather_fixture, AS_OF),
        build_dim_weather_band(weather_fixture),
        build_dim_precipitation_type(weather_fixture),
        build_dim_source(spark),
        broadcast_dims=False,
    )
    a = sorted((tuple(r) for r in wh.fact.collect()), key=repr)
    b = sorted((tuple(r) for r in fact2.collect()), key=repr)
    assert a == b


def test_validate(wh):
    result = wh.validate()
    assert result["null_fk_count"] == 0
    assert result["min_temp_f"] == 31.9
    assert result["max_temp_f"] == 90.0


def test_q2_top15_truncates(wh):
    out = q2(wh.fact, wh.dim_location).collect()
    assert len(out) == 15
    # City14/City15 tie exactly at the rank-15/16 boundary: the
    # CITY_NAME tiebreak must admit City14 and exclude City15.
    names = [r["CITY_NAME"] for r in out]
    assert "City14" in names
    assert "City15" not in names


def test_q5_null_precip_in_denominator_only(wh):
    """2024-01-04: Rainy's precip is NULL -> excluded from numerator,
    included in denominator."""
    rows = {r["DATE_KEY"]: r["PCT_LOCATIONS_WITH_RAIN"] for r in q5(wh.fact).collect()}
    # Jan 4: locations = Bandville(0.0 precip), Rainy(NULL), Gapville(1.0)
    # -> 1 rainy of 3 rows
    assert abs(rows[dt.date(2024, 1, 4)] - (1 * 100.0 / 3)) < 1e-9


def test_q5_fanout_can_exceed_intuition(wh):
    """Jan 1 includes the fan-out postal (4 fact rows from 2 staging
    rows, all precip=2.0) — replicating the reference's >100%-capable
    semantics (img/Dashboard.png shows the same artifact). The exact
    value pins the fan-out: 6 rainy fact rows (Rainy, Gapville, 4 from
    the doubled 40004 postal) over 23 fact rows; without fan-out it
    would be 4/21."""
    rows = {r["DATE_KEY"]: r["PCT_LOCATIONS_WITH_RAIN"] for r in q5(wh.fact).collect()}
    assert abs(rows[dt.date(2024, 1, 1)] - 6 * 100.0 / 23) < 1e-9


def test_cache_staging_single_scan_and_identical_results(
    spark, weather_fixture, wh
):
    """cache_staging=True collapses the lazy plan's per-branch staging
    re-derivation: the fact plan reads the checkpoint (zero parquet/
    source scans of staging) and produces bit-identical rows."""
    import io
    from contextlib import redirect_stdout

    cached = build_warehouse(
        spark, weather_fixture, AS_OF, cache_staging=True
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        cached.fact.explain("formatted")
    plan = buf.getvalue()
    # every staging branch reads the checkpointed RDD, not a re-derived
    # staging plan
    assert "Scan ExistingRDD" in plan
    key = lambda rows: sorted(map(tuple, rows), key=repr)  # noqa: E731
    assert key(cached.fact.collect()) == key(wh.fact.collect())


def test_materialize_with_expectations(spark, weather_fixture, tmp_path):
    """A declarative suite rides the fact write (second Observation):
    metrics + verdicts land on the warehouse with zero extra scans,
    the FK helper flags never reach the parquet schema, and the
    values agree with a standalone suite.run() over the same fact."""
    from globalweather_etl_spark.operators.expectations import (
        ExpectationSuite,
        expect_between,
        expect_fk,
        expect_not_null,
        expect_row_count,
    )
    from globalweather_etl_spark.plans import build_warehouse, materialize
    from globalweather_etl_spark.sources import AS_OF_DATE

    wh = build_warehouse(spark, weather_fixture, AS_OF_DATE)
    suite = ExpectationSuite(
        [
            expect_row_count(min_rows=1),
            expect_not_null("DATE_KEY"),
            expect_between("AVG_TEMP_F", -90.0, 140.0),
            expect_fk("DATE_KEY", wh.dim_date, "DATE_KEY"),
        ]
    )
    mat = materialize(wh, str(tmp_path / "wh"), expectations=suite)
    got = mat.observed_expectations
    assert got is not None and all(got["verdicts"].values())
    # no helper flags leaked into the written fact
    assert not [c for c in mat.fact.columns if c.startswith("__exp_fk")]
    # observed metrics == a dedicated scan's report
    rep = {
        r["metric"]: r["value"] for r in suite.run(mat.fact).collect()
    }
    for name, v in got["metrics"].items():
        assert rep[name] == pytest.approx(v)
