"""register_warehouse: dashboard SQL over the registered views must
match the DataFrame-API dashboards, and the materialized fact must give
partition-pruned scans for date filters."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from globalweather_etl_spark.plans import (
    build_warehouse,
    materialize,
    q1,
    register_warehouse,
)
from globalweather_etl_spark.sources import (
    AS_OF_DATE,
    load_table,
    weather_staging_from_events,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def wh(spark):
    staging = weather_staging_from_events(load_table(spark, SF_DIR, "events"))
    return build_warehouse(spark, staging, AS_OF_DATE)


def test_sql_dashboard_matches_dataframe_dashboard(spark, wh):
    register_warehouse(wh)
    got = spark.sql(
        """
        SELECT d.FULL_DATE,
               round(CAST(sum(CAST(f.AVG_TEMP_F AS DECIMAL(25,12))) AS DOUBLE)
                     / count(f.AVG_TEMP_F), 6) AS AVG_TEMP_F
        FROM DIMENSIONAL__FACT_WEATHER_DAY f
        JOIN DIMENSIONAL__DIM_DATE d ON f.DATE_KEY = d.DATE_KEY
        GROUP BY d.FULL_DATE ORDER BY d.FULL_DATE
        """
    ).collect()
    want = q1(wh.fact, wh.dim_date).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_dashboard_scan_prunes_columns(spark, wh, tmp_path_factory):
    """Dashboard Q1 touches only AVG_TEMP_F (+ the DATE_KEY partition
    column) — the materialized fact scan's ReadSchema must not include
    the other measures."""
    base = str(tmp_path_factory.mktemp("wh_prune"))
    mat = materialize(wh, base)
    buf = io.StringIO()
    with redirect_stdout(buf):
        q1(mat.fact, mat.dim_date).explain("formatted")
    plan = buf.getvalue()
    fact_scan = next(
        seg for seg in plan.split("\n\n") if "fact_weather_day" in seg
    )
    assert "AVG_TEMP_F" in fact_scan
    for untouched in ("PRECIPITATION_IN", "SNOWFALL_IN", "WEATHER_BAND"):
        assert untouched not in fact_scan, fact_scan


def test_materialized_fact_prunes_date_partitions(spark, wh, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("wh"))
    mat = materialize(wh, base)
    one_day = mat.fact.filter("DATE_KEY = DATE'2024-01-02'")
    buf = io.StringIO()
    with redirect_stdout(buf):
        one_day.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters: [isnotnull(DATE_KEY" in plan, plan
    # pruned scan must read fewer files than the full fact
    n_days = mat.fact.select("DATE_KEY").distinct().count()
    assert n_days > 1
    assert one_day.count() > 0
