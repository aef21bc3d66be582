"""Expectations engine: one-scan suite evaluation, every constraint
kind against hand-built violations, Observation parity, and a DuckDB
twin of the full report."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.expectations import (
    ExpectationSuite,
    expect_between,
    expect_completeness,
    expect_fk,
    expect_in_set,
    expect_matches,
    expect_not_null,
    expect_row_count,
    expect_unique,
)


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        # id, code, status, score, email
        (1, "AA", "open", 10.0, "a@x.com"),
        (2, "BB", "open", 55.0, "b@y.org"),
        (3, None, "closed", 99.0, "c@z.net"),       # null code
        (4, "CC", "weird", 101.0, "not-an-email"),  # bad status, range, regex
        (5, "CC", "closed", None, None),            # dup code, null score/email
    ]
    return spark.createDataFrame(
        rows, "id long, code string, status string, score double, email string"
    )


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame([("AA",), ("BB",)], "k string")


def _report(suite, df):
    return {r["metric"]: (r["value"], r["passed"]) for r in suite.run(df).collect()}


def test_every_kind_measures_and_judges(frame, dim):
    suite = ExpectationSuite(
        [
            expect_row_count(min_rows=1, max_rows=10),
            expect_not_null("code"),
            expect_unique(["id"]),
            expect_unique(["code"]),
            expect_between("score", 0.0, 100.0),
            expect_in_set("status", ["open", "closed"]),
            expect_matches("email", r"^[^@\s]+@[^@\s]+\.[a-z]+$"),
            expect_completeness("score", 0.9),
            expect_fk("code", dim, "k"),
        ]
    )
    rep = _report(suite, frame)
    assert rep["row_count"] == (5.0, True)
    assert rep["not_null__code"] == (1.0, False)
    assert rep["unique__id"] == (0.0, True)
    # non-NULL codes AA BB CC CC: 4 rows, 3 distinct -> 1 duplicate
    # (the NULL key is not_null__code's finding, not a duplicate)
    assert rep["unique__code"] == (1.0, False)
    assert rep["between__score"] == (1.0, False)       # 101.0
    assert rep["in_set__status"] == (1.0, False)       # weird
    assert rep["matches__email"] == (1.0, False)       # not-an-email
    assert rep["completeness__score"] == (0.8, False)  # 4/5
    assert rep["fk__code"] == (2.0, False)             # CC twice, NULL exempt


def test_clean_table_passes_everything(spark, dim):
    df = spark.createDataFrame(
        [(1, "AA", "open", 10.0, "a@x.com"), (2, "BB", "closed", 90.0, "b@y.org")],
        "id long, code string, status string, score double, email string",
    )
    suite = ExpectationSuite(
        [
            expect_row_count(),
            expect_not_null("code"),
            expect_unique(["id"]),
            expect_between("score", 0.0, 100.0),
            expect_in_set("status", ["open", "closed"]),
            expect_matches("email", r"^[^@\s]+@[^@\s]+\.[a-z]+$"),
            expect_completeness("score", 0.9),
            expect_fk("code", dim, "k"),
        ]
    )
    ok, rows = suite.check(df)
    assert ok and len(rows) == 8


def test_single_scan_plan(frame, dim):
    """The whole suite (incl. the FK join) is one aggregate over one
    scan of the table — no CartesianProduct, dim side broadcast."""
    suite = ExpectationSuite(
        [expect_not_null("code"), expect_between("score", 0, 100),
         expect_fk("code", dim, "k")]
    )
    plan = suite.run(frame)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan
    # exactly one scan of the checked frame's in-memory source
    assert plan.count("Scan ExistingRDD") <= 2  # frame + broadcast dim


def test_observation_matches_run(frame, dim):
    with pytest.raises(ValueError, match="unique"):
        ExpectationSuite([expect_unique(["code"])]).observation(frame)
    suite = ExpectationSuite(
        [expect_not_null("code"),
         expect_fk("code", dim, "k"), expect_completeness("score", 0.9)]
    )
    inst, obs = suite.observation(frame)
    inst.write.format("noop").mode("overwrite").save()
    got = obs.get
    rep = _report(suite, frame)
    for name, (value, passed) in rep.items():
        assert got[name] == pytest.approx(value)
    assert suite.verdicts(got) == {n: p for n, (v, p) in rep.items()}


def test_duckdb_twin(frame, dim):
    """Full report parity with an independent engine."""
    suite = ExpectationSuite(
        [
            expect_row_count(min_rows=1, max_rows=10),
            expect_not_null("code"),
            expect_unique(["code"]),
            expect_between("score", 0.0, 100.0),
            expect_in_set("status", ["open", "closed"]),
            expect_completeness("score", 0.9),
            expect_fk("code", dim, "k"),
        ]
    )
    pdf = frame.toPandas()
    dimpdf = dim.toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    con.register("d", dimpdf)
    sql = """
    SELECT * FROM (
      SELECT 'row_count' AS metric, CAST(count(*) AS DOUBLE) v,
             count(*) BETWEEN 1 AND 10 AS p FROM t
      UNION ALL SELECT 'not_null__code', CAST(count(*) FILTER (WHERE code IS NULL) AS DOUBLE),
             count(*) FILTER (WHERE code IS NULL) = 0 FROM t
      UNION ALL SELECT 'unique__code', CAST(count(code)-count(DISTINCT code) AS DOUBLE),
             count(code)-count(DISTINCT code) = 0 FROM t
      UNION ALL SELECT 'between__score', CAST(count(*) FILTER (WHERE score IS NOT NULL AND score NOT BETWEEN 0 AND 100) AS DOUBLE),
             count(*) FILTER (WHERE score IS NOT NULL AND score NOT BETWEEN 0 AND 100) = 0 FROM t
      UNION ALL SELECT 'in_set__status', CAST(count(*) FILTER (WHERE status IS NOT NULL AND status NOT IN ('open','closed')) AS DOUBLE),
             count(*) FILTER (WHERE status IS NOT NULL AND status NOT IN ('open','closed')) = 0 FROM t
      UNION ALL SELECT 'completeness__score', CAST(count(score) AS DOUBLE)/count(*),
             CAST(count(score) AS DOUBLE)/count(*) >= 0.9 FROM t
      UNION ALL SELECT 'fk__code', CAST(count(*) FILTER (WHERE code IS NOT NULL AND code NOT IN (SELECT k FROM d)) AS DOUBLE),
             count(*) FILTER (WHERE code IS NOT NULL AND code NOT IN (SELECT k FROM d)) = 0 FROM t
    ) ORDER BY metric
    """
    want = {m: (v, p) for m, v, p in con.execute(sql).fetchall()}
    got = _report(suite, frame)
    assert {k: got[k] for k in want} == want


def test_errors(frame):
    with pytest.raises(ValueError):
        ExpectationSuite([])
    with pytest.raises(ValueError):
        ExpectationSuite([expect_not_null("code"), expect_not_null("code")])
