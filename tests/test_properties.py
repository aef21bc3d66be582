"""Property tests (hypothesis): the scalar kernel against plain-Python
reference implementations of the reference SQL's exact semantics —
including the band-boundary gaps and NULL fall-through-to-ELSE."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from globalweather_etl_spark.functions import precip_type, weather_band
from globalweather_etl_spark.functions.text import (
    _RABIN_PRIME,
    quality_score,
    rolling_fingerprint,
)

# Interesting boundary values (incl. the fractional CASE gaps 50<t<51,
# 70<t<71) mixed into arbitrary doubles.
_BOUNDARY = [31.9, 32.0, 50.0, 50.5, 51.0, 70.0, 70.2, 71.0, 85.0, 85.5, 86.0]
_temps = st.one_of(
    st.sampled_from(_BOUNDARY),
    st.floats(-200, 200, allow_nan=False),
    st.none(),
)


def _band_ref(t: float | None) -> str:
    """ETL:57-63 verbatim: ordered first-match CASE; NULL (and the
    fractional gaps 50<t<51, 70<t<71) fall through to ELSE 'Hot'."""
    if t is not None and t < 32:
        return "Freezing"
    if t is not None and 32 <= t <= 50:
        return "Cold"
    if t is not None and 51 <= t <= 70:
        return "Mild"
    if t is not None and 71 <= t <= 85:
        return "Warm"
    return "Hot"


def _ptype_ref(snow: float | None, precip: float | None) -> str:
    """ETL:69-73: snow beats rain; NULLs never match a branch."""
    if snow is not None and snow > 0:
        return "Snow"
    if precip is not None and precip > 0:
        return "Rain"
    return "None"


@settings(max_examples=15, deadline=None)
@given(st.lists(_temps, min_size=1, max_size=50))
def test_weather_band_matches_reference_case(spark, temps):
    df = spark.createDataFrame(
        [(t,) for t in temps], T.StructType([T.StructField("t", T.DoubleType())])
    )
    got = [r[0] for r in df.select(weather_band(F.col("t"))).collect()]
    assert got == [_band_ref(t) for t in temps]


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.one_of(st.floats(-5, 5, allow_nan=False), st.none()),
            st.one_of(st.floats(-5, 5, allow_nan=False), st.none()),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_precip_type_matches_reference_case(spark, pairs):
    schema = T.StructType(
        [T.StructField("s", T.DoubleType()), T.StructField("p", T.DoubleType())]
    )
    df = spark.createDataFrame(pairs, schema)
    got = [r[0] for r in df.select(precip_type(F.col("s"), F.col("p"))).collect()]
    assert got == [_ptype_ref(s, p) for s, p in pairs]


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(codec="ascii", exclude_categories=["Cc"]),
            min_size=1,
            max_size=200,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_quality_score_bounded_and_fingerprint_in_range(spark, texts):
    df = spark.createDataFrame(
        [(t,) for t in texts], T.StructType([T.StructField("text", T.StringType())])
    )
    rows = df.select(
        quality_score(F.col("text")).alias("q"),
        rolling_fingerprint(F.col("text")).alias("fp"),
    ).collect()
    for r in rows:
        assert r["q"] is None or 0.0 <= r["q"] <= 1.0
        assert 0 <= r["fp"] < _RABIN_PRIME
