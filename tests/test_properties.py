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


# --- round-3 kernels -------------------------------------------------


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(-100, 100, allow_nan=False, width=32),
            min_size=4,
            max_size=16,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_quantize_roundtrip_bound_property(spark, vectors):
    """|x - dq(q(x))| <= max(|x|)/254 + eps for arbitrary float32
    vectors, including all-zero and tiny-magnitude ones."""
    from globalweather_etl_spark.operators.quantize import (
        dequantize_embeddings,
        quantize_embeddings,
    )

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vectors)],
        "vec_id long, embedding array<float>",
    )
    q = quantize_embeddings(df, "embedding")
    back = dequantize_embeddings(q, "embedding", out_col="deq")
    rows = {r["vec_id"]: r["deq"] for r in back.collect()}
    for i, v in enumerate(vectors):
        scale = max((abs(x) for x in v), default=0.0)
        bound = scale / 254.0 + 1e-5 + scale * 1e-6
        for orig, got in zip(v, rows[i]):
            assert abs(orig - got) <= bound, (i, orig, got, bound)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(codec="ascii", exclude_categories=["Cc"]),
            max_size=120,
        ),
        min_size=1,
        max_size=10,
    )
)
def test_text_signal_bounds_property(spark, texts):
    """New text signals stay in range on arbitrary ASCII: fractions in
    [0,1], BPE estimate >= 0 and 0 iff no letter/digit/symbol runs;
    redaction never raises and yields a string."""
    from globalweather_etl_spark.functions.text import (
        bpe_token_estimate,
        dup_line_fraction,
        dup_word_fraction,
        redact_pii,
    )

    df = spark.createDataFrame(
        [(t,) for t in texts], T.StructType([T.StructField("text", T.StringType())])
    )
    rows = df.select(
        bpe_token_estimate(F.col("text")).alias("bpe"),
        dup_word_fraction(F.col("text")).alias("dw"),
        dup_line_fraction(F.col("text")).alias("dl"),
        redact_pii(F.col("text")).alias("red"),
    ).collect()
    for r in rows:
        assert r["bpe"] >= 0
        assert 0.0 <= r["dw"] <= 1.0
        assert 0.0 <= r["dl"] <= 1.0
        assert isinstance(r["red"], str)


_words = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])
_doc_texts = st.lists(_words, min_size=0, max_size=30).map(" ".join)


@given(st.lists(_doc_texts, min_size=1, max_size=6))
@settings(max_examples=15, deadline=None)
def test_span_dedup_invariants_property(spark, texts):
    """remove_duplicate_spans on arbitrary tiny-alphabet corpora (built
    to collide constantly): token conservation, kept tokens are an
    ordered subsequence of the original, counts bounded, and the
    min-id doc of an exact-duplicate pair keeps everything the other
    loses in their shared windows."""
    from globalweather_etl_spark.operators.span_dedup import (
        remove_duplicate_spans,
    )

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = remove_duplicate_spans(docs, "doc_id", "text", k=3).collect()
    originals = dict(enumerate(texts))
    for r in out:
        orig_toks = [t for t in originals[r["doc_id"]].split(" ") if t]
        kept_toks = [t for t in r["text"].split(" ") if t]
        assert r["span_n_tokens"] == len(orig_toks)
        assert len(kept_toks) == r["span_n_tokens"] - r["span_tokens_removed"]
        # ordered subsequence
        it = iter(orig_toks)
        assert all(any(t == o for o in it) for t in kept_toks)
        assert 0 <= r["span_tokens_removed"] <= r["span_n_tokens"]
        assert (r["span_n_spans"] == 0) == (r["span_tokens_removed"] == 0)


@given(
    st.lists(
        st.tuples(
            st.integers(1, 3),  # user
            st.integers(0, 50),  # minute offset
            st.sampled_from(["A", "B", "C", "X"]),
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=15, deadline=None)
def test_funnel_invariants_property(spark, evs):
    """funnel() on arbitrary event soups: steps bounded by the funnel
    depth, the horizon never increases progress, t_first <= t_last,
    and converted iff all steps reached."""
    import datetime as dt

    from globalweather_etl_spark.operators.funnel import funnel

    rows = [
        (i, u, dt.datetime(2024, 5, 1) + dt.timedelta(minutes=m), t)
        for i, (u, m, t) in enumerate(evs)
    ]
    events = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    free = {
        r["user_id"]: r
        for r in funnel(events, ["A", "B", "C"]).collect()
    }
    tight = {
        r["user_id"]: r
        for r in funnel(events, ["A", "B", "C"], within_seconds=600).collect()
    }
    assert set(free) == set(tight)
    for u, r in free.items():
        assert 0 <= r["steps_reached"] <= 3
        assert r["converted"] == (r["steps_reached"] == 3)
        if r["steps_reached"] >= 1:
            assert r["t_first"] <= r["t_last"]
        else:
            assert r["t_first"] is None and r["t_last"] is None
        assert tight[u]["steps_reached"] <= r["steps_reached"]


# ------------------------------------------- round-5 CDC round-trip

@settings(max_examples=20, deadline=None)
@given(
    old=st.dictionaries(
        st.integers(0, 30),
        st.tuples(st.sampled_from(["a", "b", None]),
                  st.sampled_from([1.0, 2.0, None])),
        max_size=12,
    ),
    new=st.dictionaries(
        st.integers(0, 30),
        st.tuples(st.sampled_from(["a", "b", None]),
                  st.sampled_from([1.0, 2.0, None])),
        max_size=12,
    ),
)
def test_apply_diff_roundtrip(spark, old, new):
    """apply_diff(old, table_diff(old, new)) == new, for arbitrary
    keyed snapshots including NULL transitions."""
    from globalweather_etl_spark.operators.table_diff import (
        apply_diff,
        table_diff,
    )

    schema = "k long, s string, v double"
    old_df = spark.createDataFrame(
        [(k, s, v) for k, (s, v) in old.items()], schema
    )
    new_df = spark.createDataFrame(
        [(k, s, v) for k, (s, v) in new.items()], schema
    )
    d = table_diff(old_df, new_df, ["k"])
    rebuilt = apply_diff(old_df, d, ["k"], ["s", "v"])
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, new_df.collect())
    )
    # and the diff itself partitions the key universe
    assert d.count() == len(set(old) | set(new))


@settings(max_examples=15, deadline=None)
@given(
    vals=st.lists(st.sampled_from("abcdef"), min_size=1, max_size=40),
    probe=st.sampled_from("abcdefgh"),
)
def test_cms_never_underestimates(spark, vals, probe):
    from globalweather_etl_spark.operators.sketches import (
        cms_estimate,
        count_min_sketch,
    )

    df = spark.createDataFrame([(v,) for v in vals], "v string")
    sk = count_min_sketch(df, "v", depth=3, width=8)  # tiny: force collisions
    qs = spark.createDataFrame([(probe,)], "v string")
    [row] = cms_estimate(sk, qs, "v", depth=3, width=8).collect()
    true = vals.count(probe)
    assert row["cms_est"] >= true
    assert row["cms_est"] <= len(vals)  # bounded by stream mass


# --------------------------- round 8: VARIANT shredding equivalence

_JSON_SCALARS = st.one_of(
    st.integers(-10**6, 10**6),
    # includes purely-numeric strings like "0": a QUOTED number under
    # a bigint leaf must coerce exactly like json_get + try_cast
    # (the second falsifying example hypothesis found)
    st.text(
        alphabet=st.characters(
            whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=0x7F
        ),
        max_size=8,
    ),
    st.booleans(),
    st.none(),
)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.fixed_dictionaries(
                {"a": st.fixed_dictionaries({"b": _JSON_SCALARS})}
            ),
            st.fixed_dictionaries({"n": _JSON_SCALARS}),
            st.just({}),  # both paths missing
            st.none(),  # NULL document
        ),
        min_size=1,
        max_size=30,
    )
)
def test_shred_equals_raw_navigation_property(spark, docs):
    """shred_json must agree with json_get + TRY_CAST on ARBITRARY
    documents: present / missing / null / wrong-branch paths, NULL
    docs, and type-malformed values ('' where bigint is declared —
    the case hypothesis found: a plain ANSI cast errors there, while
    shredding's schema-on-read yields NULL)."""
    import json as _json

    from globalweather_etl_spark.functions.semistructured import (
        json_get,
        shred_json,
    )

    rows = [
        (i, None if d is None else _json.dumps(d))
        for i, d in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "id long, j string")
    shredded = shred_json(
        df, "j", {"ab": ("a.b", "string"), "n": ("n", "bigint")}
    )
    got = {
        r["id"]: (r["shred_ab"], r["shred_n"])
        for r in shredded.collect()
    }
    want = {
        r["id"]: (r["ab"], r["n"])
        for r in df.select(
            "id",
            json_get("j", "a.b").alias("ab"),
            json_get("j", "n").try_cast("bigint").alias("n"),
        ).collect()
    }
    assert got == want
