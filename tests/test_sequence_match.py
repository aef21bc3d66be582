"""Sequence pattern matching (operators/sequence_match.py): encode
order/determinism, the step-DSL compiler, match semantics
(non-overlapping leftmost count, 1-based first position), and the
cross-engine grading hook (the tpch_scalar_checks seq_* rows carry
the DuckDB parity check; these tests pin hand-computed values)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.sequence_match import (
    compile_steps,
    encode_sequences,
    match_pattern,
)

AL = {"view": "v", "click": "c", "purchase": "p", "signup": "s", "error": "e"}


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (u, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), i, t)
            for u, i, t in rows
        ],
        "user_id long, ts timestamp, event_id long, event_type string",
    )


class TestEncode:
    def test_order_and_alphabet(self, spark):
        df = _events(
            spark,
            [(1, 2, "click"), (1, 0, "view"), (1, 1, "view"),
             (2, 0, "purchase")],
        )
        got = {
            r["user_id"]: (r["seq"], r["n_events"])
            for r in encode_sequences(
                df, ["user_id"], ["ts", "event_id"], "event_type", AL
            ).collect()
        }
        assert got == {1: ("vvc", 3), 2: ("p", 1)}

    def test_unknown_type_encodes_as_dot(self, spark):
        df = _events(spark, [(1, 0, "view"), (1, 1, "weird")])
        got = encode_sequences(
            df, ["user_id"], ["ts", "event_id"], "event_type", AL
        ).collect()[0]["seq"]
        assert got == "v."
        # and '.' can never be matched by an alphabet-char pattern
        seq = spark.createDataFrame([("v.",)], "seq string")
        assert (
            match_pattern(seq, compile_steps(["view", "view"], AL))
            .collect()[0]["match_count"]
            == 0
        )

    def test_tiebreak_is_deterministic_across_partitionings(self, spark):
        rows = [(1, i % 7, f) for i, f in enumerate(
            ["view", "click", "view", "purchase", "click", "view",
             "signup", "error", "purchase", "click"]
        )]
        df = _events(spark, rows)
        a = encode_sequences(
            df.repartition(1), ["user_id"], ["ts", "event_id"],
            "event_type", AL,
        ).collect()[0]["seq"]
        b = encode_sequences(
            df.repartition(13), ["user_id"], ["ts", "event_id"],
            "event_type", AL,
        ).collect()[0]["seq"]
        assert a == b and len(a) == 10

    def test_bad_alphabet_loud(self, spark):
        df = _events(spark, [(1, 0, "view")])
        with pytest.raises(ValueError, match="single"):
            encode_sequences(
                df, ["user_id"], ["ts"], "event_type", {"view": "vv"}
            )
        with pytest.raises(ValueError, match="distinct"):
            encode_sequences(
                df, ["user_id"], ["ts"], "event_type",
                {"view": "x", "click": "x"},
            )


class TestCompile:
    def test_steps_and_quantifiers(self):
        assert compile_steps(["view+", "click", "purchase?"], AL) == "v+cp?"
        assert compile_steps(["click|view", "purchase"], AL) == "[cv]p"
        assert compile_steps(["view{2,3}", "purchase"], AL) == "v{2,3}p"

    def test_unknown_type_loud(self):
        with pytest.raises(KeyError, match="checkout"):
            compile_steps(["checkout"], AL)
        with pytest.raises(ValueError, match="empty"):
            compile_steps([], AL)


class TestMatch:
    @pytest.fixture()
    def seqs(self, spark):
        return spark.createDataFrame(
            [(1, "vvcpvcp"), (2, "ssse"), (3, ""), (4, "cpvvc")],
            "user_id long, seq string",
        )

    def test_counts_positions_first(self, spark, seqs):
        # v+cp over vvcpvcp: matches 'vvcp' at 1 and 'vcp' at 5 -> 2
        out = {
            r["user_id"]: (
                r["match_count"], r["match_first_pos"], r["match_first"]
            )
            for r in match_pattern(
                seqs, compile_steps(["view+", "click", "purchase"], AL)
            ).collect()
        }
        assert out[1] == (2, 1, "vvcp")
        assert out[2] == (0, 0, "")
        assert out[3] == (0, 0, "")
        assert out[4] == (0, 0, "")

    def test_nonoverlapping_leftmost(self, spark):
        seqs = spark.createDataFrame([("vvv",)], "seq string")
        # v{2} over vvv: leftmost non-overlapping -> 1 match at pos 1
        out = match_pattern(seqs, "v{2}").collect()[0]
        assert (out["match_count"], out["match_first_pos"]) == (1, 1)

    def test_empty_matching_pattern_rejected(self, spark, seqs):
        with pytest.raises(ValueError, match="empty string"):
            match_pattern(seqs, "v*")

    def test_end_to_end_on_events(self, spark):
        df = _events(
            spark,
            [(1, 0, "view"), (1, 1, "view"), (1, 2, "click"),
             (1, 3, "purchase"), (2, 0, "click"), (2, 1, "error")],
        )
        enc = encode_sequences(
            df, ["user_id"], ["ts", "event_id"], "event_type", AL
        )
        pat = compile_steps(["view+", "click", "purchase"], AL)
        got = {
            r["user_id"]: r["match_count"]
            for r in match_pattern(enc, pat).collect()
        }
        assert got == {1: 1, 2: 0}


class TestDefines:
    """DEFINE-lite (round 8): per-step VALUE predicates encoded into
    the alphabet at encode time."""

    def _valued(self, spark, rows):
        return spark.createDataFrame(
            [
                (
                    u,
                    dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i),
                    i,
                    t,
                    float(v),
                )
                for u, i, t, v in rows
            ],
            "user_id long, ts timestamp, event_id long,"
            " event_type string, amount double",
        )

    def test_define_claims_rows_before_type_mapping(self, spark):
        df = self._valued(
            spark,
            [(1, 0, "view", 10), (1, 1, "view", 5),
             (1, 2, "purchase", 500),   # bigbuy, NOT p
             (2, 0, "view", 10), (2, 1, "purchase", 50)],  # plain p
        )
        al = {**AL, "bigbuy": "b"}
        enc = encode_sequences(
            df, ["user_id"], ["ts", "event_id"], "event_type", al,
            defines={"bigbuy": F.col("amount") > 100},
        )
        got = {r["user_id"]: r["seq"] for r in enc.collect()}
        assert got == {1: "vvb", 2: "vp"}
        pat = compile_steps(["view+", "bigbuy"], al)
        assert pat == "v+b"
        m = {
            r["user_id"]: r["match_count"]
            for r in match_pattern(enc, pat).collect()
        }
        assert m == {1: 1, 2: 0}

    def test_first_define_wins_and_sql_string_predicates(self, spark):
        df = self._valued(spark, [(1, 0, "view", 150)])
        al = {**AL, "big": "b", "huge": "h"}
        enc = encode_sequences(
            df, ["user_id"], ["ts", "event_id"], "event_type", al,
            defines={"big": "amount > 100", "huge": "amount > 10"},
        )
        # both predicates hold; the FIRST define in dict order claims
        assert enc.collect()[0]["seq"] == "b"

    def test_define_without_alphabet_char_is_loud(self, spark):
        df = self._valued(spark, [(1, 0, "view", 1)])
        with pytest.raises(ValueError, match="no alphabet char"):
            encode_sequences(
                df, ["user_id"], ["ts", "event_id"], "event_type", AL,
                defines={"big": F.col("amount") > 100},
            )
