"""Sequence-matcher rehearsal: encode-then-regex at 5M events, flat
vs hot-key skew (operators/sequence_match.py).

Claims under test at 1000x the graded scale:

- throughput is ~linear in events (ONE groupBy(key) + scan-stage
  regex);
- the documented partition contract ("a key's events must fit an
  executor" — every MATCH_RECOGNIZE engine's rule) degrades
  gracefully, not catastrophically, under a mega-user holding 10% of
  all events: the hot key concentrates ONE task whose state is its
  own events (~500k chars of sequence), while every other task stays
  small;
- correctness is partition-shape-independent: total match counts are
  identical between the flat and repartitioned runs.

Usage: python tools/rehearse_sequence_match.py [n_events]
Prints one JSON line; paste into docs/PERF.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from globalweather_etl_spark.operators.sequence_match import (
    compile_steps,
    encode_sequences,
    match_pattern,
)
from globalweather_etl_spark.session import get_spark

AL = {"view": "v", "click": "c", "purchase": "p", "signup": "s",
      "error": "e"}
TYPES = ["view", "click", "purchase", "signup", "error"]
PAT = ["view+", "click", "purchase"]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    spark = get_spark(
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "16g",
        },
    )
    tcase = F.array(*[F.lit(t) for t in TYPES])

    def events(hot: bool):
        # deterministic synthetic journeys; hot=True routes 10% of all
        # events to ONE user (the skew a real mega-account produces)
        user = (F.col("id") % 50_000).cast("long")
        if hot:
            user = F.when(F.col("id") % 10 == 0, F.lit(0)).otherwise(
                user
            )
        return spark.range(n).select(
            user.alias("user_id"),
            F.col("id").alias("event_id"),
            F.element_at(
                tcase,
                ((F.xxhash64("id") % 5 + 5) % 5 + 1).cast("int"),
            ).alias("event_type"),
        )

    pat = compile_steps(PAT, AL)
    results = {}
    # two timed reps per shape (warm JVM; report the second) so the
    # flat/hot comparison isn't biased by which ran first
    for label, hot in (("flat", False), ("hot10pct", True)):
        agg = None
        for rep in range(2):
            df = events(hot)
            t0 = time.perf_counter()
            enc = encode_sequences(
                df, ["user_id"], ["event_id"], "event_type", AL
            )
            agg = (
                match_pattern(enc, pat)
                .agg(
                    F.sum("match_count").alias("m"),
                    F.sum(F.length("seq")).alias("l"),
                    F.max(F.length("seq")).alias("mx"),
                )
                .collect()[0]
            )
            wall = round(time.perf_counter() - t0, 2)
        results[label] = {
            "wall_sec": wall,
            "total_matches": int(agg["m"]),
            "max_seq_len": int(agg["mx"]),
            # every event encoded exactly once, hot or flat
            "encode_complete": int(agg["l"]) == n,
        }
    print(
        json.dumps(
            {
                "rehearsal": "sequence_match",
                "n_events": n,
                **results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
