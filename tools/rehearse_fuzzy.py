"""Fuzzy-join rehearsal: 100k distinct strings, planted typos, exact
recall through the blocked plan.

Synthesizes n distinct entity-like strings ("vendor-<id>-<suffix>"
over a 40k-base vocabulary) plus n/10 planted single-edit typos
(substitute one character), then runs fuzzy_self_pairs(max_dist=1) and
reports:

- wall time (the inverted-index + length-prune + threshold-levenshtein
  plan — never a cross join);
- planted-typo recall: every (original, typo) pair MUST be found —
  the q-gram lemma guarantees completeness at these lengths, so this
  is an exactness check at scale, not a quality trade-off;
- the candidate-pair count versus the n^2/2 a naive plan would score
  (the number that decides 100 TB feasibility).

Usage: python tools/rehearse_fuzzy.py [n_base] [n_typos]
Prints one JSON line; paste into docs/PERF.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from globalweather_etl_spark.operators.fuzzy_join import (
    _block_keys,
    fuzzy_self_pairs,
)
from globalweather_etl_spark.session import get_spark


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_typos = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    spark = get_spark(
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    # distinct base strings: "vendor-<base36ish>-co" — length ~14,
    # far above the q-gram completeness bound q*(d+1)=4
    base = spark.range(n_base).select(
        F.concat(
            F.lit("vendor-"),
            F.conv(F.col("id").cast("string"), 10, 36),
            F.lit("-co"),
        ).alias("name")
    )
    # typo i: flip one character of base string i to 'Z' (position
    # varies with i so typos hit prefix, middle, and suffix)
    typo_src = spark.range(n_typos).select(
        F.concat(
            F.lit("vendor-"),
            F.conv(F.col("id").cast("string"), 10, 36),
            F.lit("-co"),
        ).alias("orig"),
        F.col("id").alias("i"),
    )
    typos = typo_src.select(
        F.concat(
            F.substring("orig", 1, (F.pmod("i", F.length("orig") - 1)).cast("int")),
            F.lit("Z"),
            F.substring(
                "orig",
                (F.pmod("i", F.length("orig") - 1) + 2).cast("int"),
                F.length("orig"),
            ),
        ).alias("name")
    )
    corpus = base.unionByName(typos).persist()
    n_rows = corpus.count()

    t0 = time.perf_counter()
    pairs = fuzzy_self_pairs(corpus, "name", max_dist=1).persist()
    n_pairs = pairs.count()
    wall = round(time.perf_counter() - t0, 2)

    # recall: every planted (orig, typo) pair must appear
    planted = typo_src.select(
        "orig",
        F.concat(
            F.substring("orig", 1, (F.pmod("i", F.length("orig") - 1)).cast("int")),
            F.lit("Z"),
            F.substring(
                "orig",
                (F.pmod("i", F.length("orig") - 1) + 2).cast("int"),
                F.length("orig"),
            ),
        ).alias("typo"),
    ).select(
        F.least("orig", "typo").alias("s_a"),
        F.greatest("orig", "typo").alias("s_b"),
    ).distinct()
    n_planted = planted.count()
    n_found = planted.join(pairs, ["s_a", "s_b"], "inner").count()

    # candidate volume the blocking actually produced (re-derive the
    # candidate stage: sum over block keys of freq*(freq-1)/2)
    keys = _block_keys(corpus.distinct(), "name", q=2, max_dist=1)
    cand = (
        keys.groupBy("key")
        .agg(F.count(F.lit(1)).alias("f"))
        .agg(F.sum(F.col("f") * (F.col("f") - 1) / 2).alias("c"))
        .collect()[0]["c"]
    )
    naive = n_rows * (n_rows - 1) / 2
    print(
        json.dumps(
            {
                "n_strings": n_rows,
                "n_planted_typos": n_planted,
                "wall_s": wall,
                "pairs_found": n_pairs,
                "planted_recall": round(n_found / n_planted, 4),
                "candidate_pairs_upper": int(cand),
                "naive_pairs": int(naive),
                "candidate_reduction_x": round(naive / max(cand, 1), 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
