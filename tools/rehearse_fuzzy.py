"""Fuzzy-join rehearsal: 100k distinct strings, planted typos, the
hot-gram cap in its intended regime.

Synthesizes n distinct entity-like strings ("vendor-<base36 id>-co")
plus n/10 planted single-edit typos. This corpus is DELIBERATELY
adversarial for uncapped blocking: every string shares the
"vendor-"/"-co" stop-grams, so the uncapped candidate stage is
~n^2/2 pairs — the exact failure mode operators/fuzzy_join.py
documents (a dry run confirmed it: the uncapped join at n=110k did
not finish in minutes). The rehearsal therefore runs with
``max_gram_freq`` ON, which is how the operator is meant to be used
on real entity data, and reports:

- wall time of the capped plan (inverted index minus hot grams +
  length prune + threshold levenshtein);
- candidate-pair volume under the cap vs the naive n^2/2 — the
  feasibility number;
- planted-typo recall under the cap: a pair survives iff it still
  shares at least one RARE gram (the untouched base36-id chunk).
  Typos landing inside a SHORT id can destroy every rare gram and
  lose the pair — the documented completeness trade of the cap —
  so recall is reported honestly, expected high but below 1.0.

Usage: python tools/rehearse_fuzzy.py [n_base] [n_typos] [max_gram_freq]
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
    max_gram_freq = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000
    spark = get_spark(
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "16g",
        },
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
    pairs = fuzzy_self_pairs(
        corpus, "name", max_dist=1, max_gram_freq=max_gram_freq
    ).persist()
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

    # candidate volume the CAPPED blocking actually produced (sum over
    # surviving block keys of freq*(freq-1)/2)
    keys = _block_keys(corpus.distinct(), "name", q=2, max_dist=1)
    cand = (
        keys.groupBy("key")
        .agg(F.count(F.lit(1)).alias("f"))
        .filter(F.col("f") <= max_gram_freq)
        .agg(F.sum(F.col("f") * (F.col("f") - 1) / 2).alias("c"))
        .collect()[0]["c"]
    )
    naive = n_rows * (n_rows - 1) / 2

    # entity-resolution stage over the same corpus: pairs -> components
    # -> canonical (the capped pairs feed the cluster step)
    from globalweather_etl_spark.operators.fuzzy_join import resolve_entities

    t0 = time.perf_counter()
    resolved = resolve_entities(
        corpus, "name", max_dist=1, max_gram_freq=max_gram_freq
    ).persist()
    n_entities = resolved.count()
    n_clusters = resolved.select("canonical").distinct().count()
    resolve_s = round(time.perf_counter() - t0, 2)

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
                "resolve_s": resolve_s,
                "n_entities": n_entities,
                "n_clusters": n_clusters,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
