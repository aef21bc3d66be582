"""Profile individual bench queries: N warm repetitions per query in ONE
session, report min/median so run-to-run host noise and one-time codegen
cost are visible separately (first-run minus median ~= compile/plan cost).

Usage: python tools/profile_bench.py [query ...] [--reps N]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 5
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from globalweather_etl_spark.session import get_spark
    from globalweather_etl_spark.queries import QUERIES

    names = args or [
        "docs_minhash_lsh",
        "docs_simhash",
        "docs_ngram_jaccard",
        "emb_ivf_topk",
        "emb_lsh_range_search",
    ]
    spark = get_spark(
        app_name="globalweather-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    out = {}
    for name in names:
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = {
            "runs": runs,
            "first": runs[0],
            "median": round(statistics.median(runs), 3),
            "min": min(runs),
        }
        print(json.dumps({name: out[name]}), flush=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
