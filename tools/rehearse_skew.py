"""Skewed-join rehearsal: one pathologically hot key, plain vs salted.

Synthesizes a 20M-row probe table where HALF the rows carry one hot
key (the rest spread over 100k keys) and a 100k-row build table too
wide-keyed to broadcast comfortably at cluster scale (broadcast is
DISABLED for the comparison so the rehearsal isolates the shuffle-join
skew behavior AQE's skew splitting and salting actually address — with
broadcast on, Spark would rightly sidestep the problem for this size).

Measures three sum-aggregated joins that must return identical
results:
  plain      shuffle hash/sort-merge join on the raw key — the hot
             key's partition serializes on one task
  salted     operators/skew.salted_join with salt=32 — the hot key
             spreads over 32 tasks at the cost of 32x build-side
             replication
  aqe_skew   plain join with AQE skew splitting left to do its thing
             (spark.sql.adaptive.skewJoin, on in session.py defaults)

Prints one JSON line; paste into docs/PERF.md. The interesting number
is plain/salted wall ratio at a skew this sharp — and that all three
sums agree exactly.

Usage: python tools/rehearse_skew.py [n_probe] [n_keys] [salt]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from globalweather_etl_spark.operators.skew import salted_join
from globalweather_etl_spark.session import get_spark


def main() -> None:
    n_probe = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    salt = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    spark = get_spark(
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # force the shuffle-join regime the rehearsal studies
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            # local-mode default heap is 1g; a 20M-row deliberately
            # skewed shuffle needs real executor memory (fresh JVM, so
            # the setting is honored at launch)
            "spark.driver.memory": "24g",
        },
    )

    # half the probe rows hit key 0; the rest spread uniformly
    probe = spark.range(n_probe).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys)))
        .cast("long")
        .alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    build = spark.range(n_keys).select(
        F.col("id").alias("k"), (F.col("id") % 13).cast("double").alias("w")
    )

    def run(df):
        t0 = time.perf_counter()
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(
                    (F.col("v") * F.col("w")).cast("decimal(25,6)")
                ).cast("double"),
                3,
            ).alias("s"),
        ).collect()[0]
        return round(time.perf_counter() - t0, 2), row["n"], row["s"]

    plain_skew_off_s, n1, s1 = run(
        _with_conf(spark, probe, build, skew=False)
    )
    aqe_s, n2, s2 = run(_with_conf(spark, probe, build, skew=True))
    t_salt, n3, s3 = run(salted_join(probe, build, "k", salt=salt))

    assert (n1, s1) == (n2, s2) == (n3, s3), (n1, s1, n2, s2, n3, s3)
    print(
        json.dumps(
            {
                "n_probe": n_probe,
                "n_keys": n_keys,
                "hot_key_share": 0.5,
                "salt": salt,
                "plain_join_s": plain_skew_off_s,
                "aqe_skew_join_s": aqe_s,
                "salted_join_s": t_salt,
                "rows": n1,
                "checksum": s1,
            }
        )
    )
    spark.stop()


def _with_conf(spark, probe, build, skew: bool):
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew).lower())
    return probe.join(build, "k")


if __name__ == "__main__":
    main()
