"""Incremental-OPTIMIZE rehearsal: clustering maintenance cost at 5M rows.

Seeds a z-ordered SnapshotTable with ``n`` synthetic rows, then runs
``n_rounds`` of (append a small batch -> optimize incrementally) and
one final FULL re-cluster for comparison.

What this measures (the 100 TB claims under test):

- **optimize(incremental) is O(new data), flat in table size**: the
  per-round optimize wall must track the APPEND size, not the total
  rows accumulated — at 100 TB a maintenance pass that re-sorts the
  table cannot run at all, so this flatness IS the feature.
- **Carried-by-reference really carries**: every round must report
  files_rewritten == the appended file count and files_carried == the
  rest; the clustered fraction returns to 1.0 after each pass.
- **The full rewrite is the expensive thing we are avoiding**: the
  final full=True wall is reported next to the incremental walls for
  the honest comparison.
- **Correctness at scale**: after the last pass the table's row count
  and a grouped checksum must equal the from-scratch expectation.
- **The auto re-cluster loop closes (round 10)**: the overlap depth
  (clustering_overlap — avg files whose key range covers a point) and
  a one-week band's candidate-file count must GROW across stacked
  incremental passes, and one optimize(auto_full_threshold=...) pass
  must escalate on its own, collapse the depth, and bound the band
  read back down — read amplification stays bounded across unbounded
  maintenance passes.

Usage: python tools/rehearse_optimize.py [n] [n_rounds] [append_n]
Prints one JSON line; paste into docs/PERF.md.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from globalweather_etl_spark.session import get_spark
from globalweather_etl_spark.sources.snapshots import SnapshotTable


def synth(spark, lo: int, hi: int):
    return (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("k"),
            F.date_add(
                F.lit("2024-01-01").cast("date"),
                (F.col("id") % 365).cast("int"),
            ).alias("d"),
            ((F.col("id") * 37) % 100_000).alias("u"),
            (F.col("id") % 1000).cast("double").alias("val"),
        )
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    append_n = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000

    spark = get_spark(
        master="local[8]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    root = tempfile.mkdtemp(prefix="gw_opt_rehearsal_") + "/t"
    st = SnapshotTable(spark, root)

    t0 = time.perf_counter()
    st.write_zordered(
        synth(spark, 0, n), ["d", "u"], n_files=32, mode="overwrite"
    )
    seed_wall = round(time.perf_counter() - t0, 3)

    import datetime as _dt

    def week_candidates() -> int:
        # read-amplification probe: how many files a one-week date
        # band has to open on the current layout (stats refreshed
        # incrementally inside clustering_overlap below)
        return len(
            st.files_for_range(
                "d", _dt.date(2024, 3, 1), _dt.date(2024, 3, 7)
            )
        )

    rounds = []
    cursor = n
    for i in range(n_rounds):
        st.write(synth(spark, cursor, cursor + append_n))
        cursor += append_n
        cs = st.clustering_state()
        t0 = time.perf_counter()
        res = st.optimize(zorder_by=["d", "u"])
        wall = round(time.perf_counter() - t0, 3)
        ov = st.clustering_overlap()
        rounds.append(
            {
                "round": i,
                "total_rows": cursor,
                "optimize_wall_s": wall,
                "files_rewritten": res["files_rewritten"],
                "files_carried": res["files_carried"],
                "unclustered_before": len(cs["unclustered_files"]),
                # each pass clusters its batch among itself, so ranges
                # stack: depth and the week-band candidate count must
                # GROW round over round — the signal the auto trigger
                # below consumes
                "overlap_avg_depth": ov["avg_depth"],
                "week_band_candidate_files": week_candidates(),
            }
        )
        assert res["full"] is False
        assert res["files_rewritten"] == rounds[-1]["unclustered_before"]
        assert st.clustering_state()["clustered_fraction"] == 1.0
    assert (
        rounds[-1]["overlap_avg_depth"] > rounds[0]["overlap_avg_depth"]
    ), rounds

    # the auto trigger: one more append + optimize, now with the
    # threshold BELOW the stacked depth — the pass must escalate to
    # the full rewrite on its own, collapse the overlap, and bound the
    # week-band read back down
    st.write(synth(spark, cursor, cursor + append_n))
    cursor += append_n
    thr = rounds[-1]["overlap_avg_depth"] - 0.5
    t0 = time.perf_counter()
    auto_res = st.optimize(
        zorder_by=["d", "u"], auto_full_threshold=thr
    )
    auto_wall = round(time.perf_counter() - t0, 3)
    assert auto_res["auto_full"] is True and auto_res["full"] is True
    ov_after = st.clustering_overlap()
    auto = {
        "threshold": round(thr, 3),
        "depth_before": rounds[-1]["overlap_avg_depth"],
        "depth_after": ov_after["avg_depth"],
        "week_band_candidates_after": week_candidates(),
        "auto_full_wall_s": auto_wall,
    }
    assert auto["depth_after"] < auto["depth_before"]
    assert (
        auto["week_band_candidates_after"]
        <= rounds[-1]["week_band_candidate_files"]
    )

    # the comparison point: what a NON-incremental maintenance pass
    # costs on the same head (re-sorts every row)
    t0 = time.perf_counter()
    st.optimize(zorder_by=["d", "u"], full=True)
    full_wall = round(time.perf_counter() - t0, 3)

    got = st.read().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("k") % 97).alias("chk"),
    ).collect()[0]
    want = synth(spark, 0, cursor).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("k") % 97).alias("chk"),
    ).collect()[0]
    assert (got["n"], got["chk"]) == (want["n"], want["chk"]), (
        got, want,
    )

    print(
        json.dumps(
            {
                "rehearsal": "incremental_optimize",
                "n_seed": n,
                "append_n": append_n,
                "seed_zorder_wall_s": seed_wall,
                "rounds": rounds,
                "auto_full_trigger": auto,
                "full_recluster_wall_s": full_wall,
                "checksum_ok": True,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
