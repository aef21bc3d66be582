"""Physical-plan audit: print and grep the formatted plans of the
headline queries for the properties we design for at 100 TB.

Checks (heuristic, printed per query):
  broadcast   dimension joins use BroadcastHashJoin (no fact shuffle)
  pushdown    parquet scans carry PushedFilters / pruned ReadSchema
  one_window  fact's two window metrics share ONE Window operator
  topk        ORDER BY ... LIMIT plans TakeOrderedAndProject
  wscg        WholeStageCodegen spans exist (expressions stay JVM-side)

Usage: python tools/audit_plans.py [sf_dir] [name ...]
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

from globalweather_etl_spark.queries import QUERIES
from globalweather_etl_spark.session import get_spark


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


AUDITS = {
    "pipeline_fact": ["BroadcastHashJoin", "Window"],
    "dashboard_q2": ["BroadcastHashJoin"],
    "tpch_star_join_revenue": ["BroadcastHashJoin"],
    "tpch_topk_customers": ["TakeOrderedAndProject"],
    "tpch_events_window_suite": ["Window"],
    "docs_minhash_lsh": ["HashAggregate"],
    "emb_cosine_topk": ["BroadcastNestedLoopJoin|BroadcastExchange"],
    # bucketed range search: candidates from a (table, bucket) hash
    # join, never a nested-loop theta join over all pairs
    "emb_lsh_range_search": ["SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"],
    # doc-level semantic near-dup: same bucketed candidate join, and no
    # nested-loop anywhere despite the two documents-side joins
    "docs_embedding_neardup": [
        "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin",
    ],
    # distributed prefix sum: range exchange + pid-partitioned window,
    # never an unpartitioned Window over the data
    "docs_pack_by_budget": ["rangepartitioning", "__pid"],
    # expression selectors (md5 of a column) can't reach the parquet
    # reader as pushed filters — assert they at least stay inside codegen
    # Round 3: splits/sample flags stay scan-stage expressions; the
    # stratified quota adds the two-phase prune (__pid spread, no
    # per-stratum hot shuffle) and a broadcast join-back, so the corpus
    # itself is never hash-partitioned.
    "docs_sample_split": ["BroadcastHashJoin", "__pid"],
}


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--full"]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    names = args[1:] or list(AUDITS)
    spark = get_spark(
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    failures = 0
    for name in names:
        plan = formatted_plan(QUERIES[name](spark, sf_dir))
        n_windows = plan.count("Window ")
        n_exchanges = plan.count("Exchange")
        n_scans = plan.count("Scan parquet")
        print(f"\n=== {name}: {n_scans} scans, {n_exchanges} exchanges, "
              f"{n_windows} windows ===")
        for want in AUDITS.get(name, []):
            import re

            ok = bool(re.search(want, plan))
            print(f"  [{'ok' if ok else 'MISS'}] {want}")
            failures += 0 if ok else 1
        if "--full" in sys.argv or name in sys.argv:
            print(plan)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
