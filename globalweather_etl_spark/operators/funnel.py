"""Funnel (ordered-sequence) analysis over event streams.

The classic product-analytics question the events suite lacked: of the
users who did step 1, how many went on to do step 2 AFTER it, then
step 3 after that — optionally all within a horizon? (The SQL-standard
formulation is MATCH_RECOGNIZE, which Spark does not implement; every
event-analytics engine ships a funnel primitive instead.)

Semantics (pinned for the oracle):
- GREEDY-EARLIEST matching: the match for step 1 is the user's
  earliest step-1 event; step i+1 matches the earliest qualifying
  event STRICTLY AFTER the matched step-i event. Greedy-earliest is
  the standard funnel definition and is optimal for pure ordering:
  if any assignment completes k steps, the greedy one does. (With a
  completion horizon a later step-1 anchor could in principle convert
  when the earliest does not — this operator deliberately pins the
  simple first-touch semantics and applies the horizon as a filter,
  which is how the common funnel implementations behave.)
- Ties on the timestamp break by event id, so matching is total-order
  deterministic.
- ``within`` (seconds, optional): a completed prefix only counts
  through step k if matched_ts[k] - matched_ts[1] <= within; the
  reached count is the longest prefix satisfying the horizon.

Output: one row per user seen in the events frame —
(user, steps_reached, converted, t_first, t_last) with t_first/t_last
the matched timestamps of step 1 and the last reached step (NULL when
steps_reached = 0).

Scale shape (100 TB of events): ONE shuffle — the groupBy(user) that
collects each user's (ts, id, type) events [filtered to the funnel's
step types first, so the sort state per user is bounded by their
funnel-relevant activity, not their whole stream]; the greedy match
is then a scan-stage fold over the sorted array (O(events x steps)
per user, inside the row). No window over a global ordering, no
self-join per step (the naive k-way join grows a shuffle per step;
this is one exchange regardless of funnel depth).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel"]


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    within_seconds: int | None = None,
) -> DataFrame:
    """Per-user funnel progress through ``steps`` (see module
    docstring for the pinned matching semantics)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    nsteps = len(steps)
    relevant = events.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col).alias("user"),
        F.struct(
            F.col(ts_col).alias("ts"),
            F.col(id_col).alias("eid"),
            F.col(type_col).alias("etype"),
        ).alias("ev"),
    )
    per_user = relevant.groupBy("user").agg(
        F.array_sort(F.collect_list("ev")).alias("evs")
    )

    # fold state: (step  = next step index to match (0-based),
    #              ts    = array of matched timestamps so far)
    zero = F.struct(
        F.lit(0).alias("step"),
        F.array().cast("array<timestamp>").alias("ts"),
    )
    step_types = F.array(*[F.lit(s) for s in steps])

    def _step(acc, ev):
        wanted = F.element_at(step_types, acc["step"] + 1)
        matches = (acc["step"] < nsteps) & (ev["etype"] == wanted)
        return F.when(
            matches,
            F.struct(
                (acc["step"] + 1).alias("step"),
                F.concat(acc["ts"], F.array(ev["ts"])).alias("ts"),
            ),
        ).otherwise(acc)

    folded = F.aggregate(F.col("evs"), zero, _step)
    out = per_user.select(
        "user",
        folded["step"].alias("__raw_steps"),
        folded["ts"].alias("__ts"),
    )
    if within_seconds is not None:
        # longest prefix whose span from the step-1 match fits the horizon
        horizon = F.lit(int(within_seconds))
        reached = F.size(
            F.filter(
                F.col("__ts"),
                lambda t: (
                    t.cast("long") - F.element_at(F.col("__ts"), 1).cast("long")
                )
                <= horizon,
            )
        )
        # matches are time-ordered, so the filter keeps a prefix
        out = out.withColumn("__steps", reached)
    else:
        out = out.withColumn("__steps", F.col("__raw_steps"))
    return out.select(
        F.col("user").alias(user_col),
        F.col("__steps").cast("int").alias("steps_reached"),
        (F.col("__steps") == nsteps).alias("converted"),
        F.when(F.col("__steps") >= 1, F.element_at("__ts", 1)).alias("t_first"),
        F.when(F.col("__steps") >= 1, F.element_at("__ts", F.col("__steps"))).alias(
            "t_last"
        ),
    )
