"""Session path (user-journey) analysis — what users DO inside a
session.

Completes the event-analytics trio: `operators.sessionize` finds the
sessions, `operators.funnel` measures one prescribed sequence,
`operators.retention` measures coming back — this module extracts the
OBSERVED sequence per session ('signup>click>click>purchase') and the
corpus's most-common journeys, the product-analytics primitive behind
every flow/Sankey view.

Determinism (pinned for the DuckDB twin): events order by (ts,
tiebreak id) inside a session; the path is the '>'-joined event types
of the first ``max_events`` events (collect_list order is
nondeterministic, so the list is array_sort'ed on (ts, id) before
joining — the value is a pure function of the data).

Scale shape (100 TB): sessionize's ONE window/exchange on the user
key, then one hash aggregate per (user, session) building the ordered
list map-side.  ``max_events`` bounds the carried list (abusive
sessions can hold millions of events — never collect unbounded
per-group state; the cap is the same guardrail Spark's own
session_window state keeps).  `top_paths` is a count aggregate on the
path string + a bounded top-k (TakeOrderedAndProject).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from globalweather_etl_spark.operators.sessionize import sessionize

__all__ = ["session_paths", "top_paths"]


def session_paths(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    gap_seconds: float = 1800.0,
    max_events: int = 8,
) -> DataFrame:
    """(user, session_id, session_path, n_path_events, n_event_types)
    per session: the '>'-joined journey over the first ``max_events``
    events (time order, ``id_col`` tiebreak), the number of events the
    path covers, and the distinct event types in the WHOLE session."""
    if max_events < 1:
        raise ValueError("max_events must be >= 1")
    sess = sessionize(events, user_col, ts_col, gap_seconds)
    evs = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("t"),
                F.col(id_col).alias("i"),
                F.col(type_col).alias("y"),
            )
        )
    )
    agg = sess.groupBy(user_col, "session_id").agg(evs.alias("__evs"))
    head = F.slice("__evs", 1, max_events)
    return agg.select(
        user_col,
        F.col("session_id").cast("long").alias("session_id"),
        F.concat_ws(
            ">", F.transform(head, lambda e: e["y"])
        ).alias("session_path"),
        F.size(head).cast("long").alias("n_path_events"),
        F.size(
            F.array_distinct(F.transform("__evs", lambda e: e["y"]))
        )
        .cast("long")
        .alias("n_event_types"),
    )


def top_paths(
    paths: DataFrame, k: int = 20, path_col: str = "session_path"
) -> DataFrame:
    """The ``k`` most common session paths: (session_path, n_sessions,
    share), heaviest first, ties by path text — one count aggregate +
    a bounded top-k."""
    if k < 1:
        raise ValueError("k must be >= 1")
    total = paths.count()
    return (
        paths.groupBy(path_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col(path_col).asc())
        .limit(k)
        .withColumn(
            "share",
            F.col("n_sessions").cast("double")
            / F.lit(float(max(total, 1))),
        )
    )
