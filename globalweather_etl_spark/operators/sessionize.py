"""Per-event sessionization (gaps-and-islands): label every event with
its session, rather than aggregating sessions away.

`streaming.windows.session_stats` gives per-session aggregates via
Spark's session_window; pipelines that need the events THEMSELVES
carrying a session key (attribution joins, per-session sequence
features, funnel analysis) need the assignment form: a new session
starts where the gap to the previous event of the same key is >= gap.

Plan shape: ONE window over (key, ts) — lag to mark session starts,
running sum to number them. One hash exchange on the key, one sort;
both metrics share the window spec so Catalyst plans a single Window
operator. The oracle is the identical gaps-and-islands rewrite in
ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: float,
    session_col: str = "session_id",
    with_session_start: bool = True,
) -> DataFrame:
    """All input columns + `<session_col>` (1-based ordinal per key,
    in time order) and, unless ``with_session_start=False``,
    `session_start` (the session's first event time). Events exactly
    `gap_seconds` apart CONTINUE the session —
    Spark's session_window merges when next.start <= prev_end
    (prev_end = last + gap), so only a strictly larger gap starts a
    new one; this matches the gaps-and-islands oracle for
    events_session_30m (`ts - lag(ts) > INTERVAL` starts a session).

    Ties on (key, ts) stay in one session regardless of tiebreak
    order (delta 0 <= gap), so the ordering needs no further pinning.

    ``with_session_start=False`` skips the second Window pass that
    attaches `session_start`: the (key, session) grouping reuses the
    key exchange (subset clustering) but still pays a full extra sort
    — callers that aggregate per session anyway (min(ts) in their own
    groupBy) get the ordinal for one exchange + one sort total.
    """
    w_seq = Window.partitionBy(key_col).orderBy(ts_col)
    prev = F.lag(F.col(ts_col)).over(w_seq)
    gap = F.col(ts_col).cast("double") - prev.cast("double")
    is_start = (prev.isNull() | (gap > F.lit(float(gap_seconds)))).cast("long")
    w_run = w_seq.rowsBetween(Window.unboundedPreceding, 0)
    with_id = events.withColumn(
        session_col, F.sum(is_start).over(w_run)
    )
    if not with_session_start:
        return with_id
    w_sess = Window.partitionBy(key_col, session_col)
    return with_id.withColumn(
        "session_start", F.min(ts_col).over(w_sess)
    )
