"""Custom stateful streaming operators.

Where the built-in windowed aggregations (windows.py) don't express the
semantics, applyInPandasWithState gives an Arrow-batched per-key state
machine: state lives in the state store (checkpointed, fault-tolerant),
keys are hash-partitioned so state never concentrates, and each
micro-batch touches only keys present in that batch.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_TOTALS_OUT_SCHEMA = "user_id long, n_events long, total_value double"
_TOTALS_STATE_SCHEMA = "n long, n_vals long, total double"


def _totals_fn(
    key: tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (n, n_vals, total) = state.get if state.exists else (0, 0, 0.0)
    for pdf in batches:
        n += int(len(pdf))
        n_vals += int(pdf["value"].count())  # non-null only
        total += float(pdf["value"].sum())  # skipna, 0.0 if all null
    state.update((n, n_vals, total))
    # SQL sum semantics: NULL (not 0.0) when no non-null value was ever
    # seen — matches the batch groupBy().agg(sum) parity target.
    yield pd.DataFrame(
        {
            "user_id": pd.array([key[0]], dtype="Int64"),
            "n_events": pd.array([n], dtype="Int64"),
            "total_value": pd.array(
                [total if n_vals else None], dtype="Float64"
            ),
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Running per-user (count, sum) across the whole stream — emitted
    once per key per micro-batch in update mode. The canonical
    "cumulative metric" shape the built-in windows can't express
    (no window: the aggregate never closes).

    Batch parity: after draining any prefix of the stream, the latest
    row per user equals the batch groupBy("user_id").agg(count, sum)
    over the same prefix (float sums batch-vs-stream may differ by
    accumulation order; totals here add in arrival order)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _totals_fn,
        outputStructType=_TOTALS_OUT_SCHEMA,
        stateStructType=_TOTALS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup(
    events: DataFrame, keys: list[str] | None = None, within: str | None = None
) -> DataFrame:
    """Exact streaming deduplication on key columns.

    within=None keeps ALL seen keys in state (exact forever, state grows
    with key cardinality); within="1 hour" + an upstream watermark uses
    dropDuplicatesWithinWatermark so state is evicted once duplicates
    can no longer arrive — the 100 TB/endless-stream configuration."""
    keys = keys or ["event_id"]
    if within is None:
        return events.dropDuplicates(keys)
    return events.withWatermark("ts", within).dropDuplicatesWithinWatermark(keys)
