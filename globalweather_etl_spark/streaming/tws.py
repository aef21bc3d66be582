"""transformWithState twin (Spark 4) — VERDICT r11 item 7.

Spark 4's ``transformWithStateInPandas`` supersedes
``applyInPandasWithState`` with named state variables (value / list /
map), event- and processing-time TIMERS, and per-state TTL — the
machinery our applyInPandasWithState twins (streaming/stateful.py)
hand-roll with watermark bookkeeping where they need expiry.

This module migrates ONE twin behind the same semantics —
``running_user_totals_tws`` is drop-in for
``stateful.running_user_totals`` and parity-tested against it AND the
batch aggregate (tests/test_streaming.py) — and records the
evaluation for the rest:

- transformWithState REQUIRES the RocksDB state store provider
  (``spark.sql.streaming.stateStore.providerClass =
  ...state.RocksDBStateStoreProvider``); the default HDFS-backed
  provider is rejected at query start. RocksDB ships in Spark 4 OSS
  but brings a native dependency and per-executor local disk the
  HDFS-backed store doesn't need.
- It ALSO requires the ``protobuf`` Python package (the state
  protocol is protobuf messages) — absent in this container, so the
  parity test env-gates on ``tws_available()`` (verified: without
  protobuf the driver-side schema worker crashes opaquely; the
  ImportError is from pyspark's StateMessage_pb2).
- For the simple value-fold twins (totals, series monitor,
  Holt-Winters) the two APIs are expressively identical — the
  processor class is the same fold with ``ValueState`` instead of
  ``GroupState``. No migration benefit beyond API uniformity.
- The twins that would genuinely simplify are the ones using
  GroupStateTimeout + hand-rolled watermark math (session/dedup
  expiry): timers + TTL replace that bookkeeping. Worth migrating if
  the RocksDB provider becomes the deployment default; until then
  the applyInPandasWithState forms stay primary (they run on the
  default provider and are parity-pinned), and this twin documents
  the migration recipe.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from globalweather_etl_spark.streaming.stateful import (
    _TOTALS_OUT_SCHEMA,
    _TOTALS_STATE_SCHEMA,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming."
    "state.RocksDBStateStoreProvider"
)


def tws_available() -> bool:
    """transformWithState's Python<->JVM state protocol is protobuf-
    encoded (pyspark.sql.streaming.proto.StateMessage_pb2); without
    the ``protobuf`` package the driver-side schema worker crashes
    with an opaque 'driver worker exited unexpectedly'. This
    container does not ship protobuf (and nothing may be installed),
    so the twin is env-gated exactly like the multimodal codecs —
    the API surface, processor and parity test are real and run
    wherever protobuf exists."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class _RunningTotalsProcessor(StatefulProcessor):
    """The same fold as stateful._totals_fn, expressed as a
    transformWithState processor with one ValueState variable."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "totals", _TOTALS_STATE_SCHEMA
        )

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        if self._state.exists():
            n, n_vals, total = tuple(self._state.get())
        else:
            n, n_vals, total = 0, 0, 0.0
        for pdf in rows:
            n += int(len(pdf))
            n_vals += int(pdf["value"].count())
            total += float(pdf["value"].sum())
        self._state.update((n, n_vals, total))
        yield pd.DataFrame(
            {
                "user_id": pd.array([key[0]], dtype="Int64"),
                "n_events": pd.array([n], dtype="Int64"),
                "total_value": pd.array(
                    [total if n_vals else None], dtype="Float64"
                ),
            }
        )

    def close(self) -> None:
        pass


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Running per-user (count, sum) — semantics identical to
    stateful.running_user_totals, executed by transformWithState.

    The STREAM must run under the RocksDB state store provider: set
    ``spark.sql.streaming.stateStore.providerClass`` to
    ``ROCKSDB_PROVIDER`` before starting the query (it is read at
    query start, not at plan time) — the default provider errors."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RunningTotalsProcessor(),
        outputStructType=_TOTALS_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
