"""Custom stateful streaming operator (north-star: custom stateful ops via
``applyInPandasWithState``).

``running_user_totals`` keeps one state row per user — event count and value
sum — updated per micro-batch. This is the arbitrary-state escape hatch for
semantics windows/aggregations can't express (e.g., per-entity online
models, cross-batch dedup sets with custom eviction).

State size is bounded by the key cardinality, not the stream length — each
user's state is O(1). A processing-time timeout evicts idle users so the
state store cannot grow monotonically with churn.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _make_update(evict_idle_ms: int):
    def _update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        if evict_idle_ms:
            state.setTimeoutDuration(evict_idle_ms)
        yield pd.DataFrame(
            [{"user_id": user_id, "n_events": n, "total_value": total}]
        )

    return _update


def running_user_totals(events: DataFrame, evict_idle_ms: int = 0) -> DataFrame:
    """Per-user running (count, sum) maintained across micro-batches.

    ``evict_idle_ms`` > 0 enables processing-time eviction of idle users —
    the state-bounding knob for continuous deployments. Leave 0 for
    ``availableNow`` catch-up runs: a pending processing-time timeout keeps
    the bounded trigger from terminating (observed hang on Spark 4.1, so the
    timeout is opt-in)."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if evict_idle_ms
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update(evict_idle_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) on Spark 4.x ``transformWithState`` —
    the successor API to ``applyInPandasWithState`` with typed state
    primitives (value/list/map state, timers, TTL) instead of one opaque
    tuple.

    Same semantics as ``running_user_totals``; kept as a twin so either
    runtime path can be chosen per deployment (transformWithState requires
    the RocksDB state-store provider — set
    ``spark.sql.streaming.stateStore.providerClass`` to
    ``...state.RocksDBStateStoreProvider`` before starting the query).
    At scale the RocksDB store spills state to local disk + changelog
    checkpoints, so per-key state is bounded by disk, not executor heap —
    the right default for 100 TB streams with wide key spaces."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            if self._totals.exists():
                n, total = self._totals.get()
            else:
                n, total = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                [{"user_id": key[0], "n_events": n, "total_value": total}]
            )

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            _RunningTotals(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
