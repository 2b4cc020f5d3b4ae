"""Custom stateful streaming operator (SURVEY.md §2.b X7 — the
``applyInPandasWithState`` surface for semantics the built-in windowed
aggregations can't express).

Implemented operator: **per-user running counters with anomaly
flagging** — for each user, maintain lifetime event count and value sum
across micro-batches, emit one row per user per batch with the updated
totals and a flag when the batch's value exceeds 3× the user's
historical per-event mean. The cross-batch memory (state handle) is
exactly what distinguishes this from a windowed aggregate: the
reference's only 'state' is its stored index re-merged per trigger
(master/main.py:106-126); this is the principled generalization.

State is per-group (user), Arrow-batched, and bounded by an idle
timeout (default 7 days of processing time): a user with no events for
that long has their state EVICTED, so total state is bounded by the
active-key set, not every key ever seen — the property that lets the
pattern scale to any keyed cardinality a shuffle can partition. The
trade is explicit: an evicted user who returns restarts their lifetime
totals from zero. ``idle_timeout_minutes=None`` disables eviction
(true lifetime totals, state grows with distinct keys forever — only
for bounded key domains).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, batch_events bigint, total_events bigint, "
    "total_value double, anomaly boolean"
)
STATE_SCHEMA = "total_events bigint, total_value double"

DEFAULT_IDLE_TIMEOUT_MINUTES = 7 * 24 * 60


def _make_update_fn(timeout_ms: int | None):
    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if timeout_ms is not None and state.hasTimedOut:
            # idle eviction: drop the key's state, emit nothing
            state.remove()
            return
        batch_events = 0
        batch_value = 0.0
        for pdf in pdfs:
            batch_events += len(pdf)
            batch_value += float(pdf["value"].fillna(0.0).sum())

        if state.exists:
            total_events, total_value = state.get
        else:
            total_events, total_value = 0, 0.0

        prior_mean = (total_value / total_events) if total_events else None
        total_events += batch_events
        total_value += batch_value
        state.update((total_events, total_value))
        if timeout_ms is not None:
            # re-armed every batch the user appears in; fires only
            # after a full idle window
            state.setTimeoutDuration(timeout_ms)

        batch_mean = batch_value / batch_events if batch_events else 0.0
        anomaly = prior_mean is not None and batch_mean > 3 * prior_mean
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "batch_events": [batch_events],
                "total_events": [total_events],
                "total_value": [total_value],
                "anomaly": [anomaly],
            }
        )

    return update


def running_user_totals(
    events: DataFrame,
    idle_timeout_minutes: int | None = DEFAULT_IDLE_TIMEOUT_MINUTES,
) -> DataFrame:
    """Attach the stateful operator to a streaming events DataFrame
    (must have user_id and value columns). See the module docstring for
    the idle-eviction contract."""
    timeout_ms = (
        None if idle_timeout_minutes is None else idle_timeout_minutes * 60_000
    )
    conf = (
        GroupStateTimeout.NoTimeout
        if timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _make_update_fn(timeout_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=conf,
        )
    )
