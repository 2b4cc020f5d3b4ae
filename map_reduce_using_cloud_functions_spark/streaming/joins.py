"""Stream-stream interval joins (SURVEY.md §2.b X7).

The reference engine has no join concept at all — its only cross-file
operation is the index merge (`master/main.py` re-reducing mapper
outputs). A real event pipeline built on the same data needs the one
join shape Structured Streaming supports between two live streams: an
equi-join on a key plus an event-time range bound, with watermarks on
both sides so the join state is provably bounded.

Why the time bound is not optional at scale: a stream-stream join
without one must keep EVERY past row of both sides in state forever.
With watermarks on both event-time columns and a range condition
relating them, Spark derives a state eviction bound per side — a
100 TB/day stream holds only ``watermark + horizon`` worth of rows in
the state store, independent of total history.

The same functions run unchanged on batch DataFrames: the analyzer's
``EliminateEventTimeWatermark`` rule strips watermark nodes from batch
plans, leaving a plain range-condition equi-join. The batch run IS the
oracle twin — tests assert stream ≡ batch on the events fixture.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
    right_cols: tuple[str, ...] = ("event_id", "value"),
    prefix: str = "r_",
) -> DataFrame:
    """Pair every left row with the right rows of the same ``key`` whose
    timestamp lands in ``[left.ts, left.ts + horizon)``.

    Returns all left columns plus ``{prefix}ts`` and ``{prefix}{c}`` for
    each of ``right_cols``. Inner semantics (unmatched left rows drop;
    compose with a left_anti for the complement — streaming outer
    interval joins emit their NULL rows only after the watermark
    closes, which tests can't wait on deterministically).

    Streaming contract: both sides are watermarked here, and the range
    predicate ties the two event-time columns together, which is
    exactly what Spark's state cleanup needs — right rows are evicted
    once the left watermark passes ``r_ts + horizon``, left rows once
    the right watermark passes their ``ts``. On batch inputs the
    watermark nodes are eliminated by the analyzer and this is a plain
    equi-join on ``key`` with a range filter — the sort-merge/hash
    plan shuffles on ``key`` only, never a nested loop (the equi-key
    carries the join; the time bound is a post-join predicate).
    """
    r = right.select(
        F.col(key).alias(f"{prefix}{key}"),
        F.col(ts_col).alias(f"{prefix}ts"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
    ).withWatermark(f"{prefix}ts", watermark)
    l = left.withWatermark(ts_col, watermark)
    cond = (
        (F.col(key) == F.col(f"{prefix}{key}"))
        & (F.col(f"{prefix}ts") >= F.col(ts_col))
        & (F.col(f"{prefix}ts") < F.col(ts_col) + F.expr(f"INTERVAL {horizon}"))
    )
    return l.join(r, cond, "inner").drop(f"{prefix}{key}")


def click_attribution(
    events: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Attribution: every (click, purchase) pair where the same user's
    purchase happens within ``horizon`` after the click — the classic
    stream-stream join workload, expressed over the events fixture's
    single stream by filtering it into two sides (filter-then-join is
    a supported streaming self-join shape).

    Returns (user_id, click_id, click_ts, purchase_id, purchase_ts,
    purchase_value). A purchase preceded by several clicks in the
    horizon attributes to ALL of them (pair semantics — last-touch /
    first-touch policies are a groupBy(purchase_id).agg(max_by/min_by)
    away and deliberately not baked in).
    """
    clicks = events.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts")
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    paired = interval_join(
        clicks,
        purchases,
        key="user_id",
        ts_col="ts",
        horizon=horizon,
        watermark=watermark,
        right_cols=("event_id", "value"),
        prefix="p_",
    )
    return paired.select(
        "user_id",
        "click_id",
        F.col("ts").alias("click_ts"),
        F.col("p_event_id").alias("purchase_id"),
        F.col("p_ts").alias("purchase_ts"),
        F.col("p_value").alias("purchase_value"),
    )
