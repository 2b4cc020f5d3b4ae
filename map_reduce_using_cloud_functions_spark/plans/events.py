"""Event-stream analytics in batch form (SURVEY.md §2.b X7 semantics on
the ``events`` fixture). The same aggregations run as Structured
Streaming plans in ``streaming/windows.py``; these batch twins are the
oracle-checkable versions — identical window semantics, no watermark
needed because the batch is complete.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

SESSION_GAP_MINUTES = 30


def tumbling_hourly(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour windows per event type: count + value sum.
    ``date_trunc`` is the batch twin of ``window(ts, '1 hour')`` —
    identical bucket boundaries in UTC."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_start"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


def sliding_daily_by_user(events: DataFrame) -> DataFrame:
    """Per-user daily activity + 3-day moving average of event counts —
    the sliding-window pattern via an analytic frame over day buckets."""
    daily = (
        events.groupBy(
            F.col("user_id"), F.date_trunc("day", F.col("ts")).alias("day")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("day"))
        .rowsBetween(-2, Window.currentRow)
    )
    return daily.select(
        "user_id",
        "day",
        "n",
        F.round(F.avg("n").over(w), 6).alias("ma3"),
    )


def sessionize(events: DataFrame, gap_minutes: int = SESSION_GAP_MINUTES) -> DataFrame:
    """Session windows via gaps-and-islands: a session breaks when the
    gap since the user's previous event exceeds ``gap_minutes``.

    Expressed with lag + running sum (not ``session_window``) so the
    batch plan is the *definition* both engines share bit-for-bit; the
    streaming module uses the built-in ``session_window`` for the same
    semantics under watermarks. Returns one row per session.

    NULL-ts events are excluded by contract (an event without a time
    cannot be placed in a session; ``session_window`` drops them too).
    Found by the r5 parity fuzzer: without the explicit filter, Spark's
    ASC NULLS FIRST vs DuckDB's NULLS LAST window order silently shifts
    every later session_id for that user."""
    events = events.where(F.col("ts").isNotNull())
    w_ord = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w_ord)
    starts = events.withColumn(
        "is_start",
        F.when(gap.isNull() | (gap > gap_minutes * 60), F.lit(1)).otherwise(F.lit(0)),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = starts.withColumn("session_id", F.sum("is_start").over(w_run))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


def json_props_rollup(events: DataFrame) -> DataFrame:
    """Semi-structured extraction: pull ``k`` out of the JSON ``props``
    column and aggregate per event type (get_json_object stays
    JVM-side; no Python JSON parsing)."""
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).alias("sum_k"),
            F.round(F.avg(k), 6).alias("avg_k"),
        )
    )


def events_pivot(events: DataFrame) -> DataFrame:
    """Pivot: one row per user, one count column per event type
    (explicit value list keeps the plan static — no discovery pass)."""
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        events.groupBy("user_id")
        .pivot("event_type", types)
        .count()
        .na.fill(0, types)
    )


def approx_distinct_users(events: DataFrame) -> DataFrame:
    """Approximate aggregates (HLL): distinct users per event type,
    with the exact companion and the relative error riding along.
    Sketch values themselves are engine-specific (no cross-engine
    oracle); the bound is asserted by tests/test_events_fixture.py and
    by the hash-checked ``approx_distinct_users_checked`` twin below."""
    agg = events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return agg.withColumn(
        "rel_err",
        F.round(
            F.abs(F.col("approx_users") - F.col("exact_users"))
            / F.greatest(F.col("exact_users"), F.lit(1)),
            6,
        ),
    )


def approx_distinct_users_checked(
    events: DataFrame, rel_err_bound: float = 0.2
) -> DataFrame:
    """Oracle-checkable form of the HLL rollup: emits the exact
    distinct count (hash-matchable against ``count(DISTINCT ...)``)
    plus ``approx_ok`` — whether the engine's HLL estimate landed
    within ``rel_err_bound`` of it. The oracle states ``TRUE`` for
    every group, so a drifting sketch flips the value hash and the
    row goes red: the approximate operator is under the full gate
    without requiring bit-parity of sketch internals (default rsd
    0.05; the 0.2 bound is 4σ). The bound keeps an absolute floor of
    1 — a ±1 estimate on a tiny group (exact=4, approx=5 is normal
    sketch behavior at rel_err 0.25) must not flip the gate red."""
    agg = approx_distinct_users(events)
    abs_err = F.abs(F.col("approx_users") - F.col("exact_users"))
    bound = F.greatest(F.lit(1.0), F.lit(rel_err_bound) * F.col("exact_users"))
    return agg.select(
        "event_type",
        "exact_users",
        (abs_err <= bound).alias("approx_ok"),
    )


def user_retention(events: DataFrame) -> DataFrame:
    """Cohort retention: users grouped by their first-activity week,
    tracked by how many are still active N weeks later — the classic
    product-analytics rollup (the batch twin of what a streaming
    deployment would maintain with keyed state).

    Shape for scale: ONE wide shuffle on ``user_id`` folds each user to
    (first week, set of active weeks) — per-user state is bounded by
    the number of distinct weeks, not events — then the exploded
    (cohort, offset) aggregation and the cohort-size window run on the
    tiny cohort×offset relation. The events relation is scanned once;
    no self-join of the raw events.
    """
    # Events without a timestamp cannot cohort — dropped EXPLICITLY on
    # both sides (the oracle twin filters ts IS NOT NULL too; without
    # the filter collect_set silently drops NULL weeks while SQL
    # would group them into a NULL-offset row, diverging the hash).
    events = events.where(F.col("ts").isNotNull())
    # DATE-typed week starts (DuckDB's date_trunc('week') yields DATE;
    # matching types keep the oracle hash aligned).
    per_user = events.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week"),
        F.collect_set(F.to_date(F.date_trunc("week", F.col("ts")))).alias("weeks"),
    )
    active = (
        per_user.select(
            "cohort_week",
            F.explode("weeks").alias("week"),
        )
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        # weeks is a set per user, so rows here are (user, week)-distinct
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    # Offset 0 holds every cohort member (the first week is always in
    # the user's set), so cohort size falls out of the same relation —
    # a window over the cohort×offset rollup, never a second scan.
    w = Window.partitionBy("cohort_week")
    size = F.max(F.when(F.col("week_offset") == 0, F.col("n_active"))).over(w)
    return active.select(
        "cohort_week",
        "week_offset",
        "n_active",
        size.alias("cohort_size"),
        F.round(F.col("n_active") / size, 6).alias("retention_rate"),
    )


def event_type_funnel(events: DataFrame) -> DataFrame:
    """Per-user funnel flags (did view→click→purchase) via conditional
    aggregation — the pivot-like pattern without a shuffle per stage."""
    return (
        events.groupBy("user_id")
        .agg(
            F.max((F.col("event_type") == "view").cast("int")).alias("did_view"),
            F.max((F.col("event_type") == "click").cast("int")).alias("did_click"),
            F.max((F.col("event_type") == "purchase").cast("int")).alias("did_purchase"),
        )
    )
