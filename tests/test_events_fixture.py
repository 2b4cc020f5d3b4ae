"""Fixture-dtype canary for the events plans (VERDICT r2 item 3).

Round 2 shipped a regression the 142-test suite missed: the driver
fixture's ``events.ts`` became parquet TIMESTAMP_MICROS with
``isAdjustedToUTC=0`` (Spark: TIMESTAMP_NTZ) and ``sessionize``'s
``ts.cast("long")`` crashed — but no test exercised sessionize against
the parquet at all.  Every test here loads
``/root/testdata/sf0.001/events.parquet`` through ``load_table`` —
exactly the path ``__spark_entry__.queries()`` uses — so any future
fixture dtype drift fails the suite, not the driver gate.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from map_reduce_using_cloud_functions_spark.plans import events as ev
from map_reduce_using_cloud_functions_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _events(spark):
    return load_table(spark, SF, "events")


def test_load_table_normalizes_ts_to_session_tz_timestamp(spark):
    """The scan edge must deliver one type — session-tz TIMESTAMP — no
    matter which physical encoding the fixture ships (NTZ micros, nanos
    longs, or UTC-adjusted micros)."""
    dtype = dict(_events(spark).dtypes)["ts"]
    assert dtype == "timestamp", f"expected LTZ timestamp, got {dtype}"


def test_sessionize_on_fixture(spark):
    """The r2 red row: lag/epoch arithmetic over the fixture ts column.
    Sessions must be disjoint per user and gap-consistent."""
    sess = ev.sessionize(_events(spark)).cache()
    try:
        n = sess.count()
        assert n > 0
        # Session ids are dense 1..k per user.
        per_user = sess.groupBy("user_id").agg(
            F.count("*").alias("n"), F.max("session_id").alias("mx")
        )
        assert per_user.filter(F.col("n") != F.col("mx")).count() == 0
        # Consecutive sessions of a user are separated by > the gap.
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy("session_id")
        gaps = sess.select(
            "user_id",
            (
                F.col("session_start").cast("long")
                - F.lag(F.col("session_end").cast("long")).over(w)
            ).alias("gap_s"),
        ).filter(F.col("gap_s").isNotNull())
        assert gaps.filter(F.col("gap_s") <= ev.SESSION_GAP_MINUTES * 60).count() == 0
        # Within a session, span never exceeds... no bound (a session can
        # be long); but start <= end always.
        assert (
            sess.filter(F.col("session_start") > F.col("session_end")).count() == 0
        )
    finally:
        sess.unpersist()


def test_tumbling_hourly_on_fixture(spark):
    events = _events(spark)
    agg = ev.tumbling_hourly(events)
    assert agg.count() > 0
    # Bucket totals re-sum to the raw event count.
    assert (
        agg.agg(F.sum("n_events")).first()[0] == events.count()
    )


def test_sliding_daily_on_fixture(spark):
    daily = ev.sliding_daily_by_user(_events(spark))
    assert daily.count() > 0
    # ma3 is an average of up to 3 positive daily counts: > 0 always.
    assert daily.filter(F.col("ma3") <= 0).count() == 0


def test_json_props_rollup_on_fixture(spark):
    roll = ev.json_props_rollup(_events(spark)).collect()
    assert len(roll) > 0
    for r in roll:
        assert r["n"] > 0


def test_events_pivot_on_fixture(spark):
    events = _events(spark)
    piv = ev.events_pivot(events)
    type_cols = [c for c in piv.columns if c != "user_id"]
    assert type_cols  # static value list resolved
    # Pivot counts re-sum to the raw event count (fixture types ⊆ list).
    total = piv.select(
        sum((F.col(c) for c in type_cols), F.lit(0)).alias("t")
    ).agg(F.sum("t")).first()[0]
    assert total == events.count()


def test_approx_distinct_on_fixture(spark):
    rows = ev.approx_distinct_users(_events(spark)).collect()
    assert len(rows) > 0
    for r in rows:
        assert abs(r["approx_users"] - r["exact_users"]) <= max(
            1, 0.2 * r["exact_users"]
        )


def test_approx_distinct_checked_on_fixture(spark):
    # the judged hash-gated form: exact column + asserted bound
    rows = ev.approx_distinct_users_checked(_events(spark)).collect()
    assert len(rows) > 0
    assert all(r["approx_ok"] for r in rows)
    exact = dict(
        _events(spark)
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    )
    for r in rows:
        assert r["exact_users"] == exact[r["event_type"]]


def test_event_type_funnel_on_fixture(spark):
    events = _events(spark)
    fun = ev.event_type_funnel(events)
    assert fun.count() == events.select("user_id").distinct().count()


def test_user_retention_hand_fixture(spark):
    """Hand-checkable cohort: users A,B start week of 2024-01-01
    (Monday); A returns in week+1, nobody in week+2, B in week+3.
    User C starts week+1 and never returns."""
    rows = [
        (1, "2024-01-02 10:00:00", 1),  # A week 0
        (2, "2024-01-03 10:00:00", 2),  # B week 0
        (3, "2024-01-09 10:00:00", 1),  # A week 1
        (4, "2024-01-24 10:00:00", 2),  # B week 3
        (5, "2024-01-10 10:00:00", 3),  # C cohort week 1
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long"
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id")
    got = {
        (str(r["cohort_week"]), r["week_offset"]): (
            r["n_active"],
            r["cohort_size"],
            r["retention_rate"],
        )
        for r in ev.user_retention(events).collect()
    }
    assert got == {
        ("2024-01-01", 0): (2, 2, 1.0),
        ("2024-01-01", 1): (1, 2, 0.5),
        ("2024-01-01", 3): (1, 2, 0.5),
        ("2024-01-08", 0): (1, 1, 1.0),
    }


def test_user_retention_on_fixture(spark):
    """Invariants on the real fixture: offset 0 row per cohort equals
    the cohort size; rates in (0, 1]; cohorts partition the users."""
    events = _events(spark)
    ret = ev.user_retention(events).collect()
    n_users = events.select("user_id").distinct().count()
    assert sum(r["n_active"] for r in ret if r["week_offset"] == 0) == n_users
    for r in ret:
        assert 0 < r["retention_rate"] <= 1.0
        if r["week_offset"] == 0:
            assert r["n_active"] == r["cohort_size"]
