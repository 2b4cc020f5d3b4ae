"""Z-order clustered layout (operators/layout.py): pure layout — byte
placement changes, answers never do. Fidelity, the both-dimensions
pruning property single-column sorts cannot give, NULL routing, and
the guards."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from map_reduce_using_cloud_functions_spark.operators.layout import (
    write_zordered,
    zorder_key,
    zorder_scan_stats,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF}/lineitem.parquet")


def test_roundtrip_fidelity_and_filter_answers(spark, lineitem, tmp_path):
    """The z-written table holds exactly the input rows, and a filtered
    aggregate reads identically off the clustered layout (pruning can
    only skip row groups the predicate excludes)."""
    path = str(tmp_path / "z")
    write_zordered(lineitem, path, ["l_orderkey", "l_partkey"], num_files=8)
    back = spark.read.parquet(path)
    assert back.count() == lineitem.count()
    assert back.exceptAll(lineitem).count() == 0
    assert lineitem.exceptAll(back).count() == 0
    pred = (F.col("l_partkey") < 200) & (F.col("l_quantity") > 10)
    # decimal sum: order-independent, so the row-order change the
    # layout makes cannot perturb the comparison
    agg = F.sum(F.col("l_extendedprice").cast("decimal(38,6)"))
    want = lineitem.where(pred).agg(agg).first()[0]
    got = back.where(pred).agg(agg).first()[0]
    assert got == want


def test_zorder_prunes_every_dimension(spark, lineitem, tmp_path):
    """The point of the curve: a single-column sort gives ~full pruning
    on its own column and NONE on the other; the z-layout prunes BOTH.
    Footer-only stats — deterministic, no timing."""
    zpath, opath = str(tmp_path / "z"), str(tmp_path / "one")
    write_zordered(
        lineitem, zpath, ["l_orderkey", "l_partkey"], bits=8, num_files=16
    )
    (
        lineitem.repartitionByRange(16, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(opath)
    )
    hi_ok = lineitem.agg(F.max("l_orderkey")).first()[0]
    hi_pk = lineitem.agg(F.max("l_partkey")).first()[0]
    z_ok = zorder_scan_stats(spark, zpath, "l_orderkey", 0, hi_ok * 0.0625)
    z_pk = zorder_scan_stats(spark, zpath, "l_partkey", 0, hi_pk * 0.0625)
    o_ok = zorder_scan_stats(spark, opath, "l_orderkey", 0, hi_ok * 0.0625)
    o_pk = zorder_scan_stats(spark, opath, "l_partkey", 0, hi_pk * 0.0625)
    # the one-col layout is (near-)perfect on its column, blind on the other
    assert o_ok["skip_frac"] > 0.8 and o_pk["skip_frac"] == 0.0
    # the z layout prunes meaningfully on BOTH
    assert z_ok["skip_frac"] >= 0.5 and z_pk["skip_frac"] >= 0.5


def test_nulls_route_to_origin_and_survive(spark, tmp_path):
    """Rows with NULL in a z column land in bucket 0 (the curve
    origin) and round-trip intact."""
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (None, 3.0), (4, 4.0)], "a int, b double"
    )
    keyed = zorder_key(df, ["a", "b"], bits=2)
    assert keyed.where(F.col("a").isNull()).count() == 1
    path = str(tmp_path / "z")
    write_zordered(df, path, ["a", "b"], bits=2, num_files=1)
    back = spark.read.parquet(path)
    assert back.count() == 4
    assert back.where(F.col("b").isNull()).count() == 1


def test_quantile_all_null_column_degenerates_to_origin(spark, tmp_path):
    """approxQuantile on an all-NULL column returns an empty breaks
    list; the quantile bucketizer must treat that as a degenerate
    domain (bucket 0, like the linear path) instead of building an
    ``array<void>`` literal that fails analysis."""
    df = spark.createDataFrame(
        [(i, None) for i in range(100)], "a int, b double"
    )
    keyed = zorder_key(df, ["a", "b"], bits=3, scaling="quantile")
    assert keyed.count() == 100
    path = str(tmp_path / "zq")
    write_zordered(df, path, ["a", "b"], bits=3, num_files=2, scaling="quantile")
    back = spark.read.parquet(path)
    assert back.count() == 100
    assert back.where(F.col("b").isNull()).count() == 100


def test_guards(spark, lineitem):
    with pytest.raises(ValueError, match="bits"):
        zorder_key(lineitem, ["l_orderkey", "l_partkey"], bits=0)
    with pytest.raises(ValueError, match=">= 2 columns"):
        zorder_key(lineitem, ["l_orderkey"])
    # d*bits > 63 would WRAP shift amounts (JVM masks mod 64) and
    # silently destroy curve locality — refuse instead
    with pytest.raises(ValueError, match="only 63 fit"):
        zorder_key(
            lineitem,
            ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity"],
            bits=16,
        )


def test_quantile_scaling_survives_skew(spark, tmp_path):
    """A heavy-tailed column collapses linear min/max buckets (nearly
    every row lands in bucket 0, so its min/max stay wide in every
    file); quantile boundaries keep the buckets balanced and restore
    pruning on the skewed dimension."""
    n = 20_000
    df = spark.range(n).select(
        F.col("id").alias("a"),
        # 99.9% of values in [0, 1000), a thin tail out to ~1e9
        F.when(F.col("id") % 1000 == 0, (F.col("id") + 1) * 50_000)
        .otherwise(F.col("id") % 1000)
        .cast("double")
        .alias("s"),
    )
    lin, qua = str(tmp_path / "lin"), str(tmp_path / "qua")
    write_zordered(df, lin, ["a", "s"], bits=6, num_files=16)
    write_zordered(df, qua, ["a", "s"], bits=6, num_files=16, scaling="quantile")
    lo, hi = 100.0, 150.0  # a thin slice of the dense region
    s_lin = zorder_scan_stats(spark, lin, "s", lo, hi)
    s_qua = zorder_scan_stats(spark, qua, "s", lo, hi)
    assert s_qua["skip_frac"] > s_lin["skip_frac"]
    assert s_qua["skip_frac"] >= 0.5


def test_zordered_events_serves_judged_slice_with_both_dim_pruning(spark, tmp_path):
    """r9 verdict task 7 — wire the layout into the judged surface:
    the events fixture persisted z-ordered on (user_id, ts) serves a
    judged-query slice (sessionize one user band inside one time
    window — the operational form of the judged events_sessionize)
    IDENTICALLY to the plain table, while the parquet footers already
    exclude most row groups on BOTH predicate columns. The ts-sorted
    single-sort layout — what a time-series table naively ships with —
    prunes nothing on user_id."""
    from map_reduce_using_cloud_functions_spark.plans.events import sessionize
    from map_reduce_using_cloud_functions_spark.sources import load_table
    from map_reduce_using_cloud_functions_spark.sources.tables import (
        materialize_zordered,
    )

    sf = "/root/testdata/sf0.01"
    plain = load_table(spark, sf, "events")
    zpath = str(tmp_path / "events_z")
    zdf = materialize_zordered(
        spark, sf, "events", ["user_id", "ts"], zpath, bits=5, num_files=16
    )
    spath = str(tmp_path / "events_ts_sorted")
    # micros for the comparison layout too: the Spark default (INT96)
    # writes no ts stats at all, which would make the single-sort
    # baseline look artificially blind on its OWN column
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        (
            plain.repartitionByRange(16, "ts")
            .sortWithinPartitions("ts")
            .write.parquet(spath)
        )
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")

    b = plain.selectExpr(
        "min(user_id) AS lo_u",
        "max(user_id) AS hi_u",
        "min(cast(ts AS double)) AS lo_t",
        "max(cast(ts AS double)) AS hi_t",
    ).first()
    u_lo, u_hi = b["lo_u"], b["lo_u"] + max((b["hi_u"] - b["lo_u"]) // 8, 1)
    t_lo, t_hi = b["lo_t"], b["lo_t"] + max((b["hi_t"] - b["lo_t"]) / 8, 1.0)
    cond = (
        (F.col("user_id") >= u_lo)
        & (F.col("user_id") <= u_hi)
        & (F.col("ts").cast("double") >= t_lo)
        & (F.col("ts").cast("double") <= t_hi)
    )
    want = sorted(map(tuple, sessionize(plain.where(cond)).collect()))
    got = sorted(map(tuple, sessionize(zdf.where(cond)).collect()))
    assert got == want and want, "layout changed answers (or empty slice)"

    zu = zorder_scan_stats(spark, zpath, "user_id", float(u_lo), float(u_hi))
    zt = zorder_scan_stats(spark, zpath, "ts", t_lo, t_hi)
    su = zorder_scan_stats(spark, spath, "user_id", float(u_lo), float(u_hi))
    st = zorder_scan_stats(spark, spath, "ts", t_lo, t_hi)
    # the z layout prunes on BOTH dims; single-sort only on its own
    assert zu["skip_frac"] >= 0.4, (zu, su)
    assert zt["skip_frac"] >= 0.4, (zt, st)
    assert su["skip_frac"] == 0.0, su
    assert st["skip_frac"] >= zt["skip_frac"] * 0.8  # ts-sort prunes ts fine


def test_bucketize_tree_matches_upper_bound_count(spark):
    """r11: the quantile bucketizer's binary-search conditional tree
    assigns EXACTLY count(breaks <= value) — the contract the r10
    array-filter implementation computed — including duplicate
    boundaries (skewed quantiles), values equal to a boundary, values
    outside the break range, and NULLs (bucket 0)."""
    from map_reduce_using_cloud_functions_spark.operators.layout import (
        _bucketize,
    )

    breaks = [-3.0, -1.5, -1.5, 0.0, 0.0, 0.0, 2.5, 7.0, 7.0]
    values = [
        None, -10.0, -3.0, -2.9, -1.5, -1.4999, 0.0, 1.0, 2.5, 2.6,
        7.0, 7.1, 1e18, -1e18, float("nan"),
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "i int, v double"
    )
    got = {
        r["i"]: r["b"]
        for r in df.select("i", _bucketize("v", breaks).alias("b")).collect()
    }

    def upper_bound(v):
        if v is None:
            return 0
        if v != v:  # NaN: Spark orders NaN above every double
            return len(breaks)
        return sum(1 for b in breaks if v >= b)

    want = {i: upper_bound(v) for i, v in enumerate(values)}
    assert got == want
    # degenerate all-NULL domain: empty breaks list -> bucket 0
    got0 = df.select(_bucketize("v", []).alias("b")).distinct().collect()
    assert [r["b"] for r in got0] == [0]


def test_bucketize_nonfinite_boundaries(spark):
    """r11 review finding: quantile boundaries containing inf/nan must
    parse (repr() of non-finite doubles is not SQL) and bucket with the
    same upper-bound-count semantics as the r10 array filter."""
    from map_reduce_using_cloud_functions_spark.operators.layout import (
        _bucketize,
    )

    breaks = [float("-inf"), -1.0, 1.0, float("inf"), float("inf")]
    values = [None, float("-inf"), -5.0, 0.0, 5.0, float("inf"), float("nan")]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "i int, v double"
    )
    got = {
        r["i"]: r["b"]
        for r in df.select("i", _bucketize("v", breaks).alias("b")).collect()
    }
    # Spark double ordering: -inf >= -inf true; inf >= inf true; NaN
    # above everything (NaN >= inf true)
    assert got == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3, 5: 5, 6: 5}
