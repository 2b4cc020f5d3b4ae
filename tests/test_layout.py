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
