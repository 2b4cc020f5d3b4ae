"""Bucketed-table co-location (sources/bucketed.py): the persisted
hash-partitioning that removes the join shuffle — the plan property is
the whole point, so these tests assert on the physical plan."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from map_reduce_using_cloud_functions_spark.sources import load_table
from map_reduce_using_cloud_functions_spark.sources.bucketed import (
    read_bucketed,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")
    write_bucketed(orders, "orders_b", ["o_orderkey"], 8, path=str(base / "o"))
    write_bucketed(
        lineitem, "lineitem_b", ["l_orderkey"], 8, path=str(base / "l")
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    ot, lt = bucketed_tables
    o, l = read_bucketed(spark, ot), read_bucketed(spark, lt)
    # Forbid broadcast so the plan must prove co-location, not dodge it.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            o.join(l, o.o_orderkey == l.l_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        assert joined.count() > 0
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        # The join itself must not shuffle either side; the only
        # Exchange allowed is the one for the groupBy above the join.
        join_part = plan.split("SortMergeJoin", 1)[1]
        assert "Exchange" not in join_part
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old)


def test_bucketed_same_results_as_plain_join(spark, bucketed_tables):
    ot, lt = bucketed_tables
    o, l = read_bucketed(spark, ot), read_bucketed(spark, lt)
    bucketed = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    po, pl = load_table(spark, SF, "orders"), load_table(spark, SF, "lineitem")
    plain = (
        po.join(pl, po.o_orderkey == pl.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_bucket_pruning_on_point_filter(spark, bucketed_tables):
    ot, _ = bucketed_tables
    o = read_bucketed(spark, ot)
    key = o.select(F.min("o_orderkey")).first()[0]
    # autoBucketedScan drops bucket layout for scan-only queries (no
    # join/agg to co-locate); force it so the point filter can prune.
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        plan = plan_of(o.where(F.col("o_orderkey") == key))
        assert "SelectedBucketsCount: 1 out of 8" in plan
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
        )
