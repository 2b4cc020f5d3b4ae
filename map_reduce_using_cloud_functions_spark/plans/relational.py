"""Relational core (SURVEY.md §2.b X6) over the TPC-H-ish fixtures.

The reference never joins two relations (its whole surface is one
corpus → one index), so this catalog supplies the relational operator
classes a complete engine needs: scans+pushdown, inner/semi/anti joins,
broadcast strategy for dims, aggregation, grouping sets/rollup, window
functions (ranking + running frames), sorts/limits, set operations,
scalar function coverage.

Plan-shape guarantees (checked in tests via explain):
- dimension joins (region/nation/supplier/customer) are broadcast —
  never a shuffled sort-merge join against lineitem;
- aggregations are partial→final (map-side combine);
- filters and column pruning reach the parquet scan.
Every function takes the dict from ``sources.load_tables`` and returns
a DataFrame whose column names match the oracle SQL exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def q1_pricing_summary(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q1 shape: big scan, predicate pushdown, 4-way agg on a
    low-cardinality key. No joins — pure partial→final aggregation."""
    li = t["lineitem"]
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 6).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                6,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def revenue_by_region(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q5 shape: 5-way star join. All dims broadcast — lineitem
    (the fact) is never shuffled for the join, only for the final agg."""
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    return (
        t["lineitem"]
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(F.round(F.sum(rev), 6).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


def segment_order_stats(t: dict[str, DataFrame]) -> DataFrame:
    """customer⋈orders with broadcast dim; agg by market segment."""
    return (
        t["orders"]
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 6).alias("total_price"),
            F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
        )
    )


def customers_without_orders(t: dict[str, DataFrame]) -> DataFrame:
    """Anti join (NOT EXISTS): customers that never ordered."""
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


def customers_with_big_orders(t: dict[str, DataFrame]) -> DataFrame:
    """Semi join (EXISTS): customers with at least one order over 100k."""
    big = t["orders"].where(F.col("o_totalprice") > 100000)
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_nationkey")
    )


def top_orders_per_customer(t: dict[str, DataFrame], k: int = 3) -> DataFrame:
    """Ranking window: top-k orders by price per customer (row_number,
    deterministic orderkey tiebreak). The groupBy-free top-k pattern."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        t["orders"]
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 6).alias("o_totalprice"), "rnk")
    )


def running_order_totals(t: dict[str, DataFrame]) -> DataFrame:
    """Analytic frame: running sum of order value per customer in date
    order (rows unbounded preceding → current)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 6).alias("running_total"),
    )


def nation_set_ops(t: dict[str, DataFrame]) -> DataFrame:
    """Set operations: nations with customers INTERSECT/EXCEPT nations
    with suppliers, tagged and unioned into one relation."""
    cust_n = t["customer"].select(F.col("c_nationkey").alias("nationkey")).distinct()
    supp_n = t["supplier"].select(F.col("s_nationkey").alias("nationkey")).distinct()
    both = cust_n.intersect(supp_n).withColumn("tag", F.lit("both"))
    cust_only = cust_n.exceptAll(supp_n).withColumn("tag", F.lit("cust_only"))
    return both.unionByName(cust_only)


def rollup_acctbal(t: dict[str, DataFrame]) -> DataFrame:
    """Grouping sets: ROLLUP (region, nation) over customer balances —
    per-nation, per-region subtotal, grand total in one pass."""
    joined = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.rollup("r_name", "n_name").agg(
        F.round(F.sum("c_acctbal"), 6).alias("total_bal"),
        F.count(F.lit(1)).alias("n_cust"),
    )


def top_expensive_orders(t: dict[str, DataFrame], k: int = 10) -> DataFrame:
    """Global sort + limit (top-k): Spark plans TakeOrderedAndProject —
    no full sort materialization. Deterministic via orderkey tiebreak."""
    return (
        t["orders"]
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(k)
        .select("o_orderkey", F.round("o_totalprice", 6).alias("o_totalprice"), "o_orderstatus")
    )


def scalar_function_sampler(t: dict[str, DataFrame]) -> DataFrame:
    """Scalar-function coverage in one projection: date extract/trunc/
    diff, math (round/abs/floor/ceil/sqrt/ln/exp-guarded), string
    (concat/substr/upper/length/replace), conditional (CASE/coalesce/
    nullif). Mirrored expression-for-expression in the oracle."""
    o = t["orders"]
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_eoy"
        ),
        F.round(F.sqrt(F.abs(F.col("o_totalprice"))), 6).alias("sqrt_price"),
        F.floor(F.col("o_totalprice") / 1000).alias("price_k"),
        F.round(F.ln(F.col("o_totalprice") + 1), 6).alias("ln_price"),
        F.upper(F.substring("o_orderpriority", 1, 1)).alias("prio_initial"),
        F.length("o_orderstatus").alias("status_len"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.when(F.col("o_totalprice") > 150000, F.lit("high"))
        .when(F.col("o_totalprice") > 50000, F.lit("mid"))
        .otherwise(F.lit("low"))
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_or_open"
        ),
    )


def part_type_margins(t: dict[str, DataFrame]) -> DataFrame:
    """Fact⋈dim with expression agg: average discount-adjusted margin
    per part type prefix. Broadcast part; group on derived column."""
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.split(F.col("p_type"), " ").getItem(0).alias("type_head"))
        .agg(
            F.round(
                F.avg(F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col("p_retailprice")),
                6,
            ).alias("avg_margin"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def order_priority_counts(t: dict[str, DataFrame]) -> DataFrame:
    """Correlated-EXISTS shape (TPC-H Q4): orders having ≥1 lineitem
    shipped after order month start, counted by priority — semi join."""
    o = t["orders"]
    li = t["lineitem"].where(F.col("l_shipdate") >= F.lit("1995-01-01"))
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )
