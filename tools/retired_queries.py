"""Oracle registry for queries retired from the driver's 50-row gate.

The driver checks only the first 50 entries of
``__spark_entry__.queries()``; 16 earlier oracle-passing queries were
retired across rounds 1–2 to make room (list + rationale in the
``queries()`` docstring). Their implementations and pytest twins all
remain — this module restores their *oracle* coverage so
``tools/check_oracle.py --with-retired`` re-verifies every implemented
query each round (VERDICT r2 item 4) and gate rotation can't silently
rot them.

Spark fns mirror the exact call shapes the r1 gate used (git
455dba8:__spark_entry__.py); oracle SQL strings are the r1 DuckDB
twins, reusing the live CTE fragments from ``__spark_entry__``.
"""

from __future__ import annotations

import os
import sys
from typing import Callable

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

import __spark_entry__ as entrymod
from map_reduce_using_cloud_functions_spark.operators import dedup as dd
from map_reduce_using_cloud_functions_spark.operators import index as ix
from map_reduce_using_cloud_functions_spark.plans import events as ev
from map_reduce_using_cloud_functions_spark.plans import relational as rel
from map_reduce_using_cloud_functions_spark.sources import load_table


def _tables(spark, sf):
    return entrymod._tables(spark, sf)


def _index(spark, sf):
    return entrymod._q_index_build(spark, sf)


def retired_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "index_distinct_words": lambda s, d: ix.distinct_words(_index(s, d)).agg(
            F.count(F.lit(1)).alias("n_words")
        ),
        "index_top_words": lambda s, d: (
            _index(s, d)
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("count").alias("total_count"))
            .orderBy(F.desc("total_count"), F.asc("word"))
            .limit(20)
        ),
        "segment_order_stats": lambda s, d: rel.segment_order_stats(_tables(s, d)),
        "customers_with_big_orders": lambda s, d: rel.customers_with_big_orders(_tables(s, d)),
        "running_order_totals": lambda s, d: rel.running_order_totals(_tables(s, d)),
        "top_expensive_orders": lambda s, d: rel.top_expensive_orders(_tables(s, d)),
        "part_type_margins": lambda s, d: rel.part_type_margins(_tables(s, d)),
        "order_priority_counts": lambda s, d: rel.order_priority_counts(_tables(s, d)),
        "cube_order_counts": lambda s, d: rel.cube_order_counts(_tables(s, d)),
        "orders_above_global_avg": lambda s, d: rel.orders_above_global_avg(_tables(s, d)),
        "deterministic_sample_agg": lambda s, d: rel.deterministic_sample_agg(_tables(s, d)),
        "big_customers_having": lambda s, d: rel.big_customers_having(_tables(s, d)),
        "top_customer_per_nation": lambda s, d: rel.top_customer_per_nation(_tables(s, d)),
        "events_sliding_daily": lambda s, d: ev.sliding_daily_by_user(load_table(s, d, "events")),
        "events_funnel": lambda s, d: ev.event_type_funnel(load_table(s, d, "events")),
        "dedup_minhash_signatures": lambda s, d: dd.minhash_signatures(load_table(s, d, "documents")),
    }


def retired_oracle_sql() -> dict[str, str]:
    hex64 = entrymod._HEX64
    sql: dict[str, str] = {}
    sql["index_distinct_words"] = (
        entrymod._POSTINGS_CTE
        + "SELECT count(DISTINCT word) AS n_words FROM postings"
    )
    sql["index_top_words"] = (
        entrymod._POSTINGS_CTE
        + "SELECT word, count(*) AS n_docs, sum(count)::BIGINT AS total_count "
        + "FROM postings GROUP BY word ORDER BY total_count DESC, word LIMIT 20"
    )
    sql["segment_order_stats"] = """
SELECT c_mktsegment, count(*) AS n_orders,
       round(sum(o_totalprice), 6) AS total_price,
       round(avg(o_totalprice), 6) AS avg_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""
    sql["customers_with_big_orders"] = """
SELECT c_custkey, c_nationkey FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)
"""
    sql["running_order_totals"] = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running_total
FROM orders
"""
    sql["top_expensive_orders"] = """
SELECT o_orderkey, round(o_totalprice, 6) AS o_totalprice, o_orderstatus
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""
    sql["part_type_margins"] = """
SELECT string_split(p_type, ' ')[1] AS type_head,
       round(avg(l_extendedprice * (1 - l_discount) - p_retailprice), 6) AS avg_margin,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
"""
    sql["order_priority_counts"] = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate >= TIMESTAMP '1995-01-01')
GROUP BY o_orderpriority
"""
    sql["cube_order_counts"] = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       round(sum(o_totalprice), 6) AS total
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""
    sql["orders_above_global_avg"] = """
SELECT o_orderkey, round(o_totalprice, 6) AS o_totalprice
FROM orders
WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) * 1.5
"""
    sql["deterministic_sample_agg"] = f"""
SELECT l_returnflag, count(*) AS n,
       round(sum(l_extendedprice), 6) AS sampled_revenue
FROM lineitem
WHERE {hex64.format(col="concat_ws('-', l_orderkey, l_linenumber)")} % 100 < 5
GROUP BY l_returnflag
"""
    sql["big_customers_having"] = """
SELECT o_custkey, count(*) AS n_orders
FROM orders GROUP BY o_custkey HAVING count(*) > 12
"""
    sql["top_customer_per_nation"] = """
WITH ranked AS (
  SELECT c_nationkey, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
)
SELECT c_nationkey, c_custkey AS top_custkey, round(c_acctbal, 6) AS top_bal
FROM ranked WHERE rn = 1
"""
    sql["events_sliding_daily"] = """
WITH daily AS (
  SELECT user_id, date_trunc('day', ts)::TIMESTAMP AS day, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT user_id, day, n,
       round(avg(n) OVER (PARTITION BY user_id ORDER BY day
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS ma3
FROM daily
"""
    sql["events_funnel"] = """
SELECT user_id,
       max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS did_view,
       max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS did_click,
       max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS did_purchase
FROM events GROUP BY user_id
"""
    sql["dedup_minhash_signatures"] = (
        entrymod._MINHASH_SQL
        + "SELECT doc_id, seed::BIGINT AS seed, minhash FROM sigs"
    )
    return sql
