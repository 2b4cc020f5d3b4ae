"""Salted-join equivalence property + the SQL-API surface (every
DataFrame plan is also reachable through spark.sql over registered
views — the 'switchable engine' claim)."""

from __future__ import annotations

import pyspark.sql.functions as F

from map_reduce_using_cloud_functions_spark.operators.joins import salted_join
from map_reduce_using_cloud_functions_spark.sources import load_tables, register_views

SF = "/root/testdata/sf0.001"


def test_salted_join_equals_plain_join(spark):
    t = load_tables(spark, SF)
    plain = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_extendedprice"), 4).alias("s"))
    )
    li = t["lineitem"].withColumnRenamed("l_orderkey", "o_orderkey")
    salted = (
        salted_join(li, t["orders"], "o_orderkey", salt_buckets=8)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_extendedprice"), 4).alias("s"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_hot_key(spark):
    """A 100%-skewed key must land in multiple salt buckets."""
    hot = spark.range(10000).select(F.lit(1).alias("k"), F.col("id"))
    dim = spark.createDataFrame([(1, "x")], "k long, v string")
    out = salted_join(hot, dim, "k", salt_buckets=8)
    assert out.count() == 10000
    # the salt column spreads the hot key before the join drops it
    salts = (
        hot.withColumn("__salt", (F.crc32(F.concat_ws("\x1f", "k", "id")) % 8).cast("int"))
        .select("__salt")
        .distinct()
        .count()
    )
    assert salts == 8


def test_sql_api_surface_matches_dataframe_plans(spark):
    """register_views + spark.sql answers the same questions as the
    DataFrame catalog — users can drive the engine in pure SQL."""
    t = register_views(spark, SF)
    got = spark.sql(
        """
        SELECT c_mktsegment, count(*) AS n_orders,
               round(sum(o_totalprice), 6) AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        """
    )
    from map_reduce_using_cloud_functions_spark.plans.relational import segment_order_stats

    df_api = segment_order_stats(t).drop("avg_price")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, df_api.collect()))


def test_tfidf_ranks_rare_terms_higher(spark):
    from map_reduce_using_cloud_functions_spark.operators.text_analysis import tf_idf

    docs = spark.createDataFrame(
        [
            (0, "common rare filler"),
            (1, "common other words"),
            (2, "common more things"),
        ],
        "doc_id bigint, text string",
    )
    scores = {
        (r["doc_id"], r["word"]): r["tfidf"] for r in tf_idf(docs).collect()
    }
    # equal tf within doc 0 → 'rare' (df=1) outranks 'common' (df=3)
    assert scores[(0, "rare")] > scores[(0, "common")]
    # 'filler' and 'rare' tie (both df=1, same tf); word-asc tiebreak
    # makes the top-1 deterministic: 'filler'.
    top = tf_idf(docs, top_k=1).where(F.col("doc_id") == 0).first()
    assert top["word"] == "filler"
    assert scores[(0, "filler")] == scores[(0, "rare")]


def test_salted_join_rejects_right_preserving(spark):
    """right/full joins would duplicate unmatched right rows per salt
    replica — the API refuses them instead of returning wrong rows."""
    import pytest
    from map_reduce_using_cloud_functions_spark.operators.joins import salted_join

    a = spark.createDataFrame([(1, "x")], "k bigint, v string")
    b = spark.createDataFrame([(1, "y"), (2, "z")], "k bigint, w string")
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError):
            salted_join(a, b, "k", how=how)
    assert salted_join(a, b, "k", how="inner").count() == 1


def test_retired_relational_plans_match_sql_twins(spark):
    """Every plan retired from the driver's 50-row queries() gate stays
    correct: each DataFrame plan must row-match its spark.sql
    formulation over the registered views (round-1 retirees + the rows
    retired in round 2 for the prep family and the as-of join)."""
    from map_reduce_using_cloud_functions_spark.plans import events as ev
    from map_reduce_using_cloud_functions_spark.plans import relational as rel
    from map_reduce_using_cloud_functions_spark.sources import load_table

    t = register_views(spark, SF)
    cases = [
        (
            rel.customers_with_big_orders(t),
            """SELECT c_custkey, c_nationkey FROM customer WHERE EXISTS
               (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)""",
        ),
        (
            rel.running_order_totals(t),
            """SELECT o_custkey, o_orderkey,
                      round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running_total
               FROM orders""",
        ),
        (
            rel.top_expensive_orders(t),
            """SELECT o_orderkey, round(o_totalprice, 6) AS o_totalprice, o_orderstatus
               FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
        ),
        (
            rel.cube_order_counts(t),
            """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                      round(sum(o_totalprice), 6) AS total
               FROM orders GROUP BY o_orderstatus, o_orderpriority WITH CUBE""",
        ),
        (
            rel.orders_above_global_avg(t),
            """SELECT o_orderkey, round(o_totalprice, 6) AS o_totalprice FROM orders
               WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) * 1.5""",
        ),
        (
            rel.big_customers_having(t),
            """SELECT o_custkey, count(*) AS n_orders
               FROM orders GROUP BY o_custkey HAVING count(*) > 12""",
        ),
        (
            rel.segment_order_stats(t),
            """SELECT c_mktsegment, count(*) AS n_orders,
                      round(sum(o_totalprice), 6) AS total_price,
                      round(avg(o_totalprice), 6) AS avg_price
               FROM orders JOIN customer ON o_custkey = c_custkey
               GROUP BY c_mktsegment""",
        ),
        (
            rel.part_type_margins(t),
            """SELECT split(p_type, ' ')[0] AS type_head,
                      round(avg(l_extendedprice * (1 - l_discount) - p_retailprice), 6) AS avg_margin,
                      count(*) AS n_lines
               FROM lineitem JOIN part ON l_partkey = p_partkey
               GROUP BY 1""",
        ),
        (
            rel.order_priority_counts(t),
            """SELECT o_orderpriority, count(*) AS order_count
               FROM orders
               WHERE EXISTS (SELECT 1 FROM lineitem
                             WHERE l_orderkey = o_orderkey
                               AND l_shipdate >= TIMESTAMP '1995-01-01')
               GROUP BY o_orderpriority""",
        ),
        (
            rel.deterministic_sample_agg(t),
            """SELECT l_returnflag, count(*) AS n,
                      round(sum(l_extendedprice), 6) AS sampled_revenue
               FROM lineitem
               WHERE CAST(conv(substring(md5(concat_ws('-', l_orderkey, l_linenumber)), 1, 15), 16, 10) AS BIGINT) % 100 < 5
               GROUP BY l_returnflag""",
        ),
        (
            ev.event_type_funnel(load_table(spark, SF, "events")),
            """SELECT user_id,
                      max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS did_view,
                      max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS did_click,
                      max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS did_purchase
               FROM events GROUP BY user_id""",
        ),
        (
            rel.top_customer_per_nation(t),
            """SELECT c_nationkey, c_custkey AS top_custkey,
                      round(c_acctbal, 6) AS top_bal
               FROM (SELECT *, row_number() OVER (PARTITION BY c_nationkey
                       ORDER BY c_acctbal DESC, c_custkey) AS rn FROM customer)
               WHERE rn = 1""",
        ),
        (
            ev.sliding_daily_by_user(load_table(spark, SF, "events")),
            """SELECT user_id, date_trunc('day', ts) AS day, count(*) AS n,
                      round(avg(count(*)) OVER (PARTITION BY user_id ORDER BY date_trunc('day', ts)
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS ma3
               FROM events GROUP BY user_id, date_trunc('day', ts)""",
        ),
    ]
    def canon(rows):
        return sorted(tuple((v is None, str(v)) for v in r) for r in rows)

    for df, sql in cases:
        assert canon(df.collect()) == canon(spark.sql(sql).collect()), (
            f"mismatch for: {sql[:60]}"
        )


# ---------------------------------------------------------------- as-of


def test_as_of_join_matches_python_reference(spark):
    from map_reduce_using_cloud_functions_spark.operators.joins import as_of_join

    left = spark.createDataFrame(
        [(1, "u", 10), (2, "u", 20), (3, "u", 5), (4, "v", 15), (5, "w", 50)],
        "event_id bigint, user_id string, ts bigint",
    )
    right = spark.createDataFrame(
        [("u", 10, 1.0), ("u", 15, 2.0), ("v", 1, 3.0), ("x", 1, 9.0)],
        "user_id string, ts bigint, value double",
    )
    got = {
        r["event_id"]: (r["asof_value"], r["asof_ts"])
        for r in as_of_join(left, right, key="user_id", ts_col="ts").collect()
    }
    assert got == {
        1: (1.0, 10),   # exactly-simultaneous right row IS visible
        2: (2.0, 15),   # most recent of several
        3: (None, None),  # before any right row
        4: (3.0, 1),
        5: (None, None),  # key with no right rows at all
    }


def test_as_of_join_is_one_shuffle(spark):
    from map_reduce_using_cloud_functions_spark.operators.joins import as_of_join

    left = spark.createDataFrame(
        [(1, "u", 10)], "event_id bigint, user_id string, ts bigint"
    )
    right = spark.createDataFrame(
        [("u", 5, 1.0)], "user_id string, ts bigint, value double"
    )
    plan = (
        as_of_join(left, right)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one hash partitioning for the window; no join operator at all
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


# ---------------------------------------------------------------- range


def test_range_join_matches_nested_loop_and_avoids_it(spark):
    import duckdb

    from map_reduce_using_cloud_functions_spark.operators.joins import range_join

    points = spark.createDataFrame(
        [(i, i * 7 % 100) for i in range(60)], "pid bigint, x bigint"
    )
    intervals = spark.createDataFrame(
        [(j, j * 11 % 90, j * 11 % 90 + (j % 4) * 9) for j in range(25)],
        "iid bigint, s bigint, e bigint",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(points, intervals, "x", "s", "e", bucket_width=8).collect()
    )
    con = duckdb.connect()
    con.register("p", points.toPandas())
    con.register("i", intervals.toPandas())
    want = sorted(
        map(
            tuple,
            con.sql(
                "SELECT pid, iid FROM p JOIN i ON s <= x AND x < e"
            ).fetchall(),
        )
    )
    assert got == want and len(got) > 0
    # the plan must be a hash equi-join on the bucket, not a nested loop
    plan = (
        range_join(points, intervals, "x", "s", "e", bucket_width=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_bucket_width_invariance(spark):
    from map_reduce_using_cloud_functions_spark.operators.joins import range_join

    points = spark.createDataFrame(
        [(i, i * 13 % 200) for i in range(80)], "pid bigint, x bigint"
    )
    intervals = spark.createDataFrame(
        [(j, j * 17 % 180, j * 17 % 180 + 25) for j in range(30)],
        "iid bigint, s bigint, e bigint",
    )
    results = {
        w: sorted(
            (r["pid"], r["iid"])
            for r in range_join(points, intervals, "x", "s", "e", w).collect()
        )
        for w in (3, 10, 64)
    }
    assert results[3] == results[10] == results[64]


def test_salted_join_custom_signed_salt_loses_no_rows(spark):
    """A signed custom salt_source (e.g. F.hash) must not drop rows:
    Spark % is sign-preserving, so pmod normalization is load-bearing."""
    import pyspark.sql.functions as F

    from map_reduce_using_cloud_functions_spark.operators.joins import salted_join

    left = spark.range(1000).select((F.col("id") % 7).alias("k"), "id")
    right = spark.createDataFrame([(i,) for i in range(7)], "k long")
    got = salted_join(left, right, "k", salt_buckets=8, salt_source=F.hash("id"))
    assert got.count() == 1000


def test_salted_join_spreads_identical_duplicate_rows(spark):
    """The classic hot key is one row repeated verbatim — the default
    salt must spread byte-identical copies across buckets (a whole-row
    hash would give every copy the same salt)."""
    import pyspark.sql.functions as F

    from map_reduce_using_cloud_functions_spark.operators.joins import salted_join

    left = spark.range(800).select(F.lit(1).alias("k"), F.lit("same").alias("v"))
    right = spark.createDataFrame([(1, "dim")], "k long, d string")
    # count distinct salts the left side actually receives
    salted = left.withColumn(
        "__salt",
        F.coalesce(F.pmod(F.monotonically_increasing_id(), F.lit(8)), F.lit(0)),
    )
    assert salted.select("__salt").distinct().count() > 1
    assert salted_join(left, right, "k", salt_buckets=8).count() == 800


def test_as_of_join_null_valued_right_row_wins(spark):
    """A right row whose value is genuinely NULL is still 'the most
    recent row': the join must return (its ts, NULL), never pair the
    newer ts with an OLDER row's value (DuckDB ASOF semantics)."""
    from map_reduce_using_cloud_functions_spark.operators.joins import as_of_join

    right = spark.createDataFrame(
        [(1, 1, 5.0), (1, 2, None)], "user_id long, ts long, value double"
    )
    left = spark.createDataFrame([(1, 3)], "user_id long, ts long")
    got = as_of_join(left, right, key="user_id", ts_col="ts").collect()
    assert len(got) == 1
    assert got[0]["asof_ts"] == 2
    assert got[0]["asof_value"] is None
