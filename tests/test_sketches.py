"""Distinct-count sketch (operators/sketches.py): a pure-python replay
of the estimator is the oracle — same md5-hex60 hash, same bucket
minima, same exact integer sum, same one trailing double division —
plus the accuracy contract vs exact distinct counts and the plan-shape
contract (no sort, no window: two hash aggregations)."""

from __future__ import annotations

import hashlib
import math

import pyspark.sql.functions as F
import pytest

from map_reduce_using_cloud_functions_spark.operators.sketches import (
    distinct_sketch,
    vocab_sketch,
)
from map_reduce_using_cloud_functions_spark.sources import load_table

SF = "/root/testdata/sf0.01"


def _h(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


def py_sketch(values, k: int) -> float:
    minima: dict[int, int] = {}
    for v in values:
        if v is None:
            continue
        h = _h(v)
        b = h % k
        minima[b] = min(minima.get(b, h), h)
    occ = len(minima)
    if occ < k:
        est = float(k) * math.log(float(k) / float(k - occ))
    else:
        est = (float(k * (k - 1)) * 2.0**60) / float(sum(minima.values()))
    return round(est, 4)


def test_mincount_branch_matches_python_model_exactly(spark):
    """All buckets occupied (distinct >> k): integer arithmetic until
    one double division means the python replay matches to the bit."""
    orders = load_table(spark, SF, "orders")
    got = distinct_sketch(orders, "o_custkey", k=64).first()["est_distinct"]
    vals = [r["o_custkey"] for r in orders.select("o_custkey").collect()]
    assert got == py_sketch(vals, 64)


def test_linear_counting_branch_small_sets(spark):
    """Distinct < k: occupancy-based linear counting; the ln is the
    only libm step, so compare to 1e-9 instead of bit-exact."""
    df = spark.createDataFrame([(i % 7,) for i in range(100)], "v int")
    got = distinct_sketch(df, "v", k=64).first()["est_distinct"]
    want = py_sketch([i % 7 for i in range(100)], 64)
    assert got == pytest.approx(want, abs=1e-9)
    # occupancy-driven: far closer than 1/sqrt(k) on tiny sets
    assert abs(got - 7) < 1.0


def test_accuracy_bound_and_duplicates_are_free(spark):
    """Estimator error within ~4/sqrt(k) of exact, and duplicates
    change nothing (min of a multiset = min of its support)."""
    li = load_table(spark, SF, "lineitem")
    exact = li.select("l_orderkey").distinct().count()
    got = distinct_sketch(li, "l_orderkey", k=256).first()["est_distinct"]
    assert abs(got - exact) / exact < 4 / math.sqrt(256)
    doubled = li.select("l_orderkey").unionAll(li.select("l_orderkey"))
    assert distinct_sketch(doubled, "l_orderkey", k=256).first()[
        "est_distinct"
    ] == got


def test_group_by_and_nulls(spark):
    """Per-group estimates; NULLs contribute nothing; a group whose
    values are all NULL produces no row (same as count(DISTINCT))."""
    rows = [("a", 1), ("a", 2), ("a", None), ("b", 9), ("c", None)]
    df = spark.createDataFrame(rows, "g string, v int")
    out = {
        r["g"]: r["est_distinct"]
        for r in distinct_sketch(df, "v", k=16, by=["g"]).collect()
    }
    assert set(out) == {"a", "b"}
    assert out["a"] == pytest.approx(py_sketch([1, 2], 16), abs=1e-9)
    assert out["b"] == pytest.approx(py_sketch([9], 16), abs=1e-9)


def test_k_guard_and_plan_shape(spark):
    """k < 2 refuses; the judged plan is two hash aggregations — no
    sort, no window, no per-group collected array."""
    orders = load_table(spark, SF, "orders")
    with pytest.raises(ValueError, match="k must be >= 2"):
        distinct_sketch(orders, "o_custkey", k=1)
    plan = (
        distinct_sketch(orders, "o_custkey", k=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Sort" not in plan and "Window" not in plan
    assert "collect_list" not in plan and "collect_set" not in plan


def test_vocab_sketch_tracks_tokenizer_universe(spark):
    """vocab_sketch estimates distinct TOKENS under the engine's
    reference-parity tokenizer — replay tokenization in python and the
    estimate must match the python sketch of that token set."""
    from map_reduce_using_cloud_functions_spark.functions.text import tokens_array

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    toks = [
        r["w"]
        for r in docs.select(
            F.explode(tokens_array(F.col("text"))).alias("w")
        ).collect()
    ]
    got = vocab_sketch(docs, k=64).first()["est_vocab"]
    assert got == pytest.approx(py_sketch(toks, 64), abs=1e-9)


def test_hash_sample_deterministic_and_correlated(spark):
    """Same (key, frac) selects the same rows across runs and across
    TABLES — two relations sampled on a shared key stay joinable — and
    the sample size concentrates around frac·n."""
    from map_reduce_using_cloud_functions_spark.operators.sketches import (
        hash_sample,
    )

    orders = load_table(spark, SF, "orders")
    s1 = {r["o_orderkey"] for r in hash_sample(orders, "o_orderkey", 0.2).select("o_orderkey").collect()}
    s2 = {r["o_orderkey"] for r in hash_sample(orders, "o_orderkey", 0.2).select("o_orderkey").collect()}
    assert s1 == s2 and s1
    n = orders.count()
    assert abs(len(s1) - 0.2 * n) < 4 * math.sqrt(0.2 * n)
    # correlated across tables: lineitem sampled on the SAME key yields
    # exactly the line items of the sampled orders
    li = load_table(spark, SF, "lineitem")
    li_keys = {
        r["l_orderkey"]
        for r in hash_sample(li, "l_orderkey", 0.2).select("l_orderkey").distinct().collect()
    }
    assert li_keys == {k for k in s1 if k in {r["l_orderkey"] for r in li.select("l_orderkey").distinct().collect()}}
    with pytest.raises(ValueError, match="frac"):
        hash_sample(orders, "o_orderkey", 0.0)


def test_sampled_percentiles_close_to_exact(spark):
    """The sampled quantiles sit within the DKW band of the exact ones
    (rank tolerance translated through the fixture's spread)."""
    from map_reduce_using_cloud_functions_spark.operators.sketches import (
        sampled_percentiles,
    )

    orders = load_table(spark, SF, "orders")
    got = {
        r["o_orderstatus"]: (r["p50"], r["p90"])
        for r in sampled_percentiles(
            orders, "o_totalprice", key="o_orderkey", frac=0.25, by=["o_orderstatus"]
        ).collect()
    }
    exact = {
        r["o_orderstatus"]: (r["p50"], r["p90"])
        for r in orders.groupBy("o_orderstatus")
        .agg(
            F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
        )
        .collect()
    }
    vals = sorted(
        r["o_totalprice"] for r in orders.select("o_totalprice").collect()
    )
    spread = vals[-1] - vals[0]
    for status, (p50, p90) in got.items():
        e50, e90 = exact[status]
        # loose but meaningful: within 10% of the full value spread
        assert abs(p50 - e50) < 0.1 * spread
        assert abs(p90 - e90) < 0.1 * spread


def test_cli_profile(spark, capsys):
    """The profile subcommand prints one JSON object with per-lang doc
    counts, vocabulary estimates, and sampled length percentiles."""
    import json

    from map_reduce_using_cloud_functions_spark.__main__ import main

    rc = main(
        ["profile", f"{SF}/documents.parquet", "--vocab-k", "64"],
        spark=spark,
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(out) == {
        "docs",
        "est_vocab",
        "chars_sampled_percentiles",
        "vocab_k",
        "sample_frac",
    }
    assert sum(out["docs"].values()) == 500
    assert set(out["docs"]) == set(out["est_vocab"])
    for stats in out["chars_sampled_percentiles"].values():
        assert stats["p50"] <= stats["p90"]
