"""Bloom prefilter tests: exactness (no false negatives ever, joins
value-identical to their plain counterparts), bounded false-positive
rate, and the broadcast-probe shape."""

from __future__ import annotations

import pyspark.sql.functions as F

from map_reduce_using_cloud_functions_spark.operators.bloom import (
    bloom_anti_join,
    bloom_bitmap,
    bloom_params,
    bloom_semi_join,
    might_contain_col,
)


def test_bloom_params_sizing():
    m, k = bloom_params(10_000, 0.01)
    assert m % 64 == 0
    assert 9 <= m / 10_000 <= 11  # ~9.6 bits/key at 1%
    assert 6 <= k <= 8


def test_no_false_negatives_and_bounded_fp_rate(spark):
    keys = spark.range(0, 5_000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    bitmap, m, k = bloom_bitmap(keys, "k", expected_items=5_000, fpp=0.01)
    probe = spark.range(0, 20_000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    hits = (
        probe.crossJoin(F.broadcast(bitmap))
        .where(might_contain_col(F.col("k"), m, k))
        .select("k")
    )
    got = set(r["k"] for r in hits.collect())
    members = {f"key-{i}" for i in range(5_000)}
    assert members <= got, "bloom false negative — structurally impossible"
    fp = len(got - members) / 15_000
    assert fp <= 0.03, f"false-positive rate {fp} exceeds 3x the 1% target"


def test_semi_and_anti_join_exact(spark):
    big = spark.range(0, 10_000).select(
        F.col("id"), F.concat(F.lit("u"), F.col("id") % 3_000).alias("k")
    )
    keys = spark.range(0, 1_000).select(
        F.concat(F.lit("u"), (F.col("id") * 2)).alias("k")
    )
    semi = bloom_semi_join(big, keys, "k").select("id")
    anti = bloom_anti_join(big, keys, "k").select("id")
    want_semi = big.join(keys.distinct(), "k", "left_semi").select("id")
    want_anti = big.join(keys.distinct(), "k", "left_anti").select("id")
    assert sorted(r["id"] for r in semi.collect()) == sorted(
        r["id"] for r in want_semi.collect()
    )
    assert sorted(r["id"] for r in anti.collect()) == sorted(
        r["id"] for r in want_anti.collect()
    )
    # together they tile the input exactly
    assert semi.count() + anti.count() == big.count()


def test_bitmap_is_one_broadcastable_row(spark):
    keys = spark.range(0, 2_000).select(F.col("id").alias("k"))
    bitmap, m, k = bloom_bitmap(keys, "k", expected_items=2_000, fpp=0.01)
    rows = bitmap.collect()
    assert len(rows) == 1
    # dense word array: exactly m/64 entries regardless of key count
    assert len(rows[0]["bitmap"]) == m // 64


def test_probe_side_is_map_only(spark):
    """The prefilter stage must not shuffle the probed relation: the
    only Exchange in the probe plan belongs to the one-row bitmap
    aggregation, never to the big side."""
    big = spark.range(0, 1_000).select(F.col("id").alias("k"))
    keys = spark.range(0, 100).select(F.col("id").alias("k"))
    bitmap, m, k = bloom_bitmap(keys, "k", expected_items=100, fpp=0.01)
    probed = big.crossJoin(F.broadcast(bitmap)).where(
        might_contain_col(F.col("k"), m, k)
    )
    plan = probed._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        probed._jdf.queryExecution(), "formatted"
    )
    # Exchanges present: the bitmap agg (SinglePartition) and its
    # broadcast; none may be hash-partitioned on the probe key.
    assert "hashpartitioning(k" not in plan, plan
