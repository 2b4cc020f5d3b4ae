"""Multimodal-column tests (X5): BinaryType schema, Arrow mapInPandas
decode plumbing, metadata-only pruning."""

from __future__ import annotations

import pyspark.sql.functions as F

from map_reduce_using_cloud_functions_spark.operators.multimodal import (
    asset_stats,
    build_assets,
    decode_assets,
    frame_sample,
)
from map_reduce_using_cloud_functions_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_assets_schema_and_payload_bytes(spark):
    docs = load_table(spark, SF, "documents")
    assets = build_assets(docs)
    assert dict(assets.dtypes)["payload"] == "binary"
    assert dict(assets.dtypes)["meta"] == "struct<width:int,height:int,mime:string>"
    row = assets.where(F.col("asset_id") == 0).first()
    text = docs.where(F.col("doc_id") == 0).first()["text"]
    assert bytes(row["payload"]) == text.encode("utf-8")
    assert row["kind"] in ("image", "audio", "video")


def test_decode_stub_runs_through_mapinpandas(spark):
    docs = load_table(spark, SF, "documents").limit(50)
    decoded = decode_assets(build_assets(docs))
    rows = decoded.collect()
    assert len(rows) == 50
    assert all(r["ok"] for r in rows)
    # decode output consistent with payload size (the stub's contract)
    assets = {r["asset_id"]: r for r in build_assets(docs).collect()}
    for r in rows:
        assert r["n_bytes"] == len(bytes(assets[r["asset_id"]]["payload"]))
        assert r["width"] == r["n_bytes"] % 640


def test_metadata_query_prunes_payload_column(spark, tmp_path):
    """A metadata-only aggregation over the persisted asset table must
    not read the payload column (ReadSchema check)."""
    docs = load_table(spark, SF, "documents")
    path = str(tmp_path / "assets")
    build_assets(docs).write.parquet(path)
    q = spark.read.parquet(path).groupBy("kind").agg(F.max(F.col("meta.width")))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan.split("ReadSchema:")[1]


def test_frame_sample_stride(spark):
    docs = load_table(spark, SF, "documents").limit(5)
    samples = frame_sample(build_assets(docs), every_n_bytes=50)
    counts = {r["asset_id"]: r["n"] for r in samples.groupBy("asset_id").agg(F.count("*").alias("n")).collect()}
    lens = {r["asset_id"]: len(bytes(r["payload"])) for r in build_assets(docs).collect()}
    for aid, n in counts.items():
        assert n == (lens[aid] - 1) // 50 + 1
