"""One takedown verb, every artifact (r11, verdict task 6): a single
CLI ``takedown`` invocation must make one document id disappear from
ALL SIX artifact families a production deployment holds — the word
index's postings, the MinHash admission ledger, the shipped survivors
partitions, the embedding (semantic) ledger, the perceptual-hash
ledger, and a persisted ANN index's serving path (tombstones). Run at
sf0.01 in the suite; re-runnable at the synthetic sf1 tree via
``SPARK_GRAFT_TAKEDOWN_SF=/tmp/sf1`` (the scale evidence COVERAGE.md
cites)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from map_reduce_using_cloud_functions_spark.operators import dedup as dd
from map_reduce_using_cloud_functions_spark.operators import multimodal as mm
from map_reduce_using_cloud_functions_spark.operators import similarity as sim
from map_reduce_using_cloud_functions_spark.operators.ann import ann_search
from map_reduce_using_cloud_functions_spark.operators.ann_commit import (
    resolve_artifact,
)
from map_reduce_using_cloud_functions_spark.operators.index import (
    build_index,
    read_index,
    write_index,
)
from map_reduce_using_cloud_functions_spark.sources import load_table

SFDIR = os.environ.get("SPARK_GRAFT_TAKEDOWN_SF", "/root/testdata/sf0.01")


def test_one_takedown_verb_every_artifact(spark, tmp_path):
    from map_reduce_using_cloud_functions_spark.__main__ import main

    docs = load_table(spark, SFDIR, "documents").select("doc_id", "text")
    emb = load_table(spark, SFDIR, "embeddings").select("vec_id", "embedding")

    # victim: present in the phash fixture (>= 72 text bytes) AND in
    # the embeddings table, so every family genuinely holds it
    eligible = docs.where(
        F.octet_length(F.encode(F.col("text"), "UTF-8")) >= 72
    ).join(emb.select(F.col("vec_id").alias("doc_id")), "doc_id", "left_semi")
    victim = int(eligible.agg(F.min("doc_id")).first()[0])

    idx = str(tmp_path / "idx")
    led = str(tmp_path / "led")
    sur = str(tmp_path / "sur")
    sled = str(tmp_path / "sled")
    pled = str(tmp_path / "pled")
    ann = str(tmp_path / "ann")

    corpus = docs.select(
        F.col("doc_id").cast("string").alias("document"), "text"
    )
    write_index(build_index(corpus), idx, versioned=True)
    dd.build_minhash_ledger(docs, led, release=0)
    (
        docs.withColumn("release", F.lit(0))
        .write.partitionBy("release")
        .parquet(sur)
    )
    dd.build_embedding_ledger(emb, sled)
    dd.build_phash_ledger(mm.phash_assets(mm.build_png_assets(docs)), pled)
    sim.build_ivf_index(emb, ann)

    # preconditions: every family actually holds the victim
    assert read_index(spark, idx).where(
        F.col("document") == str(victim)
    ).count()
    assert (
        spark.read.parquet(f"{led}/sigs").where(F.col("doc_id") == victim).count()
    )
    assert spark.read.parquet(sur).where(F.col("doc_id") == victim).count()
    assert (
        spark.read.parquet(f"{sled}/vecs").where(F.col("vec_id") == victim).count()
    )
    assert (
        spark.read.parquet(f"{pled}/prints")
        .where(F.col("asset_id") == victim)
        .count()
    )
    # query with a FOREIGN query_id: the serving path excludes
    # neighbor_id == query_id (self-match suppression), and the point
    # here is whether the victim still SERVES as a neighbor
    victim_vec = emb.where(F.col("vec_id") == victim).select(
        (F.col("vec_id") + 10_000_000).alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )
    before = {
        r["neighbor_id"] for r in ann_search(spark, ann, victim_vec, k=3, n_probe=8).collect()
    }
    assert victim in before, "victim must serve from the ANN index first"

    rc = main(
        [
            "takedown",
            str(victim),
            "--index",
            idx,
            "--ledger",
            led,
            "--survivors",
            sur,
            "--semantic-ledger",
            sled,
            "--phash-ledger",
            pled,
            "--ann-index",
            ann,
        ],
        spark=spark,
    )
    assert rc == 0

    # absence across all six families, data AND derived band relations
    assert (
        read_index(spark, idx).where(F.col("document") == str(victim)).count()
        == 0
    )
    for path, col in (
        (f"{led}/sigs", "doc_id"),
        (f"{led}/bands", "doc_id"),
        (sur, "doc_id"),
        (f"{sled}/vecs", "vec_id"),
        (f"{sled}/bands", "vec_id"),
        (f"{pled}/prints", "asset_id"),
        (f"{pled}/bands", "asset_id"),
    ):
        assert (
            spark.read.parquet(path).where(F.col(col) == victim).count() == 0
        ), path
    after = {
        r["neighbor_id"] for r in ann_search(spark, ann, victim_vec, k=3, n_probe=8).collect()
    }
    assert victim not in after and after, "tombstone must stop serving"
    tomb_paths = resolve_artifact(spark, ann, "tombstones")
    assert tomb_paths
    tombs = {
        r["vec_id"]
        for p in tomb_paths
        for r in spark.read.parquet(p).collect()
    }
    assert victim in tombs

    # and the artifacts still serve everyone else
    assert read_index(spark, idx).count() > 0
    assert spark.read.parquet(sur).count() > 0
    assert spark.read.parquet(f"{led}/sigs").count() > 0
