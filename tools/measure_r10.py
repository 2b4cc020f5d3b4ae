"""r10 measurements for BASELINE.md — run each section standalone:

  python tools/measure_r10.py semantic_soak  # embedding ledger at 100x
  python tools/measure_r10.py phash          # perceptual near-dup wall
  python tools/measure_r10.py zorder_serving # clustered events slice

Methodology matches measure_r7/r8/r9: one warm session per section,
replicated sf0.1 corpora for scale axes, wall times printed as the
BASELINE rows they become.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from map_reduce_using_cloud_functions_spark.session import get_spark
from map_reduce_using_cloud_functions_spark.sources import load_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _salted_doc_replicas(docs, rep: int):
    """rep replicas whose every TOKEN carries a per-replica prefix —
    all shingles AND the hashed embedding direction change, so each
    replica is genuinely admissible (a plain salt suffix would be
    near-dup-gated away and the ledger would never grow)."""
    parts = []
    for r in range(rep):
        if r == 0:
            p = docs.select("doc_id", "text")
        else:
            p = docs.select(
                (F.col("doc_id") + F.lit(r * 1_000_000)).alias("doc_id"),
                F.concat(
                    F.lit(f"r{r}q "),
                    F.regexp_replace("text", " ", f" r{r}q"),
                ).alias("text"),
            )
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def semantic_soak():
    """The embedding (semantic) admission ledger at 100x its r9
    fixture evidence (r9 verdict task 5): >=50k docs across 12
    releases through the full front-door admission (MinHash gate +
    semantic gate), probe cost vs release count before/after
    compact_embedding_ledger, admitted-volume accounting, and one
    kill-point crash-replay (crash AFTER the minhash append, BEFORE
    the semantic append — the inter-ledger window; replay must
    converge to the clean state)."""
    from map_reduce_using_cloud_functions_spark.operators import dedup as dd
    from map_reduce_using_cloud_functions_spark.streaming import near_dedup as nd

    spark = get_spark("measure_r10")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    n_rep = 12
    corpus = _salted_doc_replicas(docs, n_rep).localCheckpoint()
    batches = [
        corpus.where(F.floor(F.col("doc_id") / 1_000_000) == r).localCheckpoint()
        for r in range(n_rep)
    ]
    total_docs = sum(b.count() for b in batches)
    root = "/tmp/m10_semsoak"
    shutil.rmtree(root, ignore_errors=True)
    led, sled, out = f"{root}/led", f"{root}/sled", f"{root}/out"
    walls = []
    for i, b in enumerate(batches):
        t0 = time.time()
        nd.admit_batch(spark, b, led, out, i, semantic_ledger_path=sled)
        walls.append(time.time() - t0)
    admitted = spark.read.parquet(out).count()
    info = dd.ledger_info(spark, sled)
    print(
        f"semantic_soak[admit]: {n_rep} releases x ~{total_docs // n_rep} docs "
        f"({total_docs} total) -> {admitted} admitted; per-batch walls "
        f"first/last = {walls[0]:.1f}/{walls[-1]:.1f}s; "
        f"semantic ledger: {info['n_docs']} vecs, releases={info['releases']}, "
        f"band_dirs={info['band_dirs']}"
    )

    # probe cost vs releases: one fresh admissible batch, pure probe
    probe = (
        docs.select(
            (F.col("doc_id") + F.lit(50_000_000)).alias("doc_id"),
            F.concat(
                F.lit("zz9 "), F.regexp_replace("text", " ", " zz9")
            ).alias("text"),
        )
        .localCheckpoint()
    )
    from map_reduce_using_cloud_functions_spark.operators.text_analysis import (
        hashed_doc_vectors,
    )

    vecs = (
        hashed_doc_vectors(probe)
        .select(F.col("doc_id").alias("vec_id"), "embedding")
        .where(F.col("embedding").isNotNull())
        .localCheckpoint()
    )

    def probe_once() -> float:
        t0 = time.time()
        dd.ledger_embedding_pairs(spark, vecs, sled, threshold=0.85).count()
        return time.time() - t0

    pre = min(probe_once() for _ in range(3))
    t0 = time.time()
    folded = dd.compact_embedding_ledger(spark, sled, keep_last=1)
    compact_wall = time.time() - t0
    info2 = dd.ledger_info(spark, sled)
    post = min(probe_once() for _ in range(3))
    print(
        f"semantic_soak[probe]: {pre:.2f}s at {n_rep} releases -> "
        f"{post:.2f}s after compaction (folded {len(folded)} releases in "
        f"{compact_wall:.1f}s; band_dirs {info['band_dirs']} -> {info2['band_dirs']})"
    )

    # kill point: crash between the two ledger appends, then replay
    extra = (
        docs.select(
            (F.col("doc_id") + F.lit(60_000_000)).alias("doc_id"),
            F.concat(
                F.lit("kk7 "), F.regexp_replace("text", " ", " kk7")
            ).alias("text"),
        )
        .localCheckpoint()
    )
    real_append = dd.append_embedding_ledger

    def boom(*a, **k):
        raise RuntimeError("injected crash between ledger appends")

    dd.append_embedding_ledger = boom
    try:
        nd.admit_batch(spark, extra, led, out, n_rep, semantic_ledger_path=sled)
        raise AssertionError("injected crash did not fire")
    except RuntimeError as e:
        assert "injected" in str(e)
    finally:
        dd.append_embedding_ledger = real_append
    # replay the same batch id: must converge (minhash release
    # overwritten, semantic append lands exactly once)
    nd.admit_batch(spark, extra, led, out, n_rep, semantic_ledger_path=sled)
    info3 = dd.ledger_info(spark, sled)
    n_admitted = spark.read.parquet(f"{out}/release={n_rep}").count()
    vecs = spark.read.parquet(f"{sled}/vecs")
    n_vecs, n_distinct = vecs.count(), vecs.select("vec_id").distinct().count()
    assert n_vecs == n_distinct, "double-append: duplicate vec_ids"
    assert n_vecs == info2["n_docs"] + n_admitted, "ledger != prior + gated batch"
    print(
        f"semantic_soak[crash-replay]: kill between appends at release "
        f"{n_rep}, replay converged exactly-once; semantic ledger "
        f"{info2['n_docs']} -> {n_vecs} vecs (+{n_admitted} = the batch's "
        f"gated survivors, all vec_ids distinct), releases={info3['releases']}"
    )


def phash():
    """Perceptual near-dup wall at sf0.1 and a 10x replica axis:
    fingerprint (decode+dHash) then banded pairs."""
    from map_reduce_using_cloud_functions_spark.operators import multimodal as mm

    spark = get_spark("measure_r10")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF, "documents")
    for rep in (1, 10):
        d = _salted_doc_replicas(docs.select("doc_id", "text"), rep)
        assets = mm.build_png_assets(d).localCheckpoint()
        n = assets.count()
        t0 = time.time()
        hashes = mm.phash_assets(assets).localCheckpoint()
        t_hash = time.time() - t0
        t0 = time.time()
        np_ = mm.phash_pairs(hashes, max_hamming=6).count()
        t_pairs = time.time() - t0
        print(
            f"phash[{rep}x]: {n} PNGs -> fingerprints {t_hash:.1f}s, "
            f"pairs({np_}) {t_pairs:.1f}s"
        )


def zorder_serving():
    """The materialized z-ordered events fixture vs the ts-sorted
    single-sort layout: footer row-group pruning for a judged-query
    slice (sessionize one user band in one time window) on BOTH
    predicate columns — deterministic, no timing."""
    from map_reduce_using_cloud_functions_spark.operators.layout import (
        zorder_scan_stats,
    )
    from map_reduce_using_cloud_functions_spark.sources.tables import (
        materialize_zordered,
    )

    spark = get_spark("measure_r10")
    spark.sparkContext.setLogLevel("ERROR")
    plain = load_table(spark, SF, "events")
    root = "/tmp/m10_zorder"
    shutil.rmtree(root, ignore_errors=True)
    zpath, spath = f"{root}/z", f"{root}/ts_sorted"
    materialize_zordered(
        spark, SF, "events", ["user_id", "ts"], zpath, bits=6, num_files=32
    )
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )  # INT96 (the default) writes no ts stats — see write_zordered
    plain.repartitionByRange(32, "ts").sortWithinPartitions("ts").write.parquet(spath)
    b = plain.selectExpr(
        "min(user_id) lo_u", "max(user_id) hi_u",
        "min(cast(ts as double)) lo_t", "max(cast(ts as double)) hi_t",
    ).first()
    u_lo, u_hi = b["lo_u"], b["lo_u"] + (b["hi_u"] - b["lo_u"]) // 8
    t_lo, t_hi = b["lo_t"], b["lo_t"] + (b["hi_t"] - b["lo_t"]) / 8
    for col, lo, hi in (("user_id", u_lo, u_hi), ("ts", t_lo, t_hi)):
        z = zorder_scan_stats(spark, zpath, col, float(lo), float(hi))
        s = zorder_scan_stats(spark, spath, col, float(lo), float(hi))
        print(
            f"zorder_serving[{col}]: z-layout skips {z['skipped']}/{z['row_groups']} "
            f"row groups ({z['skip_frac']:.2f}), ts-sorted skips "
            f"{s['skipped']}/{s['row_groups']} ({s['skip_frac']:.2f})"
        )


if __name__ == "__main__":
    {
        "semantic_soak": semantic_soak,
        "phash": phash,
        "zorder_serving": zorder_serving,
    }[sys.argv[1]]()
