"""r11 measurements for BASELINE.md — run each section standalone:

  python tools/measure_r11.py asset_front_door  # phash admission stream
  python tools/measure_r11.py audiohash         # audio near-dup wall
  python tools/measure_r11.py zorder            # quantile write after the r11 rebuild

Methodology matches measure_r7..r10: one warm session per section,
wall times printed as the BASELINE rows they become.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_reduce_using_cloud_functions_spark.session import get_spark
from map_reduce_using_cloud_functions_spark.sources import load_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def asset_front_door():
    """Per-batch cost of the r11 perceptual admission stream (image
    assets through the phash ledger) at sf0.1 — the bench.py
    `streaming_front_door_phash` section, printed standalone with the
    per-batch breakdown."""
    import bench

    spark = get_spark("measure_r11")
    spark.sparkContext.setLogLevel("ERROR")
    out = bench.bench_asset_front_door(spark, SF)
    print(
        f"asset front door (sf0.1): {out['assets']} PNG files in "
        f"{out['files']} batches — total {out['total_sec']}s, "
        f"{out['sec_per_batch']}s/batch (batch_secs={out['batch_secs']}), "
        f"admitted {out['admitted']}"
    )


def audiohash():
    """Audio fingerprint + banded pairs wall at sf0.1 (min-of-3 after a
    warm pass): WAV encode fixture -> stdlib PCM decode -> energy-sign
    hash (mapInPandas) -> pigeonhole banded hamming pairs."""
    from map_reduce_using_cloud_functions_spark.operators import (
        multimodal as mm,
    )

    spark = get_spark("measure_r11")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF, "documents")

    def run() -> tuple[float, int]:
        t0 = time.time()
        n = mm.audiohash_pairs(
            mm.audiohash_assets(mm.build_wav_assets(docs))
        ).count()
        return time.time() - t0, n

    run()  # warm
    results = [run() for _ in range(3)]
    best = min(t for t, _ in results)
    n_pairs = results[0][1]
    n_assets = mm.build_wav_assets(docs).count()
    print(
        f"audiohash pairs (sf0.1): {n_assets} clips -> {n_pairs} pairs, "
        f"min-of-3 {best:.2f}s"
    )


def zorder():
    """The r9 zorder section re-run on the r11 implementation (binary-
    search bucket tree + sampled boundaries): quantile write should sit
    within ~1.5x of linear instead of the r9 3.2x."""
    import tools.measure_r9 as m9

    m9.zorder()


def _replica(docs, r: int):
    """One admissible replica for the IMAGE soak. The image is the
    first 72 TEXT BYTES, so token-level salting (the semantic soak's
    rule) is far too weak here: within a replica every doc's pixel
    window starts with the same salt tokens, and across replicas the
    windows differ by one character per token — both land inside the
    hamming-6 gate and the door (correctly) refuses ~70% of the corpus
    as near-dups, which starves a SCALE soak. Salting the window
    itself — a 96-hex-char (replica, doc_id)-keyed prefix — makes
    every image genuinely novel, so the ledger actually grows."""
    import pyspark.sql.functions as F

    rid = (F.col("doc_id") + F.lit(r * 1_000_000)).alias("doc_id")
    salt = F.concat(
        F.md5(F.concat_ws("|", F.lit(r), F.col("doc_id"))),
        F.md5(F.concat_ws("#", F.col("doc_id"), F.lit(r))),
        F.md5(F.concat_ws("@", F.lit(r), F.col("doc_id"), F.lit("x"))),
    )
    return docs.select(
        rid, F.concat(salt, F.lit(" "), F.col("text")).alias("text")
    )


def phash_soak(reps: int = 12):
    """The image admission door at soak volume (the r10 semantic-soak
    protocol at perceptual strength): ~58k real PNGs across ``reps``
    releases through admit_assets_batch, per-release admission wall,
    fresh-batch probe cost vs release count BEFORE and AFTER
    compact_phash_ledger, an in-script replay-idempotence assertion
    (re-admitting a release must not grow the ledger), and an
    in-script compaction-invariance assertion (the probe's pair set
    must not change)."""
    import shutil
    import tempfile

    from map_reduce_using_cloud_functions_spark.operators import (
        dedup as dd,
        multimodal as mm,
    )
    from map_reduce_using_cloud_functions_spark.streaming.near_dedup import (
        admit_assets_batch,
    )

    spark = get_spark("measure_r11")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF, "documents")
    base = tempfile.mkdtemp(prefix="m11_phsoak_")
    led, out = f"{base}/led", f"{base}/out"
    try:
        walls, admitted, total = [], 0, 0

        def batch_assets(r: int):
            return mm.build_png_assets(_replica(docs, r))

        for r in range(reps):
            batch = batch_assets(r).localCheckpoint()
            nb = batch.count()
            t0 = time.time()
            adm = admit_assets_batch(spark, batch, led, out, batch_id=r)
            n_adm = adm.count()
            walls.append(round(time.time() - t0, 2))
            admitted += n_adm
            total += nb
        print(
            f"phash soak: {total} PNGs / {reps} releases, admitted "
            f"{admitted}; per-release admission walls {walls}"
        )

        # probe batch: a novel replica PLUS ~10% planted exact copies
        # of release-3 images (shifted ids) so the probe's exact-verify
        # stage does real work and the pair count is a known floor
        import pyspark.sql.functions as F

        planted_docs = _replica(docs, 3).where(
            F.col("doc_id") % 10 == 3
        ).select(
            (F.col("doc_id") + F.lit(90_000_000)).alias("doc_id"), "text"
        )
        probe_docs = _replica(docs, reps).unionByName(planted_docs)
        n_planted = mm.build_png_assets(planted_docs).count()
        probe = mm.phash_assets(
            mm.build_png_assets(probe_docs)
        ).localCheckpoint()

        def probe_once():
            t0 = time.time()
            n = dd.ledger_phash_pairs(spark, probe, led).count()
            return round(time.time() - t0, 2), n

        probe_once()  # warm
        pre = [probe_once() for _ in range(3)]
        n_pre = pre[0][1]
        assert n_pre >= n_planted, (
            f"planted copies not found: {n_pre} pairs < {n_planted} planted"
        )

        # replay idempotence at volume: re-admitting a release with
        # identical content must not grow prints or change releases
        before = spark.read.parquet(f"{led}/prints").count()
        admit_assets_batch(
            spark, batch_assets(reps - 1), led, out, batch_id=reps - 1
        )
        after = spark.read.parquet(f"{led}/prints").count()
        assert after == before, f"replay grew the ledger: {before}->{after}"

        folded = dd.compact_phash_ledger(spark, led, keep_last=1)
        post = [probe_once() for _ in range(3)]
        assert post[0][1] == n_pre, (
            f"compaction changed probe results: {n_pre}->{post[0][1]}"
        )
        info = dd.ledger_info(spark, led)
        print(
            f"probe vs {reps} releases: {min(t for t, _ in pre)}s "
            f"({n_pre} pairs); after compaction (folded {folded}, "
            f"band_dirs {info['band_dirs']}): "
            f"{min(t for t, _ in post)}s — replay-idempotence and "
            "compaction-invariance asserted in-script"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    sections = {
        "asset_front_door": asset_front_door,
        "audiohash": audiohash,
        "zorder": zorder,
        "phash_soak": phash_soak,
    }
    for name in sys.argv[1:] or list(sections):
        sections[name]()
