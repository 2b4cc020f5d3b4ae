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


if __name__ == "__main__":
    sections = {
        "asset_front_door": asset_front_door,
        "audiohash": audiohash,
        "zorder": zorder,
    }
    for name in sys.argv[1:] or list(sections):
        sections[name]()
