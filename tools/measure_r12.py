"""r12 measurements for BASELINE.md.

Usage: python tools/measure_r12.py soak|envelope_stages

``soak`` — the r11 verdict's stretch task: a MIXED-MODALITY soak
through the multimodal envelope — 12 shipments of documents carrying
image+audio+video assets drain one batch at a time with
``compact_after_releases=4``, a mid-soak takedown retracts one
document and one image asset, and the script asserts exactly-once
invariants in-line (no doc or asset admitted twice across releases;
the retracted content re-admits afterwards while a duplicate of
retained content still refuses; ledger fan-out stays bounded by the
auto-compaction threshold). Per-drain wall seconds show whether probe
cost stays flat as history folds.

``envelope_stages`` — per-stage breakdown of ONE envelope round (text
gate vs each signal door) at the bench shape, for the BASELINE
paragraph.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _records(spark, n_docs: int):
    import numpy as np

    from map_reduce_using_cloud_functions_spark.operators import multimodal as mm
    from map_reduce_using_cloud_functions_spark.sources import load_table

    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .limit(n_docs)
        .collect()
    )
    out = []
    for r in docs:
        text = r["text"] or ""
        raw = text.encode("utf-8")
        assets = []
        if len(raw) >= 72:
            pix = np.frombuffer(raw[:72], dtype=np.uint8).reshape(8, 9)
            assets.append((r["doc_id"] * 10, "image", mm.encode_png(pix)))
        if len(raw) >= 130:
            assets.append(
                (
                    r["doc_id"] * 10 + 1,
                    "audio",
                    mm.encode_wav(np.frombuffer(raw[:130], dtype=np.uint8)),
                )
            )
        if len(raw) >= 260:
            frames = np.frombuffer(raw[:260], dtype=np.uint8).reshape(65, 2, 2)
            assets.append(
                (r["doc_id"] * 10 + 2, "video", mm.encode_y4m(frames))
            )
        out.append((r["doc_id"], text, assets))
    return out


def _write_shipment(directory: str, name: str, records) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            (
                "assets",
                pa.list_(
                    pa.struct(
                        [
                            ("asset_id", pa.int64()),
                            ("signal", pa.string()),
                            ("payload", pa.binary()),
                        ]
                    )
                ),
            ),
        ]
    )
    os.makedirs(directory, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": [x[0] for x in records],
                "text": [x[1] for x in records],
                "assets": [
                    [
                        {"asset_id": a[0], "signal": a[1], "payload": a[2]}
                        for a in x[2]
                    ]
                    for x in records
                ],
            },
            schema=schema,
        ),
        os.path.join(directory, name),
    )


def soak() -> None:
    import shutil
    import tempfile

    from map_reduce_using_cloud_functions_spark.operators import dedup as dd
    from map_reduce_using_cloud_functions_spark.session import get_spark
    from map_reduce_using_cloud_functions_spark.streaming.envelope import (
        multimodal_paths,
        start_multimodal_front_door_stream,
        streaming_multimodal_from_dir,
    )

    spark = get_spark()
    base_dir = tempfile.mkdtemp(prefix="soak_mm_")
    base = os.path.join(base_dir, "mm")
    watch = os.path.join(base_dir, "in")
    ckpt = os.path.join(base_dir, "ck")
    paths = multimodal_paths(base)
    n_batches, compact_after = 12, 4
    records = _records(spark, 4800)
    shipments = [records[i::n_batches] for i in range(n_batches)]

    def drain():
        q = start_multimodal_front_door_stream(
            spark,
            streaming_multimodal_from_dir(spark, watch),
            base,
            ckpt,
            compact_after_releases=compact_after,
        )
        q.awaitTermination()

    drain_secs, fanout = [], []
    takedown_doc = takedown_asset = None
    for i, ship in enumerate(shipments):
        _write_shipment(watch, f"b{i}.parquet", ship)
        t0 = time.perf_counter()
        drain()
        drain_secs.append(round(time.perf_counter() - t0, 3))
        fanout.append(
            {
                "batch": i,
                "minhash_releases": len(
                    dd.ledger_releases(spark, paths["ledger"])
                ),
                "image_releases": len(
                    dd.ledger_releases(spark, paths["phash"]["image"])
                ),
            }
        )
        if i == 6:
            # mid-soak takedown: retract one admitted document from the
            # text ledger+survivors and one image asset from its ledger
            first = spark.read.parquet(paths["docs"]).select("doc_id").first()
            takedown_doc = int(first["doc_id"])
            takedown_asset = takedown_doc * 10
            dd.delete_from_ledger(spark, paths["ledger"], [takedown_doc])
            dd.delete_from_survivors(spark, paths["docs"], [takedown_doc])
            dd.delete_from_phash_ledger(
                spark, paths["phash"]["image"], [takedown_asset]
            )

    # --- exactly-once + policy assertions (in-script, hard failures) ---
    docs = spark.read.parquet(paths["docs"]).select("doc_id", "release")
    n_docs, n_distinct = docs.count(), docs.select("doc_id").distinct().count()
    assert n_docs == n_distinct, f"doc admitted twice: {n_docs} vs {n_distinct}"
    assets = spark.read.parquet(paths["assets"]).select("asset_id")
    n_assets = assets.count()
    assert n_assets == assets.distinct().count(), "asset admitted twice"
    assert takedown_doc is not None
    assert (
        docs.where(docs.doc_id == takedown_doc).count() == 0
    ), "takedown left the doc in survivors"
    # fan-out stayed bounded: auto-compaction held probes to
    # compact_after + 2 directories (threshold + own + folded -1)
    max_fan = max(f["minhash_releases"] for f in fanout)
    assert max_fan <= compact_after + 2, fanout

    # the retracted content re-admits; a duplicate of RETAINED content
    # still refuses (both through one more envelope round)
    retained = [r for r in records if r[0] != takedown_doc and r[2]][0]
    taken = [r for r in records if r[0] == takedown_doc][0]
    _write_shipment(
        watch,
        "post.parquet",
        [
            (900000001, taken[1], [(900000010, a[1], a[2]) for a in taken[2]]),
            (
                900000002,
                retained[1],
                [(900000020, a[1], a[2]) for a in retained[2][:1]],
            ),
        ],
    )
    drain()
    post = {
        int(r["doc_id"])
        for r in spark.read.parquet(paths["docs"])
        .where("doc_id >= 900000000")
        .collect()
    }
    assert post == {900000001}, f"takedown/gate policy broke: {post}"

    out = {
        "metric": "multimodal_mixed_soak",
        "sf_dir": SF_DIR,
        "batches": n_batches,
        "compact_after_releases": compact_after,
        "docs_shipped": len(records),
        "docs_admitted": n_docs,
        "assets_admitted": n_assets,
        "drain_secs": drain_secs,
        "fanout": fanout,
        "takedown": {"doc": takedown_doc, "asset": takedown_asset},
        "post_takedown_readmit": "retracted content re-admitted; retained duplicate refused",
    }
    print(json.dumps(out))
    shutil.rmtree(base_dir, ignore_errors=True)


def envelope_stages() -> None:
    """Per-stage seconds of one steady-state envelope round: run the
    batch spelling with stage timers around the text gate and each
    signal door (batch 1 against a warm batch-0 history)."""
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from map_reduce_using_cloud_functions_spark.session import get_spark
    from map_reduce_using_cloud_functions_spark.streaming import envelope as env
    from map_reduce_using_cloud_functions_spark.streaming import near_dedup as nd

    spark = get_spark()
    base_dir = tempfile.mkdtemp(prefix="env_stage_")
    base = os.path.join(base_dir, "mm")
    records = _records(spark, 1000)

    def df_of(recs):
        return spark.createDataFrame(
            [
                (
                    r[0],
                    r[1],
                    [
                        {
                            "asset_id": a[0],
                            "signal": a[1],
                            "payload": bytearray(a[2]),
                        }
                        for a in r[2]
                    ],
                )
                for r in recs
            ],
            env.MULTIMODAL_RECORD_SCHEMA,
        )

    env.admit_multimodal_batch(spark, df_of(records[0::2]), base, batch_id=0)

    stages: dict[str, float] = {}
    real_text, real_assets = nd.admit_batch, nd.admit_assets_batch

    def timed_text(*a, **kw):
        t0 = time.perf_counter()
        out = real_text(*a, **kw)
        stages["text_gate"] = round(time.perf_counter() - t0, 3)
        return out

    def timed_assets(spark_, batch_df, ledger_path, *a, **kw):
        t0 = time.perf_counter()
        out = real_assets(spark_, batch_df, ledger_path, *a, **kw)
        stages[f"door_{kw.get('signal', '?')}"] = round(
            time.perf_counter() - t0, 3
        )
        return out

    env.admit_batch = timed_text  # type: ignore[assignment]
    env.admit_assets_batch = timed_assets  # type: ignore[assignment]
    try:
        t0 = time.perf_counter()
        env.admit_multimodal_batch(
            spark, df_of(records[1::2]), base, batch_id=1
        )
        total = round(time.perf_counter() - t0, 3)
    finally:
        env.admit_batch, env.admit_assets_batch = real_text, real_assets

    print(
        json.dumps(
            {
                "metric": "envelope_round_stages",
                "sf_dir": SF_DIR,
                "docs_in_round": len(records[1::2]),
                "total_sec": total,
                "stages": stages,
            }
        )
    )
    shutil.rmtree(base_dir, ignore_errors=True)


if __name__ == "__main__":
    {"soak": soak, "envelope_stages": envelope_stages}[sys.argv[1]]()
