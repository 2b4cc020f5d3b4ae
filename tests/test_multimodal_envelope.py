"""One admission envelope for a document AND its assets
(streaming/envelope.py): record-level text gating, per-signal asset
gating for admitted records only, one release watermark across every
sink, and replay convergence with a kill point BETWEEN the text commit
and the asset commit — the window the two independent doors could not
close. Reference analogue: one object lands → one gate → one index
(filladdtrigger/main.py:5-22) at multimodal width."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from map_reduce_using_cloud_functions_spark.operators import dedup as dd
from map_reduce_using_cloud_functions_spark.operators import multimodal as mm
from map_reduce_using_cloud_functions_spark.streaming import envelope as env
from map_reduce_using_cloud_functions_spark.streaming.envelope import (
    admit_multimodal_batch,
    multimodal_paths,
    start_multimodal_front_door_stream,
    streaming_multimodal_from_dir,
)

TEXT_A = (
    "the quick brown fox jumps over the lazy dog while the rain "
    "falls softly on the quiet village roofs tonight"
)
TEXT_A_NEAR = TEXT_A.replace("tonight", "today")
TEXT_B = (
    "completely different content about distributed query engines "
    "folding partial aggregates before the exchange boundary runs"
)
TEXT_C = (
    "a third unrelated story where a sailor counts gulls above the "
    "harbor and writes their numbers into a weathered logbook daily"
)


def _img(seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    return mm.encode_png(rng.integers(0, 256, (16, 16), dtype=np.uint8))


def _wav(seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    return mm.encode_wav(rng.integers(0, 256, 390, dtype=np.uint8))


_ARROW_SCHEMA = pa.schema(
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


def _write_records(directory: str, name: str, records) -> None:
    """One parquet shipment file (MULTIMODAL_RECORD_SCHEMA) — the
    producer format streaming_multimodal_from_dir watches for."""
    os.makedirs(directory, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": [r[0] for r in records],
                "text": [r[1] for r in records],
                "assets": [
                    [
                        {"asset_id": a[0], "signal": a[1], "payload": a[2]}
                        for a in r[2]
                    ]
                    if r[2] is not None
                    else None
                    for r in records
                ],
            },
            schema=_ARROW_SCHEMA,
        ),
        os.path.join(directory, name),
    )


def _records_df(spark, records):
    return spark.createDataFrame(
        [
            (
                r[0],
                r[1],
                [
                    {"asset_id": a[0], "signal": a[1], "payload": bytearray(a[2])}
                    for a in r[2]
                ]
                if r[2] is not None
                else None,
            )
            for r in records
        ],
        env.MULTIMODAL_RECORD_SCHEMA,
    )


def _docs(spark, base):
    out = {}
    p = multimodal_paths(base)["docs"]
    for r in spark.read.parquet(p).select("release", "doc_id").collect():
        out.setdefault(r["release"], set()).add(r["doc_id"])
    return out


def _assets(spark, base):
    out = {}
    p = multimodal_paths(base)["assets"]
    rows = spark.read.parquet(p).select("signal", "release", "asset_id")
    for r in rows.collect():
        out.setdefault((r["signal"], r["release"]), set()).add(r["asset_id"])
    return out


def test_envelope_gates_record_then_assets(spark, tmp_path):
    """Batch 0 admits a full record; batch 1: a text near-dup record is
    refused WHOLE (its assets — including a novel image — never gate,
    never enter any ledger), an admitted record keeps its novel assets
    and loses its duplicate one."""
    base = str(tmp_path / "mm")
    png_x, png_y, wav_z = _img(1), _img(2), _wav(3)
    b0 = _records_df(
        spark,
        [(1, TEXT_A, [(100, "image", png_x), (101, "audio", wav_z)])],
    )
    admit_multimodal_batch(spark, b0, base, batch_id=0)
    assert _docs(spark, base) == {0: {1}}
    assert _assets(spark, base) == {("image", 0): {100}, ("audio", 0): {101}}

    b1 = _records_df(
        spark,
        [
            # refused by text (near-dup of TEXT_A): record drops WHOLE —
            # its novel image 200 must NOT enter any ledger
            (2, TEXT_A_NEAR, [(200, "image", png_y)]),
            # admitted by text; asset 300 duplicates the admitted 100
            # (recompressed → same pixels) and is pruned; 301 is novel
            (3, TEXT_B, [(300, "image", png_x), (301, "image", png_y)]),
        ],
    )
    admit_multimodal_batch(spark, b1, base, batch_id=1)
    assert _docs(spark, base) == {0: {1}, 1: {3}}
    assert _assets(spark, base) == {
        ("image", 0): {100},
        ("audio", 0): {101},
        ("image", 1): {301},
    }
    # the refused record's image never gated: 200 is nowhere in the
    # image ledger (301 with the same pixels WAS admitted instead)
    prints = spark.read.parquet(
        f"{multimodal_paths(base)['phash']['image']}/prints"
    )
    assert {r["asset_id"] for r in prints.collect()} == {100, 301}

    # a later record with no assets at all admits cleanly
    b2 = _records_df(spark, [(4, TEXT_C, None)])
    admit_multimodal_batch(spark, b2, base, batch_id=2)
    assert _docs(spark, base)[2] == {4}


def test_envelope_unknown_signal_refuses(spark, tmp_path):
    base = str(tmp_path / "mm")
    df = _records_df(spark, [(1, TEXT_A, [(9, "hologram", b"\x00\x01")])])
    with pytest.raises(ValueError, match="hologram"):
        admit_multimodal_batch(spark, df, base, batch_id=0)


def test_envelope_stream_kill_between_text_and_asset_commit(
    spark, tmp_path, monkeypatch
):
    """THE crash window the two-door design could not close: the text
    sinks commit (docs release + MinHash ledger append), then the
    process dies before the asset door runs. The replayed batch must
    re-admit the SAME documents (its text probe excludes its own
    release — no self-match) and land the assets exactly once, under
    the same release watermark."""
    base = str(tmp_path / "mm")
    watch = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    paths = multimodal_paths(base)

    real_assets_door = env.admit_assets_batch
    calls = []

    def crashy(spark_, batch_df, *a, **kw):
        # r13: the signal doors run CONCURRENTLY — crash BOTH of round
        # one's doors (not just the first call) so the asserted
        # mid-state (text committed, NO assets) is deterministic under
        # any thread interleaving
        if len(calls) < 2:
            calls.append("crash")
            raise RuntimeError("injected crash BETWEEN text and asset commit")
        calls.append("run")
        return real_assets_door(spark_, batch_df, *a, **kw)

    monkeypatch.setattr(env, "admit_assets_batch", crashy)

    def run():
        q = start_multimodal_front_door_stream(
            spark,
            streaming_multimodal_from_dir(spark, watch),
            base,
            ckpt,
        )
        q.awaitTermination(180)

    _write_records(
        watch,
        "b0.parquet",
        [
            (1, TEXT_A, [(100, "image", _img(1))]),
            (2, TEXT_B, [(200, "audio", _wav(2))]),
        ],
    )
    with pytest.raises(Exception, match="injected crash"):
        run()
    # the window is real: text committed, assets did not
    assert _docs(spark, base) == {0: {1, 2}}
    assert dd.ledger_releases(spark, paths["ledger"]) == [0]
    assert not os.path.exists(paths["assets"])

    run()  # replay converges: same docs (no self-match), assets land once
    # two signals: both doors crashed in round one, both ran on replay
    assert calls == ["crash", "crash", "run", "run"], calls
    assert _docs(spark, base) == {0: {1, 2}}
    assert _assets(spark, base) == {("audio", 0): {200}, ("image", 0): {100}}
    assert dd.ledger_releases(spark, paths["ledger"]) == [0]
    assert dd.ledger_releases(spark, paths["phash"]["image"]) == [0]
    assert dd.ledger_releases(spark, paths["phash"]["audio"]) == [0]

    # the converged ledgers gate batch 1 normally: near-dup text
    # refused whole, novel record's duplicate image pruned
    _write_records(
        watch,
        "b1.parquet",
        [
            (3, TEXT_A_NEAR, [(300, "image", _img(3))]),
            (4, TEXT_C, [(400, "image", _img(1)), (401, "image", _img(4))]),
        ],
    )
    run()
    assert _docs(spark, base) == {0: {1, 2}, 1: {4}}
    assert _assets(spark, base) == {
        ("audio", 0): {200},
        ("image", 0): {100},
        ("image", 1): {401},
    }


def test_envelope_concurrent_signal_doors_replay(spark, tmp_path, monkeypatch):
    """r13: the per-signal doors overlap from a driver thread pool, so
    a crash can now land AFTER a sibling signal committed — an
    interleaving the old sorted sequential loop could never produce.
    Pin it deterministically: the audio door commits and signals an
    event, then the image door crashes. The replay must converge
    exactly-once on EVERY sink — the audio door's re-run overwrites its
    own release partitions (no double rows), the image door lands."""
    import threading

    base = str(tmp_path / "mm")
    watch = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    paths = multimodal_paths(base)

    real_assets_door = env.admit_assets_batch
    audio_done = threading.Event()
    crashed = []

    def crashy(spark_, batch_df, *a, **kw):
        sig = kw["signal"]
        if sig == "audio":
            out = real_assets_door(spark_, batch_df, *a, **kw)
            audio_done.set()
            return out
        if not crashed:
            # image door: let the sibling commit first, then die
            assert audio_done.wait(120), "audio door never finished"
            crashed.append(True)
            raise RuntimeError("injected crash AFTER sibling signal commit")
        return real_assets_door(spark_, batch_df, *a, **kw)

    monkeypatch.setattr(env, "admit_assets_batch", crashy)

    def run():
        q = start_multimodal_front_door_stream(
            spark,
            streaming_multimodal_from_dir(spark, watch),
            base,
            ckpt,
        )
        q.awaitTermination(180)

    _write_records(
        watch,
        "b0.parquet",
        [
            (1, TEXT_A, [(100, "image", _img(1)), (101, "audio", _wav(1))]),
            (2, TEXT_B, [(200, "audio", _wav(2))]),
        ],
    )
    with pytest.raises(Exception, match="AFTER sibling signal commit"):
        run()
    # the new window is real: text AND the audio signal committed,
    # image did not
    assert _docs(spark, base) == {0: {1, 2}}
    assert _assets(spark, base) == {("audio", 0): {101, 200}}
    assert dd.ledger_releases(spark, paths["phash"]["audio"]) == [0]
    assert not os.path.exists(os.path.join(paths["assets"], "signal=image"))

    run()  # replay: every sink converges exactly-once
    assert _docs(spark, base) == {0: {1, 2}}
    assert _assets(spark, base) == {
        ("audio", 0): {101, 200},
        ("image", 0): {100},
    }
    # exactly-once means no duplicate ROWS either (sets would hide them)
    assert spark.read.parquet(paths["assets"]).count() == 3
    assert spark.read.parquet(paths["docs"]).count() == 2
    assert dd.ledger_releases(spark, paths["ledger"]) == [0]
    assert dd.ledger_releases(spark, paths["phash"]["image"]) == [0]
    assert dd.ledger_releases(spark, paths["phash"]["audio"]) == [0]
    assert (
        spark.read.parquet(f"{paths['phash']['audio']}/prints").count() == 2
    )


def test_envelope_stream_equals_batch(spark, tmp_path):
    """The stream and the batch spelling admit identical sets from
    identical shipments (the stream ≡ batch contract every door
    holds)."""
    base_s = str(tmp_path / "mm_stream")
    base_b = str(tmp_path / "mm_batch")
    watch = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    shipments = [
        [
            (1, TEXT_A, [(100, "image", _img(11)), (101, "video", _y4m(12))]),
            (2, TEXT_A, [(110, "image", _img(13))]),  # within-batch text dup
        ],
        [
            (3, TEXT_B, [(300, "video", _y4m(12)), (301, "audio", _wav(14))]),
        ],
    ]
    for i, ship in enumerate(shipments):
        _write_records(watch, f"b{i}.parquet", ship)
        q = start_multimodal_front_door_stream(
            spark,
            streaming_multimodal_from_dir(spark, watch),
            base_s,
            ckpt,
        )
        q.awaitTermination(180)
        admit_multimodal_batch(
            spark, _records_df(spark, ship), base_b, batch_id=i
        )
    assert _docs(spark, base_s) == _docs(spark, base_b) == {0: {1}, 1: {3}}
    # record 1's video admitted in batch 0; record 3 re-ships the SAME
    # clip — pruned by the video ledger in both spellings
    assert (
        _assets(spark, base_s)
        == _assets(spark, base_b)
        == {
            ("image", 0): {100},
            ("video", 0): {101},
            ("audio", 1): {301},
        }
    )


def _y4m(seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    pattern = rng.integers(0, 2, (2, 2)) * 2 - 1
    steps = rng.normal(0, 3, 120).cumsum()
    smooth = np.convolve(steps, np.ones(25) / 25, mode="valid")[:80]
    amp = 45 + 35 * np.tanh(smooth / 30)
    frames = np.clip(128 + amp[:, None, None] * pattern[None], 0, 255)
    return mm.encode_y4m(frames.round().astype(np.uint8))


def test_envelope_report(spark, tmp_path):
    """front_door_report(multimodal_base=...) accounts for the
    envelope's committed relations: docs per release, assets per
    (signal, release), and every ledger under the base."""
    from map_reduce_using_cloud_functions_spark.streaming.report import (
        front_door_report,
    )

    base = str(tmp_path / "mm")
    b0 = _records_df(
        spark,
        [
            (1, TEXT_A, [(100, "image", _img(21)), (101, "audio", _wav(22))]),
            (2, TEXT_B, [(200, "image", b"not a png")]),  # corrupt: admits once
        ],
    )
    admit_multimodal_batch(spark, b0, base, batch_id=0)
    rep = front_door_report(spark, multimodal_base=base)["multimodal"]
    assert rep["docs_per_release"] == {0: 2}
    assert rep["docs_total"] == 2
    assert rep["assets_per_release"] == {
        "audio": {0: 1},
        "image": {0: 2},
    }
    assert rep["assets_total"] == 3
    assert rep["minhash_ledger"]["per_release"] == {0: 2}
    assert rep["phash_ledger_image"]["per_release"] == {0: 1}  # ok print
    assert rep["phash_ledger_image"]["corrupt_per_release"] == {0: 1}
    assert rep["phash_ledger_audio"]["per_release"] == {0: 1}
    assert "phash_ledger_video" not in rep  # signal never appeared


def test_cli_admit_multimodal_and_report(spark, tmp_path, capsys):
    """The envelope through its CLI verbs: `admit-multimodal --once`
    drains a shipment, a second drain gates against the first, and
    `front-door-report --multimodal` prints the envelope accounting."""
    import json

    from map_reduce_using_cloud_functions_spark.__main__ import main

    watch = str(tmp_path / "in")
    base = str(tmp_path / "mm")
    args = [
        "admit-multimodal",
        watch,
        base,
        str(tmp_path / "ck"),
        "--once",
    ]
    _write_records(
        watch, "b0.parquet", [(1, TEXT_A, [(100, "image", _img(31))])]
    )
    assert main(args, spark=spark) == 0
    _write_records(
        watch,
        "b1.parquet",
        [
            (2, TEXT_A_NEAR, [(200, "audio", _wav(32))]),  # text near-dup
            (3, TEXT_B, [(300, "image", _img(31)), (301, "audio", _wav(33))]),
        ],
    )
    assert main(args, spark=spark) == 0
    assert _docs(spark, base) == {0: {1}, 1: {3}}
    assert _assets(spark, base) == {
        ("image", 0): {100},
        ("audio", 1): {301},
    }
    capsys.readouterr()
    assert (
        main(["front-door-report", "--multimodal", base], spark=spark) == 0
    )
    rep = json.loads(capsys.readouterr().out)["multimodal"]
    assert rep["docs_per_release"] == {"0": 1, "1": 1}
    assert rep["assets_per_release"] == {"audio": {"1": 1}, "image": {"0": 1}}
