"""Perceptually-gated asset admission (streaming/near_dedup.py
admit_assets_batch / start_asset_admission_stream): the image side of
the streaming front door — recompressed / lightly-edited copies of
admitted assets refuse against the phash ledger, with the MinHash
front door's exactly-once replay discipline on the phash ledger path.
Reference analogue: the upload trigger (filladdtrigger/main.py:5-22 —
new object lands → gate → index), applied to a multimodal corpus."""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np
import pytest

from map_reduce_using_cloud_functions_spark.operators import dedup as dd
from map_reduce_using_cloud_functions_spark.operators import multimodal as mm
from map_reduce_using_cloud_functions_spark.streaming.near_dedup import (
    admit_assets_batch,
    start_asset_admission_stream,
)
from map_reduce_using_cloud_functions_spark.streaming.prep import (
    streaming_assets_from_dir,
)


def _img(seed: int, h: int = 16, w: int = 16) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)


def _recompress(png: bytes) -> bytes:
    """Different FILE bytes, identical pixels: insert an ancillary tEXt
    chunk before IEND — the shape a re-encoding pipeline produces."""
    body = b"comment\x00recompressed copy"
    chunk = (
        struct.pack(">I", len(body))
        + b"tEXt"
        + body
        + struct.pack(">I", zlib.crc32(b"tEXt" + body) & 0xFFFFFFFF)
    )
    return png[:-12] + chunk + png[-12:]


def _edited(pixels: np.ndarray) -> np.ndarray:
    """A light edit: perturb a few pixels just enough to flip 1–6 dHash
    bits — near the original (refused by the gate at max_hamming=6) but
    not identical. Found by a deterministic seed search so the fixture
    stays stable if the hash or image ever changes."""
    base = mm.dhash64(pixels)
    for seed in range(1000):
        rng = np.random.default_rng(10_000 + seed)
        out = pixels.astype(np.int64)
        for _ in range(4):
            r, c = rng.integers(0, pixels.shape[0]), rng.integers(0, pixels.shape[1])
            out[r, c] += int(rng.integers(-60, 61))
        out = np.clip(out, 0, 255).astype(np.uint8)
        ham = bin((mm.dhash64(out) ^ base) & (2**64 - 1)).count("1")
        if 1 <= ham <= 6:
            return out
    raise AssertionError("no light edit with hamming in [1, 6] found")


PIX_A = _img(1)
PIX_B = _img(2)
PIX_C = _img(3)
PNG_A = mm.encode_png(PIX_A)
PNG_A_RECOMP = _recompress(PNG_A)
PNG_A_EDIT = mm.encode_png(_edited(PIX_A))
PNG_B = mm.encode_png(PIX_B)
PNG_C = mm.encode_png(PIX_C)


def _write_assets(directory, rows):
    os.makedirs(directory, exist_ok=True)
    for asset_id, payload in rows:
        with open(os.path.join(directory, f"{asset_id}.png"), "wb") as f:
            f.write(payload)


def _run_stream(spark, watch, ledger, survivors, ckpt):
    q = start_asset_admission_stream(
        spark,
        streaming_assets_from_dir(spark, watch),
        ledger,
        survivors,
        ckpt,
    )
    q.awaitTermination(180)


def _survivor_ids(spark, survivors_path):
    out = {}
    rows = spark.read.parquet(survivors_path).select("release", "asset_id")
    for r in rows.collect():
        out.setdefault(r["release"], set()).add(r["asset_id"])
    return out


def test_planted_fixture_distances(spark):
    """The planted near-dups really are near (recompressed: hamming 0;
    edited: 0 < hamming <= 6) and the distinct images really are far —
    the preconditions every other test leans on."""
    df = spark.createDataFrame(
        [
            (1, bytearray(PNG_A)),
            (2, bytearray(PNG_A_RECOMP)),
            (3, bytearray(PNG_A_EDIT)),
            (4, bytearray(PNG_B)),
            (5, bytearray(PNG_C)),
        ],
        "asset_id bigint, payload binary",
    )
    h = {
        r["asset_id"]: r["phash"]
        for r in mm.phash_assets(df).where("ok").collect()
    }
    assert len(h) == 5

    def ham(a, b):
        return bin((h[a] ^ h[b]) & (2**64 - 1)).count("1")

    assert ham(1, 2) == 0  # recompression never moves pixels
    assert 0 < ham(1, 3) <= 6  # light edit: near, not identical
    assert ham(1, 4) > 6 and ham(1, 5) > 6 and ham(4, 5) > 6


def test_asset_stream_admits_only_novel_images(spark, tmp_path):
    """Batch 0: a recompressed within-batch copy collapses to the min
    asset_id. Batch 1: a lightly-edited copy of an admitted image is
    refused by the ledger, a fresh image is admitted."""
    watch = str(tmp_path / "in")
    ledger = str(tmp_path / "ledger")
    survivors = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")

    _write_assets(watch, [(1, PNG_A), (2, PNG_A_RECOMP), (3, PNG_B)])
    _run_stream(spark, watch, ledger, survivors, ckpt)
    assert _survivor_ids(spark, survivors) == {0: {1, 3}}
    assert dd.ledger_releases(spark, ledger) == [0]

    _write_assets(watch, [(10, PNG_A_EDIT), (11, PNG_C)])
    _run_stream(spark, watch, ledger, survivors, ckpt)
    assert _survivor_ids(spark, survivors) == {0: {1, 3}, 1: {11}}
    assert dd.ledger_releases(spark, ledger) == [0, 1]

    # the stream's ledger serves batch probes identically
    probe = mm.phash_assets(
        spark.createDataFrame(
            [(99, bytearray(PNG_A_EDIT))], "asset_id bigint, payload binary"
        )
    )
    kept = dd.near_dedup_against_phash_ledger(spark, probe, ledger)
    assert kept.count() == 0


def test_admit_assets_batch_is_the_stream_twin(spark, tmp_path):
    """Driving admit_assets_batch directly (the batch spelling) admits
    the same sets the stream admitted — stream ≡ batch."""
    ledger = str(tmp_path / "ledger")
    survivors = str(tmp_path / "out")
    b0 = spark.createDataFrame(
        [
            (1, bytearray(PNG_A)),
            (2, bytearray(PNG_A_RECOMP)),
            (3, bytearray(PNG_B)),
        ],
        "asset_id bigint, payload binary",
    )
    b1 = spark.createDataFrame(
        [(10, bytearray(PNG_A_EDIT)), (11, bytearray(PNG_C))],
        "asset_id bigint, payload binary",
    )
    admit_assets_batch(spark, b0, ledger, survivors, batch_id=0)
    admit_assets_batch(spark, b1, ledger, survivors, batch_id=1)
    assert _survivor_ids(spark, survivors) == {0: {1, 3}, 1: {11}}
    meta = dd.load_phash_ledger_meta(spark, ledger)
    assert meta == {"grid": 8, "max_hamming": 6, "signal": "image"}


def test_asset_replay_converges(spark, tmp_path, monkeypatch):
    """Crash AFTER the phash-ledger append, before the checkpoint
    commit: the replayed batch must exclude its own release from the
    probe (else every image self-matches and the replay admits
    nothing) and converge to the same survivors + single release."""
    watch = str(tmp_path / "in")
    ledger = str(tmp_path / "ledger")
    survivors = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    _write_assets(watch, [(1, PNG_A), (3, PNG_B)])

    real_append = dd.append_phash_ledger
    calls = []

    def crashy(hashes, path, release):
        real_append(hashes, path, release)
        calls.append(release)
        if len(calls) == 1:
            raise RuntimeError("injected crash AFTER phash ledger append")

    monkeypatch.setattr(dd, "append_phash_ledger", crashy)
    with pytest.raises(Exception, match="injected crash"):
        _run_stream(spark, watch, ledger, survivors, ckpt)
    assert dd.ledger_releases(spark, ledger) == [0], "append did not land"

    _run_stream(spark, watch, ledger, survivors, ckpt)
    assert calls == [0, 0], "batch 0 was not replayed"
    assert _survivor_ids(spark, survivors) == {0: {1, 3}}
    assert dd.ledger_releases(spark, ledger) == [0]


def test_undecodable_assets_admit_once_and_never_gate_perceptually(
    spark, tmp_path
):
    """A corrupt payload (ok=false fingerprint) ships with the
    survivors — the caller's corrupt-asset policy sees it — but enters
    no ledger band (no perceptual identity exists to refuse on).
    Since r12 it DOES enter the corrupt/ content-hash sidecar: the
    identical corrupt bytes re-landing later refuse on the exact-byte
    gate (r11 ADVICE — previously they re-admitted into every release
    forever), while a DIFFERENT corrupt payload (one flipped byte)
    still admits — the no-perceptual-gate policy stands."""
    ledger = str(tmp_path / "ledger")
    survivors = str(tmp_path / "out")
    corrupt = PNG_A[:40]  # truncated: magic ok, undecodable
    b0 = spark.createDataFrame(
        # two IDENTICAL corrupt payloads in one batch: min-id survives
        [(1, bytearray(PNG_A)), (7, bytearray(corrupt)), (9, bytearray(corrupt))],
        "asset_id bigint, payload binary",
    )
    admit_assets_batch(spark, b0, ledger, survivors, batch_id=0)
    assert _survivor_ids(spark, survivors) == {0: {1, 7}}
    prints = spark.read.parquet(f"{ledger}/prints")
    assert {r["asset_id"] for r in prints.collect()} == {1}
    side = spark.read.parquet(f"{ledger}/corrupt")
    assert {r["asset_id"] for r in side.collect()} == {7}

    other_corrupt = bytes(corrupt[:-1] + bytes([corrupt[-1] ^ 0xFF]))
    b1 = spark.createDataFrame(
        [(8, bytearray(corrupt)), (12, bytearray(other_corrupt))],
        "asset_id bigint, payload binary",
    )
    admit_assets_batch(spark, b1, ledger, survivors, batch_id=1)
    # 8 = exact repeat of an admitted corrupt payload: refused;
    # 12 = novel corrupt bytes: admitted (and recorded)
    assert _survivor_ids(spark, survivors)[1] == {12}
    side = spark.read.parquet(f"{ledger}/corrupt")
    assert {(r["asset_id"], r["release"]) for r in side.collect()} == {
        (7, 0),
        (12, 1),
    }


def test_corrupt_sidecar_replay_compaction_and_takedown(spark, tmp_path):
    """The sidecar rides every ledger discipline: a replayed batch
    converges (its own release is excluded from the probe, its append
    overwrites), compaction folds sidecar releases into release=-1
    (still gating), and takedown removes an asset's hash so the same
    bytes can land again."""
    ledger = str(tmp_path / "ledger")
    survivors = str(tmp_path / "out")
    # distinct corrupt payloads (NB: PNG_A[:40] == PNG_B[:40] — equal
    # dims give byte-identical headers, which is itself why an
    # exact-byte gate needs real content hashes, not prefixes)
    c1, c2, c3 = PNG_A[:40], PNG_A[:44], PNG_A[:48]
    assert len({c1, c2, c3}) == 3
    for bid, (aid, payload) in enumerate([(1, c1), (2, c2), (3, c3)]):
        df = spark.createDataFrame(
            [(aid, bytearray(payload))], "asset_id bigint, payload binary"
        )
        admit_assets_batch(spark, df, ledger, survivors, batch_id=bid)
    # replay batch 2 (same content): converges to the same state
    df = spark.createDataFrame(
        [(3, bytearray(c3))], "asset_id bigint, payload binary"
    )
    admit_assets_batch(spark, df, ledger, survivors, batch_id=2)
    side = spark.read.parquet(f"{ledger}/corrupt")
    assert {(r["asset_id"], r["release"]) for r in side.collect()} == {
        (1, 0),
        (2, 1),
        (3, 2),
    }
    # compaction folds old sidecar releases (keep_last=1 keeps the
    # newest); folded hashes still gate
    folded = dd.compact_phash_ledger(spark, ledger, keep_last=1)
    assert folded == [0, 1]
    side = spark.read.parquet(f"{ledger}/corrupt")
    assert {(r["asset_id"], r["release"]) for r in side.collect()} == {
        (1, -1),
        (2, -1),
        (3, 2),
    }
    df = spark.createDataFrame(
        [(10, bytearray(c1))], "asset_id bigint, payload binary"
    )
    admit_assets_batch(spark, df, ledger, survivors, batch_id=3)
    assert 3 not in _survivor_ids(spark, survivors)  # all refused: no dir
    # takedown: retract asset 1 → the same bytes admit again
    dd.delete_from_phash_ledger(spark, ledger, [1])
    side = spark.read.parquet(f"{ledger}/corrupt")
    assert {r["asset_id"] for r in side.collect()} == {2, 3}
    df = spark.createDataFrame(
        [(20, bytearray(c1))], "asset_id bigint, payload binary"
    )
    admit_assets_batch(spark, df, ledger, survivors, batch_id=4)
    assert _survivor_ids(spark, survivors)[4] == {20}


def test_param_and_signal_mismatch_refuse(spark, tmp_path):
    """The ledger's stored geometry and modality are authoritative:
    admission with different grid/max_hamming/signal refuses instead
    of silently comparing incomparable fingerprints."""
    ledger = str(tmp_path / "ledger")
    survivors = str(tmp_path / "out")
    b0 = spark.createDataFrame(
        [(1, bytearray(PNG_A))], "asset_id bigint, payload binary"
    )
    admit_assets_batch(spark, b0, ledger, survivors, batch_id=0)
    with pytest.raises(ValueError, match="ledger's identity"):
        admit_assets_batch(
            spark, b0, ledger, survivors, batch_id=1, grid=4
        )
    with pytest.raises(ValueError, match="ledger's identity"):
        admit_assets_batch(
            spark, b0, ledger, survivors, batch_id=1, max_hamming=3
        )
    with pytest.raises(ValueError, match="ledger's identity"):
        admit_assets_batch(
            spark, b0, ledger, survivors, batch_id=1, signal="audio"
        )


def test_fresh_checkpoint_against_owned_ledger_is_refused(spark, tmp_path):
    """A new checkpoint restarts batch ids at 0; its release overwrite
    would silently replace admitted assets — the binding refuses."""
    watch = str(tmp_path / "in")
    ledger = str(tmp_path / "ledger")
    survivors = str(tmp_path / "out")
    _write_assets(watch, [(1, PNG_A)])
    _run_stream(spark, watch, ledger, survivors, str(tmp_path / "ck1"))
    with pytest.raises(Exception, match="checkpoint"):
        _run_stream(spark, watch, ledger, survivors, str(tmp_path / "ck2"))


def test_cli_admit_assets_once(spark, tmp_path, capsys):
    """The admit-assets subcommand drains landed PNGs through the
    perceptual admission stream: recompressed copy refused within
    batch, survivors release-partitioned, ledger queryable."""
    from map_reduce_using_cloud_functions_spark.__main__ import main

    watch = str(tmp_path / "in")
    _write_assets(watch, [(1, PNG_A), (2, PNG_A_RECOMP), (3, PNG_B)])
    rc = main(
        [
            "admit-assets",
            watch,
            str(tmp_path / "ledger"),
            str(tmp_path / "out"),
            str(tmp_path / "ck"),
            "--once",
        ],
        spark=spark,
    )
    assert rc == 0
    assert _survivor_ids(spark, str(tmp_path / "out")) == {0: {1, 3}}
    info = dd.ledger_info(spark, str(tmp_path / "ledger"))
    assert info["kind"] == "phash" and info["signal"] == "image"


def test_audio_admission_refuses_transformed_copies(spark, tmp_path):
    """The audio flavor of the same front door (signal="audio" on the
    shared phash-ledger machinery): a gain-shifted and a decimated copy
    of an admitted clip refuse; a fresh clip admits."""
    import tests.test_multimodal as tmm

    ledger = str(tmp_path / "ledger")
    survivors = str(tmp_path / "out")
    base = tmm._clip(31)
    fresh = tmm._clip(32)
    b0 = spark.createDataFrame(
        [(1, bytearray(mm.encode_wav(base)))],
        "asset_id bigint, payload binary",
    )
    admit_assets_batch(
        spark, b0, ledger, survivors, batch_id=0, signal="audio"
    )
    meta = dd.load_phash_ledger_meta(spark, ledger)
    assert meta["signal"] == "audio"

    b1 = spark.createDataFrame(
        [
            (10, bytearray(mm.encode_wav(tmm._gain(base, 0.8)))),
            (11, bytearray(mm.encode_wav(base[::2]))),
            (12, bytearray(mm.encode_wav(fresh))),
        ],
        "asset_id bigint, payload binary",
    )
    admit_assets_batch(
        spark, b1, ledger, survivors, batch_id=1, signal="audio"
    )
    assert _survivor_ids(spark, survivors) == {0: {1}, 1: {12}}

    # modality is identity: probing this ledger as an image door refuses
    with pytest.raises(ValueError, match="ledger's identity"):
        admit_assets_batch(
            spark, b1, ledger, survivors, batch_id=2, signal="image"
        )


def test_cli_admit_assets_audio_stream(spark, tmp_path):
    """The audio modality through the FULL streaming path: WAV files
    land, `admit-assets --pattern '*.wav' --signal audio --once`
    drains them, a second drain refuses a gain-shifted copy of an
    admitted clip and admits a fresh one — closing the
    image/audio × batch/stream matrix."""
    import tests.test_multimodal as tmm

    from map_reduce_using_cloud_functions_spark.__main__ import main

    watch = str(tmp_path / "in")
    os.makedirs(watch)
    base = tmm._clip(41)
    fresh = tmm._clip(42)
    with open(os.path.join(watch, "1.wav"), "wb") as f:
        f.write(mm.encode_wav(base))
    args = [
        "admit-assets",
        watch,
        str(tmp_path / "ledger"),
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
        "--pattern",
        "*.wav",
        "--signal",
        "audio",
        "--once",
    ]
    assert main(args, spark=spark) == 0
    assert _survivor_ids(spark, str(tmp_path / "out")) == {0: {1}}

    with open(os.path.join(watch, "10.wav"), "wb") as f:
        f.write(mm.encode_wav(tmm._gain(base, 0.8)))
    with open(os.path.join(watch, "11.wav"), "wb") as f:
        f.write(mm.encode_wav(fresh))
    assert main(args, spark=spark) == 0
    assert _survivor_ids(spark, str(tmp_path / "out")) == {0: {1}, 1: {11}}
    meta = dd.load_phash_ledger_meta(spark, str(tmp_path / "ledger"))
    assert meta["signal"] == "audio"


def test_asset_id_expr_overflow_and_fallback(spark):
    """r11 review finding: a >18-digit numeric stem must take the
    hash path, not cast to a NULL id (a NULL id silently drops the
    asset from the admitted semi-join while its fingerprint gates)."""
    from map_reduce_using_cloud_functions_spark.streaming.prep import (
        _asset_id_expr,
    )
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [
            ("dir/7.png",),
            ("dir/12345678901234567890.png",),  # > bigint range
            ("dir/banner.png",),  # non-numeric stem
            ("dir/123456789012345678.png",),  # exactly 18 digits: fits
        ],
        "path string",
    )
    got = df.select(
        "path", _asset_id_expr(F.col("path")).alias("asset_id")
    ).collect()
    ids = {r["path"].split("/")[-1]: r["asset_id"] for r in got}
    assert ids["7.png"] == 7
    assert ids["123456789012345678.png"] == 123456789012345678
    assert ids["12345678901234567890.png"] is not None  # hashed, not NULL
    assert ids["banner.png"] is not None
    assert len(set(ids.values())) == 4


def test_phash_for_ledger_refuses_audio_ledger(spark, tmp_path):
    """r11 review finding: the 'safe on-ramp' must refuse a non-image
    ledger instead of dHashing images against audio fingerprints."""
    import tests.test_multimodal as tmm

    led = str(tmp_path / "aled")
    hashes = mm.audiohash_assets(
        spark.createDataFrame(
            [(1, bytearray(mm.encode_wav(tmm._clip(51))))],
            "asset_id bigint, payload binary",
        )
    ).withColumnRenamed("ahash", "phash")
    dd.build_phash_ledger(hashes, led, signal="audio")
    img = spark.createDataFrame(
        [(2, bytearray(PNG_A))], "asset_id bigint, payload binary"
    )
    with pytest.raises(ValueError, match="audio"):
        mm.phash_for_ledger(spark, img, led)
    # and the image spelling still works on an image ledger
    iled = str(tmp_path / "iled")
    dd.build_phash_ledger(mm.phash_assets(img), iled)
    assert mm.phash_for_ledger(spark, img, iled).count() == 1


def test_cli_admit_assets_adopts_stored_meta(spark, tmp_path):
    """r11 review finding: restarting admit-assets WITHOUT flags must
    adopt the existing ledger's stored geometry/modality instead of
    refusing on the defaults."""
    from map_reduce_using_cloud_functions_spark.__main__ import main

    watch = str(tmp_path / "in")
    ledger = str(tmp_path / "ledger")
    _write_assets(watch, [(1, PNG_A)])
    args = [
        "admit-assets",
        watch,
        ledger,
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
        "--once",
    ]
    assert main(args + ["--grid", "7", "--max-hamming", "5"], spark=spark) == 0
    meta = dd.load_phash_ledger_meta(spark, ledger)
    assert (meta["grid"], meta["max_hamming"]) == (7, 5)
    # restart with NO flags: stored meta adopted, stream drains fine
    _write_assets(watch, [(2, PNG_B)])
    assert main(args, spark=spark) == 0
    assert _survivor_ids(spark, str(tmp_path / "out")) == {0: {1}, 1: {2}}
    # an EXPLICIT mismatching flag still refuses (the ValueError
    # surfaces wrapped in the stream's failure)
    _write_assets(watch, [(3, PNG_C)])
    with pytest.raises(Exception, match="ledger's identity"):
        main(args + ["--grid", "8"], spark=spark)


def test_video_admission_refuses_transformed_copies(spark, tmp_path):
    """The video flavor of the same front door (signal="video" on the
    shared phash-ledger machinery): a contrast-regraded and a
    frame-decimated copy of an admitted clip refuse; a fresh clip
    admits; modality mismatch refuses."""
    import tests.test_multimodal as tmm

    ledger = str(tmp_path / "ledger")
    survivors = str(tmp_path / "out")
    base = tmm._vid(31)
    fresh = tmm._vid(32)
    b0 = spark.createDataFrame(
        [(1, bytearray(mm.encode_y4m(base)))],
        "asset_id bigint, payload binary",
    )
    admit_assets_batch(
        spark, b0, ledger, survivors, batch_id=0, signal="video"
    )
    assert dd.load_phash_ledger_meta(spark, ledger)["signal"] == "video"

    b1 = spark.createDataFrame(
        [
            (10, bytearray(mm.encode_y4m(tmm._contrast(base, 0.8)))),
            (11, bytearray(mm.encode_y4m(base[::2]))),
            (12, bytearray(mm.encode_y4m(fresh))),
        ],
        "asset_id bigint, payload binary",
    )
    admit_assets_batch(
        spark, b1, ledger, survivors, batch_id=1, signal="video"
    )
    assert _survivor_ids(spark, survivors) == {0: {1}, 1: {12}}

    # modality is identity: probing this ledger as an audio door refuses
    with pytest.raises(ValueError, match="ledger's identity"):
        admit_assets_batch(
            spark, b1, ledger, survivors, batch_id=2, signal="audio"
        )


def test_cli_admit_assets_video_stream(spark, tmp_path):
    """The video modality through the FULL streaming path: y4m files
    land, `admit-assets --pattern '*.y4m' --signal video --once`
    drains them, a second drain refuses a decimated copy of an
    admitted clip and admits a fresh one — closing the
    image/audio/video × batch/stream matrix."""
    import tests.test_multimodal as tmm

    from map_reduce_using_cloud_functions_spark.__main__ import main

    watch = str(tmp_path / "in")
    os.makedirs(watch)
    base = tmm._vid(41)
    fresh = tmm._vid(42)
    with open(os.path.join(watch, "1.y4m"), "wb") as f:
        f.write(mm.encode_y4m(base))
    args = [
        "admit-assets",
        watch,
        str(tmp_path / "ledger"),
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
        "--pattern",
        "*.y4m",
        "--signal",
        "video",
        "--once",
    ]
    assert main(args, spark=spark) == 0
    assert _survivor_ids(spark, str(tmp_path / "out")) == {0: {1}}

    with open(os.path.join(watch, "10.y4m"), "wb") as f:
        f.write(mm.encode_y4m(base[::2]))
    with open(os.path.join(watch, "11.y4m"), "wb") as f:
        f.write(mm.encode_y4m(fresh))
    assert main(args, spark=spark) == 0
    assert _survivor_ids(spark, str(tmp_path / "out")) == {0: {1}, 1: {11}}
    assert (
        dd.load_phash_ledger_meta(spark, str(tmp_path / "ledger"))["signal"]
        == "video"
    )


# --- semantic strength for the asset door (r12) -----------------------------


def _structured_img(seed: int, h: int = 33, w: int = 33) -> np.ndarray:
    """Vertical-only structure (seed-specific harmonic mix) + pixel
    noise: a 1-px crop preserves the vertical contrast profile (high
    embedding cosine) while the noise-decided HORIZONTAL dHash
    comparisons reshuffle (hamming >> 6) — the transform class the
    semantic strength exists for."""
    rng = np.random.default_rng(seed)
    r = np.arange(h)
    f1, f2 = rng.uniform(0.7, 1.4), rng.uniform(1.8, 3.2)
    p1, p2 = rng.uniform(0, 2 * np.pi, 2)
    vert = 30 * np.sin(2 * np.pi * f1 * r / h + p1) + 20 * np.sin(
        2 * np.pi * f2 * r / h + p2
    )
    noise = rng.integers(-2, 3, (h, w))
    return np.clip(128 + vert[:, None] + noise, 0, 255).round().astype(np.uint8)


def _cosine(a, b) -> float:
    va, vb = np.asarray(a), np.asarray(b)
    return float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))


def test_semantic_strength_catches_crops(spark, tmp_path):
    """A crop sails past the perceptual gate (every dHash cell boundary
    moves) but its contrast profile stays cosine-near — the embedding
    ledger refuses it. An unrelated image admits through both
    strengths; refused assets' prints enter NEITHER ledger."""
    base, other = _structured_img(5), _structured_img(6)
    crop = base[1:, 1:]
    # fixture preconditions: perceptual-pass + semantic-near vs base
    ham = bin((mm.dhash64(base) ^ mm.dhash64(crop)) & (2**64 - 1)).count("1")
    assert ham > 6
    assert _cosine(mm.image_grid_vector(base), mm.image_grid_vector(crop)) >= 0.95
    assert _cosine(mm.image_grid_vector(base), mm.image_grid_vector(other)) < 0.9

    ledger = str(tmp_path / "led")
    sled = str(tmp_path / "sled")
    survivors = str(tmp_path / "out")
    b0 = spark.createDataFrame(
        [(1, bytearray(mm.encode_png(base)))], "asset_id bigint, payload binary"
    )
    b1 = spark.createDataFrame(
        [
            (10, bytearray(mm.encode_png(crop))),
            (11, bytearray(mm.encode_png(other))),
        ],
        "asset_id bigint, payload binary",
    )
    for bid, df in ((0, b0), (1, b1)):
        admit_assets_batch(
            spark, df, ledger, survivors, batch_id=bid,
            semantic_ledger_path=sled,
        )
    assert _survivor_ids(spark, survivors) == {0: {1}, 1: {11}}
    prints = spark.read.parquet(f"{ledger}/prints")
    assert {r["asset_id"] for r in prints.collect()} == {1, 11}
    vecs = spark.read.parquet(f"{sled}/vecs")
    assert {r["vec_id"] for r in vecs.collect()} == {1, 11}

    # without the semantic ledger the same crop would have admitted —
    # the gate is doing the work, not the perceptual strength
    ledger2, surv2 = str(tmp_path / "led2"), str(tmp_path / "out2")
    admit_assets_batch(spark, b0, ledger2, surv2, batch_id=0)
    admit_assets_batch(spark, b1, ledger2, surv2, batch_id=1)
    assert _survivor_ids(spark, surv2) == {0: {1}, 1: {10, 11}}


def test_semantic_asset_stream_and_crash_replay(spark, tmp_path, monkeypatch):
    """The semantic strength through the FULL streaming path, with a
    kill point in the widest window: AFTER the phash-ledger append,
    BEFORE the embedding-ledger append. The replay must exclude its
    own release from BOTH probes and converge to the same survivors,
    single phash release, and single embedding release."""
    from map_reduce_using_cloud_functions_spark.streaming.near_dedup import (
        start_asset_admission_stream as start,
    )

    watch = str(tmp_path / "in")
    ledger = str(tmp_path / "led")
    sled = str(tmp_path / "sled")
    survivors = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    base, other = _structured_img(5), _structured_img(6)
    _write_assets(watch, [(1, mm.encode_png(base))])

    real_append = dd.append_embedding_ledger
    calls = []

    def crashy(embeddings, path, release):
        calls.append(release)
        if len(calls) == 1:
            raise RuntimeError("injected crash BEFORE embedding append")
        real_append(embeddings, path, release)

    monkeypatch.setattr(dd, "append_embedding_ledger", crashy)

    def run():
        q = start(
            spark,
            streaming_assets_from_dir(spark, watch),
            ledger,
            survivors,
            ckpt,
            semantic_ledger_path=sled,
        )
        q.awaitTermination(180)

    with pytest.raises(Exception, match="injected crash"):
        run()
    # the crash window is real: phash release landed, embedding didn't
    assert dd.ledger_releases(spark, ledger) == [0]
    assert dd.ledger_releases(spark, sled) == []

    run()
    assert calls == [0, 0], "batch 0 was not replayed"
    assert _survivor_ids(spark, survivors) == {0: {1}}
    assert dd.ledger_releases(spark, ledger) == [0]
    assert dd.ledger_releases(spark, sled) == [0]

    # batch 1 gates against the converged ledgers: crop refused
    # semantically, fresh image admitted
    _write_assets(watch, [(10, mm.encode_png(base[1:, 1:])), (11, mm.encode_png(other))])
    run()
    assert _survivor_ids(spark, survivors) == {0: {1}, 1: {11}}
    assert {r["vec_id"] for r in spark.read.parquet(f"{sled}/vecs").collect()} == {1, 11}


# --- threshold-triggered auto-compaction in the door (r12) ------------------


def test_door_auto_compaction_resets_fanout(spark, tmp_path):
    """With compact_after_releases=2 the door folds prior releases into
    release=-1 before probing once the fan-out crosses the threshold —
    no operator intervention — and the folded history still gates (a
    duplicate of the FIRST, long-folded image refuses in the last
    batch)."""
    ledger = str(tmp_path / "led")
    survivors = str(tmp_path / "out")
    imgs = [_img(60 + i) for i in range(4)]
    for bid in range(3):
        df = spark.createDataFrame(
            [(bid * 10, bytearray(mm.encode_png(imgs[bid])))],
            "asset_id bigint, payload binary",
        )
        admit_assets_batch(
            spark, df, ledger, survivors, batch_id=bid,
            compact_after_releases=2,
        )
    # batch 2 crossed the threshold: 0 folded, 1 kept, 2 appended
    assert dd.ledger_releases(spark, ledger) == [-1, 1, 2]
    b3 = spark.createDataFrame(
        [
            (30, bytearray(mm.encode_png(imgs[0]))),  # dup of FOLDED release 0
            (31, bytearray(mm.encode_png(imgs[3]))),  # novel
        ],
        "asset_id bigint, payload binary",
    )
    admit_assets_batch(
        spark, b3, ledger, survivors, batch_id=3, compact_after_releases=2
    )
    assert dd.ledger_releases(spark, ledger) == [-1, 2, 3]
    assert _survivor_ids(spark, survivors) == {
        0: {0},
        1: {10},
        2: {20},
        3: {31},
    }


def test_door_auto_compaction_crash_mid_fold_converges(
    spark, tmp_path, monkeypatch
):
    """Kill INSIDE the auto-compaction fold (first release-directory
    sweep): the intermediate state over-gates (folded rows in -1 AND
    the original release), and the replayed drain re-runs the fold to
    convergence, then admits the batch."""
    from map_reduce_using_cloud_functions_spark.operators import index as idx

    watch = str(tmp_path / "in")
    ledger = str(tmp_path / "led")
    survivors = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")

    def run():
        q = start_asset_admission_stream(
            spark,
            streaming_assets_from_dir(spark, watch),
            ledger,
            survivors,
            ckpt,
            compact_after_releases=2,
        )
        q.awaitTermination(180)

    imgs = [_img(70 + i) for i in range(3)]
    _write_assets(watch, [(0, mm.encode_png(imgs[0]))])
    run()
    _write_assets(watch, [(10, mm.encode_png(imgs[1]))])
    run()
    assert dd.ledger_releases(spark, ledger) == [0, 1]

    real_delete = idx._hadoop_delete
    calls = []

    def crashy(spark_, path_):
        if not calls:
            calls.append(path_)
            raise RuntimeError("injected crash mid-fold")
        real_delete(spark_, path_)

    monkeypatch.setattr(idx, "_hadoop_delete", crashy)
    _write_assets(watch, [(20, mm.encode_png(imgs[2]))])
    with pytest.raises(Exception, match="injected crash"):
        run()
    # over-gating intermediate state: folded rows AND the source release
    rels = dd.ledger_releases(spark, ledger)
    assert -1 in rels and 0 in rels, rels
    monkeypatch.setattr(idx, "_hadoop_delete", real_delete)

    run()  # replay: fold re-runs to convergence, then batch 2 admits
    assert dd.ledger_releases(spark, ledger) == [-1, 1, 2]
    assert _survivor_ids(spark, survivors) == {0: {0}, 1: {10}, 2: {20}}
    # the folded ledger still refuses a recompressed copy of image 0
    probe = spark.createDataFrame(
        [(99, bytearray(_recompress(mm.encode_png(imgs[0]))))],
        "asset_id bigint, payload binary",
    )
    admit_assets_batch(
        spark, probe, ledger, survivors, batch_id=3, compact_after_releases=2
    )
    assert 3 not in _survivor_ids(spark, survivors)
