"""Multimodal-column tests (X5): BinaryType schema, Arrow mapInPandas
decode plumbing, metadata-only pruning."""

from __future__ import annotations

import pyspark.sql.functions as F

from map_reduce_using_cloud_functions_spark.operators import multimodal as mm
from map_reduce_using_cloud_functions_spark.operators.multimodal import (
    asset_stats,
    build_assets,
    decode_assets,
    decode_media,
    decode_media_assets,
    encode_png,
    frame_sample,
)
from map_reduce_using_cloud_functions_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _wav_bytes(n_frames=4410, framerate=44100, n_channels=2, sampwidth=2):
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(sampwidth)
        w.setframerate(framerate)
        frames = b"".join(
            struct.pack(
                "<" + "h" * n_channels,
                *([int(12000 * math.sin(2 * math.pi * 440 * i / framerate))] * n_channels),
            )
            for i in range(n_frames)
        )
        w.writeframes(frames)
    return buf.getvalue()


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


def test_real_png_roundtrip_local():
    """encode_png → decode_media round-trips dims and pixel stats for
    gray, RGB, and RGBA, including non-trivial filter-0 scanlines."""
    import numpy as np

    rng = np.random.default_rng(7)
    for shape in [(5, 9), (12, 7, 3), (4, 4, 4)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        d = decode_media(encode_png(px))
        assert d["format"] == "png"
        assert (d["height"], d["width"]) == shape[:2]
        assert abs(d["mean_value"] - float(px.mean())) < 1e-9


def test_real_png_all_filter_types_decode():
    """The stdlib unfilter path handles filter types 1–4 (encoders in
    the wild emit them): re-encode each scanline with an explicit
    filter type and verify exact pixel recovery."""
    import struct
    import zlib

    import numpy as np

    from map_reduce_using_cloud_functions_spark.operators.multimodal import (
        _PNG_MAGIC,
    )

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
    h, w, c = px.shape

    # hand-rolled encoder applying filter type = row index % 5
    raw = b""
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        line = px[y].reshape(-1).astype(np.int32)
        f = y % 5
        enc = np.zeros(w * c, dtype=np.int32)
        for i in range(w * c):
            left = line[i - c] if i >= c else 0
            up = prev[i]
            ul = prev[i - c] if i >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) // 2
            else:
                p = left + up - ul
                pa, pb, pc_ = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc_ else (up if pb <= pc_ else ul)
            enc[i] = (line[i] - pred) & 0xFF
        raw += bytes([f]) + enc.astype(np.uint8).tobytes()
        prev = line

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    png = (
        _PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    d = decode_media(png)
    assert (d["height"], d["width"]) == (h, w)
    assert abs(d["mean_value"] - float(px.mean())) < 1e-9


def test_real_wav_decode_local():
    d = decode_media(_wav_bytes(n_frames=4410, framerate=44100, n_channels=2))
    assert d["format"] == "wav"
    assert d["n_frames"] == 4410
    assert d["sample_rate"] == 44100
    assert d["width"] == 2  # channels
    assert d["height"] == 16  # bits per sample


def test_decode_media_assets_real_codec_through_mapinpandas(spark):
    """Real PNG/WAV bytes + one corrupt payload through the SAME
    mapInPandas plumbing the judged stub row uses: per-row decode,
    corrupt rows flagged not fatal."""
    import numpy as np

    rng = np.random.default_rng(3)
    rows = []
    for i in range(6):
        px = rng.integers(0, 256, size=(10 + i, 20 + i, 3), dtype=np.uint8)
        rows.append((i, "image", bytearray(encode_png(px)), float(px.mean())))
    rows.append((6, "audio", bytearray(_wav_bytes(n_frames=100)), None))
    rows.append((7, "image", bytearray(b"\x89PNG\r\n\x1a\ntruncated"), None))
    df = spark.createDataFrame(
        [(r[0], r[1], bytes(r[2])) for r in rows],
        "asset_id bigint, kind string, payload binary",
    ).repartition(3)
    out = {r["asset_id"]: r for r in decode_media_assets(df).collect()}
    assert len(out) == 8
    for i in range(6):
        r = out[i]
        assert r["ok"] and r["format"] == "png"
        assert (r["height"], r["width"]) == (10 + i, 20 + i)
        assert abs(r["mean_value"] - rows[i][3]) < 1e-9
    assert out[6]["ok"] and out[6]["format"] == "wav" and out[6]["n_frames"] == 100
    assert not out[7]["ok"] and out[7]["err"]


def test_frame_sample_stride(spark):
    docs = load_table(spark, SF, "documents").limit(5)
    samples = frame_sample(build_assets(docs), every_n_bytes=50)
    counts = {r["asset_id"]: r["n"] for r in samples.groupBy("asset_id").agg(F.count("*").alias("n")).collect()}
    lens = {r["asset_id"]: len(bytes(r["payload"])) for r in build_assets(docs).collect()}
    for aid, n in counts.items():
        assert n == (lens[aid] - 1) // 50 + 1


def test_interlaced_png_rejected_explicitly():
    """Adam7 PNGs must fail with an explicit unsupported-format message,
    not a misleading internal length-mismatch error (stdlib path)."""
    import struct
    import zlib

    import numpy as np
    import pytest

    px = np.zeros((4, 4), dtype=np.uint8)
    payload = bytearray(encode_png(px))
    # IHDR body starts at offset 16 (8 magic + 4 len + 4 type);
    # interlace is its 13th byte. Patch it to 1 and fix the CRC.
    ihdr = bytearray(payload[16 : 16 + 13])
    ihdr[12] = 1
    payload[16 : 16 + 13] = ihdr
    crc = zlib.crc32(b"IHDR" + bytes(ihdr)) & 0xFFFFFFFF
    payload[16 + 13 : 16 + 17] = struct.pack(">I", crc)
    from map_reduce_using_cloud_functions_spark.operators.multimodal import (
        _decode_png_stdlib,
    )

    with pytest.raises(ValueError, match="interlaced"):
        _decode_png_stdlib(bytes(payload))


# --- perceptual near-dup (phash family, r10) --------------------------------


def _rand_img(seed: int, h: int = 64, w: int = 64, channels: int = 3):
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, channels), dtype=np.uint8)


def test_dhash_local_properties():
    """dhash64 is deterministic, two's-complement-packed, robust to
    mild perturbation, and separates unrelated images."""
    import numpy as np

    from map_reduce_using_cloud_functions_spark.operators.multimodal import dhash64

    img = _rand_img(7)
    h1 = dhash64(img)
    assert h1 == dhash64(img.copy())
    assert -(1 << 63) <= h1 < (1 << 63)
    # +-2 brightness on every pixel: block means shift together, the
    # gradient SIGNS barely move — hamming stays small
    bright = np.clip(img.astype(np.int16) + 2, 0, 255).astype(np.uint8)
    near = bin((dhash64(bright) ^ h1) & ((1 << 64) - 1)).count("1")
    assert near <= 6, near
    # an unrelated image is far (64 independent-ish bits, expect ~32)
    far = bin((dhash64(_rand_img(8)) ^ h1) & ((1 << 64) - 1)).count("1")
    assert far > 12, far
    # identical constant rows -> no gradient -> all bits zero
    assert dhash64(np.full((16, 18), 77, dtype=np.uint8)) == 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="smaller than"):
        dhash64(np.zeros((4, 4), dtype=np.uint8))
    with _pytest.raises(ValueError, match="grid"):
        dhash64(img, grid=9)


def test_phash_pipeline_finds_planted_near_identical_images(spark, tmp_path):
    """End to end through Spark: 6 base images; image 100+i is a
    lightly-perturbed re-encode of image i (the recompressed-copy
    case); one corrupt payload rides along. phash_pairs finds exactly
    the planted (i, 100+i) pairs — unrelated images never pair at the
    threshold — and the corrupt row surfaces ok=false without failing
    the job."""
    import numpy as np

    from map_reduce_using_cloud_functions_spark.operators.multimodal import (
        dhash64,
        phash_assets,
        phash_pairs,
    )

    rows = []
    for i in range(6):
        img = _rand_img(100 + i)
        rows.append((i, bytearray(encode_png(img))))
        # near-identical copy: tiny uniform brightness shift, then a
        # FRESH encode (different bytes, same perception)
        pert = np.clip(img.astype(np.int16) + 2, 0, 255).astype(np.uint8)
        rows.append((100 + i, bytearray(encode_png(pert))))
    rows.append((999, bytearray(b"not a png at all")))
    assets = spark.createDataFrame(rows, "asset_id bigint, payload binary")
    hashes = phash_assets(assets).cache()
    got = {r["asset_id"]: r for r in hashes.collect()}
    assert got[999]["ok"] is False and got[999]["err"]
    assert all(got[i]["ok"] for i in range(6))
    # executor-side hash == local hash (same decode, same arithmetic)
    img0 = _rand_img(100)
    assert got[0]["phash"] == dhash64(img0)
    pairs = {
        (r["asset_a"], r["asset_b"]): r["hamming"]
        for r in phash_pairs(hashes, max_hamming=6).collect()
    }
    for i in range(6):
        assert (i, 100 + i) in pairs, f"planted pair {i} missing: {pairs}"
    assert all(a % 100 == b % 100 for a, b in pairs), pairs
    hashes.unpersist()


def test_phash_pairs_matches_bruteforce_hamming(spark):
    """The banded pigeonhole join is EXACT for hamming <= max_hamming:
    equal to the all-pairs filter on 40 random fingerprints."""
    import itertools
    import random

    from map_reduce_using_cloud_functions_spark.operators.multimodal import phash_pairs

    rng = random.Random(5)
    base = rng.getrandbits(64)
    fps = []
    for i in range(40):
        # half the prints cluster around `base` (flip <= 8 random bits),
        # half are independent — plenty of in-threshold pairs
        if i % 2 == 0:
            v = base
            for _ in range(rng.randint(0, 8)):
                v ^= 1 << rng.randrange(64)
        else:
            v = rng.getrandbits(64)
        if v >= 1 << 63:
            v -= 1 << 64
        fps.append((i, v))
    df = spark.createDataFrame(
        [(i, v, True, None) for i, v in fps],
        "asset_id bigint, phash bigint, ok boolean, err string",
    )
    got = {
        (r["asset_a"], r["asset_b"]): r["hamming"]
        for r in phash_pairs(df, max_hamming=5).collect()
    }
    want = {}
    for (ia, va), (ib, vb) in itertools.combinations(fps, 2):
        d = bin((va ^ vb) & ((1 << 64) - 1)).count("1")
        if d <= 5:
            want[(min(ia, ib), max(ia, ib))] = d
    assert got == want


def test_build_png_assets_pixels_are_text_bytes(spark):
    """The oracle premise, asserted in code: decode(build_png_assets)
    returns exactly the first 72 UTF-8 bytes of the text."""
    import numpy as np

    from map_reduce_using_cloud_functions_spark.operators.multimodal import (
        build_png_assets,
        decode_png_pixels,
    )

    docs = load_table(spark, SF, "documents").limit(20)
    assets = {r["asset_id"]: bytes(r["payload"]) for r in build_png_assets(docs).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert assets, "no eligible docs"
    for aid, payload in assets.items():
        pix = decode_png_pixels(payload)
        want = np.frombuffer(texts[aid].encode("utf-8")[:72], dtype=np.uint8)
        assert np.array_equal(pix.reshape(-1), want), aid


# --- audio fingerprint (r11): energy-sign hash over real WAV decode ----------


def _clip(seed: int, n: int = 390) -> "np.ndarray":
    """A structured test clip: per-block amplitude levels drawn wide
    apart so adjacent block energies compare decisively — the shape a
    real signal's envelope has, and what makes the hash stable under
    requantization (uniform noise would leave half the bits marginal).
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    amps = rng.integers(5, 120, 66)
    t = np.arange(n)
    block = (t * 65) // n
    wave_sig = amps[block] * np.sin(t * 0.9) + rng.normal(0, 1.5, n)
    return np.clip(np.round(wave_sig) + 128, 0, 255).astype(np.uint8)


def _gain(samples, factor: float):
    import numpy as np

    centered = samples.astype(np.float64) - 128
    return np.clip(np.round(centered * factor) + 128, 0, 255).astype(np.uint8)


def test_wav_roundtrip_and_hash_determinism():
    import numpy as np

    s = _clip(7)
    payload = mm.encode_wav(s)
    decoded = mm.decode_wav_samples(payload)
    assert (decoded == s.astype(np.int64) - 128).all()
    assert mm.audiohash64(decoded) == mm.audiohash64(decoded)
    # 16-bit path decodes natively signed
    s16 = (s.astype(np.int64) - 128) * 256
    d16 = mm.decode_wav_samples(mm.encode_wav(s16, sampwidth=2))
    assert (d16 == s16).all()
    # multi-channel mixes by integer channel sum
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(bytes([10, 20, 30, 40]))  # frames: (10,20), (30,40)
    st = mm.decode_wav_samples(buf.getvalue())
    assert list(st) == [(10 - 128) + (20 - 128), (30 - 128) + (40 - 128)]


def test_audiohash_survives_gain_and_resampling():
    """The invariances the fingerprint exists for: a gain-shifted copy
    and a 2x-decimated copy hash within the admission threshold; an
    unrelated clip is far. Pure energy-ORDER comparisons make gain a
    common factor on every block (invariant up to requantization), and
    floor-proportional block boundaries make resampling near-neutral."""
    import numpy as np

    base = _clip(11)
    h = mm.audiohash64(base.astype(np.int64) - 128)

    def ham(other) -> int:
        return bin(
            (mm.audiohash64(other.astype(np.int64) - 128) ^ h) & (2**64 - 1)
        ).count("1")

    assert ham(_gain(base, 0.7)) <= 6
    assert ham(_gain(base, 1.3)) <= 6
    assert ham(base[::2]) <= 6  # decimation (downsample 2x)
    assert ham(np.repeat(base, 2)) <= 6  # sample-doubling (upsample 2x)
    assert ham(_clip(12)) > 15  # unrelated clip: far


def test_audiohash_assets_error_rows_and_pairs(spark):
    """Planted near-dups pair through the banded engine; corrupt and
    too-short payloads surface as ok=false rows, excluded from pairs."""
    base = _clip(21)
    rows = [
        (1, bytearray(mm.encode_wav(base))),
        (2, bytearray(mm.encode_wav(_gain(base, 0.8)))),  # gain-shifted copy
        (3, bytearray(mm.encode_wav(_clip(22)))),  # unrelated
        (4, bytearray(b"RIFFgarbage-not-a-wav")),  # corrupt
        (5, bytearray(mm.encode_wav(_clip(23)[:40]))),  # too short to hash
    ]
    assets = spark.createDataFrame(rows, "asset_id bigint, payload binary")
    hashes = mm.audiohash_assets(assets)
    got = {r["asset_id"]: r for r in hashes.collect()}
    assert got[1]["ok"] and got[2]["ok"] and got[3]["ok"]
    assert not got[4]["ok"] and got[4]["ahash"] is None
    assert not got[5]["ok"] and "block" in got[5]["err"]
    pairs = {
        (r["asset_a"], r["asset_b"])
        for r in mm.audiohash_pairs(hashes, max_hamming=6).collect()
    }
    assert pairs == {(1, 2)}


def test_audiohash_spark_matches_local(spark):
    """The mapInPandas fingerprint equals a driver-side recompute from
    the same payloads — no executor-side drift (stdlib-only decode)."""
    docs = spark.createDataFrame(
        [(i, "some repeated text content " * 8) for i in range(4)],
        "doc_id bigint, text string",
    )
    wavs = mm.build_wav_assets(docs)
    hashes = {
        r["asset_id"]: r["ahash"]
        for r in mm.audiohash_assets(wavs).where("ok").collect()
    }
    for r in wavs.collect():
        local = mm.audiohash64(mm.decode_wav_samples(bytes(r["payload"])))
        assert hashes[r["asset_id"]] == local


# --- video fingerprint (r12): y4m codec + temporal energy-sign hash ---------


def _vid(seed: int, n: int = 200, h: int = 4, w: int = 4) -> "np.ndarray":
    """Structured test clip: a fixed ±1 spatial pattern under a SMOOTH
    random amplitude envelope (random walk, moving-average smoothed) —
    the temporal shape real footage has, and the one the fingerprint's
    invariances (decimation, trim) are defined over. Pure-noise frames
    would make adjacent frame energies coin flips."""
    import numpy as np

    rng = np.random.default_rng(seed)
    pattern = rng.integers(0, 2, (h, w)) * 2 - 1
    steps = rng.normal(0, 3, n + 40).cumsum()
    smooth = np.convolve(steps, np.ones(25) / 25, mode="valid")[:n]
    amp = 45 + 35 * np.tanh(smooth / 30)
    frames = 128 + amp[:, None, None] * pattern[None]
    return np.clip(frames, 0, 255).round().astype(np.uint8)


def _contrast(frames, c: float):
    import numpy as np

    out = 128 + c * (frames.astype(np.float64) - 128)
    return np.clip(out, 0, 255).round().astype(np.uint8)


def test_y4m_roundtrip_and_hash_determinism():
    import numpy as np

    frames = _vid(7)
    payload = mm.encode_y4m(frames)
    decoded = mm.decode_y4m_frames(payload)
    assert decoded.dtype == np.uint8 and (decoded == frames).all()
    # lossless container: re-encoding hashes identically
    assert mm.videohash64(decoded) == mm.videohash64(frames)
    # corrupt / truncated / wrong-colorspace payloads raise (callers
    # surface that per-row as ok=false)
    import pytest

    for bad in (
        payload[:40],
        b"junk" + payload,
        payload.replace(b"Cmono", b"C420 "),
        payload[: len(payload) - 3],  # truncated final frame
    ):
        with pytest.raises(ValueError):
            mm.decode_y4m_frames(bad)
    with pytest.raises(ValueError):
        mm.videohash64(_vid(8, n=30))  # fewer frames than hash blocks


def test_videohash_survives_contrast_and_resampling():
    """The invariances the temporal fingerprint exists for: a
    contrast-scaled (about mid-gray), frame-doubled, 2x-decimated or
    tail-trimmed copy hashes within the admission threshold; unrelated
    clips are far. Energy-ORDER comparisons make contrast a common
    factor on every frame energy; floor-proportional block boundaries
    make resampling near-neutral."""
    base = _vid(11)
    h = mm.videohash64(base)

    def ham(other) -> int:
        return bin((mm.videohash64(other) ^ h) & (2**64 - 1)).count("1")

    import numpy as np

    assert ham(_contrast(base, 0.7)) <= 6
    assert ham(_contrast(base, 1.3)) <= 6
    assert ham(np.repeat(base, 2, axis=0)) <= 6  # frame-doubling
    assert ham(base[::2]) <= 6  # decimation (drop every other frame)
    assert ham(base[:-5]) <= 6  # tail trim
    assert ham(_vid(12)) > 15  # unrelated clip: far
    assert ham(_vid(13)) > 15


def test_videohash_assets_error_rows_and_pairs(spark):
    """Planted near-dups pair through the banded engine; corrupt and
    too-short payloads surface as ok=false rows, excluded from pairs."""
    base = _vid(21)
    rows = [
        (1, bytearray(mm.encode_y4m(base))),
        (2, bytearray(mm.encode_y4m(_contrast(base, 0.8)))),  # re-graded copy
        (3, bytearray(mm.encode_y4m(_vid(22)))),  # unrelated
        (4, bytearray(b"YUV4MPEG2 garbage")),  # corrupt header
        (5, bytearray(mm.encode_y4m(_vid(23)[:30]))),  # too short to hash
    ]
    assets = spark.createDataFrame(rows, "asset_id bigint, payload binary")
    hashes = mm.videohash_assets(assets)
    got = {r["asset_id"]: r for r in hashes.collect()}
    assert got[1]["ok"] and got[2]["ok"] and got[3]["ok"]
    assert not got[4]["ok"] and got[4]["vhash"] is None
    assert not got[5]["ok"] and "block" in got[5]["err"]
    pairs = {
        (r["asset_a"], r["asset_b"])
        for r in mm.videohash_pairs(hashes, max_hamming=6).collect()
    }
    assert pairs == {(1, 2)}


def test_videohash_spark_matches_local(spark):
    """The mapInPandas fingerprint equals a driver-side recompute from
    the same payloads — no executor-side drift (stdlib-only decode)."""
    docs = spark.createDataFrame(
        [(i, "some repeated text content " * 12) for i in range(4)],
        "doc_id bigint, text string",
    )
    vids = mm.build_y4m_assets(docs)
    hashes = {
        r["asset_id"]: r["vhash"]
        for r in mm.videohash_assets(vids).where("ok").collect()
    }
    for r in vids.collect():
        local = mm.videohash64(mm.decode_y4m_frames(bytes(r["payload"])))
        assert hashes[r["asset_id"]] == local


def test_build_y4m_assets_frames_are_text_bytes(spark):
    """y4m planes are uncompressed: the decoded frame bytes ARE the
    first 260 text bytes (the oracle twin's replay contract); short
    documents are dropped."""
    import numpy as np

    long_text = "".join(chr(32 + (i * 7) % 95) for i in range(300))
    docs = spark.createDataFrame(
        [(1, long_text), (2, "too short")], "doc_id bigint, text string"
    )
    rows = mm.build_y4m_assets(docs).collect()
    assert [r["asset_id"] for r in rows] == [1]
    frames = mm.decode_y4m_frames(bytes(rows[0]["payload"]))
    assert frames.shape == (65, 2, 2)
    want = np.frombuffer(long_text.encode()[:260], dtype=np.uint8)
    assert (frames.reshape(-1) == want).all()
