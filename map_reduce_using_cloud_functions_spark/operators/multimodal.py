"""Multimodal columns (SURVEY.md §2.b X5): image/audio/video as opaque
``binary`` payloads + typed metadata structs.

The container has no image/audio codecs, so *decode* is stubbed (clearly
marked), but everything Spark-side is real and tested: the BinaryType
schema, the deterministic asset builder, Arrow-batched ``mapInPandas``
plumbing (batch shape, schema projection, partitioning), and the
metadata aggregations. Swapping the stub for PIL/libav is a one-function
change that does not touch the plan.

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
    """STUB decoder — the container ships no media codecs.

    Real implementation would be e.g. PIL.Image.open(BytesIO(payload));
    here: a deterministic fake that 'decodes' byte length into fake
    dimensions. Raising NotImplementedError for genuinely unsupported
    kinds keeps the failure explicit rather than silent.
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
