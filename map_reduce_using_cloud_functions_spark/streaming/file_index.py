"""Streaming file-source indexing (SURVEY.md §2 O19).

Reference behavior: a GCS object-finalize event fires a CloudEvent
handler that re-runs the whole pipeline on the new file and merges into
the stored index (``filladdtrigger/main.py:5-22`` → O15 merge at
``master/main.py:106-126``). Concurrent uploads race (no locking —
SURVEY.md §3.2); the Spark restatement is a single-writer Structured
Streaming query, which serializes batches by construction:

    readStream.text(dir) → tokenize/aggregate (same expressions as
    batch) → foreachBatch: upsert into the parquet index.

At scale the upsert is a per-batch join against only the index
partitions the delta touches (replace-document semantics), or a pure
additive union (reference parity). Exactly-once comes from the
checkpoint + idempotent per-document overwrite.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.index import build_index, merge_index


def start_file_index_stream(
    spark: SparkSession,
    watch_dir: str,
    index_path: str,
    checkpoint_dir: str,
    additive: bool = False,
    available_now: bool = True,
) -> StreamingQuery:
    """Watch ``watch_dir`` for new text files; maintain the index table
    at ``index_path``. One file = one document (basename identity,
    reference ``mapper/main.py:63``)."""

    corpus = (
        spark.readStream.text(watch_dir)
        .select(
            F.element_at(F.split(F.input_file_name(), "/"), -1).alias("document"),
            F.col("value").alias("text"),
        )
    )

    def upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
        delta = build_index(batch_df)
        if os.path.exists(index_path):
            old = spark.read.parquet(index_path)
            merged = merge_index(old, delta, additive=additive)
        else:
            merged = delta
        # Write-then-swap: materialize to a sibling dir and rename so a
        # reader never sees a half-written index (single-writer, so the
        # swap is atomic enough for the contract; a real deployment
        # would use a transactional table format here).
        tmp = f"{index_path}.__batch{batch_id}__"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(index_path):
            import shutil

            shutil.rmtree(index_path)
        os.rename(tmp, index_path)

    writer = corpus.writeStream.foreachBatch(upsert_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
