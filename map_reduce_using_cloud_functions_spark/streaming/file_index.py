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


import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.index import build_index, upsert_index
from ..sources.text_corpus import document_from_file_name


def start_file_index_stream(
    spark: SparkSession,
    watch_dir: str,
    index_path: str,
    checkpoint_dir: str,
    additive: bool = False,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Watch ``watch_dir`` for new text files; maintain the index table
    at ``index_path``. One file = one document (basename identity,
    reference ``mapper/main.py:63``).

    ``max_files_per_trigger`` bounds each micro-batch (backpressure): a
    backlog of a million files drains as bounded batches instead of one
    giant first batch — the knob that keeps recovery-from-downtime
    memory-safe on a production stream."""

    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    corpus = (
        reader.text(watch_dir)
        .select(
            # same decoded-basename identity as the batch reader
            document_from_file_name().alias("document"),
            F.col("value").alias("text"),
        )
    )

    def upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
        # Partition-level upsert: only first-letter partitions touched by
        # this batch's postings are rewritten (dynamic partition
        # overwrite) — a one-file batch rewrites a few directories, never
        # the whole index. Effectively-once holds for the DEFAULT
        # replace path only: foreachBatch is at-least-once, and the
        # per-document replace is idempotent under batch replay. The
        # additive path (reference bug-parity) is NOT — a replayed
        # batch adds its counts again; don't run additive=True where a
        # driver restart mid-commit is in play.
        # the batch's documents are the explicit replace-set so a file
        # re-dropped with token-free content scrubs its old postings
        upsert_index(
            spark,
            build_index(batch_df),
            index_path,
            additive=additive,
            documents=batch_df.select("document"),
        )

    writer = corpus.writeStream.foreachBatch(upsert_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
