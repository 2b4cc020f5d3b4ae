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
batch-keyed additive delta partition. Exactly-once comes from the
checkpoint + an idempotent write in BOTH modes: per-document overwrite
(replace) or per-batch partition overwrite (additive); the legacy
reference-parity additive merge (double-counts on replay) stays behind
``legacy_additive_merge=True``.
"""

from __future__ import annotations


import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.index import (
    _hadoop_exists,
    build_index,
    compact_index,
    pending_additive_batches,
    upsert_index,
    write_additive_delta,
    write_index,
)
from ..sources.text_corpus import document_from_file_name


def start_file_index_stream(
    spark: SparkSession,
    watch_dir: str,
    index_path: str,
    checkpoint_dir: str,
    additive: bool = False,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    legacy_additive_merge: bool = False,
    compact_every: int | None = None,
) -> StreamingQuery:
    """Watch ``watch_dir`` for new text files; maintain the index table
    at ``index_path``. One file = one document (basename identity,
    reference ``mapper/main.py:63``).

    ``max_files_per_trigger`` bounds each micro-batch (backpressure): a
    backlog of a million files drains as bounded batches instead of one
    giant first batch — the knob that keeps recovery-from-downtime
    memory-safe on a production stream.

    ``legacy_additive_merge``: the pre-r6 additive behavior — merge each
    batch's counts straight into the base table's letter partitions.
    At-least-once ONLY: foreachBatch replays uncommitted batches, and a
    replayed merge adds its counts AGAIN — bit-parity with the
    reference's own double-count semantics (``master/main.py:112-121``),
    kept reachable solely for that parity. The default additive path is
    exactly-once (batch-keyed delta partitions, see
    ``write_additive_delta``).

    ``compact_every`` (additive default path only): fold the pending
    delta tail into the base whenever it reaches this many batches, in
    the same single-writer foreachBatch thread — unbounded tails make
    every read's fold wider. Off (None) by default. Crash safety
    depends on the table layout (``compact_index``): on a VERSIONED
    table (pre-build with ``write_index(versioned=True)``) compaction
    is crash-atomic — turn this on freely. On an in-place table a crash
    mid-compact can lose the table, and one crashed-at-the-wrong-moment
    replay can double-count (``compact_index``'s exact window list), so
    in-place streams that must survive arbitrary kill points should
    compact out-of-band with the stream paused instead."""

    if compact_every is not None and (not additive or legacy_additive_merge):
        raise ValueError(
            "compact_every applies only to the default additive path "
            "(additive=True, legacy_additive_merge=False) — the replace "
            "path has no delta tail and the legacy merge folds eagerly"
        )
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
        # Exactly-once under foreachBatch's at-least-once replay, per
        # mode:
        # - replace (default): partition-level upsert — only the letter
        #   partitions this batch touches are rewritten, and the
        #   per-document replace absorbs a replay (idempotent).
        # - additive: each batch writes its OWN (abatch, first) delta
        #   partitions; a replay overwrites the same partitions, so the
        #   write IS the idempotence ledger — no post-write ledger
        #   append, no crash window between data and ledger. Readers
        #   fold deltas via read_index; compact_index bounds the tail.
        # - additive + legacy_additive_merge: the reference-parity
        #   double-count path (docstring above).
        if additive and not legacy_additive_merge:
            if not _hadoop_exists(spark, index_path):
                # first batch full-builds: static overwrite, idempotent
                write_index(build_index(batch_df), index_path)
            else:
                write_additive_delta(
                    spark, build_index(batch_df), index_path, batch_id
                )
                if (
                    compact_every is not None
                    and len(pending_additive_batches(spark, index_path))
                    >= compact_every
                ):
                    compact_index(spark, index_path)
            return
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
