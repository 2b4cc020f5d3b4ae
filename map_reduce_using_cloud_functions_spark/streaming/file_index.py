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

Since r7 the stream defaults to the VERSIONED table layout — the only
layout whose full rewrites and compactions are crash-atomic at every
kill point (``compact_index``'s window list) — binds its checkpoint
identity to the table so a fresh checkpoint pointed at an old table is
refused instead of silently dropping colliding batch ids, and
auto-compacts the additive delta tail on that layout (size-ratio
policy; the in-place opt-out never auto-compacts).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.index import (
    STREAM_BINDING,
    _hadoop_exists,
    _read_small_file,
    _write_small_file,
    build_index,
    compact_index,
    index_exists,
    index_version,
    should_compact,
    upsert_index,
    write_additive_delta,
    write_index,
)
from ..sources.text_corpus import document_from_file_name


def _canon_ckpt(checkpoint_dir: str) -> str:
    # local paths normalize (relative vs absolute must compare equal);
    # URI schemes pass through untouched
    return (
        checkpoint_dir if "://" in checkpoint_dir else os.path.abspath(checkpoint_dir)
    )


def _bind_checkpoint(spark, index_path: str, checkpoint_dir: str) -> None:
    _write_small_file(
        spark,
        f"{index_path}/{STREAM_BINDING}",
        _canon_ckpt(checkpoint_dir).encode("utf-8"),
    )


def _check_checkpoint_binding(spark, index_path: str, checkpoint_dir: str) -> str:
    """Refuse the silent-data-drop configuration: a FRESH checkpoint
    (batch ids restarting at 0) pointed at a table another checkpoint
    built. Its low ids collide with the table's folded_through
    watermark and every colliding batch would be dropped as if it were
    a crash replay — and with availableNow it would also re-read files
    the table already counted, double-counting the rest.

    Returns ``"bound"`` when the table's binding matches this stream's
    checkpoint (folded ids below the watermark ARE genuine replays) or
    ``"adopting"`` when the table has no binding yet (pre-built via
    write_index, or a pre-binding-era table). An adopting stream has
    NOT proven that low batch ids are replays, so the caller must not
    assert allow_replayed_ids for it — a colliding id raises instead
    of silently no-opping — and must write the binding only AFTER a
    successful batch (binding an unverified checkpoint first would
    convert the refusal into a silent drop on the operator's retry)."""
    marker = f"{index_path}/{STREAM_BINDING}"
    if not _hadoop_exists(spark, marker):
        return "adopting"
    bound = _read_small_file(spark, marker).decode("utf-8")
    current = _canon_ckpt(checkpoint_dir)
    if bound != current:
        raise ValueError(
            f"index table {index_path} is bound to streaming checkpoint "
            f"{bound!r}, but this stream uses {current!r}. A fresh "
            "checkpoint restarts batch ids at 0: ids at or below the "
            "table's folded_through watermark would be silently dropped "
            "as replays, and an availableNow stream would re-count files "
            "the table already holds. Keep the original checkpoint, or "
            "rebuild the index at a fresh path (delete the table AND "
            f"its {STREAM_BINDING} marker to deliberately rebind)."
        )
    return "bound"


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
    compact_tail_ratio: float | None | str = "auto",
    versioned: bool = True,
) -> StreamingQuery:
    """Watch ``watch_dir`` for new text files; maintain the index table
    at ``index_path``. One file = one document (basename identity,
    reference ``mapper/main.py:63``).

    ``max_files_per_trigger`` bounds each micro-batch (backpressure): a
    backlog of a million files drains as bounded batches instead of one
    giant first batch — the knob that keeps recovery-from-downtime
    memory-safe on a production stream.

    ``versioned`` (default True since r7): the stream's first full
    build creates the table on the crash-atomic versioned layout —
    immutable ``v=N`` dirs, atomic commit files, ``folded_through``
    watermark (``write_index``) — because a stream is exactly the
    workload that "must survive arbitrary kill points"
    (``compact_index``'s own window list: the in-place layout can lose
    the table mid-compaction and double-count in the
    overwrite-to-marker gap). Measured overhead is constant metadata
    per commit (BASELINE.md r6: 1.97 vs 1.58 s at the 10× base,
    constant at 100×). ``versioned=False`` keeps the in-place layout
    reachable for bit-layout parity; a table that already exists keeps
    whatever layout it has either way.

    ``legacy_additive_merge``: the pre-r6 additive behavior — merge each
    batch's counts straight into the base table's letter partitions.
    At-least-once ONLY: foreachBatch replays uncommitted batches, and a
    replayed merge adds its counts AGAIN — bit-parity with the
    reference's own double-count semantics (``master/main.py:112-121``),
    kept reachable solely for that parity. The default additive path is
    exactly-once (batch-keyed delta partitions, see
    ``write_additive_delta``); its first batch records itself as the
    ``folded_through`` watermark, so even a crash between the first
    full build and the checkpoint commit replays as a no-op instead of
    a double count (the r6-ADVICE batch-0 window, pinned by
    test_streaming's crash-on-batch-0 test).

    ``compact_every`` / ``compact_tail_ratio`` (additive default path
    only): fold the pending delta tail into the base, in the same
    single-writer foreachBatch thread, when the tail reaches this many
    batches / this fraction of the base's bytes. The ratio trigger is
    the one to use on long-lived streams: each fold is a full base
    rewrite, so a count trigger costs O(base) per K batches forever,
    while the ratio trigger amortizes to constant work per ingested
    byte (``should_compact``).

    ``compact_tail_ratio="auto"`` (the default) resolves to **1.0 on
    the versioned layout** — fold whenever the delta tail reaches the
    base's size — and **off on the in-place opt-out**: versioned folds
    are crash-atomic at every kill point, so bounding the tail by
    default costs nothing in safety and keeps every read's delta fold
    bounded (an unbounded tail makes each ``read_index`` sum wider
    forever — the r6 pattern of a safe mechanism left opt-in);
    in-place folds carry the documented crash windows, so they stay
    opt-in — compact out-of-band with the stream paused, or pass an
    explicit ratio to accept the risk. Pass ``None`` to disable
    auto-compaction entirely."""

    explicit_compaction = compact_every is not None or (
        compact_tail_ratio is not None and compact_tail_ratio != "auto"
    )
    if explicit_compaction and (not additive or legacy_additive_merge):
        raise ValueError(
            "compact_every/compact_tail_ratio apply only to the default "
            "additive path (additive=True, legacy_additive_merge=False) — "
            "the replace path has no delta tail and the legacy merge "
            "folds eagerly"
        )
    if compact_tail_ratio == "auto" and (not additive or legacy_additive_merge):
        compact_tail_ratio = None  # no delta tail on those paths
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
        #   The FIRST batch full-builds and stamps its batch id as the
        #   folded_through watermark in the same write, so its own
        #   replay is a watermark no-op (no double count); the
        #   checkpoint binding distinguishes genuine replays from a
        #   fresh checkpoint's colliding ids (which raise).
        # - additive + legacy_additive_merge: the reference-parity
        #   double-count path (docstring above).
        if additive and not legacy_additive_merge:
            if not index_exists(spark, index_path):
                # Binding-vs-build ordering closes the crash window
                # between them: on the versioned layout the binding is
                # written FIRST — a crash mid-build leaves binding +
                # uncommitted carcass, and the replay (index_exists
                # False) simply rebuilds; a crash after the commit but
                # before the checkpoint commit replays as a BOUND
                # watermark no-op. On the opt-out in-place layout the
                # full build's static overwrite would wipe a
                # pre-written marker, so it binds after — leaving a
                # narrow build-to-bind window where a replay is
                # REFUSED loudly (adoption collision) instead of
                # recovered; that residue is part of what the
                # versioned default buys.
                if versioned:
                    _bind_checkpoint(spark, index_path, checkpoint_dir)
                write_index(
                    build_index(batch_df),
                    index_path,
                    versioned=versioned,
                    folded_through=batch_id,
                )
                if not versioned:
                    _bind_checkpoint(spark, index_path, checkpoint_dir)
            else:
                binding = _check_checkpoint_binding(spark, index_path, checkpoint_dir)
                # Only a MATCHED binding proves folded ids are crash
                # replays; an adopting stream (unbound table) gets the
                # raise-on-collision default, and earns its binding
                # only after a batch actually lands.
                write_additive_delta(
                    spark,
                    build_index(batch_df),
                    index_path,
                    batch_id,
                    allow_replayed_ids=(binding == "bound"),
                )
                if binding != "bound":
                    _bind_checkpoint(spark, index_path, checkpoint_dir)
                ratio = compact_tail_ratio
                if ratio == "auto":
                    # resolve against the table's ACTUAL layout, not the
                    # versioned flag — that flag only shapes first
                    # builds, and auto-compaction must never put an
                    # in-place table's crash windows in the hot path
                    ratio = (
                        1.0
                        if index_version(spark, index_path) is not None
                        else None
                    )
                if should_compact(
                    spark,
                    index_path,
                    max_pending=compact_every,
                    max_tail_ratio=ratio,
                ):
                    # letter-scoped fold: per-batch auto-compaction over
                    # a growing base must not pay O(base) per fold; the
                    # additive stream never upserts, so layered commits
                    # cost it nothing ("auto" still flattens past the
                    # layer cap)
                    compact_index(spark, index_path, scoped="auto")
            return
        # the batch's documents are the explicit replace-set so a file
        # re-dropped with token-free content scrubs its old postings
        upsert_index(
            spark,
            build_index(batch_df),
            index_path,
            additive=additive,
            documents=batch_df.select("document"),
            versioned=versioned,
        )

    writer = corpus.writeStream.foreachBatch(upsert_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
