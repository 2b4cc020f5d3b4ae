"""One admission envelope for a document AND its assets (r11 verdict
task 1).

A multimodal record — ``(doc_id, text, assets[])`` — is one unit: the
reference's trigger contract is one object lands → ONE gate → one
index (``filladdtrigger/main.py:5-22``), and the r11 engine's two
independent doors (text at ``near_dedup.admit_batch``, assets at
``admit_assets_batch``) could half-admit a record when a crash landed
between their checkpoints, with nothing tying a refused image to its
sibling text. This module composes the two doors into one
exactly-once round under a SINGLE release watermark (the batch id),
with one base directory owning every sink:

    {base}/docs                 admitted documents   (release=N)
    {base}/assets/signal=S      admitted assets      (…/release=N)
    {base}/ledger               MinHash text ledger
    {base}/semantic             text embedding ledger      (optional)
    {base}/phash/S              per-signal fingerprint ledger
    {base}/asset_semantic/S     per-signal embedding ledger (optional)

Record policy, stated exactly:

- the RECORD admits or refuses on its TEXT strengths (quality gate,
  within-batch MinHash CC, cross-release ledger probe, optional
  semantic gate). A refused record contributes NOTHING: its assets
  never gate, never enter any ledger, never ship — a crash cannot
  admit a document's image while refusing its text, because the
  assets of refused documents are filtered out before any asset
  strength runs;
- assets of ADMITTED records are then individually gated per signal
  (within-batch banded CC, cross-release fingerprint probe, the
  corrupt exact-byte gate, optional semantic strength). A duplicate
  asset is pruned from its record — the record still ships, joined to
  its SURVIVING assets by ``doc_id`` at read time.

Exactly-once under replay: every sink write is a release-partition
dynamic overwrite keyed on the SAME batch id, and every probe excludes
``release=batch_id`` — so a replay after a crash anywhere in the round
(including BETWEEN the text commit and an asset commit, the window the
two-door design could not close) recomputes the identical survivor
sets from the checkpoint-pinned batch content and overwrites its own
partitions. Asset signals run CONCURRENTLY from a driver thread pool
(r13 — their ledgers and sink subtrees are disjoint, so overlap is
free parallelism, guide §2.6); the crash-window sequence across
signals is therefore an arbitrary interleaving, and replay converges
from any of them because each signal's sub-door is the UNCHANGED
``admit_assets_batch`` writing under its own ``signal=S`` subtree (two
signals can never clobber each other's release partition).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import LSH_BANDS, MINHASH_K, PHASH_SIGNALS, ledger_exists
from .file_index import _bind_checkpoint
from .near_dedup import admit_assets_batch, admit_batch, _guard_ledger_binding

MULTIMODAL_RECORD_SCHEMA = (
    "doc_id bigint, text string, assets array<struct<"
    "asset_id: bigint, signal: string, payload: binary>>"
)


def multimodal_paths(base_path: str) -> dict:
    """The envelope's sink layout under one base directory — the
    single root ``front_door_report(multimodal_base=...)`` reads."""
    return {
        "docs": f"{base_path}/docs",
        "assets": f"{base_path}/assets",
        "ledger": f"{base_path}/ledger",
        "semantic": f"{base_path}/semantic",
        "phash": {s: f"{base_path}/phash/{s}" for s in PHASH_SIGNALS},
        "asset_semantic": {
            s: f"{base_path}/asset_semantic/{s}" for s in PHASH_SIGNALS
        },
    }


def admit_multimodal_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    base_path: str,
    batch_id: int,
    threshold: float = 0.5,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    shingle_n: int = 3,
    min_quality: float | None = None,
    quality_filter=None,
    text_semantic: bool = False,
    semantic_threshold: float = 0.85,
    embedder=None,
    grid: int = 8,
    max_hamming: int = 6,
    asset_semantic: bool = False,
    asset_semantic_threshold: float = 0.9,
    asset_embedder=None,
    compact_after_releases: int | None = None,
) -> DataFrame:
    """One multimodal admission round, callable from ``foreachBatch``
    or a batch driver (stream ≡ batch, like every door here).
    ``batch_df`` carries ``MULTIMODAL_RECORD_SCHEMA`` (``assets`` may
    be null/empty; asset ids must be unique within the corpus — they
    key the fingerprint ledgers). Returns the admitted documents
    (materialized; their surviving assets are under
    ``{base}/assets``, joined by ``doc_id``).

    Strengths and their order (each one the UNCHANGED single-door
    operator — the envelope adds composition, not new gate logic):

    1. quality (optional ``min_quality`` heuristic composite or a
       frozen ``quality_filter`` callable) — refused records are
       dropped before they cost a sketch;
    2. text: within-batch MinHash CC → cross-release ledger probe →
       optional semantic (embedding-ledger) gate;
    3. per signal present among ADMITTED records' assets, overlapped
       from a driver thread pool (disjoint sinks — see the module
       docstring): ``admit_assets_batch`` under
       ``{base}/phash/{signal}`` (perceptual + corrupt exact-byte
       gates, optional semantic strength against
       ``{base}/asset_semantic/{signal}``).

    ``compact_after_releases`` applies the threshold-triggered
    auto-compaction to EVERY ledger the round touches."""
    paths = multimodal_paths(base_path)
    docs = batch_df.drop("assets")
    if quality_filter is not None:
        docs = quality_filter(docs)
    elif min_quality is not None:
        from ..operators.text_analysis import text_features

        keep = (
            text_features(docs)
            .where(F.col("quality") >= min_quality)
            .select("doc_id")
        )
        # keep is trigger-bounded — broadcast the semi-join probe (r12)
        docs = docs.join(F.broadcast(keep), "doc_id", "left_semi")
    survivors = admit_batch(
        spark,
        docs,
        paths["ledger"],
        paths["docs"],
        batch_id,
        threshold=threshold,
        k=k,
        bands=bands,
        shingle_n=shingle_n,
        semantic_ledger_path=paths["semantic"] if text_semantic else None,
        semantic_threshold=semantic_threshold,
        embedder=embedder,
        compact_after_releases=compact_after_releases,
    )
    assets = (
        batch_df.select("doc_id", F.explode("assets").alias("a"))
        .select(
            "doc_id",
            F.col("a.asset_id").alias("asset_id"),
            F.col("a.signal").alias("signal"),
            F.col("a.payload").alias("payload"),
        )
        # survivors are trigger-bounded and checkpointed (no size
        # estimate) — broadcast the semi-join probe side (r12)
        .join(F.broadcast(survivors.select("doc_id")), "doc_id", "left_semi")
    )
    signals = sorted(
        r["signal"] for r in assets.select("signal").distinct().collect()
    )
    unknown = [s for s in signals if s not in PHASH_SIGNALS]
    if unknown:
        raise ValueError(
            f"admit_multimodal_batch: records carry assets with "
            f"signal(s) {unknown} — no fingerprint family exists for "
            f"them (known: {PHASH_SIGNALS}). An ungated modality would "
            "be a silent dedup hole; fix the producer or extend "
            "PHASH_SIGNALS with a fingerprint."
        )
    def _admit_signal(sig: str) -> None:
        spark.sparkContext.setJobDescription(
            f"envelope batch {batch_id}: {sig} door"
        )
        admit_assets_batch(
            spark,
            assets.where(F.col("signal") == sig).drop("signal"),
            paths["phash"][sig],
            f"{paths['assets']}/signal={sig}",
            batch_id,
            grid=grid,
            max_hamming=max_hamming,
            signal=sig,
            semantic_ledger_path=(
                paths["asset_semantic"][sig] if asset_semantic else None
            ),
            semantic_threshold=asset_semantic_threshold,
            asset_embedder=asset_embedder,
            compact_after_releases=compact_after_releases,
        )

    # r13 (r12 verdict task 5): the per-signal doors are independent
    # until their sink writes — DISJOINT ledger paths ({base}/phash/S),
    # DISJOINT survivor subtrees ({base}/assets/signal=S), disjoint
    # semantic ledgers — so they overlap from a driver thread pool
    # (guide §2.6): each door's eager jobs (checkpoints, counts,
    # collects) serialize its OWN critical path, and overlapping lets
    # one signal's jobs back-fill the cores another's barrier leaves
    # idle. Exactly-once is untouched: every write keys on the same
    # batch id, a replay overwrites its own partitions per signal, and
    # any door's failure fails the whole batch before the checkpoint
    # commits (pool.map re-raises). The crash-window SEQUENCE across
    # signals is no longer deterministic — replay converges from any
    # interleaving because the signals share no sink — which the
    # concurrent-replay test pins.
    if len(signals) > 1:
        from concurrent.futures import ThreadPoolExecutor

        from pyspark import inheritable_thread_target

        with ThreadPoolExecutor(max_workers=len(signals)) as pool:
            list(pool.map(inheritable_thread_target(_admit_signal), signals))
    else:
        for sig in signals:
            _admit_signal(sig)
    return survivors


def start_multimodal_front_door_stream(
    spark: SparkSession,
    records: DataFrame,
    base_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    **kwargs,
) -> StreamingQuery:
    """The multimodal front door as ONE stream: records land
    (``streaming_multimodal_from_dir`` or any streaming relation with
    ``MULTIMODAL_RECORD_SCHEMA``), each batch runs ONE
    ``admit_multimodal_batch`` round, and every sink under
    ``base_path`` is exactly-once on the same batch id. ``kwargs``
    pass through to ``admit_multimodal_batch``.

    Binding: every ledger path the round COULD touch is guarded
    upfront with the standard protocol (fresh paths bind immediately —
    the crash-safe order the single doors use; existing unbound paths
    adopt with foreign-release snapshots and finalize after the batch
    lands). Guarding a signal ledger that never materializes costs one
    idempotent marker write per batch and buys the replay contract the
    moment that signal first appears."""
    paths = multimodal_paths(base_path)
    guarded = [paths["ledger"]]
    if kwargs.get("text_semantic"):
        guarded.append(paths["semantic"])
    for sig in PHASH_SIGNALS:
        guarded.append(paths["phash"][sig])
        if kwargs.get("asset_semantic"):
            guarded.append(paths["asset_semantic"][sig])

    def _admit(batch_df: DataFrame, batch_id: int) -> None:
        bindings = {
            p: _guard_ledger_binding(spark, p, checkpoint_dir, batch_id)
            for p in guarded
        }
        admit_multimodal_batch(
            spark, batch_df, base_path, batch_id, **kwargs
        )
        for p, binding in bindings.items():
            if binding == "adopting":
                _bind_checkpoint(spark, p, checkpoint_dir)

    writer = records.writeStream.foreachBatch(_admit).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_multimodal_from_dir(
    spark, path: str, max_files_per_trigger: int | None = None
):
    """File-source ingest for multimodal record shipments: watch
    ``path`` for landing parquet files carrying
    ``MULTIMODAL_RECORD_SCHEMA`` (the shape a producer shipping
    documents WITH their media actually writes — text and payload in
    one row group, one file per shipment). The explicit schema is
    required by streaming file sources and pins the producer
    contract."""
    reader = spark.readStream.schema(MULTIMODAL_RECORD_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)
