"""Streaming near-dup ingest (X2×X7): continuous corpus admission
through the cross-release MinHash ledger.

The real shape of a training-data pipeline's front door: documents
land continuously, and each batch must be admitted only if it is not a
near-duplicate of anything the corpus already holds — including what
earlier batches of this same stream admitted. The reference's closest
analogue is its per-file upload trigger (``filladdtrigger/main.py``),
which recounts everything; this is the incremental, bounded version:

    foreachBatch:
      batch ──1── within-batch near-dedup (MinHash pairs → CC → min-id
                  survivor — batches are bounded, so the full operator
                  is cheap here)
            ──2── probe the persisted ledger (every release EXCEPT
                  release=batch_id: sketch the batch, equi-join the
                  narrow bands relation, verify colliding candidates
                  exactly)
            ──3── write survivors to release=batch_id (dynamic
                  partition overwrite)
            ──4── append the survivors' sketches to the ledger as
                  release=batch_id (same overwrite discipline)

Exactly-once without a watermark protocol: the batch id IS the release
id, and both writes are release-partition dynamic overwrites, so a
replayed batch REPLACES its own partitions instead of double-inserting.
The one subtlety is step 2 on replay: the crashed attempt may already
have appended release=batch_id, so the probe MUST exclude the batch's
own release (``exclude_release=batch_id``) or every replayed document
matches itself and the replay admits nothing — the self-match trap the
replay test pins. Exclusion is by inequality, not ``<``: an adopting
stream (ledger pre-built with caller-chosen release ids) can have
fresh batch ids BELOW existing releases, and those releases must still
gate admission.

Fresh-checkpoint protection mirrors ``file_index``: the ledger binds
the checkpoint that owns it, because a fresh checkpoint restarts batch
ids at 0 and its release-partition overwrites would silently REPLACE
release 0's admitted documents with different ones.

At 100 TB the per-batch cost is: sketch the batch (map-only), one
equi-join of the batch's bands against the partition-pruned persisted
bands relation, exact verification only for colliding candidates, and
two bounded writes. No prior release's text is ever re-read.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import (
    LSH_BANDS,
    MINHASH_K,
    append_minhash_ledger,
    init_minhash_ledger,
    ledger_exists,
    ledger_releases,
    load_ledger_meta,
    near_dedup,
    near_dedup_against_ledger,
)
from .file_index import _bind_checkpoint, _check_checkpoint_binding


def _maybe_compact_ledger(
    spark, path: str, batch_id: int, compact_after_releases: int | None, kind: str
) -> None:
    """Threshold-triggered auto-compaction inside an admission round
    (r11 verdict task 4): when the ledger's REAL release fan-out (own
    crashed release and the folded ``-1`` partition excluded) reaches
    ``compact_after_releases``, fold history with the flavor's major
    compactor at ``keep_last=1`` BEFORE this round probes or appends.

    Why this point in the round is the safe one: compaction must never
    fold ``release=batch_id`` (a replayed batch's probe hides exactly
    that release — folding it would make replayed documents refuse as
    duplicates of themselves), and ``keep_last=1`` keeps the HIGHEST
    real release — which is the crashed attempt's own append when one
    exists. Inside ``foreachBatch`` the stream is the ledger's only
    writer, satisfying the compactors' writers-quiesced contract; a
    crash mid-fold replays into the same call and converges (the fold
    set is recomputed from surviving directories — the compactors'
    own crash contract)."""
    if compact_after_releases is None:
        return
    from ..operators.dedup import (
        compact_embedding_ledger,
        compact_minhash_ledger,
        compact_phash_ledger,
    )

    reals = [
        r
        for r in ledger_releases(spark, path)
        if r >= 0 and r != batch_id
    ]
    if len(reals) < compact_after_releases:
        return
    compactor = {
        "minhash": compact_minhash_ledger,
        "embedding": compact_embedding_ledger,
        "phash": compact_phash_ledger,
    }[kind]
    compactor(spark, path, keep_last=1)

# Adoption-time snapshot of the ledger's pre-existing (foreign) release
# ids. An adopting stream's fresh batch ids start at 0, which can sit
# BELOW releases the ledger already holds (the exclude_release-by-
# inequality probe exists for exactly that shape) — so after binding, a
# later batch id can EQUAL a foreign release, and the release-partition
# "replay overwrite" discipline would silently erase that release's
# admitted documents. The binding marker alone can't tell this apart
# from a genuine replay; this sidecar can. The name lives in
# operators/dedup.py because ledger compaction refreshes the sidecar
# when it folds a foreign release away.
from ..operators.dedup import FOREIGN_RELEASES_MARKER


def _record_foreign_releases(spark, ledger_path: str, releases: list[int]) -> None:
    import json

    from ..operators.index import _write_small_file

    marker = f"{ledger_path}/{FOREIGN_RELEASES_MARKER}"
    # _write_small_file replaces an existing marker itself (tmp-then-
    # rename); a pre-delete would only widen the no-marker crash window
    _write_small_file(spark, marker, json.dumps(sorted(releases)).encode("ascii"))


def _foreign_releases(spark, ledger_path: str) -> set[int]:
    import json

    from ..operators.index import _hadoop_exists, _read_small_file

    marker = f"{ledger_path}/{FOREIGN_RELEASES_MARKER}"
    if not _hadoop_exists(spark, marker):
        return set()
    return set(json.loads(_read_small_file(spark, marker).decode("ascii")))


def _refuse_foreign_collision(
    spark, ledger_path: str, checkpoint_dir: str, batch_id: int
) -> None:
    if batch_id in _foreign_releases(spark, ledger_path):
        raise ValueError(
            f"batch id {batch_id} collides with a release that already "
            f"existed in ledger {ledger_path} BEFORE this stream "
            f"(checkpoint {checkpoint_dir}) adopted it. Overwriting that "
            "release's partitions would erase previously admitted "
            "documents and re-admit their future near-duplicates — only "
            "ids this stream itself issued are replayable. Start the "
            "stream on a fresh ledger path, or remap its batch ids above "
            "the existing releases (e.g. pre-build the ledger with "
            "release ids below the stream's range)."
        )


def _guard_ledger_binding(
    spark, ledger_path: str, checkpoint_dir: str, batch_id: int
) -> str:
    """The pre-admission binding protocol, one ledger path at a time
    (the primary MinHash ledger and the optional semantic ledger run
    the SAME rules): fresh path binds; an unbound existing ledger
    adopts — refusing a batch id that collides with a pre-existing
    release and snapshotting the foreign ids; a bound-elsewhere ledger
    refuses foreign collisions. Returns the binding state so the
    caller can finalize an adoption AFTER the batch lands."""
    if not ledger_exists(spark, ledger_path):
        _bind_checkpoint(spark, ledger_path, checkpoint_dir)
        return "bound"
    binding = _check_checkpoint_binding(spark, ledger_path, checkpoint_dir)
    if binding == "adopting":
        existing = ledger_releases(spark, ledger_path)
        if batch_id in existing:
            raise ValueError(
                f"ledger {ledger_path} already holds release "
                f"{batch_id} and is not bound to this checkpoint "
                f"({checkpoint_dir}): overwriting it would replace "
                "previously admitted documents. Keep the original "
                "checkpoint, or start a fresh ledger path."
            )
        _record_foreign_releases(spark, ledger_path, existing)
    else:
        _refuse_foreign_collision(spark, ledger_path, checkpoint_dir, batch_id)
    return binding


def _semantic_gate(
    spark,
    survivors: DataFrame,
    batch_id: int,
    path: str,
    threshold: float,
    planes_per_band: int,
    bands: int,
    embedder,
    id_col: str = "doc_id",
    compact_after_releases: int | None = None,
):
    """The semantic admission stage: refuse survivors whose embedding
    is a cosine near-duplicate of anything already in the embedding
    ledger (or of an earlier batch-mate). Returns (gated survivors,
    admitted (vec_id, embedding) rows to append — None when nothing
    embeddable). Shared by the text door (``id_col='doc_id'``) and the
    asset door (``id_col='asset_id'``, embedder over payload bytes).

    Embeddings come from the batch's own ``embedding`` column when
    present, else from ``embedder`` (default: the deterministic
    ``hashed_doc_vectors`` hashing-trick featurizer — the stand-in for
    a model embedder, which MUST likewise be deterministic in document
    content: the replay recomputes the gate). Documents the embedder
    yields no vector for (e.g. empty text, undecodable assets) carry
    no semantic signal and pass the gate."""
    from ..operators.dedup import (
        init_embedding_ledger,
        ledger_releases as _releases,
        load_embedding_ledger_meta,
        near_dedup_against_embedding_ledger,
    )
    from ..operators.similarity import embedding_near_dedup

    if "embedding" in survivors.columns:
        emb = survivors.select(
            F.col(id_col).alias("vec_id"), "embedding"
        )
    else:
        from ..operators.text_analysis import hashed_doc_vectors

        fn = embedder or hashed_doc_vectors
        emb = fn(survivors).select(
            F.col(id_col).alias("vec_id"), "embedding"
        )
    emb = emb.where(F.col("embedding").isNotNull()).localCheckpoint()
    dim_row = emb.select(F.size("embedding").alias("d")).first()
    if dim_row is None:
        return survivors, None
    if ledger_exists(spark, path):
        meta = load_embedding_ledger_meta(spark, path)
        if (planes_per_band, bands) != (meta["planes_per_band"], meta["bands"]):
            raise ValueError(
                f"semantic ledger {path} was built with "
                f"planes_per_band={meta['planes_per_band']} "
                f"bands={meta['bands']} but this admission passed "
                f"planes_per_band={planes_per_band} bands={bands} — "
                "sketch geometry is the ledger's identity; drop the "
                "overrides or start a new ledger path."
            )
    else:
        init_embedding_ledger(
            spark,
            path,
            dim_row["d"],
            planes_per_band=planes_per_band,
            bands=bands,
        )
    _maybe_compact_ledger(
        spark, path, batch_id, compact_after_releases, "embedding"
    )
    kept = embedding_near_dedup(
        emb, threshold, planes_per_band=planes_per_band, bands=bands
    )
    if any(rel != batch_id for rel in _releases(spark, path)):
        # bounded_batch=True: the door ASSERTS the trigger-bounded
        # contract — the probe keeps its broadcast pins with no
        # boundedness-probe job (r13)
        kept = near_dedup_against_embedding_ledger(
            spark,
            kept,
            path,
            threshold=threshold,
            exclude_release=batch_id,
            bounded_batch=True,
        )
    kept = kept.localCheckpoint()
    # kept/emb are trigger-bounded (and checkpointed, which defeats the
    # planner's size estimate) — broadcast the semi/anti probe sides so
    # the gate joins never exchange the survivor relation (r12)
    no_signal = survivors.join(
        F.broadcast(emb.select(F.col("vec_id").alias(id_col))),
        id_col,
        "left_anti",
    )
    gated = survivors.join(
        F.broadcast(kept.select(F.col("vec_id").alias(id_col))),
        id_col,
        "left_semi",
    ).unionByName(no_signal)
    return gated, kept.select("vec_id", "embedding")


def admit_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    ledger_path: str,
    survivors_path: str,
    batch_id: int,
    threshold: float = 0.5,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    shingle_n: int = 3,
    semantic_ledger_path: str | None = None,
    semantic_threshold: float = 0.85,
    semantic_planes_per_band: int = 8,
    semantic_bands: int = 8,
    embedder=None,
    compact_after_releases: int | None = None,
) -> DataFrame:
    """One admission round, callable from foreachBatch or a batch
    driver (the stream ≡ batch equivalence tests drive this directly).
    Returns the admitted survivors (materialized — safe to feed a
    second sink, e.g. the composed front door's index upsert).
    Idempotent per (batch_id, content): replays overwrite their own
    release partitions and probe every OTHER release — excluding only
    ``release=batch_id`` (a crashed attempt's own append; probing it
    would self-match every replayed document), never releases with
    higher ids (an adopting stream's fresh batch ids can start below
    the ledger's existing releases, and those must still gate
    admission).

    Sketch parameters are ONE set per ledger: when the ledger exists,
    its stored meta is authoritative — passed k/bands/shingle_n must
    match it (raise on mismatch, never silently compare incomparable
    sketches), and the within-batch dedup runs on the SAME parameters
    so stream ≡ batch holds for non-default geometries too."""
    if ledger_exists(spark, ledger_path):
        meta = load_ledger_meta(spark, ledger_path)
        if (k, bands, shingle_n) != (meta["k"], meta["bands"], meta["shingle_n"]):
            raise ValueError(
                f"ledger {ledger_path} was built with k={meta['k']} "
                f"bands={meta['bands']} shingle_n={meta['shingle_n']} but "
                f"this admission passed k={k} bands={bands} "
                f"shingle_n={shingle_n} — sketch parameters are the "
                "ledger's identity; drop the overrides or start a new "
                "ledger path."
            )
        _maybe_compact_ledger(
            spark, ledger_path, batch_id, compact_after_releases, "minhash"
        )
        survivors = near_dedup(
            batch_df, threshold=threshold, k=k, bands=bands, shingle_n=shingle_n
        )
        if any(r != batch_id for r in ledger_releases(spark, ledger_path)):
            # bounded_batch=True: the door ASSERTS the trigger-bounded
            # contract — broadcast pins stay, no boundedness-probe job
            survivors = near_dedup_against_ledger(
                spark,
                survivors,
                ledger_path,
                threshold=threshold,
                exclude_release=batch_id,
                bounded_batch=True,
            )
    else:
        survivors = near_dedup(
            batch_df, threshold=threshold, k=k, bands=bands, shingle_n=shingle_n
        )
        # first batch creates the ledger's parameter row; a crash
        # between meta and the release append replays into the
        # ledger_exists branch with no earlier releases — same result
        init_minhash_ledger(
            spark, ledger_path, k=k, bands=bands, shingle_n=shingle_n
        )
    admitted_emb = None
    if semantic_ledger_path is not None:
        # the third gating strength (r9): semantic near-dups — a
        # paraphrase sharing no shingles — refuse against the
        # embedding ledger; same replay discipline (exclude own
        # release, release-partition overwrite appends)
        survivors, admitted_emb = _semantic_gate(
            spark,
            survivors,
            batch_id,
            semantic_ledger_path,
            semantic_threshold,
            semantic_planes_per_band,
            semantic_bands,
            embedder,
            compact_after_releases=compact_after_releases,
        )
    # materialize once: the survivor relation feeds two writes, and
    # lazily recomputing it after the ledger append would self-match
    survivors = survivors.localCheckpoint()
    (
        survivors.withColumn("release", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("release")
        .parquet(survivors_path)
    )
    append_minhash_ledger(survivors, ledger_path, release=batch_id)
    if admitted_emb is not None:
        from ..operators.dedup import append_embedding_ledger

        append_embedding_ledger(
            admitted_emb, semantic_ledger_path, release=batch_id
        )
    return survivors


def start_near_dedup_stream(
    spark: SparkSession,
    documents: DataFrame,
    ledger_path: str,
    survivors_path: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    shingle_n: int = 3,
    available_now: bool = True,
    semantic_ledger_path: str | None = None,
    semantic_threshold: float = 0.85,
    semantic_planes_per_band: int = 8,
    semantic_bands: int = 8,
    embedder=None,
    compact_after_releases: int | None = None,
) -> StreamingQuery:
    """Run continuous admission over a streaming ``documents`` relation
    (``doc_id``, ``text``, + any payload columns — e.g.
    ``streaming_corpus_from_jsonl``). Admitted documents land under
    ``{survivors_path}/release=<batch_id>/`` with all columns intact;
    their sketches extend the ledger at ``ledger_path`` for every later
    batch (and every later release of the batch pipeline — the ledger
    is the same one ``build_minhash_ledger`` serves)."""

    def _admit(batch_df: DataFrame, batch_id: int) -> None:
        # only a MATCHED binding proves an id re-use is a crash replay;
        # an adopting ledger's colliding release would silently REPLACE
        # admitted documents — _guard_ledger_binding refuses that and
        # snapshots foreign release ids at adoption, per ledger path
        binding = _guard_ledger_binding(
            spark, ledger_path, checkpoint_dir, batch_id
        )
        sem_binding = (
            _guard_ledger_binding(
                spark, semantic_ledger_path, checkpoint_dir, batch_id
            )
            if semantic_ledger_path is not None
            else "bound"
        )
        admit_batch(
            spark,
            batch_df,
            ledger_path,
            survivors_path,
            batch_id,
            threshold=threshold,
            k=k,
            bands=bands,
            shingle_n=shingle_n,
            semantic_ledger_path=semantic_ledger_path,
            semantic_threshold=semantic_threshold,
            semantic_planes_per_band=semantic_planes_per_band,
            semantic_bands=semantic_bands,
            embedder=embedder,
            compact_after_releases=compact_after_releases,
        )
        if binding == "adopting":
            _bind_checkpoint(spark, ledger_path, checkpoint_dir)
        if sem_binding == "adopting":
            _bind_checkpoint(spark, semantic_ledger_path, checkpoint_dir)

    writer = documents.writeStream.foreachBatch(_admit).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# --- image/audio asset admission: the phash-ledger front door -------------


def admit_assets_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    ledger_path: str,
    survivors_path: str,
    batch_id: int,
    grid: int = 8,
    max_hamming: int = 6,
    signal: str = "image",
    semantic_ledger_path: str | None = None,
    semantic_threshold: float = 0.9,
    semantic_planes_per_band: int = 8,
    semantic_bands: int = 8,
    asset_embedder=None,
    compact_after_releases: int | None = None,
) -> DataFrame:
    """One PERCEPTUAL admission round over an asset batch
    (``asset_id``, ``payload`` binary, + any metadata columns) —
    ``admit_batch``'s exactly-once envelope at fingerprint strength:

        1. fingerprint the batch AT THE LEDGER'S STORED GRID (meta is
           authoritative — the phash is an opaque long, so a cross-grid
           probe would be undetectably meaningless);
        2. within-batch near-dedup: banded hamming pairs → connected
           components → min-asset_id survivor;
        3. probe the persisted phash ledger, excluding ONLY
           ``release=batch_id`` (a crashed attempt's own append — the
           self-match trap, verbatim from the MinHash front door);
        4. write admitted assets to ``release=batch_id`` and append
           their fingerprints as the same release (both dynamic
           partition overwrites — a replay REPLACES its own partitions).

    Undecodable assets (``ok=false`` fingerprints) carry no perceptual
    identity and never enter the banded ledger — refusing them
    perceptually would let one corrupt byte-flip smuggle a duplicate
    past the door's OTHER strengths downstream. They admit and ship
    with the survivors so the caller's corrupt-asset policy
    (quarantine, re-fetch) sees them — ONCE per exact payload: the
    ledger's ``corrupt/`` sidecar records admitted corrupt content
    hashes, so the identical corrupt bytes re-landing in later batches
    refuse on the exact-byte gate instead of re-admitting forever
    (r11 ADVICE). Same replay discipline as every other strength
    (within-batch min-id survivor, probe excludes ``release=batch_id``,
    release-partition overwrite append).

    ``semantic_ledger_path`` adds the SEMANTIC strength (r11 verdict
    task 3): a crop or re-render moves every dHash cell boundary and
    sails past the perceptual gate, but its coarse content profile
    (``multimodal.asset_embeddings`` — block-mean luma grid for
    images, block-RMS energy for audio/video; or a caller-supplied
    frozen featurizer via ``asset_embedder``) stays cosine-near, and
    the embedding-ledger machinery the text door gates on refuses it.
    Undecodable assets yield no vector and pass (they already gate on
    exact bytes above). Refusal order: perceptual first, semantic on
    the perceptual survivors; the phash ledger appends only assets
    that passed BOTH (an asset the door refused must not gate future
    batches).

    The reference's trigger path (``filladdtrigger/main.py:5-22`` —
    new object lands → gate → index) implies exactly this operator for
    a multimodal corpus; the text side has had it since r8."""
    from ..operators import multimodal as mm
    from ..operators.dedup import (
        append_phash_ledger,
        cluster_survivors,
        init_phash_ledger,
        load_phash_ledger_meta,
        near_dedup_against_phash_ledger,
    )

    if ledger_exists(spark, ledger_path):
        meta = load_phash_ledger_meta(spark, ledger_path)
        if (grid, max_hamming, signal) != (
            meta["grid"],
            meta["max_hamming"],
            meta["signal"],
        ):
            raise ValueError(
                f"phash ledger {ledger_path} was built with "
                f"grid={meta['grid']} max_hamming={meta['max_hamming']} "
                f"signal={meta['signal']!r} but this admission passed "
                f"grid={grid} max_hamming={max_hamming} "
                f"signal={signal!r} — fingerprint geometry and modality "
                "are the ledger's identity; drop the overrides or start "
                "a new ledger path."
            )
    else:
        init_phash_ledger(
            spark,
            ledger_path,
            grid=grid,
            max_hamming=max_hamming,
            signal=signal,
        )
    _maybe_compact_ledger(
        spark, ledger_path, batch_id, compact_after_releases, "phash"
    )
    if signal == "image":
        hashes = mm.phash_assets(batch_df, grid=grid)
    else:
        if grid != 8:
            raise ValueError(
                f"{signal} admission: the energy-sign hash is 64-bit, so "
                f"the ledger must use grid=8 (64 = grid² bits); got {grid}"
            )
        if signal == "audio":
            hashes = mm.audiohash_assets(batch_df).withColumnRenamed(
                "ahash", "phash"
            )
        else:  # "video" — init_phash_ledger already refused anything else
            hashes = mm.videohash_assets(batch_df).withColumnRenamed(
                "vhash", "phash"
            )
    # materialize the fingerprints once: they feed the within-batch
    # pair join (both sides), the ledger probe, and the append
    hashes = hashes.localCheckpoint()
    # corrupt rows (no perceptual identity) gate on exact content bytes
    # instead: min-id survivor per hash within the batch, then refuse
    # hashes an EARLIER release already admitted (r11 ADVICE)
    from ..operators.dedup import (
        append_corrupt_hashes,
        corrupt_content_hashes,
        refuse_known_corrupt,
    )

    n_bad = hashes.where(~F.col("ok")).count()
    corrupt_kept = None
    if n_bad:
        bad = corrupt_content_hashes(
            batch_df.join(
                F.broadcast(hashes.where(~F.col("ok")).select("asset_id")),
                "asset_id",
                "left_semi",
            )
        )
        corrupt_kept = refuse_known_corrupt(
            spark,
            bad.groupBy("content_hash").agg(
                F.min("asset_id").alias("asset_id")
            ),
            ledger_path,
            exclude_release=batch_id,
        ).localCheckpoint()
    pairs = mm.phash_pairs(
        hashes, max_hamming=max_hamming, grid=grid
    ).select(
        F.col("asset_a").alias("doc_a"), F.col("asset_b").alias("doc_b")
    )
    kept = cluster_survivors(hashes, pairs, id_col="asset_id")
    if any(r != batch_id for r in ledger_releases(spark, ledger_path)):
        # bounded_batch=True: trigger-bounded door contract (r13)
        kept = near_dedup_against_phash_ledger(
            spark,
            kept,
            ledger_path,
            exclude_release=batch_id,
            bounded_batch=True,
        )
    if corrupt_kept is not None:
        kept = kept.where(F.col("ok")).unionByName(
            hashes.where(~F.col("ok")).join(
                F.broadcast(corrupt_kept.select("asset_id")),
                "asset_id",
                "left_semi",
            )
        )
    kept = kept.localCheckpoint()
    admitted_emb = None
    if semantic_ledger_path is not None:
        sem_candidates = batch_df.join(
            F.broadcast(kept.where(F.col("ok")).select("asset_id")),
            "asset_id",
            "left_semi",
        )
        embedder = asset_embedder or (
            lambda df: mm.asset_embeddings(df, signal=signal)
        )
        gated, admitted_emb = _semantic_gate(
            spark,
            sem_candidates,
            batch_id,
            semantic_ledger_path,
            semantic_threshold,
            semantic_planes_per_band,
            semantic_bands,
            embedder,
            id_col="asset_id",
            compact_after_releases=compact_after_releases,
        )
        # semantic refusals leave the fingerprint relation too: the
        # phash ledger appends exactly the ADMITTED assets' prints
        kept = kept.where(~F.col("ok")).unionByName(
            kept.where(F.col("ok")).join(
                F.broadcast(gated.select("asset_id")), "asset_id", "left_semi"
            )
        ).localCheckpoint()
    # kept is trigger-bounded and checkpointed (no size estimate) —
    # broadcast the semi-join probe side (r12)
    admitted = batch_df.join(
        F.broadcast(kept.select("asset_id")), "asset_id", "left_semi"
    )
    (
        admitted.withColumn("release", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("release")
        .parquet(survivors_path)
    )
    append_phash_ledger(kept, ledger_path, release=batch_id)
    if corrupt_kept is not None:
        append_corrupt_hashes(corrupt_kept, ledger_path, release=batch_id)
    if admitted_emb is not None:
        from ..operators.dedup import append_embedding_ledger

        append_embedding_ledger(
            admitted_emb, semantic_ledger_path, release=batch_id
        )
    return admitted


def start_asset_admission_stream(
    spark: SparkSession,
    assets: DataFrame,
    ledger_path: str,
    survivors_path: str,
    checkpoint_dir: str,
    grid: int = 8,
    max_hamming: int = 6,
    signal: str = "image",
    available_now: bool = True,
    semantic_ledger_path: str | None = None,
    semantic_threshold: float = 0.9,
    semantic_planes_per_band: int = 8,
    semantic_bands: int = 8,
    asset_embedder=None,
    compact_after_releases: int | None = None,
) -> StreamingQuery:
    """Continuous perceptually-gated admission over a streaming
    ``assets`` relation (``asset_id``, ``payload`` — e.g.
    ``streaming_assets_from_dir``): recompressed / lightly-edited
    copies of anything already admitted (this stream or prior batch
    releases of the same ledger) are refused; admitted assets land
    under ``{survivors_path}/release=<batch_id>/`` with all columns
    intact. ``semantic_ledger_path`` adds the embedding strength
    (crops/re-renders — see ``admit_assets_batch``). Binding,
    foreign-release refusal, and replay discipline are the MinHash
    front door's, applied to each ledger path."""

    def _admit(batch_df: DataFrame, batch_id: int) -> None:
        binding = _guard_ledger_binding(
            spark, ledger_path, checkpoint_dir, batch_id
        )
        sem_binding = (
            _guard_ledger_binding(
                spark, semantic_ledger_path, checkpoint_dir, batch_id
            )
            if semantic_ledger_path is not None
            else "bound"
        )
        admit_assets_batch(
            spark,
            batch_df,
            ledger_path,
            survivors_path,
            batch_id,
            grid=grid,
            max_hamming=max_hamming,
            signal=signal,
            semantic_ledger_path=semantic_ledger_path,
            semantic_threshold=semantic_threshold,
            semantic_planes_per_band=semantic_planes_per_band,
            semantic_bands=semantic_bands,
            asset_embedder=asset_embedder,
            compact_after_releases=compact_after_releases,
        )
        if binding == "adopting":
            _bind_checkpoint(spark, ledger_path, checkpoint_dir)
        if sem_binding == "adopting":
            _bind_checkpoint(spark, semantic_ledger_path, checkpoint_dir)

    writer = assets.writeStream.foreachBatch(_admit).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# --- composed front door: admit AND index in one exactly-once batch -------


def admit_and_index_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    ledger_path: str,
    survivors_path: str,
    index_path: str,
    checkpoint_dir: str,
    batch_id: int,
    threshold: float = 0.5,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    shingle_n: int = 3,
    min_quality: float | None = None,
    quality_filter=None,
    semantic_ledger_path: str | None = None,
    semantic_threshold: float = 0.85,
    semantic_planes_per_band: int = 8,
    semantic_bands: int = 8,
    embedder=None,
    compact_after_releases: int | None = None,
) -> None:
    """One composed round: near-dup-gate the batch against the ledger
    (``admit_batch`` — release-partition overwrites) AND fold the
    ADMITTED documents' postings into the versioned word index
    (``write_additive_delta`` — batch-keyed delta partitions). The two
    idempotence disciplines line up on the SAME batch id — release id
    and abatch id — so a replay converges on BOTH sinks:

    - admission recomputes the identical survivor set (content pinned
      by the checkpoint; the probe excludes its own release) and
      overwrites its own release partitions;
    - the index side re-overwrites its own (abatch, first) partitions,
      or no-ops at the folded_through watermark if compaction (or the
      first full build) already absorbed the batch.

    Quality gate (r9): the real front door drops low-quality documents
    BEFORE they cost a sketch or gate anyone else. ``min_quality``
    applies the heuristic composite (``text_analysis.text_features`` —
    one map-only pass over the batch); ``quality_filter`` takes any
    callable ``DataFrame -> DataFrame`` returning the surviving subset
    (e.g. a ``quality_model_pipeline`` head with FROZEN weights).
    Either must be DETERMINISTIC in document content — the replay
    recomputes the gate, and a nondeterministic filter would admit a
    different survivor set than the crashed attempt (which is why a
    per-batch retrained model does NOT belong here; train once, pass
    the frozen scorer). Rejected documents are dropped entirely: they
    do not enter the ledger, so a later higher-quality near-duplicate
    of a rejected document is still admissible.

    A crash BETWEEN the sinks is the interesting window: the replay
    redoes admission (convergent overwrite) and then lands the index
    delta exactly once — pinned by the crash-injection test. The index
    table is versioned (crash-atomic folds) and binds the same
    checkpoint as the ledger; its auto-compaction uses letter-scoped
    folds (this stream never upserts)."""
    from ..operators.index import (
        build_index,
        compact_index,
        index_exists,
        should_compact,
        write_additive_delta,
        write_index,
    )

    if quality_filter is not None:
        batch_df = quality_filter(batch_df)
    elif min_quality is not None:
        from ..operators.text_analysis import text_features

        keep = (
            text_features(batch_df)
            .where(F.col("quality") >= min_quality)
            .select("doc_id")
        )
        # keep is trigger-bounded — broadcast the semi-join probe (r12)
        batch_df = batch_df.join(F.broadcast(keep), "doc_id", "left_semi")
    survivors = admit_batch(
        spark,
        batch_df,
        ledger_path,
        survivors_path,
        batch_id,
        threshold=threshold,
        k=k,
        bands=bands,
        shingle_n=shingle_n,
        semantic_ledger_path=semantic_ledger_path,
        semantic_threshold=semantic_threshold,
        semantic_planes_per_band=semantic_planes_per_band,
        semantic_bands=semantic_bands,
        embedder=embedder,
        compact_after_releases=compact_after_releases,
    )
    corpus = survivors.select(
        F.col("doc_id").cast("string").alias("document"), "text"
    )
    if not index_exists(spark, index_path):
        # binding-before-build (versioned layout): a crash mid-build
        # leaves binding + uncommitted carcass; the replay rebuilds
        _bind_checkpoint(spark, index_path, checkpoint_dir)
        write_index(
            build_index(corpus),
            index_path,
            versioned=True,
            folded_through=batch_id,
        )
        return
    binding = _check_checkpoint_binding(spark, index_path, checkpoint_dir)
    write_additive_delta(
        spark,
        build_index(corpus),
        index_path,
        batch_id,
        allow_replayed_ids=(binding == "bound"),
    )
    if binding != "bound":
        _bind_checkpoint(spark, index_path, checkpoint_dir)
    if should_compact(spark, index_path, max_tail_ratio=1.0):
        compact_index(spark, index_path, scoped="auto")


def start_front_door_stream(
    spark: SparkSession,
    documents: DataFrame,
    ledger_path: str,
    survivors_path: str,
    index_path: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    shingle_n: int = 3,
    available_now: bool = True,
    min_quality: float | None = None,
    quality_filter=None,
    semantic_ledger_path: str | None = None,
    semantic_threshold: float = 0.85,
    semantic_planes_per_band: int = 8,
    semantic_bands: int = 8,
    embedder=None,
    compact_after_releases: int | None = None,
) -> StreamingQuery:
    """The full training-data front door as ONE stream: documents land,
    near-duplicates of anything already admitted (this stream or prior
    releases) are dropped, survivors are shipped release-partitioned
    AND their postings become queryable through the versioned word
    index — ``lookup_persisted(index_path, word)`` serves admitted
    content only. Both sinks are exactly-once under replay (see
    ``admit_and_index_batch``); fresh-checkpoint collisions refuse on
    whichever sink detects them."""

    def _admit(batch_df: DataFrame, batch_id: int) -> None:
        binding = _guard_ledger_binding(
            spark, ledger_path, checkpoint_dir, batch_id
        )
        sem_binding = (
            _guard_ledger_binding(
                spark, semantic_ledger_path, checkpoint_dir, batch_id
            )
            if semantic_ledger_path is not None
            else "bound"
        )
        admit_and_index_batch(
            spark,
            batch_df,
            ledger_path,
            survivors_path,
            index_path,
            checkpoint_dir,
            batch_id,
            threshold=threshold,
            k=k,
            bands=bands,
            shingle_n=shingle_n,
            min_quality=min_quality,
            quality_filter=quality_filter,
            semantic_ledger_path=semantic_ledger_path,
            semantic_threshold=semantic_threshold,
            semantic_planes_per_band=semantic_planes_per_band,
            semantic_bands=semantic_bands,
            embedder=embedder,
            compact_after_releases=compact_after_releases,
        )
        if binding == "adopting":
            _bind_checkpoint(spark, ledger_path, checkpoint_dir)
        if sem_binding == "adopting":
            _bind_checkpoint(spark, semantic_ledger_path, checkpoint_dir)

    writer = documents.writeStream.foreachBatch(_admit).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
