"""Oracle registry for operators added AFTER the driver's 50-row gate
filled up.

The gate dict is frozen at 50 entries (driver contract) and churn was
flagged as a risk in round-2 review, so new operators get their oracle
evidence here instead: ``tools/check_oracle.py --with-retired`` folds
these in next to the retired registry, and the per-round
``CORRECTNESS_full_r{N}.json`` artifact records their verdicts.
Same contract as the gate: Spark fn + DuckDB twin, aliased columns
matching on both sides.
"""

from __future__ import annotations

import os
import sys
from typing import Callable

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession

import __spark_entry__ as entrymod
from map_reduce_using_cloud_functions_spark.operators import dedup as dd
from map_reduce_using_cloud_functions_spark.operators import multimodal as mm
from map_reduce_using_cloud_functions_spark.operators import semdedup as sdd
from map_reduce_using_cloud_functions_spark.operators import similarity as sim
from map_reduce_using_cloud_functions_spark.operators import prep as pp
from map_reduce_using_cloud_functions_spark.operators import text_analysis as ta
from map_reduce_using_cloud_functions_spark.plans import events as ev
from map_reduce_using_cloud_functions_spark.plans import relational as rel
from map_reduce_using_cloud_functions_spark.sources import load_table, load_tables


def extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "order_grouping_sets": lambda s, d: rel.order_grouping_sets(load_tables(s, d)),
        "map_function_sampler": lambda s, d: rel.map_function_sampler(load_tables(s, d)),
        "events_unpivot": lambda s, d: rel.events_unpivot(load_table(s, d, "events")),
        "dedup_duplicate_spans": lambda s, d: dd.duplicate_spans(
            load_table(s, d, "documents")
        ),
        "dedup_span_stats": lambda s, d: dd.duplicate_span_stats(
            load_table(s, d, "documents")
        ),
        "text_repetition_flags": lambda s, d: ta.repetition_flags(
            load_table(s, d, "documents")
        ),
        "corpus_mix_report": lambda s, d: ta.corpus_report(
            load_table(s, d, "documents")
        ),
        "text_unigram_logprob": lambda s, d: ta.unigram_logprob(
            load_table(s, d, "documents")
        ),
        "text_bigram_logprob": lambda s, d: ta.bigram_logprob(
            load_table(s, d, "documents")
        ),
        "corpus_split_assignment": lambda s, d: pp.assign_splits(
            load_table(s, d, "documents")
        ).select("doc_id", "split"),
        "events_retention_cohorts": lambda s, d: ev.user_retention(
            load_table(s, d, "events")
        ),
        # r5: banded multi-probe LSH top-k (retrieval-regime LSH)
        "ann_topk_lsh_banded": lambda s, d: sim.lsh_banded_topk(
            load_table(s, d, "embeddings"),
            sim.queries_from_ids(load_table(s, d, "embeddings"), 8),
        ),
        # r6: persisted-index serving paths — same answers as their
        # in-plan twins, plus the write/read/prune machinery under oracle
        "index_lookup_persisted": _q_index_lookup_persisted,
        "index_lookup_versioned": _q_index_lookup_versioned,
        # r9: takedown — scoped tombstone fold purges base AND tail
        "index_lookup_after_delete": _q_index_lookup_after_delete,
        "ann_topk_ivf_indexed": _q_ann_topk_ivf_indexed,
        # r7: persisted banded-LSH serving path — identical answers to
        # the in-plan ann_topk_lsh_banded at the index's parameters
        "ann_topk_lsh_indexed": _q_ann_topk_lsh_indexed,
        # r7: index-maintenance appends — build on half the corpus,
        # append the rest, probe. LSH appends are provably exact (the
        # sketch is corpus-independent), so the full-build oracle
        # applies untouched; IVF appends freeze build-time centroids,
        # so the oracle seeds centroids from the BUILD half only.
        "ann_topk_lsh_appended": _q_ann_topk_lsh_appended,
        "ann_topk_ivf_appended": _q_ann_topk_ivf_appended,
        # r7: cross-release near-dup ledger (dedup_against_reference's
        # sibling at MinHash strength) — ledger holds even doc_ids,
        # the odd half probes it; the twin is the joint-corpus sketch
        # restricted to even×odd pairs.
        "dedup_ledger_pairs": _q_dedup_ledger_pairs,
        "dedup_ledger_survivors": _q_dedup_ledger_survivors,
        # r9: the semantic (embedding-cosine) admission ledger — the
        # third gating strength; same even/odd split, twin = the joint
        # pairwise sketch restricted to cross-split pairs (hyperplanes
        # are corpus-independent, so ledger probe ≡ joint sketch).
        "embedding_ledger_pairs": _q_embedding_ledger_pairs,
        "embedding_ledger_survivors": _q_embedding_ledger_survivors,
        # r9: sketch statistics (operators/sketches.py) — bounded-state
        # distinct estimation and deterministic hash-sampled quantiles;
        # the DuckDB twins are generated by the same module so the
        # hash, the exact integer sum, and the one trailing double
        # division stay alignment-proof
        "corpus_vocab_sketch": _q_corpus_vocab_sketch,
        "distinct_custkeys_sketch": _q_distinct_custkeys_sketch,
        "sampled_price_percentiles": _q_sampled_price_percentiles,
        # r7: time travel over the versioned commit log — snapshot
        # reads serve any surviving commit byte-identically; the diff
        # is one full-outer join of two immutable snapshots.
        "index_snapshot_v0": _q_index_snapshot_v0,
        "index_version_diff": _q_index_version_diff,
        # r7: SemDeDup (arXiv:2303.09540) — embedding-space near-dup
        # pruning: seeded-centroid clustering, within-cluster cosine,
        # keep the lowest-centroid-sim member of each duplicate pair.
        # Seeded (train=False) is the oracle-replayed configuration.
        "semdedup_pairs": lambda s, d: sdd.semdedup_pairs(
            load_table(s, d, "embeddings")
        ).select("list_id", "vec_a", "vec_b", "score"),
        "semdedup_survivors": lambda s, d: sdd.semdedup_survivors(
            load_table(s, d, "embeddings")
        ),
        # r8: persisted assignment (build_semdedup_index) — the argmax
        # amortizes across threshold re-runs; stored seeded centroids
        # replay identically, so the in-plan oracle applies untouched.
        "semdedup_pairs_indexed": _q_semdedup_pairs_indexed,
        "semdedup_survivors_indexed": _q_semdedup_survivors_indexed,
        # r9: incremental assignment appends (frozen build-half
        # centroids — the IVF append rule applied to SemDeDup)
        "semdedup_survivors_appended": _q_semdedup_survivors_appended,
        # r7: product quantization (Jégou et al. 2011) — exhaustive ADC
        # top-k over the 32x-compressed corpus; seeded codebooks are
        # the oracle-replayed configuration.
        "ann_topk_pq": _q_ann_topk_pq,
        # persisted PQ index: indexed ≡ in-plan (same oracle); appends
        # are exact by construction with build-half seeds (same rule as
        # the LSH/IVF appended rows).
        "ann_topk_pq_indexed": _q_ann_topk_pq_indexed,
        "ann_topk_pq_appended": _q_ann_topk_pq_appended,
        # packed-BIGINT codes layout: one 24-byte logical row per
        # vector; answers bit-identical to the array layout (same
        # oracle).
        "ann_topk_pq_packed": _q_ann_topk_pq_packed,
        # r8: the composed IVF-PQ family (FAISS-IVFPQ shape) — coarse
        # routing restricts WHICH rows score, ADC decides the scores;
        # the twin is the PQ pipeline with the candidate set gated by
        # the IVF routing CTEs. Indexed ≡ in-plan (same oracle);
        # appended seeds centroids AND codebooks from the build half.
        "ann_topk_ivfpq": _q_ann_topk_ivfpq,
        "ann_topk_ivfpq_indexed": _q_ann_topk_ivfpq_indexed,
        "ann_topk_ivfpq_appended": _q_ann_topk_ivfpq_appended,
        # r9: residual encoding (the FAISS IVFPQ default) — codes
        # quantize v − centroid(list); the twin replays the residual
        # relation, residual-seeded books, and the qc + ADC score.
        "ann_topk_ivfpq_residual": _q_ann_topk_ivfpq_residual,
        "ann_topk_ivfpq_residual_indexed": _q_ann_topk_ivfpq_residual_indexed,
        # r7: CCNet-style cross-corpus boilerplate removal — drop
        # segments whose trimmed form appears in >= min_df distinct
        # docs, rejoin survivors in order. Fixture texts are one line,
        # so the judged configuration strips at WORD granularity
        # (sep=' ', df >= half the corpus) — the full count/remove/
        # reassemble path under oracle.
        "corpus_boilerplate_strip": lambda s, d: pp.strip_boilerplate_lines(
            load_table(s, d, "documents").select("doc_id", "text"),
            min_df=250,
            sep=" ",
        ),
        # r10: perceptual image near-dup (X5) — REAL PNG encode →
        # decode → unfilter → dHash → banded hamming pairs; the twin
        # replays the hash from the pixels (= the text bytes, PNG is
        # lossless), so any codec bug breaks the hash match.
        "multimodal_phash_pairs": _q_multimodal_phash_pairs,
        # r10: the image-side admission ledger — cross-release
        # perceptual gating (build two releases, probe with a third
        # batch; EXACT vs the all-pairs twin by the pigeonhole property)
        "multimodal_phash_ledger_pairs": _q_multimodal_phash_ledger_pairs,
        # r10: the SCALE-SAFE configs of the two judged fixed-resolution
        # rows (r9 verdict task 2) — the configurations a 100 TB run
        # would actually use, pinned so a regression in exactly that
        # path is visible. k ∝ n (resolution tracks corpus growth) and
        # the r=8,b=8 production banding at a production threshold.
        "semdedup_survivors_scaled": _q_semdedup_survivors_scaled,
        "dedup_embedding_pairs_production": _q_dedup_embedding_pairs_production,
        # r11: the audio fingerprint family (X5, third modality) —
        # REAL WAV encode → PCM decode → energy-sign hash → banded
        # hamming pairs; the twin replays the hash from the samples
        # (= the text bytes, PCM is lossless), so any codec bug breaks
        # the hash match. The ledger row runs the same cross-release
        # split as the image phash ledger row, on the shared machinery
        # (signal="audio" meta flavor).
        "multimodal_audiohash_pairs": _q_multimodal_audiohash_pairs,
        "multimodal_audiohash_ledger_pairs": _q_multimodal_audiohash_ledger_pairs,
        # r12: the video fingerprint family (X5, fourth modality) —
        # REAL YUV4MPEG2 encode → frame decode → temporal energy-sign
        # hash → banded hamming pairs; the twin replays the hash from
        # the frames (= the text bytes, y4m planes are uncompressed),
        # so any codec bug breaks the hash match. The ledger row runs
        # the same cross-release split as the image/audio rows on the
        # shared machinery (signal="video" meta flavor).
        "multimodal_videohash_pairs": _q_multimodal_videohash_pairs,
        "multimodal_videohash_ledger_pairs": _q_multimodal_videohash_ledger_pairs,
        # r12: the asset door's SEMANTIC strength featurizer — the
        # mean-centered block-mean luma grid computed from REAL decoded
        # PNG pixels; the twin replays it from the text bytes with an
        # ORDER-PINNED list sum (the centering mean must add cells in
        # the same row-major order the engine does, or last-ulp drift
        # leaks through the rounding).
        "multimodal_image_embeddings": _q_multimodal_image_embeddings,
    }


def _scaled_semdedup_k(n: int) -> int:
    """The guard-named scale-safe SemDeDup resolution: cluster count
    grows with the corpus (k = n/250 caps the expected cluster at ~250
    vectors so within-cluster pair volume stays flat as n grows — the
    configuration BASELINE r9 measured at 15.4 s on the sf1 tree where
    fixed k=8 ran 79.7 s), floored at the judged fixture's k=8 and
    capped at 96 — the seeded-centroid rule hashes vec_id into 97
    slots, so more than 96 centroids would need the trained path."""
    return max(8, min(96, n // 250))


def _q_multimodal_phash_pairs(s: SparkSession, d: str) -> DataFrame:
    """Perceptual near-dup over real PNGs derived from the documents
    fixture: encode (lossless) → real decode (stdlib or PIL) → dHash →
    banded hamming pairs via the shared SimHash pigeonhole engine."""
    docs = load_table(s, d, "documents")
    # materialize the fingerprints ONCE: both sides of the banded
    # self-join read this relation, and an uncached lineage would
    # re-run the full mapInPandas decode chain twice (r11 verdict
    # efficiency note — the production door already persists,
    # streaming/near_dedup.py admit_assets_batch)
    hashes = mm.phash_assets(mm.build_png_assets(docs)).localCheckpoint()
    return mm.phash_pairs(hashes, max_hamming=6)


def _q_multimodal_phash_ledger_pairs(s: SparkSession, d: str) -> DataFrame:
    """The perceptual-hash admission ledger end to end: fingerprints of
    the doc_id%3∈{0,1} assets persist as two ledger releases, the
    %3==2 batch probes. The probe is EXACT (pigeonhole bands certify
    every pair within the stored max_hamming), so the twin is the
    plain cross-release hamming join over the replayed hashes."""
    import tempfile

    from map_reduce_using_cloud_functions_spark.operators import dedup as ddm

    docs = load_table(s, d, "documents")
    hashes = mm.phash_assets(mm.build_png_assets(docs)).localCheckpoint()
    path = tempfile.mkdtemp(prefix="oracle_phled_") + "/led"
    ddm.build_phash_ledger(hashes.where("asset_id % 3 = 0"), path, release=0)
    ddm.append_phash_ledger(hashes.where("asset_id % 3 = 1"), path, release=1)
    return ddm.ledger_phash_pairs(s, hashes.where("asset_id % 3 = 2"), path)


def _q_multimodal_audiohash_pairs(s: SparkSession, d: str) -> DataFrame:
    """Audio near-dup over real WAV clips derived from the documents
    fixture: encode (lossless 8-bit PCM) → stdlib wave decode →
    energy-sign hash → banded hamming pairs via the shared pigeonhole
    engine."""
    docs = load_table(s, d, "documents")
    # one decode chain for both sides of the banded self-join — see
    # _q_multimodal_phash_pairs
    hashes = mm.audiohash_assets(mm.build_wav_assets(docs)).localCheckpoint()
    return mm.audiohash_pairs(hashes, max_hamming=6)


def _q_multimodal_audiohash_ledger_pairs(s: SparkSession, d: str) -> DataFrame:
    """The audio admission ledger end to end on the shared phash-ledger
    machinery (signal="audio"): fingerprints of the doc_id%3∈{0,1}
    clips persist as two releases, the %3==2 batch probes. EXACT by
    the pigeonhole property, so the twin is the plain cross-release
    hamming join over replayed hashes."""
    import tempfile

    docs = load_table(s, d, "documents")
    hashes = (
        mm.audiohash_assets(mm.build_wav_assets(docs))
        .withColumnRenamed("ahash", "phash")
        .localCheckpoint()
    )
    path = tempfile.mkdtemp(prefix="oracle_ahled_") + "/led"
    dd.build_phash_ledger(
        hashes.where("asset_id % 3 = 0"), path, release=0, signal="audio"
    )
    dd.append_phash_ledger(hashes.where("asset_id % 3 = 1"), path, release=1)
    return dd.ledger_phash_pairs(s, hashes.where("asset_id % 3 = 2"), path)


def _q_multimodal_videohash_pairs(s: SparkSession, d: str) -> DataFrame:
    """Video near-dup over real y4m clips derived from the documents
    fixture: encode (uncompressed mono planes) → stdlib frame decode →
    temporal energy-sign hash → banded hamming pairs via the shared
    pigeonhole engine. One decode chain for both sides of the self-join
    (see _q_multimodal_phash_pairs)."""
    docs = load_table(s, d, "documents")
    hashes = mm.videohash_assets(mm.build_y4m_assets(docs)).localCheckpoint()
    return mm.videohash_pairs(hashes, max_hamming=6)


def _q_multimodal_videohash_ledger_pairs(s: SparkSession, d: str) -> DataFrame:
    """The video admission ledger end to end on the shared phash-ledger
    machinery (signal="video"): fingerprints of the doc_id%3∈{0,1}
    clips persist as two releases, the %3==2 batch probes. EXACT by
    the pigeonhole property, so the twin is the plain cross-release
    hamming join over replayed hashes."""
    import tempfile

    docs = load_table(s, d, "documents")
    hashes = (
        mm.videohash_assets(mm.build_y4m_assets(docs))
        .withColumnRenamed("vhash", "phash")
        .localCheckpoint()
    )
    path = tempfile.mkdtemp(prefix="oracle_vhled_") + "/led"
    dd.build_phash_ledger(
        hashes.where("asset_id % 3 = 0"), path, release=0, signal="video"
    )
    dd.append_phash_ledger(hashes.where("asset_id % 3 = 1"), path, release=1)
    return dd.ledger_phash_pairs(s, hashes.where("asset_id % 3 = 2"), path)


def _q_multimodal_image_embeddings(s: SparkSession, d: str) -> DataFrame:
    """The asset semantic-gate featurizer over real PNGs: encode →
    decode → 4x4 mean-centered block-mean luma grid. Rounded to 6
    decimals in BOTH engines (the only float boundary; block means and
    the ordered centering sum are bit-identical doubles)."""
    import pyspark.sql.functions as F

    docs = load_table(s, d, "documents")
    emb = mm.asset_embeddings(mm.build_png_assets(docs), signal="image")
    # + 0.0 normalizes signed zeros: a centered value one ulp either
    # side of 0 rounds to +0.0 here and -0.0 there (found at sf1), and
    # canon stringifies ARRAY elements verbatim — so both engines add
    # 0.0 after the round (IEEE: -0.0 + 0.0 = +0.0, others unchanged)
    return emb.select(
        "asset_id",
        F.transform(
            "embedding", lambda x: F.round(x, 6) + F.lit(0.0)
        ).alias("embedding"),
    )


def _q_semdedup_survivors_scaled(s: SparkSession, d: str) -> DataFrame:
    """semdedup_survivors at the SCALE-SAFE resolution (k ∝ n): one
    bounded count picks k, everything else is the judged plan. At the
    fixture SFs this lands on the same k=8 (the floor); at sf1 it is
    k=80 — the config BASELINE.md measured at 15.4 s where the judged
    fixed-k row runs 79.7 s."""
    emb = load_table(s, d, "embeddings")
    k = _scaled_semdedup_k(emb.count())
    return sdd.semdedup_survivors(emb, n_clusters=k)


def _q_dedup_embedding_pairs_production(s: SparkSession, d: str) -> DataFrame:
    """pairwise_near_dup at the PRODUCTION banding (r=8, b=8, τ=0.8 —
    similarity.py's documented production regime). The fixture has no
    pairs at τ≥0.6, so the query plants deterministic near-duplicates:
    every 25th vector gets a ±0.05 alternating-sign perturbation clone
    (cos ≈ 0.92 to its original — above τ, far from every other
    vector), computable identically by the SQL twin. Pairs are what
    the production banding FINDS (its ~4% per-pair miss at cos 0.92 is
    the documented recall contract, replayed identically by the twin)."""
    import pyspark.sql.functions as F

    emb = load_table(s, d, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    clones = emb.where("vec_id % 25 = 0").select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x
            + F.when(i % 2 == 0, F.lit(0.05)).otherwise(F.lit(-0.05)),
        ).alias("embedding"),
    )
    corpus = emb.unionByName(clones)
    return sim.pairwise_near_dup(
        corpus, threshold=0.8, planes_per_band=8, bands=8
    )


def _q_index_lookup_persisted(s: SparkSession, d: str) -> DataFrame:
    """Gate row index_lookup's probe served through the PERSISTED path:
    write_index to disk, then lookup_persisted (first-letter partition
    pruning + pending-delta fold). Same oracle SQL as index_lookup —
    persistence must not change answers."""
    import tempfile

    from map_reduce_using_cloud_functions_spark.operators import index as ix
    from map_reduce_using_cloud_functions_spark.sources.text_corpus import (
        documents_as_corpus,
    )

    path = tempfile.mkdtemp(prefix="oracle_idx_") + "/idx"
    ix.write_index(
        ix.build_index(documents_as_corpus(load_table(s, d, "documents"))), path
    )
    return ix.lookup_persisted(s, path, "The!")


def _q_index_lookup_versioned(s: SparkSession, d: str) -> DataFrame:
    """The same probe on the r6 VERSIONED layout, exercised the hard
    way: versioned base build from docs < 300, the rest arrives as a
    streaming-style additive delta, a compaction folds it (new version
    + folded_through watermark), and the batch is REPLAYED after the
    fold (must be a no-op). The final lookup must equal index_lookup's
    oracle over the full corpus — layout and lifecycle must not change
    answers."""
    import tempfile

    import pyspark.sql.functions as F

    from map_reduce_using_cloud_functions_spark.operators import index as ix
    from map_reduce_using_cloud_functions_spark.sources.text_corpus import (
        documents_as_corpus,
    )

    corpus = documents_as_corpus(load_table(s, d, "documents"))
    path = tempfile.mkdtemp(prefix="oracle_idxv_") + "/idx"
    ix.write_index(
        ix.build_index(corpus.where(F.col("document").cast("bigint") < 300)),
        path,
        versioned=True,
    )
    delta = ix.build_index(
        corpus.where(F.col("document").cast("bigint") >= 300)
    )
    ix.write_additive_delta(s, delta, path, batch_id=1)
    ix.compact_index(s, path)
    # the replay of the just-folded batch must be a watermark no-op
    # (allow_replayed_ids is the streaming checkpoint path's assertion;
    # without it the same call raises — pinned by test_index)
    ix.write_additive_delta(s, delta, path, batch_id=1, allow_replayed_ids=True)
    return ix.lookup_persisted(s, path, "The!")


def _mk_versioned_two_commits(s: SparkSession, d: str) -> str:
    """v=0 holds the index of doc_id < 300; v=1 the full corpus —
    the fixture for the time-travel twins."""
    import tempfile

    import pyspark.sql.functions as F

    from map_reduce_using_cloud_functions_spark.operators import index as ix
    from map_reduce_using_cloud_functions_spark.sources.text_corpus import (
        documents_as_corpus,
    )

    corpus = documents_as_corpus(load_table(s, d, "documents"))
    path = tempfile.mkdtemp(prefix="oracle_tt_") + "/idx"
    ix.write_index(
        ix.build_index(corpus.where(F.col("document").cast("bigint") < 300)),
        path,
        versioned=True,
    )
    ix.write_index(ix.build_index(corpus), path)
    return path


def _q_index_snapshot_v0(s: SparkSession, d: str) -> DataFrame:
    """read_index_at(0) after a v=1 full rebuild must serve the doc<300
    index byte-identically — the twin is the postings CTE restricted to
    doc_id < 300."""
    from map_reduce_using_cloud_functions_spark.operators import index as ix

    return ix.read_index_at(s, _mk_versioned_two_commits(s, d), 0)


def _q_index_version_diff(s: SparkSession, d: str) -> DataFrame:
    """index_diff(0, 1) on that fixture is pure inserts: every posting
    of doc_id >= 300 with count_from=0 (doc<300 postings are identical
    in both commits, and (word, document) keys never cross the split)."""
    from map_reduce_using_cloud_functions_spark.operators import index as ix

    return ix.index_diff(s, _mk_versioned_two_commits(s, d), 0, 1)


def _q_index_lookup_after_delete(s: SparkSession, d: str) -> DataFrame:
    """r9 takedown row: versioned base + a PENDING additive delta, then
    delete_documents removes every doc_id ≡ 3 (mod 10) — the
    letter-scoped tombstone fold must purge the documents from the base
    AND the tail (a pending delta row left behind would resurrect them
    at the next compaction). The probe equals index_lookup's oracle
    filtered by the same predicate."""
    import tempfile

    import pyspark.sql.functions as F

    from map_reduce_using_cloud_functions_spark.operators import index as ix
    from map_reduce_using_cloud_functions_spark.sources.text_corpus import (
        documents_as_corpus,
    )

    corpus = documents_as_corpus(load_table(s, d, "documents"))
    path = tempfile.mkdtemp(prefix="oracle_idxdel_") + "/idx"
    ix.write_index(
        ix.build_index(corpus.where(F.col("document").cast("bigint") < 300)),
        path,
        versioned=True,
    )
    ix.write_additive_delta(
        s,
        ix.build_index(corpus.where(F.col("document").cast("bigint") >= 300)),
        path,
        batch_id=1,
    )
    doomed = [
        r["document"]
        for r in corpus.select("document")
        .where(F.col("document").cast("bigint") % 10 == 3)
        .distinct()
        .collect()
    ]
    ix.delete_documents(s, path, doomed)
    return ix.lookup_persisted(s, path, "The!")


def _q_ann_topk_pq(s: SparkSession, d: str) -> DataFrame:
    """Exhaustive ADC top-k over the PQ-compressed corpus (m=8
    subspaces, k=16 seeded codewords): codes + reconstruction norms on
    the corpus side, per-query lookup tables, reconstruction-cosine
    ranking — the DuckDB twin replays the whole pipeline (slice →
    argmin by <x,c>−|c|²/2 → subspace-ordered folds)."""
    from map_reduce_using_cloud_functions_spark.operators import pq

    emb = load_table(s, d, "embeddings")
    books = pq.train_pq_codebooks(emb, m=8, k=16)
    return pq.pq_topk(pq.pq_encode(emb, books), books, sim.queries_from_ids(emb, 8))


def _q_ann_topk_pq_indexed(s: SparkSession, d: str) -> DataFrame:
    """ann_topk_pq served from a persisted build_pq_index — the index
    amortizes encoding across query batches, it must not change
    answers (same oracle SQL)."""
    import tempfile

    from map_reduce_using_cloud_functions_spark.operators import pq

    emb = load_table(s, d, "embeddings")
    path = tempfile.mkdtemp(prefix="oracle_pq_") + "/pq"
    pq.build_pq_index(emb, path, m=8, k=16)
    return pq.pq_topk_indexed(s, path, sim.queries_from_ids(emb, 8))


def _q_ann_topk_pq_appended(s: SparkSession, d: str) -> DataFrame:
    """build_pq_index on even vec_ids + append_pq_index of the odds.
    PQ appends are exact by construction (codewords are stored
    parameters), so the twin is the full pipeline with codebooks
    seeded from the BUILD half only."""
    import tempfile

    import pyspark.sql.functions as F

    from map_reduce_using_cloud_functions_spark.operators import pq

    emb = load_table(s, d, "embeddings")
    path = tempfile.mkdtemp(prefix="oracle_pqa_") + "/pq"
    pq.build_pq_index(emb.where(F.col("vec_id") % 2 == 0), path, m=8, k=16)
    pq.append_pq_index(emb.where(F.col("vec_id") % 2 == 1), path)
    return pq.pq_topk_indexed(s, path, sim.queries_from_ids(emb, 8))


def _q_ann_topk_pq_packed(s: SparkSession, d: str) -> DataFrame:
    """ann_topk_pq on the packed-BIGINT codes layout (build_pq_index
    packed=True): layout must not change answers — Horner-packed codes
    unpack by shift-and-mask and the ADC adds run in the same order."""
    import tempfile

    from map_reduce_using_cloud_functions_spark.operators import pq

    emb = load_table(s, d, "embeddings")
    path = tempfile.mkdtemp(prefix="oracle_pqp_") + "/pq"
    pq.build_pq_index(emb, path, m=8, k=16, packed=True)
    return pq.pq_topk_indexed(s, path, sim.queries_from_ids(emb, 8))


def _q_semdedup_pairs_indexed(s: SparkSession, d: str) -> DataFrame:
    """semdedup_pairs served from the persisted assignment (same
    oracle as the in-plan row — stored seeded centroids replay
    identically)."""
    import tempfile

    emb = load_table(s, d, "embeddings")
    path = tempfile.mkdtemp(prefix="oracle_sddp_") + "/sdd"
    sdd.build_semdedup_index(emb, path, n_clusters=8)
    return sdd.semdedup_pairs_indexed(s, path).select(
        "list_id", "vec_a", "vec_b", "score"
    )


def _q_semdedup_survivors_indexed(s: SparkSession, d: str) -> DataFrame:
    """semdedup_survivors served from a persisted build_semdedup_index
    (seeded centroids — the oracle-replayable configuration): the
    stored assignment must serve the same survivors as the in-plan
    argmax (same oracle SQL)."""
    import tempfile

    emb = load_table(s, d, "embeddings")
    path = tempfile.mkdtemp(prefix="oracle_sdd_") + "/sdd"
    sdd.build_semdedup_index(emb, path, n_clusters=8)
    return sdd.semdedup_survivors_indexed(s, path)


def _q_ann_topk_ivfpq(s: SparkSession, d: str) -> DataFrame:
    """In-plan FAISS-IVFPQ composition: coarse routing (8 seeded
    centroids, 2 probes) + ADC scoring of only the probed candidates
    (m=8, k=16 seeded codewords). The twin composes the ann_topk_pq
    pipeline with ann_topk_ivf's routing CTEs."""
    from map_reduce_using_cloud_functions_spark.operators import pq

    emb = load_table(s, d, "embeddings")
    return pq.ivf_pq_topk(emb, sim.queries_from_ids(emb, 8))


def _q_ann_topk_ivfpq_indexed(s: SparkSession, d: str) -> DataFrame:
    """ann_topk_ivfpq served through a persisted build_ivf_pq_index:
    partition-pruned list scan + broadcast-LUT ADC — the serving shape
    must not change answers (same oracle SQL)."""
    import tempfile

    from map_reduce_using_cloud_functions_spark.operators import pq

    emb = load_table(s, d, "embeddings")
    path = tempfile.mkdtemp(prefix="oracle_ivfpq_") + "/ivfpq"
    pq.build_ivf_pq_index(emb, path, n_centroids=8, m=8, k=16)
    return pq.ivf_pq_topk_indexed(s, path, sim.queries_from_ids(emb, 8))


def _q_ann_topk_ivfpq_appended(s: SparkSession, d: str) -> DataFrame:
    """build_ivf_pq_index on even vec_ids + append of the odds: both
    frozen artifacts (centroids, codebooks) come from the build half,
    so the twin restricts BOTH seed sources to even ids; the appended
    rows themselves are exact by construction."""
    import tempfile

    import pyspark.sql.functions as F

    from map_reduce_using_cloud_functions_spark.operators import pq

    emb = load_table(s, d, "embeddings")
    path = tempfile.mkdtemp(prefix="oracle_ivfpqa_") + "/ivfpq"
    pq.build_ivf_pq_index(emb.where(F.col("vec_id") % 2 == 0), path, n_centroids=8, m=8, k=16)
    pq.append_ivf_pq_index(emb.where(F.col("vec_id") % 2 == 1), path)
    return pq.ivf_pq_topk_indexed(s, path, sim.queries_from_ids(emb, 8))


def _q_semdedup_survivors_appended(s: SparkSession, d: str) -> DataFrame:
    """SemDeDup assignment built on even vec_ids + the odds appended
    against the FROZEN centroids: survivors must equal the joint
    in-plan run with centroids seeded from the build half (the IVF
    appended-row twin rule)."""
    import tempfile

    import pyspark.sql.functions as F

    emb = load_table(s, d, "embeddings")
    path = tempfile.mkdtemp(prefix="oracle_sdda_") + "/sdd"
    sdd.build_semdedup_index(emb.where(F.col("vec_id") % 2 == 0), path, n_clusters=8)
    sdd.append_semdedup_index(emb.where(F.col("vec_id") % 2 == 1), path)
    return sdd.semdedup_survivors_indexed(s, path)


def _q_ann_topk_ivfpq_residual(s: SparkSession, d: str) -> DataFrame:
    """In-plan IVF-PQ with RESIDUAL encoding (Jégou et al. §IV — the
    FAISS IVFPQ default): codes quantize v − centroid(list); scores add
    the <q, centroid> first-order term back. Seeded configuration
    (8 coarse slots, residual-seeded m=8/k=16 books) so the DuckDB twin
    replays the full pipeline."""
    from map_reduce_using_cloud_functions_spark.operators import pq

    emb = load_table(s, d, "embeddings")
    return pq.ivf_pq_topk(emb, sim.queries_from_ids(emb, 8), residual=True)


def _q_ann_topk_ivfpq_residual_indexed(s: SparkSession, d: str) -> DataFrame:
    """The persisted residual index must serve the in-plan residual
    answers (same oracle SQL): meta.residual routes the probe to the
    qc + ADC scoring path over the identical partition-pruned scan."""
    import tempfile

    from map_reduce_using_cloud_functions_spark.operators import pq

    emb = load_table(s, d, "embeddings")
    path = tempfile.mkdtemp(prefix="oracle_ivfpqr_") + "/ivfpqr"
    pq.build_ivf_pq_index(emb, path, n_centroids=8, m=8, k=16, residual=True)
    return pq.ivf_pq_topk_indexed(s, path, sim.queries_from_ids(emb, 8))


def _q_ann_topk_ivf_indexed(s: SparkSession, d: str) -> DataFrame:
    """Gate row ann_topk_ivf's query batch served through a persisted
    build_ivf_index (hash-seed centroids — the oracle-replayable
    configuration; cosine casts elements to double, so the index's
    array<double> centroid storage is value-identical to the in-plan
    float seeds). Same oracle SQL as ann_topk_ivf."""
    import tempfile

    emb = load_table(s, d, "embeddings")
    path = tempfile.mkdtemp(prefix="oracle_ivf_") + "/ivf"
    sim.build_ivf_index(emb, path, n_centroids=8)
    return sim.ivf_topk_indexed(s, path, sim.queries_from_ids(emb, 8))


def _q_ann_topk_lsh_indexed(s: SparkSession, d: str) -> DataFrame:
    """Gate-extras row ann_topk_lsh_banded's query batch served through
    a persisted build_lsh_index (r6 verdict task 4): sketch parameters
    (r=6, b=6) and probe (1 bit) match the in-plan row, so the same
    oracle SQL applies — the index amortizes the corpus sketch, it must
    not change answers."""
    import tempfile

    emb = load_table(s, d, "embeddings")
    path = tempfile.mkdtemp(prefix="oracle_lsh_") + "/lsh"
    sim.build_lsh_index(emb, path)
    return sim.lsh_banded_topk_indexed(s, path, sim.queries_from_ids(emb, 8))


def _q_ann_topk_lsh_appended(s: SparkSession, d: str) -> DataFrame:
    """build_lsh_index on even vec_ids + append_lsh_index of the odds,
    probed like ann_topk_lsh_banded. The hyperplanes are functions of
    the stored parameters alone, so the appended index must be
    answer-identical to a full build — the oracle is the unmodified
    ann_topk_lsh_banded SQL."""
    import tempfile

    import pyspark.sql.functions as F

    emb = load_table(s, d, "embeddings")
    path = tempfile.mkdtemp(prefix="oracle_lsha_") + "/lsh"
    sim.build_lsh_index(emb.where(F.col("vec_id") % 2 == 0), path)
    sim.append_lsh_index(emb.where(F.col("vec_id") % 2 == 1), path)
    return sim.lsh_banded_topk_indexed(s, path, sim.queries_from_ids(emb, 8))


def _q_ann_topk_ivf_appended(s: SparkSession, d: str) -> DataFrame:
    """build_ivf_index on even vec_ids + append_ivf_index of the odds.
    Centroids are frozen at build (FAISS add contract), so the oracle
    is the ann_topk_ivf SQL with its centroid seeding restricted to
    the even half — corpus assignment still covers everything."""
    import tempfile

    import pyspark.sql.functions as F

    emb = load_table(s, d, "embeddings")
    path = tempfile.mkdtemp(prefix="oracle_ivfa_") + "/ivf"
    sim.build_ivf_index(emb.where(F.col("vec_id") % 2 == 0), path, n_centroids=8)
    sim.append_ivf_index(emb.where(F.col("vec_id") % 2 == 1), path)
    return sim.ivf_topk_indexed(s, path, sim.queries_from_ids(emb, 8))


def _q_dedup_ledger_pairs(s: SparkSession, d: str) -> DataFrame:
    """Near-dup ledger probe: ledger = even doc_ids, batch = odd.
    Must equal the joint-corpus minhash pairs restricted to cross-split
    pairs (the sketch is corpus-independent — probing a persisted
    ledger IS the joint sketch, pinned here against DuckDB)."""
    import tempfile

    import pyspark.sql.functions as F
    from map_reduce_using_cloud_functions_spark.operators import dedup as ddm

    docs = load_table(s, d, "documents")
    path = tempfile.mkdtemp(prefix="oracle_led_") + "/led"
    ddm.build_minhash_ledger(docs.where(F.col("doc_id") % 2 == 0), path)
    return ddm.ledger_near_dup_pairs(
        s, docs.where(F.col("doc_id") % 2 == 1), path, threshold=0.25
    )


def _q_dedup_ledger_survivors(s: SparkSession, d: str) -> DataFrame:
    """The survivor face of the same probe: odd docs that are NOT a
    near-dup of any even (ledger) doc at the 0.25 threshold."""
    import tempfile

    import pyspark.sql.functions as F
    from map_reduce_using_cloud_functions_spark.operators import dedup as ddm

    docs = load_table(s, d, "documents")
    path = tempfile.mkdtemp(prefix="oracle_leds_") + "/led"
    ddm.build_minhash_ledger(docs.where(F.col("doc_id") % 2 == 0), path)
    return ddm.near_dedup_against_ledger(
        s, docs.where(F.col("doc_id") % 2 == 1), path, threshold=0.25
    ).select("doc_id")


def _q_embedding_ledger_pairs(s: SparkSession, d: str) -> DataFrame:
    """Semantic ledger probe: ledger = even vec_ids, batch = odd.
    Fixture banding (r=4, b=4) matches the judged dedup_embedding_pairs
    geometry so the DuckDB twin is its joint sketch cross-split."""
    import tempfile

    import pyspark.sql.functions as F
    from map_reduce_using_cloud_functions_spark.operators import dedup as ddm

    emb = load_table(s, d, "embeddings")
    path = tempfile.mkdtemp(prefix="oracle_eled_") + "/led"
    ddm.build_embedding_ledger(
        emb.where(F.col("vec_id") % 2 == 0), path, planes_per_band=4, bands=4
    )
    return ddm.ledger_embedding_pairs(
        s, emb.where(F.col("vec_id") % 2 == 1), path, threshold=0.45
    )


def _q_embedding_ledger_survivors(s: SparkSession, d: str) -> DataFrame:
    """The survivor face: odd vectors that are NOT a semantic near-dup
    of any even (ledger) vector at the fixture threshold."""
    import tempfile

    import pyspark.sql.functions as F
    from map_reduce_using_cloud_functions_spark.operators import dedup as ddm

    emb = load_table(s, d, "embeddings")
    path = tempfile.mkdtemp(prefix="oracle_eleds_") + "/led"
    ddm.build_embedding_ledger(
        emb.where(F.col("vec_id") % 2 == 0), path, planes_per_band=4, bands=4
    )
    return ddm.near_dedup_against_embedding_ledger(
        s, emb.where(F.col("vec_id") % 2 == 1), path, threshold=0.45
    ).select("vec_id")


def _q_corpus_vocab_sketch(s: SparkSession, d: str) -> DataFrame:
    from map_reduce_using_cloud_functions_spark.operators.sketches import (
        vocab_sketch,
    )

    return vocab_sketch(load_table(s, d, "documents"), k=64, by=["lang"])


def _q_distinct_custkeys_sketch(s: SparkSession, d: str) -> DataFrame:
    from map_reduce_using_cloud_functions_spark.operators.sketches import (
        distinct_sketch,
    )

    return distinct_sketch(
        load_table(s, d, "orders"), "o_custkey", k=256, alias="est_custkeys"
    )


def _q_sampled_price_percentiles(s: SparkSession, d: str) -> DataFrame:
    from map_reduce_using_cloud_functions_spark.operators.sketches import (
        sampled_percentiles,
    )

    return sampled_percentiles(
        load_table(s, d, "orders"),
        "o_totalprice",
        key="o_orderkey",
        frac=0.25,
        by=["o_orderstatus"],
    )


def extra_oracle_sql() -> dict[str, str]:
    doctoks = entrymod._DOCTOKS
    sql: dict[str, str] = {}
    # map-sampler twin: every output is derivable from the raw columns
    # (the map is engine-local plumbing, the VALUES are what's checked)
    sql["map_function_sampler"] = """
SELECT doc_id,
       2::INT AS m_size,
       lang AS m_lang,
       'lang,source' AS m_keys,
       TRUE AS m_has_source,
       1::INT AS m_filtered_size,
       upper(source) AS m_source_upper
FROM documents
"""
    sql["order_grouping_sets"] = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       round(sum(o_totalprice), 6) AS total_price,
       grouping_id(o_orderstatus, o_orderpriority)::BIGINT AS gid
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""
    # unpivot twin: the judged events_pivot CTE melted back via UNION ALL
    sql["events_unpivot"] = (
        "WITH piv AS (" + entrymod.oracle_sql()["events_pivot"] + ")\n"
        + "\nUNION ALL\n".join(
            f"SELECT user_id, '{t}' AS event_type, {t} AS n FROM piv"
            for t in ("click", "error", "purchase", "signup", "view")
        )
    )
    hex64_g = entrymod._HEX64.format(col="array_to_string(list_slice(l, i, i + 7), ' ')")
    _span_cte = f"""
WITH doctoks AS ({doctoks}),
grams AS (
  SELECT doc_id, i::INT AS i, {hex64_g} AS gh
  FROM (SELECT doc_id, l, unnest(range(1, greatest(len(l) - 7, 0) + 1)) AS i
        FROM doctoks WHERE len(l) >= 8)
),
dup AS (SELECT gh FROM (SELECT gh, count(*) AS c FROM grams GROUP BY 1) WHERE c >= 2),
hits AS (SELECT doc_id, i FROM grams JOIN dup USING (gh)),
flags AS (
  SELECT doc_id, i,
         CASE WHEN lag(i) OVER w IS NULL OR i > lag(i) OVER w + 8 THEN 1 ELSE 0 END AS is_new
  FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY i)
),
sp AS (
  SELECT doc_id, i,
         sum(is_new) OVER (PARTITION BY doc_id ORDER BY i
                           ROWS UNBOUNDED PRECEDING)::BIGINT AS span_id
  FROM flags
),
spans AS (
  SELECT doc_id, span_id, min(i)::INT AS span_start, (max(i) + 7)::INT AS span_end,
         (max(i) + 8 - min(i))::INT AS span_tokens
  FROM sp GROUP BY 1, 2
)
"""
    sql["dedup_duplicate_spans"] = (
        _span_cte
        + "SELECT doc_id, span_id, span_start, span_end, span_tokens FROM spans"
    )
    sql["dedup_span_stats"] = (
        _span_cte
        + """,
agg AS (
  SELECT doc_id, count(*) AS n_spans, sum(span_tokens) AS dup_tokens
  FROM spans GROUP BY 1
)
SELECT d.doc_id, len(d.l)::INT AS n_tokens,
       coalesce(n_spans, 0)::BIGINT AS n_spans,
       coalesce(dup_tokens, 0)::BIGINT AS dup_tokens,
       round(coalesce(dup_tokens, 0)::DOUBLE / greatest(len(d.l), 1), 6) AS dup_token_frac
FROM doctoks d LEFT JOIN agg USING (doc_id)
"""
    )
    sql["text_repetition_flags"] = f"""
WITH doctoks AS ({doctoks}),
base AS (
  SELECT doc_id, length(array_to_string(l, ' ')) AS norm_chars FROM doctoks
),
rawlines AS (
  SELECT doc_id,
         regexp_replace(unnest(string_split(text, chr(10))),
                        '^[\\s\\x{{b}}]+|[\\s\\x{{b}}]+$', '', 'g') AS line
  FROM documents
),
lines AS (SELECT doc_id, line FROM rawlines WHERE line <> ''),
lc AS (SELECT doc_id, line, count(*) AS c FROM lines GROUP BY 1, 2),
ls AS (
  SELECT doc_id, sum(c) AS n_lines,
         round(1 - count(*)::DOUBLE / sum(c), 6) AS dup_line_frac,
         round(sum(CASE WHEN c > 1 THEN c * length(line) ELSE 0 END)::DOUBLE
               / sum(c * length(line)), 6) AS dup_line_char_frac
  FROM lc GROUP BY 1
),
g3 AS (
  SELECT doc_id, (l[i] || ' ' || l[i+1] || ' ' || l[i+2]) AS shingle
  FROM (SELECT doc_id, l, unnest(range(1, greatest(len(l) - 2, 0) + 1)) AS i
        FROM doctoks WHERE len(l) >= 3)
),
g3c AS (SELECT doc_id, shingle, count(*) AS c FROM g3 GROUP BY 1, 2),
dg AS (
  SELECT doc_id,
         sum(CASE WHEN c > 1 THEN c * length(shingle) ELSE 0 END) AS dup_gram_chars
  FROM g3c GROUP BY 1
),
g2 AS (
  SELECT doc_id, (l[i] || ' ' || l[i+1]) AS shingle
  FROM (SELECT doc_id, l, unnest(range(1, greatest(len(l) - 1, 0) + 1)) AS i
        FROM doctoks WHERE len(l) >= 2)
),
g2c AS (SELECT doc_id, shingle, count(*) AS c FROM g2 GROUP BY 1, 2),
tg AS (
  SELECT doc_id, shingle AS top_gram, c * length(shingle) AS top_gram_chars
  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY c DESC, shingle) AS rn
        FROM g2c)
  WHERE rn = 1
)
SELECT b.doc_id,
       coalesce(n_lines, 0)::BIGINT AS n_lines,
       coalesce(dup_line_frac, 0.0) AS dup_line_frac,
       coalesce(dup_line_char_frac, 0.0) AS dup_line_char_frac,
       top_gram,
       round(CASE WHEN norm_chars > 0
                  THEN coalesce(top_gram_chars, 0)::DOUBLE / norm_chars
                  ELSE 0.0 END, 6) AS top_gram_char_frac,
       round(CASE WHEN norm_chars > 0
                  THEN coalesce(dup_gram_chars, 0)::DOUBLE / norm_chars
                  ELSE 0.0 END, 6) AS dup_gram_char_frac
FROM base b
LEFT JOIN ls USING (doc_id)
LEFT JOIN dg USING (doc_id)
LEFT JOIN tg USING (doc_id)
"""
    hex64 = entrymod._HEX64
    sql["corpus_mix_report"] = f"""
WITH doctoks AS ({doctoks.replace("SELECT doc_id,", "SELECT doc_id, source, lang, n_chars, text,")})
SELECT source, lang,
       count(*) AS n_docs,
       sum(len(l))::BIGINT AS total_tokens,
       sum(n_chars)::BIGINT AS total_chars,
       round(quantile_cont(len(l), 0.5), 4) AS p50_tokens,
       round(quantile_cont(len(l), 0.9), 4) AS p90_tokens,
       round(1 - (count(DISTINCT {hex64.format(col='text')})
                  + sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END))::DOUBLE
                 / count(*), 6) AS dup_frac
FROM doctoks GROUP BY source, lang
"""
    sql["text_unigram_logprob"] = f"""
WITH doctoks AS ({doctoks}),
tok AS (SELECT doc_id, unnest(l) AS word FROM doctoks),
vocab AS (SELECT word, count(*) AS wc FROM tok GROUP BY 1),
tot AS (SELECT sum(wc) AS n_ref, count(*) AS v_ref FROM vocab),
postings AS (SELECT doc_id, word, count(*) AS cnt FROM tok GROUP BY 1, 2)
SELECT doc_id, sum(cnt)::BIGINT AS n_tokens,
       round(sum(ln((wc + 1) / (n_ref + v_ref)) * cnt) / sum(cnt), 6) AS avg_logprob
FROM postings JOIN vocab USING (word) CROSS JOIN tot
GROUP BY doc_id
"""
    sql["text_bigram_logprob"] = f"""
WITH doctoks AS ({doctoks}),
bg AS (
  SELECT doc_id, (l[i] || ' ' || l[i+1]) AS b
  FROM (SELECT doc_id, l, unnest(range(1, greatest(len(l) - 1, 0) + 1)) AS i
        FROM doctoks WHERE len(l) >= 2)
),
refb AS (SELECT b, count(*) AS bc FROM bg GROUP BY 1),
ctx AS (SELECT string_split(b, ' ')[1] AS w1, sum(bc) AS cc FROM refb GROUP BY 1),
v AS (SELECT count(*) + 1 AS v_ctx FROM ctx),
docb AS (SELECT doc_id, b, count(*) AS cnt FROM bg GROUP BY 1, 2)
SELECT doc_id, sum(cnt)::BIGINT AS n_bigrams,
       round(sum(ln((bc + 1) / (cc + v_ctx)) * cnt) / sum(cnt), 6) AS avg_logprob2
FROM docb
JOIN refb USING (b)
JOIN ctx ON string_split(b, ' ')[1] = w1
CROSS JOIN v
GROUP BY doc_id
"""
    split_bucket = hex64.format(col="(doc_id || '|split')") + " % 1000000"
    sql["corpus_split_assignment"] = f"""
SELECT doc_id,
       CASE WHEN {split_bucket} < 980000 THEN 'train'
            WHEN {split_bucket} < 990000 THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""
    sql["events_retention_cohorts"] = """
WITH ev AS (SELECT * FROM events WHERE ts IS NOT NULL),
per_user AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM ev GROUP BY user_id
),
active AS (
  SELECT p.cohort_week,
         CAST(date_diff('day', p.cohort_week, date_trunc('week', e.ts)) / 7
              AS BIGINT) AS week_offset,
         count(DISTINCT e.user_id) AS n_active
  FROM ev e JOIN per_user p USING (user_id)
  GROUP BY 1, 2
)
SELECT cohort_week, week_offset, n_active,
       max(CASE WHEN week_offset = 0 THEN n_active END)
           OVER (PARTITION BY cohort_week) AS cohort_size,
       round(n_active * 1.0
             / max(CASE WHEN week_offset = 0 THEN n_active END)
                   OVER (PARTITION BY cohort_week), 6) AS retention_rate
FROM active
"""

    # Banded multi-probe LSH twin: 36 deterministic hyperplanes -> 6
    # bands x 6 sign bits; each query probes its home bucket plus every
    # 1-bit flip (masks 0,1,2,4,8,16,32) per band; candidates are the
    # distinct bucket hits, scored exactly, ranked like brute force.
    hexp = entrymod._HEX64.format(col="(plane::VARCHAR || '|' || (i-1)::VARCHAR)")
    cosqn = entrymod._COS.format(a="qe.embedding", b="ne.embedding")
    sql["ann_topk_lsh_banded"] = f"""
WITH comp AS (
  SELECT vec_id, embedding, unnest(range(0, 36)) AS plane FROM embeddings
),
dims AS (
  SELECT vec_id, plane, unnest(range(1, len(embedding) + 1)) AS i, embedding
  FROM comp
),
dots AS (
  SELECT vec_id, plane,
         sum(embedding[i]::DOUBLE * ((({hexp}) % 2001 - 1000)::DOUBLE / 1000.0)) AS dot
  FROM dims GROUP BY 1, 2
),
bsk AS (
  SELECT vec_id, (plane // 6)::INT AS band,
         sum(CASE WHEN dot > 0 THEN (1::BIGINT << (plane % 6)) ELSE 0 END)::BIGINT AS band_bucket
  FROM dots GROUP BY 1, 2
),
masks AS (SELECT unnest([0, 1, 2, 4, 8, 16, 32])::BIGINT AS m),
qb AS (
  SELECT b.vec_id AS query_id, b.band, xor(b.band_bucket, m.m) AS band_bucket
  FROM bsk b CROSS JOIN masks m WHERE b.vec_id < 8
),
cand AS (
  SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id
  FROM bsk c JOIN qb q ON c.band = q.band AND c.band_bucket = q.band_bucket
  WHERE c.vec_id <> q.query_id
),
scored AS (
  SELECT cd.query_id, cd.neighbor_id, {cosqn} AS score
  FROM cand cd
  JOIN embeddings qe ON qe.vec_id = cd.query_id
  JOIN embeddings ne ON ne.vec_id = cd.neighbor_id
)
SELECT query_id, neighbor_id, rank, round(score, 6) AS score FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id)::INT AS rank,
         score
  FROM scored
) WHERE rank <= 5
"""
    gate = entrymod.oracle_sql()
    sql["index_lookup_persisted"] = gate["index_lookup"]
    sql["index_lookup_versioned"] = gate["index_lookup"]
    assert gate["index_lookup"].count("WHERE word = 'the' ") == 1
    sql["index_lookup_after_delete"] = gate["index_lookup"].replace(
        "WHERE word = 'the' ",
        "WHERE word = 'the' AND (document::BIGINT % 10) <> 3 ",
    )
    sql["ann_topk_ivf_indexed"] = gate["ann_topk_ivf"]
    sql["ann_topk_lsh_indexed"] = sql["ann_topk_lsh_banded"]
    # appended LSH ≡ full build (corpus-independent sketch): unmodified twin
    sql["ann_topk_lsh_appended"] = sql["ann_topk_lsh_banded"]
    # appended IVF: centroids seeded from the BUILD (even) half only
    _ivf_cents_src = "FROM embeddings WHERE (vec_id % 97) < 8"
    assert gate["ann_topk_ivf"].count(_ivf_cents_src) == 1
    sql["ann_topk_ivf_appended"] = gate["ann_topk_ivf"].replace(
        _ivf_cents_src,
        "FROM embeddings WHERE vec_id % 2 = 0 AND (vec_id % 97) < 8",
    )
    # near-dup ledger: joint-corpus sketch restricted to even(ledger) ×
    # odd(batch) pairs — sigs over everything, candidates via banding,
    # exact signature-overlap verify, same arithmetic as the gate row
    _ledger_core = (
        entrymod._MINHASH_SQL
        + f""",
banded AS (
  SELECT doc_id, (seed // 4)::INT AS band,
         {entrymod._HEX64.format(col="string_agg(minhash::VARCHAR, ',' ORDER BY seed)")} AS band_hash
  FROM sigs GROUP BY doc_id, (seed // 4)::INT
),
cands AS (
  SELECT DISTINCT b.doc_id AS doc_id, a.doc_id AS ledger_doc
  FROM banded a JOIN banded b ON a.band = b.band AND a.band_hash = b.band_hash
  WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
),
verified AS (
  SELECT c.doc_id, c.ledger_doc,
         (sum(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END) / 16.0) AS est_jaccard
  FROM cands c
  JOIN sigs sa ON sa.doc_id = c.ledger_doc
  JOIN sigs sb ON sb.doc_id = c.doc_id AND sb.seed = sa.seed
  GROUP BY 1, 2
)
"""
    )
    sql["dedup_ledger_pairs"] = (
        _ledger_core
        + "SELECT doc_id, ledger_doc, est_jaccard FROM verified WHERE est_jaccard >= 0.25"
    )
    sql["dedup_ledger_survivors"] = (
        _ledger_core
        + """SELECT doc_id FROM documents
WHERE doc_id % 2 = 1
  AND doc_id NOT IN (SELECT doc_id FROM verified WHERE est_jaccard >= 0.25)"""
    )

    # embedding-ledger twins: wrap the gate's joint embedding-pairs
    # sketch and restrict to cross-split pairs, oriented batch→ledger
    _emb_joint = entrymod.oracle_sql()["dedup_embedding_pairs"]
    sql["embedding_ledger_pairs"] = f"""
WITH joint AS ({_emb_joint})
SELECT CASE WHEN vec_a % 2 = 1 THEN vec_a ELSE vec_b END AS vec_id,
       CASE WHEN vec_a % 2 = 1 THEN vec_b ELSE vec_a END AS ledger_vec,
       score
FROM joint WHERE (vec_a % 2) <> (vec_b % 2)
"""
    sql["embedding_ledger_survivors"] = f"""
WITH joint AS ({_emb_joint}),
matched AS (
  SELECT CASE WHEN vec_a % 2 = 1 THEN vec_a ELSE vec_b END AS vec_id
  FROM joint WHERE (vec_a % 2) <> (vec_b % 2)
)
SELECT vec_id FROM embeddings
WHERE vec_id % 2 = 1 AND vec_id NOT IN (SELECT vec_id FROM matched)
"""

    # sketch twins — generated by operators/sketches.py itself
    from map_reduce_using_cloud_functions_spark.operators.sketches import (
        distinct_sketch_sql,
        sampled_percentiles_sql,
    )

    _toks = entrymod._TOKS_LIST
    sql["corpus_vocab_sketch"] = distinct_sketch_sql(
        f"(SELECT lang, unnest({_toks.format(col='text')}) AS word FROM documents)",
        "word",
        k=64,
        by=["lang"],
        alias="est_vocab",
    )
    sql["distinct_custkeys_sketch"] = distinct_sketch_sql(
        "orders", "cast(o_custkey AS VARCHAR)", k=256, alias="est_custkeys"
    )
    sql["sampled_price_percentiles"] = sampled_percentiles_sql(
        "orders",
        "o_totalprice",
        "cast(o_orderkey AS VARCHAR)",
        frac=0.25,
        by=["o_orderstatus"],
    )

    # time-travel twins: the same tokenizer/postings CTE as the gate's
    # index_build, restricted per commit of the two-commit fixture
    _tok_lt = entrymod._TOK_CTE.replace(
        "FROM documents", "FROM documents WHERE doc_id < 300"
    )
    _tok_ge = entrymod._TOK_CTE.replace(
        "FROM documents", "FROM documents WHERE doc_id >= 300"
    )
    _postings_tail = (
        ", postings AS (SELECT word, document, count(*) AS count"
        " FROM tok GROUP BY 1, 2)"
    )
    sql["index_snapshot_v0"] = (
        _tok_lt + _postings_tail + "SELECT word, document, count FROM postings"
    )
    sql["index_version_diff"] = (
        _tok_ge
        + _postings_tail
        + """SELECT word, document,
       0::BIGINT AS count_from, count AS count_to, count AS delta
FROM postings"""
    )

    # PQ twin: the whole product-quantization pipeline in SQL — seeded
    # codebooks sliced per subspace, L2 argmin via the monotone
    # <x,c>−|c|²/2 objective (tie toward the smaller code), recon norm
    # and ADC dot folded in subspace order (list(... ORDER BY subspace)
    # then list_sum — same sequential double adds as the engine's
    # array folds).
    sql["ann_topk_pq"] = """
WITH dims AS (SELECT (max(len(embedding)) // 8)::INT AS sub FROM embeddings),
seeds AS (
  SELECT (vec_id % 97)::INT AS cid, arg_min(embedding, vec_id) AS sv
  FROM embeddings WHERE (vec_id % 97) < 16 GROUP BY 1
),
sp AS (SELECT unnest(range(0, 8)) AS s),
bn AS (
  SELECT sp.s AS subspace, cid,
         list_slice(sv, sp.s*d.sub + 1, (sp.s+1)*d.sub) AS cw,
         list_inner_product(list_slice(sv, sp.s*d.sub + 1, (sp.s+1)*d.sub)::DOUBLE[],
                            list_slice(sv, sp.s*d.sub + 1, (sp.s+1)*d.sub)::DOUBLE[]) AS cn2
  FROM seeds, sp, dims d
),
subs AS (
  SELECT vec_id, sp.s AS subspace,
         list_slice(embedding, sp.s*d.sub + 1, (sp.s+1)*d.sub) AS xv
  FROM embeddings, sp, dims d
),
assign AS (
  SELECT vec_id, subspace, cid, cn2 FROM (
    SELECT v.vec_id, v.subspace, b.cid, b.cn2,
           row_number() OVER (
             PARTITION BY v.vec_id, v.subspace
             ORDER BY (list_inner_product(v.xv::DOUBLE[], b.cw::DOUBLE[]) - b.cn2/2) DESC,
                      b.cid
           ) AS rn
    FROM subs v JOIN bn b ON b.subspace = v.subspace
  ) WHERE rn = 1
),
recon AS (
  SELECT vec_id, sqrt(list_sum(list(cn2 ORDER BY subspace))) AS recon_norm
  FROM assign GROUP BY vec_id
),
q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 8),
qsubs AS (
  SELECT query_id, sp.s AS subspace, list_slice(qe, sp.s*d.sub + 1, (sp.s+1)*d.sub) AS qv
  FROM q, sp, dims d
),
adc AS (
  SELECT qs.query_id, a.vec_id,
         list_sum(list(list_inner_product(qs.qv::DOUBLE[], b.cw::DOUBLE[])
                       ORDER BY qs.subspace)) AS adot
  FROM qsubs qs
  JOIN assign a ON a.subspace = qs.subspace
  JOIN bn b ON b.subspace = a.subspace AND b.cid = a.cid
  GROUP BY 1, 2
),
qn AS (SELECT vec_id AS query_id,
              sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS qnorm
       FROM embeddings WHERE vec_id < 8),
scored AS (
  SELECT adc.query_id, adc.vec_id AS neighbor_id,
         adc.adot / (qn.qnorm * r.recon_norm) AS score
  FROM adc
  JOIN qn USING (query_id)
  JOIN recon r ON r.vec_id = adc.vec_id
  WHERE adc.vec_id <> adc.query_id
)
SELECT query_id, neighbor_id, rank, round(score, 6) AS score FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(score, 6) DESC, neighbor_id)::INT AS rank,
         score
  FROM scored
) WHERE rank <= 5
"""

    # boilerplate-strip twin: split on the literal separator, count df
    # over trimmed non-empty segments per DISTINCT doc, remove where
    # df >= 250, rejoin survivors in original order (string_agg with
    # ORDER BY + FILTER; empty docs coalesce to '')
    sql["corpus_boilerplate_strip"] = """
WITH docl AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
segs AS (
  SELECT doc_id, unnest(range(1, len(l) + 1)) AS pos, l FROM docl
),
keyed AS (
  SELECT doc_id, pos, l[pos] AS seg, trim(l[pos]) AS t FROM segs
),
dfreq AS (
  SELECT t, count(DISTINCT doc_id) AS df FROM keyed
  WHERE length(t) >= 1 GROUP BY t
),
marked AS (
  SELECT k.doc_id, k.pos, k.seg,
         (length(k.t) >= 1 AND coalesce(d.df, 0) >= 250) AS rm
  FROM keyed k LEFT JOIN dfreq d ON d.t = k.t
)
SELECT doc_id,
       coalesce(string_agg(seg, ' ' ORDER BY pos) FILTER (WHERE NOT rm), '') AS text,
       sum(CASE WHEN rm THEN 1 ELSE 0 END)::BIGINT AS n_removed
FROM marked GROUP BY doc_id
"""

    sql["ann_topk_pq_indexed"] = sql["ann_topk_pq"]
    sql["ann_topk_pq_packed"] = sql["ann_topk_pq"]

    # IVF-PQ twin: the PQ pipeline with its candidate set gated by the
    # IVF routing CTEs (8 seeded centroids, corpus argmax list, 2
    # probed lists per query) — routing changes WHICH rows score, ADC
    # decides the scores, so the surgery swaps only the `scored` CTE.
    _pq_scored = """scored AS (
  SELECT adc.query_id, adc.vec_id AS neighbor_id,
         adc.adot / (qn.qnorm * r.recon_norm) AS score
  FROM adc
  JOIN qn USING (query_id)
  JOIN recon r ON r.vec_id = adc.vec_id
  WHERE adc.vec_id <> adc.query_id
)"""
    assert sql["ann_topk_pq"].count(_pq_scored) == 1
    _cos_ec = entrymod._COS.format(a="e.embedding", b="c.c_embedding")
    _cos_qc = entrymod._COS.format(a="qq.qe", b="c.c_embedding")
    sql["ann_topk_ivfpq"] = sql["ann_topk_pq"].replace(
        _pq_scored,
        f"""cents AS (
  SELECT (vec_id % 97)::INT AS centroid_id,
         arg_min(embedding, vec_id) AS c_embedding
  FROM embeddings WHERE (vec_id % 97) < 8 GROUP BY 1
),
corpus_lists AS (
  SELECT vec_id, centroid_id AS list_id FROM (
    SELECT e.vec_id, c.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_cos_ec} DESC, c.centroid_id) AS crn
    FROM embeddings e CROSS JOIN cents c
  ) WHERE crn = 1
),
query_lists AS (
  SELECT query_id, centroid_id AS list_id FROM (
    SELECT qq.query_id, c.centroid_id,
           row_number() OVER (PARTITION BY qq.query_id
                              ORDER BY {_cos_qc} DESC, c.centroid_id) AS crn
    FROM q qq CROSS JOIN cents c
  ) WHERE crn <= 2
),
scored AS (
  SELECT adc.query_id, adc.vec_id AS neighbor_id,
         adc.adot / (qn.qnorm * r.recon_norm) AS score
  FROM adc
  JOIN qn USING (query_id)
  JOIN recon r ON r.vec_id = adc.vec_id
  JOIN corpus_lists cl ON cl.vec_id = adc.vec_id
  JOIN query_lists ql ON ql.query_id = adc.query_id AND ql.list_id = cl.list_id
  WHERE adc.vec_id <> adc.query_id
)""",
    )
    sql["ann_topk_ivfpq_indexed"] = sql["ann_topk_ivfpq"]
    # appended twin: BOTH frozen artifacts seed from the build (even)
    # half — codebook seeds and coarse centroids
    assert (
        sql["ann_topk_ivfpq"].count("FROM embeddings WHERE (vec_id % 97) < 16") == 1
        and sql["ann_topk_ivfpq"].count("FROM embeddings WHERE (vec_id % 97) < 8") == 1
    )
    sql["ann_topk_ivfpq_appended"] = sql["ann_topk_ivfpq"].replace(
        "FROM embeddings WHERE (vec_id % 97) < 16",
        "FROM embeddings WHERE vec_id % 2 = 0 AND (vec_id % 97) < 16",
    ).replace(
        "FROM embeddings WHERE (vec_id % 97) < 8",
        "FROM embeddings WHERE vec_id % 2 = 0 AND (vec_id % 97) < 8",
    )

    # Residual IVF-PQ twin (Jégou §IV, the FAISS default): the full
    # pipeline replayed fresh — coarse routing, residual relation
    # (element-wise v − c), residual-seeded books, per-subspace argmin
    # on residual slices, recon assembled ELEMENT-WISE (c + r̂, then
    # normed — the same fold as Spark's l2_norm, not the norm algebra,
    # so doubles agree at the 6-dp contract), score = (⟨q,c⟩ + ADC) /
    # (|q|·|c + r̂|). Indexed row shares it (indexed ≡ in-plan).
    sql["ann_topk_ivfpq_residual"] = f"""
WITH dims AS (SELECT (max(len(embedding)) // 8)::INT AS sub FROM embeddings),
cents AS (
  SELECT (vec_id % 97)::INT AS centroid_id,
         arg_min(embedding, vec_id) AS c_embedding
  FROM embeddings WHERE (vec_id % 97) < 8 GROUP BY 1
),
corpus_lists AS (
  SELECT vec_id, centroid_id AS list_id FROM (
    SELECT e.vec_id, c.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_cos_ec} DESC, c.centroid_id) AS crn
    FROM embeddings e CROSS JOIN cents c
  ) WHERE crn = 1
),
resid AS (
  SELECT e.vec_id, cl.list_id,
         list_transform(range(1, 8 * d.sub + 1),
                        i -> e.embedding[i]::DOUBLE - c.c_embedding[i]::DOUBLE) AS r
  FROM embeddings e
  JOIN corpus_lists cl USING (vec_id)
  JOIN cents c ON c.centroid_id = cl.list_id
  CROSS JOIN dims d
),
seeds AS (
  SELECT (vec_id % 97)::INT AS cid, arg_min(r, vec_id) AS sv
  FROM resid WHERE (vec_id % 97) < 16 GROUP BY 1
),
sp AS (SELECT unnest(range(0, 8)) AS s),
bn AS (
  SELECT sp.s AS subspace, cid,
         list_slice(sv, sp.s*d.sub + 1, (sp.s+1)*d.sub) AS cw,
         list_inner_product(list_slice(sv, sp.s*d.sub + 1, (sp.s+1)*d.sub)::DOUBLE[],
                            list_slice(sv, sp.s*d.sub + 1, (sp.s+1)*d.sub)::DOUBLE[]) AS cn2
  FROM seeds, sp, dims d
),
subs AS (
  SELECT vec_id, sp.s AS subspace,
         list_slice(r, sp.s*d.sub + 1, (sp.s+1)*d.sub) AS xv
  FROM resid, sp, dims d
),
assign AS (
  SELECT vec_id, subspace, cid, cw FROM (
    SELECT v.vec_id, v.subspace, b.cid, b.cw,
           row_number() OVER (
             PARTITION BY v.vec_id, v.subspace
             ORDER BY (list_inner_product(v.xv::DOUBLE[], b.cw::DOUBLE[]) - b.cn2/2) DESC,
                      b.cid
           ) AS rn
    FROM subs v JOIN bn b ON b.subspace = v.subspace
  ) WHERE rn = 1
),
rrv AS (
  SELECT vec_id, flatten(list(cw ORDER BY subspace)) AS rr FROM assign GROUP BY vec_id
),
recon AS (
  SELECT rv.vec_id,
         sqrt(list_inner_product(
           list_transform(range(1, 8 * d.sub + 1),
                          i -> c.c_embedding[i]::DOUBLE + rv.rr[i]::DOUBLE),
           list_transform(range(1, 8 * d.sub + 1),
                          i -> c.c_embedding[i]::DOUBLE + rv.rr[i]::DOUBLE)
         )) AS recon_norm
  FROM rrv rv
  JOIN corpus_lists cl USING (vec_id)
  JOIN cents c ON c.centroid_id = cl.list_id
  CROSS JOIN dims d
),
q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 8),
qsubs AS (
  SELECT query_id, sp.s AS subspace, list_slice(qe, sp.s*d.sub + 1, (sp.s+1)*d.sub) AS qv
  FROM q, sp, dims d
),
adc AS (
  SELECT qs.query_id, a.vec_id,
         list_sum(list(list_inner_product(qs.qv::DOUBLE[], a.cw::DOUBLE[])
                       ORDER BY qs.subspace)) AS adot
  FROM qsubs qs
  JOIN assign a ON a.subspace = qs.subspace
  GROUP BY 1, 2
),
qn AS (SELECT vec_id AS query_id,
              sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS qnorm
       FROM embeddings WHERE vec_id < 8),
query_lists AS (
  SELECT query_id, centroid_id AS list_id FROM (
    SELECT qq.query_id, c.centroid_id,
           row_number() OVER (PARTITION BY qq.query_id
                              ORDER BY {_cos_qc} DESC, c.centroid_id) AS crn
    FROM q qq CROSS JOIN cents c
  ) WHERE crn <= 2
),
qc AS (
  SELECT ql.query_id, ql.list_id,
         list_inner_product(qq.qe::DOUBLE[], c.c_embedding::DOUBLE[]) AS qcv
  FROM query_lists ql
  JOIN q qq USING (query_id)
  JOIN cents c ON c.centroid_id = ql.list_id
),
scored AS (
  SELECT adc.query_id, adc.vec_id AS neighbor_id,
         (qc.qcv + adc.adot) / (qn.qnorm * r.recon_norm) AS score
  FROM adc
  JOIN qn USING (query_id)
  JOIN recon r ON r.vec_id = adc.vec_id
  JOIN corpus_lists cl ON cl.vec_id = adc.vec_id
  JOIN query_lists ql ON ql.query_id = adc.query_id AND ql.list_id = cl.list_id
  JOIN qc ON qc.query_id = adc.query_id AND qc.list_id = cl.list_id
  WHERE adc.vec_id <> adc.query_id
)
SELECT query_id, neighbor_id, rank, round(score, 6) AS score FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(score, 6) DESC, neighbor_id)::INT AS rank,
         score
  FROM scored
) WHERE rank <= 5
"""
    sql["ann_topk_ivfpq_residual_indexed"] = sql["ann_topk_ivfpq_residual"]
    # appended twin: codebook seeds restricted to the BUILD half (even
    # vec_ids) — appends themselves are exact, only the seed source
    # differs from the full-build row
    sql["ann_topk_pq_appended"] = sql["ann_topk_pq"].replace(
        "FROM embeddings WHERE (vec_id % 97) < 16",
        "FROM embeddings WHERE vec_id % 2 = 0 AND (vec_id % 97) < 16",
    )

    # SemDeDup twin: the identical seeded centroids + argmax assignment
    # as ann_topk_ivf's oracle, then within-cluster cosine pairs and the
    # keep-lowest-centroid-sim rule as a row-value CASE (ties on exact
    # duplicates break to the smaller vec_id, same struct ordering as
    # the engine).
    _cos_ec = entrymod._COS.format(a="e.embedding", b="c.c_embedding")
    _cos_ab = entrymod._COS.format(a="a.embedding", b="b.embedding")
    _semdedup_core = f"""
WITH cents AS (
  SELECT (vec_id % 97)::INT AS centroid_id,
         arg_min(embedding, vec_id) AS c_embedding
  FROM embeddings WHERE (vec_id % 97) < 8 GROUP BY 1
),
scored AS (
  SELECT e.vec_id, e.embedding, c.centroid_id,
         {_cos_ec} AS c_score
  FROM embeddings e CROSS JOIN cents c
),
assigned AS (
  SELECT vec_id, embedding, centroid_id AS list_id, c_score FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY c_score DESC, centroid_id) AS rn
    FROM scored
  ) WHERE rn = 1
),
pairs AS (
  SELECT a.list_id, a.vec_id AS vec_a, b.vec_id AS vec_b,
         a.c_score AS ca, b.c_score AS cb,
         {_cos_ab} AS s
  FROM assigned a
  JOIN assigned b ON a.list_id = b.list_id AND a.vec_id < b.vec_id
)
"""
    sql["semdedup_pairs"] = (
        _semdedup_core
        + "SELECT list_id, vec_a, vec_b, round(s, 6) AS score "
        + "FROM pairs WHERE s >= 0.4"
    )
    sql["semdedup_survivors"] = (
        _semdedup_core
        + """SELECT v.vec_id, v.list_id, round(v.c_score, 6) AS c_score
FROM assigned v
WHERE v.vec_id NOT IN (
  SELECT CASE WHEN (ca, vec_a) > (cb, vec_b) THEN vec_a ELSE vec_b END
  FROM pairs WHERE s >= 0.4
)"""
    )
    sql["semdedup_pairs_indexed"] = sql["semdedup_pairs"]
    sql["semdedup_survivors_indexed"] = sql["semdedup_survivors"]
    # r9 appended twin: centroids frozen at build time seed from the
    # BUILD (even) half only — the same rule as the IVF appended rows
    assert (
        sql["semdedup_survivors"].count("FROM embeddings WHERE (vec_id % 97) < 8")
        == 1
    )
    sql["semdedup_survivors_appended"] = sql["semdedup_survivors"].replace(
        "FROM embeddings WHERE (vec_id % 97) < 8",
        "FROM embeddings WHERE vec_id % 2 = 0 AND (vec_id % 97) < 8",
    )
    # r10 scale-safe twin: the seeded-centroid slot count becomes the
    # data-derived k = clamp(n/250, 8, 96) instead of the fixture's
    # literal 8 — the ONLY difference from the judged row, so the twin
    # tracks the Spark side's k at every SF it runs at.
    _scaled_k_sql = "(SELECT greatest(8, least(96, count(*) // 250)) FROM embeddings)"
    sql["semdedup_survivors_scaled"] = sql["semdedup_survivors"].replace(
        "(vec_id % 97) < 8", f"(vec_id % 97) < {_scaled_k_sql}"
    )
    assert _scaled_k_sql in sql["semdedup_survivors_scaled"]

    # r10 production-banding twin: the judged dedup_embedding_pairs CTE
    # chain with 64 planes (r=8, b=8), τ=0.8, over the clone-planted
    # corpus (every 25th vector + its ±0.05 alternating perturbation —
    # DuckDB list_transform's lambda index is 1-based, hence (i-1)).
    _plane_h = entrymod._HEX64.format(col="(plane::VARCHAR || '|' || (i-1)::VARCHAR)")
    _cosp = entrymod._COS.format(a="ea.embedding", b="eb.embedding")
    sql["dedup_embedding_pairs_production"] = f"""
WITH corpus AS (
  SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000,
         list_transform(embedding::DOUBLE[],
                        (x, i) -> x + CASE WHEN (i - 1) % 2 = 0 THEN 0.05 ELSE -0.05 END)
  FROM embeddings WHERE vec_id % 25 = 0
),
comp AS (SELECT vec_id, embedding, unnest(range(0, 64)) AS plane FROM corpus),
dims AS (
  SELECT vec_id, plane, unnest(range(1, len(embedding) + 1)) AS i, embedding
  FROM comp
),
dots AS (
  SELECT vec_id, plane,
         sum(embedding[i] * (({_plane_h} % 2001 - 1000)::DOUBLE / 1000.0)) AS dot
  FROM dims GROUP BY 1, 2
),
bsk AS (
  SELECT vec_id, (plane // 8)::INT AS band,
         sum(CASE WHEN dot > 0 THEN (1::BIGINT << (plane % 8)) ELSE 0 END)::BIGINT AS band_bucket
  FROM dots GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bsk a JOIN bsk b ON a.band = b.band AND a.band_bucket = b.band_bucket
  WHERE a.vec_id < b.vec_id
)
SELECT c.vec_a, c.vec_b, round({_cosp}, 6) AS score
FROM cand c
JOIN corpus ea ON ea.vec_id = c.vec_a
JOIN corpus eb ON eb.vec_id = c.vec_b
WHERE {_cosp} >= 0.8
"""

    # r10 perceptual-hash twin: PNG is lossless, so the decoded pixels
    # the Spark side hashes ARE the first 72 text bytes — the twin
    # recomputes the dHash bit-for-bit from those bytes (two's-
    # complement BIGINT packing for bit 63) and pairs all-pairs (the
    # oracle may brute-force what the engine bands).
    sql["multimodal_phash_pairs"] = _phash_pairs_sql(max_hamming=6)
    sql["multimodal_phash_ledger_pairs"] = _phash_ledger_pairs_sql(
        max_hamming=6
    )

    # r11 audio-fingerprint twins: WAV 8-bit PCM is lossless, so the
    # decoded samples ARE the first 130 text bytes; the twin recomputes
    # the energy-sign hash bit-for-bit (65 equal 2-frame blocks at
    # n=130, so the cross-multiplied comparison reduces to a plain
    # block-energy comparison; two's-complement BIGINT packing for bit
    # 63) and pairs all-pairs — the oracle may brute-force what the
    # engine bands.
    sql["multimodal_audiohash_pairs"] = _audiohash_pairs_sql(max_hamming=6)
    sql["multimodal_audiohash_ledger_pairs"] = _audiohash_ledger_pairs_sql(
        max_hamming=6
    )

    # r12 video-fingerprint twins: y4m mono planes are uncompressed, so
    # the decoded frames ARE the first 260 text bytes; the twin
    # recomputes the temporal energy-sign hash bit-for-bit (65 equal
    # 1-frame blocks of 2x2 pixels at the fixture geometry, so the
    # cross-multiplied comparison reduces to a plain frame-energy
    # comparison; two's-complement BIGINT packing for bit 63) and pairs
    # all-pairs — the oracle may brute-force what the engine bands.
    sql["multimodal_videohash_pairs"] = _videohash_pairs_sql(max_hamming=6)
    sql["multimodal_videohash_ledger_pairs"] = _videohash_ledger_pairs_sql(
        max_hamming=6
    )

    # r12 asset-embedding twin: PNG is lossless, so the decoded pixels
    # ARE the first 72 text bytes; pixel (r, c) = byte r·9+c. The 9x8
    # image under the 4x4 grid has EXACT 2-row blocks and [0,2,4,6,9)
    # column blocks; each block mean is an exact double (sum of <=6
    # ints / count), and the centering mean is summed in the engine's
    # row-major cell order via list_sum(list(... ORDER BY bi, bj)) so
    # the subtraction is bit-identical before the 6-decimal round.
    sql["multimodal_image_embeddings"] = """
WITH px AS (
  SELECT doc_id, (i // 9)::INT AS r, (i % 9)::INT AS c,
         ord(substr(text, i::INT + 1, 1))::DOUBLE AS v
  FROM (SELECT doc_id, text, unnest(range(0, 72)) AS i
        FROM documents WHERE octet_length(encode(text)) >= 72)
),
cell AS (
  SELECT doc_id, (r // 2)::INT AS bi,
         (CASE WHEN c < 2 THEN 0 WHEN c < 4 THEN 1
               WHEN c < 6 THEN 2 ELSE 3 END)::INT AS bj,
         avg(v) AS m
  FROM px GROUP BY 1, 2, 3
),
lst AS (
  SELECT doc_id, list(m ORDER BY bi, bj) AS cells
  FROM cell GROUP BY doc_id
)
SELECT doc_id AS asset_id,
       -- + 0.0 normalizes signed zeros (see the Spark twin)
       list_transform(cells, x -> round(x - list_sum(cells) / 16, 6) + 0.0)
         AS embedding
FROM lst
"""
    return sql


_AUDIOHASH_H_CTE = """
WITH v AS (
  SELECT doc_id, i, (ord(substr(text, i::INT + 1, 1)) - 128)::BIGINT AS v
  FROM (SELECT doc_id, text, unnest(range(0, 130)) AS i
        FROM documents WHERE octet_length(encode(text)) >= 130)
),
e AS (
  SELECT doc_id, (i // 2)::INT AS block, sum(v * v) AS en
  FROM v GROUP BY 1, 2
),
b AS (
  SELECT a.doc_id, a.block AS k, (a.en > c.en) AS bit
  FROM e a JOIN e c ON a.doc_id = c.doc_id AND c.block = a.block + 1
  WHERE a.block < 64
),
h AS (
  -- The outer ::BIGINT matters: DuckDB widens sum(BIGINT) to HUGEINT
  -- (int128), and when exactly one hash of a pair has bit 63 set the
  -- sign-extension bits 64-127 differ, inflating bit_count(xor(..))
  -- by +64 and silently dropping in-threshold pairs.
  SELECT doc_id,
         (sum(CASE WHEN bit AND k < 63 THEN (1::BIGINT << k) ELSE 0 END)
        + sum(CASE WHEN bit AND k = 63 THEN (-9223372036854775807 - 1) ELSE 0 END)
         )::BIGINT AS ahash
  FROM b GROUP BY doc_id
)
"""


def _audiohash_pairs_sql(max_hamming: int) -> str:
    """DuckDB twin of build_wav_assets → audiohash_assets →
    audiohash_pairs at the default 130-sample 8-bit mono fixture: bit k
    compares block k's energy (sum of squared centered samples, blocks
    = 2 consecutive text bytes) against block k+1's."""
    return f"""{_AUDIOHASH_H_CTE}
SELECT a.doc_id AS asset_a, b.doc_id AS asset_b,
       bit_count(xor(a.ahash, b.ahash))::INT AS hamming
FROM h a JOIN h b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.ahash, b.ahash)) <= {max_hamming}
"""


def _audiohash_ledger_pairs_sql(max_hamming: int) -> str:
    """Twin of the audio LEDGER probe: the energy-sign hash over the
    cross-release split (batch = doc_id%3==2, ledger = %3 in (0,1)),
    each (batch, ledger) pair once — the probe's output shape."""
    return f"""{_AUDIOHASH_H_CTE}
SELECT b.doc_id AS asset_id, l.doc_id AS ledger_asset,
       bit_count(xor(b.ahash, l.ahash))::INT AS hamming
FROM h b JOIN h l ON b.doc_id % 3 = 2 AND l.doc_id % 3 IN (0, 1)
WHERE bit_count(xor(b.ahash, l.ahash)) <= {max_hamming}
"""


_VIDEOHASH_H_CTE = """
WITH v AS (
  SELECT doc_id, i, (ord(substr(text, i::INT + 1, 1)) - 128)::BIGINT AS v
  FROM (SELECT doc_id, text, unnest(range(0, 260)) AS i
        FROM documents WHERE octet_length(encode(text)) >= 260)
),
e AS (
  SELECT doc_id, (i // 4)::INT AS frame, sum(v * v) AS en
  FROM v GROUP BY 1, 2
),
b AS (
  SELECT a.doc_id, a.frame AS k, (a.en > c.en) AS bit
  FROM e a JOIN e c ON a.doc_id = c.doc_id AND c.frame = a.frame + 1
  WHERE a.frame < 64
),
h AS (
  -- outer ::BIGINT: DuckDB widens sum(BIGINT) to HUGEINT, whose sign-
  -- extension bits would inflate bit_count(xor(..)) by +64 whenever
  -- exactly one hash of a pair has bit 63 set (the r11 ADVICE bug)
  SELECT doc_id,
         (sum(CASE WHEN bit AND k < 63 THEN (1::BIGINT << k) ELSE 0 END)
        + sum(CASE WHEN bit AND k = 63 THEN (-9223372036854775807 - 1) ELSE 0 END)
         )::BIGINT AS vhash
  FROM b GROUP BY doc_id
)
"""


def _videohash_pairs_sql(max_hamming: int) -> str:
    """DuckDB twin of build_y4m_assets → videohash_assets →
    videohash_pairs at the default 65-frame 2x2 mono fixture: bit k
    compares frame k's energy (sum of squared mid-gray-centered pixels,
    frames = 4 consecutive text bytes) against frame k+1's."""
    return f"""{_VIDEOHASH_H_CTE}
SELECT a.doc_id AS asset_a, b.doc_id AS asset_b,
       bit_count(xor(a.vhash, b.vhash))::INT AS hamming
FROM h a JOIN h b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.vhash, b.vhash)) <= {max_hamming}
"""


def _videohash_ledger_pairs_sql(max_hamming: int) -> str:
    """Twin of the video LEDGER probe: the temporal energy-sign hash
    over the cross-release split (batch = doc_id%3==2, ledger = %3 in
    (0,1)), each (batch, ledger) pair once — the probe's output shape."""
    return f"""{_VIDEOHASH_H_CTE}
SELECT b.doc_id AS asset_id, l.doc_id AS ledger_asset,
       bit_count(xor(b.vhash, l.vhash))::INT AS hamming
FROM h b JOIN h l ON b.doc_id % 3 = 2 AND l.doc_id % 3 IN (0, 1)
WHERE bit_count(xor(b.vhash, l.vhash)) <= {max_hamming}
"""


def _phash_ledger_pairs_sql(
    max_hamming: int, width: int = 9, height: int = 8, grid: int = 8
) -> str:
    """Twin of the perceptual-hash LEDGER probe: the dHash expression
    of ``_phash_pairs_sql`` over the cross-release split (batch =
    doc_id%3==2, ledger = %3 in (0,1)) — no a<b constraint, each
    (batch, ledger) pair once, exactly the probe's output shape."""
    core = _phash_pairs_sql(max_hamming, width=width, height=height, grid=grid)
    h_cte = core.split("SELECT a.doc_id")[0]  # the WITH h AS (...) prefix
    return f"""{h_cte}SELECT b.doc_id AS asset_id, l.doc_id AS ledger_asset,
       bit_count(xor(b.phash, l.phash))::INT AS hamming
FROM h b JOIN h l ON b.doc_id % 3 = 2 AND l.doc_id % 3 IN (0, 1)
WHERE bit_count(xor(b.phash, l.phash)) <= {max_hamming}
"""


def _phash_pairs_sql(
    max_hamming: int, width: int = 9, height: int = 8, grid: int = 8
) -> str:
    """DuckDB twin of build_png_assets → phash_assets → phash_pairs at
    the default 9×8 grayscale-from-text-bytes fixture: bit k of the
    dHash is pixel(r,c) > pixel(r,c+1) with k = r·grid + c, pixels
    being the text's byte values (ASCII fixture — char position ==
    byte position). Bit 63 lands as the BIGINT sign contribution, the
    exact two's-complement wrap ``dhash64`` applies."""
    n = width * height
    bits = []
    for k in range(grid * grid):
        r, c = divmod(k, grid)
        p1 = r * width + c + 1
        bits.append(
            f"(CASE WHEN ord(substr(text,{p1},1)) > ord(substr(text,{p1 + 1},1)) "
            "THEN 1 ELSE 0 END)"
        )
    terms = " + ".join(f"{bits[k]}::BIGINT * {1 << k}" for k in range(63))
    expr = (
        f"({terms}) + (CASE WHEN {bits[63]} = 1 "
        "THEN (-9223372036854775807 - 1) ELSE 0 END)"
    )
    return f"""
WITH h AS (
  SELECT doc_id, {expr} AS phash
  FROM documents WHERE octet_length(encode(text)) >= {n}
)
SELECT a.doc_id AS asset_a, b.doc_id AS asset_b,
       bit_count(xor(a.phash, b.phash))::INT AS hamming
FROM h a JOIN h b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.phash, b.phash)) <= {max_hamming}
"""
