"""

HISTORICAL (r8 measurement record): sections that account bytes via fixed subdir paths ({path}/lists, {path}/codes) predate the r9 ANN commit protocol (generation dirs + manifests) — for current indexes resolve through ann_commit.read_artifact/resolve_artifact, or use tools/measure_r9.py.
r8 BASELINE measurements.

1. scoped  — letter-scoped vs full compaction at a ~100x base: fold
   cost must track the TOUCHED letters' data, not the base (and the
   honest caveat: a natural-text delta touches most letters, so the
   win is the coverage gap, not a constant factor).
2. ivfpq   — persisted IVF-PQ amortization at a replicated corpus:
   build once vs per-batch in-plan composition; bytes probed vs
   corpus bytes (partition pruning x code compression).
3. pq256   — the production codebook size (m=8, k=256, trained):
   disk shrink, exhaustive-ADC scan wall, recall@5 vs brute force.
4. semdedup_k — SemDeDup at k ∝ n on the replicated corpus (the
   paper's regime): trained k-means|| wall + guard behavior, vs the
   guard's refusal at under-clustered k.
5. frontdoor — composed admission+index stream: sec/batch for the
   two-sink foreachBatch vs the admission-only stream.

Usage: python tools/measure_r8.py [section ...]  (default: all)
Sections: scoped ivfpq pq256 semdedup_k frontdoor
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

import pyspark.sql.functions as F

sys.path.insert(0, ".")

from map_reduce_using_cloud_functions_spark.operators import dedup as dd  # noqa: E402
from map_reduce_using_cloud_functions_spark.operators import index as ix  # noqa: E402
from map_reduce_using_cloud_functions_spark.operators import pq  # noqa: E402
from map_reduce_using_cloud_functions_spark.operators import semdedup as sdd  # noqa: E402
from map_reduce_using_cloud_functions_spark.operators import similarity as sim  # noqa: E402
from map_reduce_using_cloud_functions_spark.session import get_spark  # noqa: E402
from map_reduce_using_cloud_functions_spark.sources import load_table  # noqa: E402
from map_reduce_using_cloud_functions_spark.sources.text_corpus import (  # noqa: E402
    documents_as_corpus,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def wall(action, n: int = 3) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        action()
        best = min(best, time.time() - t0)
    return best


def _dir_bytes(path: str) -> int:
    return sum(
        os.path.getsize(os.path.join(r, f)) for r, _, fs in os.walk(path) for f in fs
    )


def _replicated_embeddings(spark, emb, rep: int):
    reps = F.broadcast(spark.range(rep).select(F.col("id").alias("rep")))
    return (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * F.lit(10**9)).alias("vec_id"),
            "embedding",
        )
        # the fixture is one parquet file, so the crossJoin inherits ONE
        # partition — every downstream map stage would run single-
        # threaded and the soak would measure nothing but that accident
        .repartition(64)
        .localCheckpoint()
    )


def section_scoped(spark) -> None:
    rep = 100
    docs = load_table(spark, SF_DIR, "documents")
    reps = F.broadcast(spark.range(rep).select(F.col("id").alias("rep")))
    corpus = (
        documents_as_corpus(docs)
        .crossJoin(reps)
        .select(
            F.concat_ws("#", "document", F.col("rep").cast("string")).alias(
                "document"
            ),
            "text",
        )
        .localCheckpoint()
    )
    tmp = tempfile.mkdtemp(prefix="r8scoped_")
    path = f"{tmp}/idx"
    try:
        t0 = time.time()
        ix.write_index(ix.build_index(corpus), path, versioned=True)
        t_build = time.time() - t0
        base_bytes = ix.index_size_info(spark, path)["base_bytes"]
        all_letters = len(ix._list_letters(spark, f"{path}/v=0"))

        # a 3-letter delta (micro-batch whose words start with a/b/c)
        small = ix.build_index(corpus.limit(200)).where(
            F.substring("word", 1, 1).isin("a", "b", "c")
        )
        ix.write_additive_delta(spark, small, path, 1)
        t0 = time.time()
        ix.compact_index(spark, path, scoped=True)
        t_scoped3 = time.time() - t0

        # a full-coverage delta (normal text: touches most letters)
        wide = ix.build_index(corpus.limit(200))
        ix.write_additive_delta(spark, wide, path, 2)
        t0 = time.time()
        ix.compact_index(spark, path, scoped=True)
        t_scoped_wide = time.time() - t0
        wide_letters = len(
            ix._commit_letter_map(spark, path, ix.index_version(spark, path)) or {}
        )

        # the full fold on the same table (flatten)
        ix.write_additive_delta(spark, small, path, 3)
        t0 = time.time()
        ix.compact_index(spark, path, scoped=False)
        t_full = time.time() - t0
        print(
            f"scoped-compaction @100x base ({base_bytes/1e6:.0f} MB, "
            f"{all_letters} letters, full build {t_build:.1f} s): "
            f"3-letter tail folds in {t_scoped3:.1f} s scoped vs "
            f"{t_full:.1f} s full ({t_full/max(t_scoped3,1e-9):.1f}x); "
            f"full-coverage tail ({wide_letters}-letter map) folds in "
            f"{t_scoped_wide:.1f} s scoped — the win is the coverage "
            "gap, stated honestly"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def section_ivfpq(spark) -> None:
    rep = 50
    emb = load_table(spark, SF_DIR, "embeddings")
    n0 = emb.count()
    big = _replicated_embeddings(spark, emb, rep)
    q = sim.queries_from_ids(emb, 8)
    tmp = tempfile.mkdtemp(prefix="r8ivfpq_")
    path = f"{tmp}/ivfpq"
    fl = f"{tmp}/floats"
    try:
        big.write.mode("overwrite").parquet(fl)
        n_cent = 64  # 2-of-64 probes: the prune fraction is the point
        t0 = time.time()
        pq.build_ivf_pq_index(big, path, n_centroids=n_cent, m=8, k=16)
        t_build = time.time() - t0
        t_inplan = wall(
            lambda: pq.ivf_pq_topk(big, q, n_centroids=n_cent)
            .write.format("noop")
            .mode("overwrite")
            .save(),
            n=2,
        )
        t_indexed = wall(
            lambda: pq.ivf_pq_topk_indexed(spark, path, q)
            .write.format("noop")
            .mode("overwrite")
            .save(),
            n=3,
        )
        same = sorted(
            map(tuple, pq.ivf_pq_topk_indexed(spark, path, q).collect())
        ) == sorted(map(tuple, pq.ivf_pq_topk(big, q, n_centroids=n_cent).collect()))
        codes_bytes = _dir_bytes(f"{path}/codes")
        float_bytes = _dir_bytes(fl)
        probed = {
            r["list_id"]
            for r in sim._probe_query_lists(
                q, sim.load_ivf_centroids(spark, path), 2
            )
            .select("list_id")
            .distinct()
            .collect()
        }
        probed_bytes = sum(
            _dir_bytes(f"{path}/codes/list_id={l}") for l in probed
        )
        print(
            f"ivfpq-index @{n0 * rep:,} vectors: build {t_build:.1f} s once; "
            f"per 8-query batch in-plan {t_inplan:.1f} s vs indexed "
            f"{t_indexed:.2f} s = {t_inplan/max(t_indexed,1e-9):.1f}x; answers "
            f"identical: {same}; codes {codes_bytes/1e6:.1f} MB vs floats "
            f"{float_bytes/1e6:.1f} MB ({float_bytes/max(codes_bytes,1):.1f}x "
            f"smaller; parquet dictionary-codes the replicated rows, so "
            "the on-disk ratio UNDERSTATES the 32x logical shrink); probe "
            f"reads {probed_bytes/1e6:.1f} MB "
            f"({probed_bytes/max(codes_bytes,1)*100:.0f}% of codes, "
            f"{probed_bytes/max(float_bytes,1)*100:.1f}% of the float corpus)"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def section_pq256(spark) -> None:
    rep = 50
    emb = load_table(spark, SF_DIR, "embeddings")
    n0 = emb.count()
    big = _replicated_embeddings(spark, emb, rep)
    q = sim.queries_from_ids(emb, 8)
    tmp = tempfile.mkdtemp(prefix="r8pq256_")
    fl = f"{tmp}/floats"
    try:
        big.write.mode("overwrite").parquet(fl)
        t0 = time.time()
        books = pq.train_pq_codebooks(big, m=8, k=256, train=True, train_iters=2)
        books = books.localCheckpoint()
        t_train = time.time() - t0
        t0 = time.time()
        codes = pq.pq_encode(big, books, packed=True).localCheckpoint()
        t_encode = time.time() - t0
        codes.write.mode("overwrite").parquet(f"{tmp}/codes")
        t_scan = wall(
            lambda: pq.pq_topk(codes, books, q)
            .write.format("noop")
            .mode("overwrite")
            .save(),
            n=3,
        )
        # recall on the DISTINCT base corpus: on the replicated soak the
        # true top-5 is five exact replicas of the query — a trivial
        # target that measures nothing about codebook quality
        base_codes = pq.pq_encode(emb, books, packed=True)
        truth = {
            (r["query_id"], r["neighbor_id"])
            for r in sim.brute_force_topk_vectorized(emb, q, k=5).collect()
        }
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in pq.pq_topk(base_codes, books, q, k=5).collect()
        }
        recall = len(got & truth) / max(len(truth), 1)
        print(
            f"pq k=256 trained @{n0 * rep:,} vectors (m=8, 2 Lloyd iters, "
            f"packed codes): train {t_train:.1f} s + encode {t_encode:.1f} s "
            f"once; exhaustive ADC scan {t_scan:.1f} s per 8-query batch; "
            f"codes {_dir_bytes(tmp + '/codes')/1e6:.1f} MB vs floats "
            f"{_dir_bytes(fl)/1e6:.1f} MB (dictionary-coded replicas — the "
            "logical row is 17 B vs 264 B); recall@5 vs brute force on the "
            f"distinct {n0:,}-vector base {recall:.2f} ({len(truth)} truth "
            "pairs)"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def section_semdedup_k(spark) -> None:
    rep = 50
    emb = load_table(spark, SF_DIR, "embeddings")
    n0 = emb.count()
    big = _replicated_embeddings(spark, emb, rep)
    n = n0 * rep
    k = max(100, n // 100)  # k ∝ n: mean cluster ~100 (the paper regime)
    # guard behavior at under-clustered k (fixed small k on a grown
    # corpus): must refuse, naming a k that fits
    refused = False
    try:
        sdd.semdedup_pairs(big, n_clusters=8).count()
    except ValueError:
        refused = True
    t0 = time.time()
    init = sim.kmeans_parallel_init(big, k, rounds=2)
    cents = sim.train_ivf_centroids(big, k, iters=1, init=init)
    t_train = time.time() - t0
    t0 = time.time()
    surv = sdd.semdedup_survivors(big, n_clusters=k, centroids=cents)
    kept = surv.count()
    t_dedup = time.time() - t0
    print(
        f"semdedup @{n:,} vectors, k={k} (k ∝ n, k-means|| 2 rounds + 1 "
        f"Lloyd iter): train {t_train:.1f} s, dedup pass {t_dedup:.1f} s, "
        f"{kept:,}/{n:,} kept; fixed k=8 at this scale refused by the "
        f"volume guard: {refused}"
    )


def section_frontdoor(spark) -> None:
    import json

    from map_reduce_using_cloud_functions_spark.streaming.near_dedup import (
        start_front_door_stream,
        start_near_dedup_stream,
    )
    from map_reduce_using_cloud_functions_spark.streaming.prep import (
        streaming_corpus_from_jsonl,
    )

    docs = [
        (r["doc_id"], r["text"])
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .limit(5000)
        .collect()
    ]
    n_files = 5

    def run(which: str) -> float:
        tmp = tempfile.mkdtemp(prefix=f"r8fd_{which}_")
        watch = f"{tmp}/in"
        os.makedirs(watch)
        try:
            for i in range(n_files):
                with open(f"{watch}/b{i}.jsonl", "w") as f:
                    for did, text in docs[i::n_files]:
                        f.write(json.dumps({"doc_id": did, "text": text}) + "\n")
            t0 = time.time()
            if which == "admit":
                q = start_near_dedup_stream(
                    spark,
                    streaming_corpus_from_jsonl(spark, watch),
                    f"{tmp}/led",
                    f"{tmp}/out",
                    f"{tmp}/ck",
                )
            else:
                q = start_front_door_stream(
                    spark,
                    streaming_corpus_from_jsonl(spark, watch),
                    f"{tmp}/led",
                    f"{tmp}/out",
                    f"{tmp}/idx",
                    f"{tmp}/ck",
                )
            q.awaitTermination()
            return (time.time() - t0) / n_files
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    t_admit = run("admit")
    t_fd = run("frontdoor")
    print(
        f"front-door stream @{len(docs):,} docs in {n_files} batches: "
        f"admission-only {t_admit:.1f} s/batch; composed admission+index "
        f"{t_fd:.1f} s/batch (+{t_fd - t_admit:.1f} s for the second sink)"
    )


SECTIONS = {
    "scoped": section_scoped,
    "ivfpq": section_ivfpq,
    "pq256": section_pq256,
    "semdedup_k": section_semdedup_k,
    "frontdoor": section_frontdoor,
}


def main() -> None:
    names = sys.argv[1:] or list(SECTIONS)
    spark = get_spark()
    for name in names:
        SECTIONS[name](spark)


if __name__ == "__main__":
    main()
