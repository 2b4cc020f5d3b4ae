"""

HISTORICAL (r7 measurement record): sections that account bytes via fixed subdir paths ({path}/lists, {path}/codes) predate the r9 ANN commit protocol (generation dirs + manifests) — for current indexes resolve through ann_commit.read_artifact/resolve_artifact, or use tools/measure_r9.py.
r7 BASELINE measurements.

1. size-policy at the 100x base: should_compact's decision is
   filesystem metadata only — measure its cost against a 100x-scale
   index with a tiny pending tail, vs the full-rewrite fold the count
   trigger would have paid (the r6 soak measured that rewrite at
   ~100 s).
2. persisted banded-LSH amortization: in-plan lsh_banded_topk
   (re-sketches the corpus per call) vs build_lsh_index once +
   lsh_banded_topk_indexed per batch, at a replicated corpus.
3. int8 IVF lists: float vs quantized persisted lists — bytes on
   disk, per-batch probe wall, neighbor overlap and score error.
4. versioned-vs-in-place streaming first build + per-batch delta cost
   (the 'no stream-cost change' row for the r7 default flip).

Usage: python tools/measure_r7.py [section ...]  (default: all)
Sections: size lsh ivf stream
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

import pyspark.sql.functions as F

sys.path.insert(0, ".")

from map_reduce_using_cloud_functions_spark.operators import index as ix  # noqa: E402
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


def section_size(spark) -> None:
    rep = 100
    docs = load_table(spark, SF_DIR, "documents")
    reps = F.broadcast(spark.range(rep).select(F.col("id").alias("rep")))
    corpus = docs.crossJoin(reps).select(
        F.concat_ws("#", F.col("doc_id").cast("string"), F.col("rep").cast("string")).alias(
            "document"
        ),
        "text",
    )
    tmp = tempfile.mkdtemp(prefix="r7size_")
    path = f"{tmp}/idx"
    try:
        t0 = time.time()
        ix.write_index(ix.build_index(corpus), path, versioned=True)
        t_build = time.time() - t0
        small = ix.build_index(
            spark.createDataFrame([("newdoc", "a few new words")], "document string, text string")
        )
        ix.write_additive_delta(spark, small, path, 1)
        t_decide = wall(lambda: ix.should_compact(spark, path, max_tail_ratio=0.25), n=3)
        info = ix.index_size_info(spark, path)
        fired = ix.should_compact(spark, path, max_tail_ratio=0.25)
        fired_count = ix.should_compact(spark, path, max_pending=1)
        print(
            f"size-policy @100x: base {info['base_bytes']/1e6:.1f} MB, tail "
            f"{info['tail_bytes']/1e3:.1f} KB ({len(info['pending_batches'])} batch); "
            f"decision {t_decide*1000:.0f} ms (min-of-3, metadata-only); "
            f"ratio-0.25 trigger fired={fired} vs count-1 trigger fired={fired_count} "
            f"(the count trigger would pay the full {t_build:.1f} s-scale base rewrite "
            "for a KB tail)"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def section_lsh(spark) -> None:
    rep = 50
    emb = load_table(spark, SF_DIR, "embeddings")
    n0 = emb.count()
    reps = F.broadcast(spark.range(rep).select(F.col("id").alias("rep")))
    big = (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * F.lit(10**9)).alias("vec_id"),
            "embedding",
        )
        .localCheckpoint()
    )
    q = sim.queries_from_ids(emb, 8)
    tmp = tempfile.mkdtemp(prefix="r7lsh_")
    path = f"{tmp}/lsh"
    try:
        t0 = time.time()
        sim.build_lsh_index(big, path)
        t_build = time.time() - t0
        t_inplan = wall(
            lambda: sim.lsh_banded_topk(big, q, scale_guard="off").write.format("noop")
            .mode("overwrite")
            .save(),
            n=3,
        )
        t_indexed = wall(
            lambda: sim.lsh_banded_topk_indexed(spark, path, q, scale_guard="off")
            .write.format("noop")
            .mode("overwrite")
            .save(),
            n=3,
        )
        same = sorted(
            map(tuple, sim.lsh_banded_topk_indexed(spark, path, q).collect())
        ) == sorted(map(tuple, sim.lsh_banded_topk(big, q, scale_guard="off").collect()))
        print(
            f"lsh-index @{n0 * rep:,} vectors: build {t_build:.1f} s once; per "
            f"8-query batch in-plan {t_inplan:.2f} s vs indexed {t_indexed:.2f} s "
            f"(min-of-3) = {t_inplan / t_indexed:.1f}x per batch; answers identical: {same}"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def section_ivf(spark) -> None:
    emb = load_table(spark, SF_DIR, "embeddings")
    q = sim.queries_from_ids(emb, 64)
    tmp = tempfile.mkdtemp(prefix="r7ivf_")
    fpath, qpath = f"{tmp}/f", f"{tmp}/q"
    try:
        sim.build_ivf_index(emb, fpath, n_centroids=8)
        sim.build_ivf_index(emb, qpath, n_centroids=8, quantize=True)
        fb = _dir_bytes(f"{fpath}/lists")
        qb = _dir_bytes(f"{qpath}/lists")
        t_f = wall(
            lambda: sim.ivf_topk_indexed(spark, fpath, q, n_probe=2)
            .write.format("noop")
            .mode("overwrite")
            .save(),
            n=3,
        )
        t_q = wall(
            lambda: sim.ivf_topk_indexed(spark, qpath, q, n_probe=2)
            .write.format("noop")
            .mode("overwrite")
            .save(),
            n=3,
        )
        f = {
            (r["query_id"], r["neighbor_id"]): r["score"]
            for r in sim.ivf_topk_indexed(spark, fpath, q, n_probe=2).collect()
        }
        qz = {
            (r["query_id"], r["neighbor_id"]): r["score"]
            for r in sim.ivf_topk_indexed(spark, qpath, q, n_probe=2).collect()
        }
        overlap = len(set(f) & set(qz)) / max(len(f), 1)
        err = max((abs(f[k] - qz[k]) for k in set(f) & set(qz)), default=0.0)
        print(
            f"ivf int8 lists @{emb.count():,} vectors, 64-query batch, 2/8 probe: "
            f"lists {fb/1e6:.2f} MB float vs {qb/1e6:.2f} MB int8 "
            f"({fb/qb:.2f}x narrower); probe {t_f:.2f} s float vs {t_q:.2f} s int8 "
            f"(min-of-3); neighbor overlap {overlap:.3f}, max |score err| {err:.4f}"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def section_stream(spark) -> None:
    from map_reduce_using_cloud_functions_spark.streaming.file_index import (
        start_file_index_stream,
    )

    docs = load_table(spark, SF_DIR, "documents")
    texts = [r["text"] for r in docs.select("text").limit(600).collect()]
    for versioned in (True, False):
        base = tempfile.mkdtemp(prefix=f"r7stream_{versioned}_")
        watch = os.path.join(base, "watch")
        os.makedirs(watch)
        try:
            for i in range(6):
                with open(os.path.join(watch, f"p{i}.txt"), "w") as f:
                    f.write("\n".join(texts[i::6]))
            t0 = time.time()
            q = start_file_index_stream(
                spark,
                watch,
                os.path.join(base, "idx"),
                os.path.join(base, "ckpt"),
                additive=True,
                max_files_per_trigger=1,
                versioned=versioned,
            )
            q.awaitTermination()
            total = time.time() - t0
            batch_secs = [
                round(p["durationMs"]["triggerExecution"] / 1000.0, 2)
                for p in q.recentProgress
                if p["numInputRows"] > 0
            ]
            print(
                f"additive stream versioned={versioned}: {total/6:.2f} s/file "
                f"(6 files; per-batch {batch_secs})"
            )
        finally:
            shutil.rmtree(base, ignore_errors=True)


def _replicated_embeddings(spark, emb, rep: int):
    reps = F.broadcast(spark.range(rep).select(F.col("id").alias("rep")))
    return (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * F.lit(10**9)).alias("vec_id"),
            "embedding",
        )
        .localCheckpoint()
    )


def section_append(spark) -> None:
    """r7 appends: growing a persisted ANN index by a release batch via
    append_* vs the full rebuild the pre-r7 API forced. The batch is
    1/rep of the corpus — the release-over-standing-corpus shape."""
    rep = 50
    emb = load_table(spark, SF_DIR, "embeddings")
    n0 = emb.count()
    big = _replicated_embeddings(spark, emb, rep)
    batch = emb.select((F.col("vec_id") + F.lit(rep * 10**9)).alias("vec_id"), "embedding")
    tmp = tempfile.mkdtemp(prefix="r7append_")
    try:
        for kind, build, append in (
            ("lsh", sim.build_lsh_index, sim.append_lsh_index),
            (
                "ivf",
                lambda df, p: sim.build_ivf_index(df, p, n_centroids=8),
                sim.append_ivf_index,
            ),
        ):
            path = f"{tmp}/{kind}"
            build(big, path)
            t_append = wall(lambda: append(batch, path), n=1)
            t_rebuild = wall(
                lambda: build(big.unionByName(batch), f"{tmp}/{kind}_rb"), n=1
            )
            print(
                f"{kind}-append @{n0 * rep:,}+{n0:,} vectors: append "
                f"{t_append:.1f} s vs full rebuild {t_rebuild:.1f} s = "
                f"{t_rebuild / t_append:.1f}x per release (append cost is "
                "O(batch); rebuild re-reads the standing corpus)"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def section_ledger(spark) -> None:
    """Cross-release near-dup: probing the persisted MinHash ledger vs
    the joint re-sketch a ledger-less pipeline pays (sketch prior
    releases + batch together, then keep only cross pairs)."""
    from map_reduce_using_cloud_functions_spark.operators import dedup as dd

    rep = 20
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n0 = docs.count()
    reps = F.broadcast(spark.range(rep).select(F.col("id").alias("rep")))
    prior = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * F.lit(10**9)).alias("doc_id"), "text"
        )
        .localCheckpoint()
    )
    batch = docs.select((F.col("doc_id") + F.lit(rep * 10**9)).alias("doc_id"), "text")
    tmp = tempfile.mkdtemp(prefix="r7ledger_")
    path = f"{tmp}/led"
    try:
        t_build = wall(lambda: dd.build_minhash_ledger(prior, path), n=1)
        t_probe = wall(
            lambda: dd.ledger_near_dup_pairs(spark, batch, path, threshold=0.5)
            .write.format("noop")
            .mode("overwrite")
            .save(),
            n=3,
        )
        t_joint = wall(
            lambda: dd.minhash_dedup_pairs(
                prior.unionByName(batch), threshold=0.5
            )
            .where((F.col("doc_a") >= rep * 10**9) != (F.col("doc_b") >= rep * 10**9))
            .write.format("noop")
            .mode("overwrite")
            .save(),
            n=1,
        )
        led_mb = _dir_bytes(path) / 1e6
        print(
            f"near-dup ledger @{n0 * rep:,} prior + {n0:,} batch docs: build "
            f"{t_build:.1f} s once ({led_mb:.1f} MB stored — signatures, never "
            f"text); probe {t_probe:.1f} s (min-of-3) vs joint re-sketch "
            f"{t_joint:.1f} s per release = {t_joint / t_probe:.1f}x (joint also "
            "re-pays itself on EVERY release as the corpus grows; the probe "
            "pays only the batch)"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def section_semdedup(spark) -> None:
    """SemDeDup scale contract: within-cluster pair volume is the cost,
    and the paper's k ∝ n rule is what bounds it. Three points: the
    1x fixture at the k=8 default; the 100x corpus at the SAME k=8
    (the guard must refuse — measured volume ~1e4x the 1x point); the
    100x corpus at the scaled k=97 (the seed-slot ceiling), which fits
    the budget and runs."""
    from map_reduce_using_cloud_functions_spark.operators import semdedup as sd

    emb = load_table(spark, SF_DIR, "embeddings")
    n0 = emb.count()
    big = _replicated_embeddings(spark, emb, 100)

    t1 = wall(
        lambda: sd.semdedup_survivors(emb, n_clusters=8)
        .write.format("noop")
        .mode("overwrite")
        .save(),
        n=3,
    )
    print(f"semdedup @1x ({n0:,} vecs, k=8): {t1:.1f} s (min-of-3)")

    # recall: the method only sees pairs that co-cluster — quantify the
    # miss rate against the corpus-wide exact pair relation at the same
    # threshold (brute force is fine at fixture scale)
    tau = 0.4
    got = {
        (r["vec_a"], r["vec_b"])
        for r in sd.semdedup_pairs(emb, n_clusters=8, threshold=tau).collect()
    }
    truth = {
        (r["vec_a"], r["vec_b"])
        for r in sim.pairwise_near_dup(emb, threshold=tau, exact=True).collect()
    }
    print(
        f"semdedup @1x pair recall vs corpus-wide exact at tau={tau}: "
        f"{len(got & truth)}/{len(truth)} "
        f"({100 * len(got & truth) / max(len(truth), 1):.0f}% — misses are "
        "pairs split across clusters; finer k lowers cost AND recall, "
        "the method's stated trade)"
    )
    try:
        sd.semdedup_pairs(big, n_clusters=8).write.format("noop").mode(
            "overwrite"
        ).save()
        print("semdedup @100x k=8: GUARD DID NOT FIRE (unexpected)")
    except ValueError as e:
        print(f"semdedup @100x ({n0 * 100:,} vecs, k=8): guard refused — {e}")
    t100 = wall(
        lambda: sd.semdedup_survivors(big, n_clusters=97)
        .write.format("noop")
        .mode("overwrite")
        .save(),
        n=1,
    )
    print(
        f"semdedup @100x ({n0 * 100:,} vecs, k=97 — k scaled with n per "
        f"the method): {t100:.1f} s = {t100 / t1:.1f}x wall for 100x data"
    )


def section_ingest(spark) -> None:
    """Streaming near-dup admission: per-batch cost against a growing
    standing ledger — release 0 (cold build) vs a same-size batch
    admitted over a 10x standing corpus. The claim under test: the
    batch pays for itself + collisions, never for the corpus."""
    from map_reduce_using_cloud_functions_spark.streaming.near_dedup import (
        admit_batch,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n0 = docs.count()
    reps = F.broadcast(spark.range(10).select(F.col("id").alias("rep")))
    standing = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * F.lit(10**9)).alias("doc_id"),
            "text",
        )
        .localCheckpoint()
    )
    batch = docs.select(
        (F.col("doc_id") + F.lit(20 * 10**9)).alias("doc_id"), "text"
    ).localCheckpoint()
    tmp = tempfile.mkdtemp(prefix="r7ingest_")
    try:
        t0 = wall(
            lambda: admit_batch(
                spark, standing, f"{tmp}/led", f"{tmp}/out", batch_id=0
            ),
            n=1,
        )
        t1 = wall(
            lambda: admit_batch(
                spark, batch, f"{tmp}/led", f"{tmp}/out", batch_id=1
            ),
            n=1,
        )
        survivors = spark.read.parquet(f"{tmp}/out")
        kept1 = survivors.where(F.col("release") == 1).count()
        print(
            f"streaming admission: release 0 builds {n0 * 10:,} docs in "
            f"{t0:.1f} s (within-batch near-dedup + ledger append); a "
            f"{n0:,}-doc batch over that standing ledger admits in "
            f"{t1:.1f} s (kept {kept1:,} — replica-of-standing docs "
            "refused); batch cost is probe + append, never a corpus "
            "re-sketch"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def section_pq(spark) -> None:
    """Product quantization at 100x: bytes on disk (the compression
    contract) and per-query-batch ADC scan wall vs the float scans —
    honest one-box verdict included."""
    from map_reduce_using_cloud_functions_spark.operators import pq
    from map_reduce_using_cloud_functions_spark.operators import similarity as sim

    emb = load_table(spark, SF_DIR, "embeddings")
    n0 = emb.count()
    # DISTINCT deterministic vectors, not fixture replicas: parquet's
    # dictionary coding crushes 100x-replicated rows and would report a
    # fantasy compression ratio for the float corpus. Hash-derived
    # components are deterministic and incompressible-ish — the honest
    # bytes comparison.
    dim = 64
    big = (
        spark.range(n0 * 100)
        .select(
            F.col("id").alias("vec_id"),
            F.expr(
                "transform(sequence(0, 63), d -> "
                "cast((pmod(xxhash64(id, d), 2001) - 1000) / 1000.0 as float))"
            ).alias("embedding"),
        )
        .localCheckpoint()
    )
    q = big.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    _ = dim
    tmp = tempfile.mkdtemp(prefix="r7pq_")
    try:
        path = f"{tmp}/pq"
        t_build = wall(lambda: pq.build_pq_index(big, path, m=8, k=16), n=1)
        packed = f"{tmp}/pqp"
        pq.build_pq_index(big, packed, m=8, k=16, packed=True)
        floats = f"{tmp}/floats"
        big.write.mode("overwrite").parquet(floats)
        code_mb = _dir_bytes(f"{path}/codes") / 1e6
        packed_mb = _dir_bytes(f"{packed}/codes") / 1e6
        float_mb = _dir_bytes(floats) / 1e6
        t_adc = wall(
            lambda: pq.pq_topk_indexed(spark, path, q)
            .write.format("noop")
            .mode("overwrite")
            .save(),
            n=3,
        )
        t_rerank = wall(
            lambda: pq.pq_topk_indexed(
                spark, path, q, shortlist=100, embeddings=big
            )
            .write.format("noop")
            .mode("overwrite")
            .save(),
            n=3,
        )
        t_bf = wall(
            lambda: sim.brute_force_topk_vectorized(big, q)
            .write.format("noop")
            .mode("overwrite")
            .save(),
            n=3,
        )
        t_adc_packed = wall(
            lambda: pq.pq_topk_indexed(spark, packed, q)
            .write.format("noop")
            .mode("overwrite")
            .save(),
            n=3,
        )
        print(
            f"PQ @{n0 * 100:,} vecs (m=8, k=16): build {t_build:.1f} s once; "
            f"codes {code_mb:.1f} MB (array) / {packed_mb:.1f} MB (packed "
            f"BIGINT) vs float corpus {float_mb:.1f} MB = "
            f"{float_mb / code_mb:.1f}x / {float_mb / packed_mb:.1f}x "
            f"smaller; per 8-query batch: ADC scan {t_adc:.1f} s (array) / "
            f"{t_adc_packed:.1f} s (packed), ADC+exact-rerank(100) "
            f"{t_rerank:.1f} s, Arrow+NumPy float brute force {t_bf:.1f} s "
            "(min-of-3 each)"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def section_strip(spark) -> None:
    """Boilerplate strip at 100x: the df count is a narrow hash shuffle
    and the text shuffles exactly once — wall should track corpus
    bytes, not segment-pair anything."""
    from map_reduce_using_cloud_functions_spark.operators.prep import (
        strip_boilerplate_lines,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n0 = docs.count()
    reps = F.broadcast(spark.range(100).select(F.col("id").alias("rep")))
    big = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * F.lit(10**9)).alias("doc_id"), "text"
        )
        .localCheckpoint()
    )
    t1 = wall(
        lambda: strip_boilerplate_lines(docs, min_df=2500, sep=" ")
        .write.format("noop")
        .mode("overwrite")
        .save(),
        n=3,
    )
    t100 = wall(
        lambda: strip_boilerplate_lines(big, min_df=250000, sep=" ")
        .write.format("noop")
        .mode("overwrite")
        .save(),
        n=1,
    )
    print(
        f"boilerplate strip @1x ({n0:,} docs, word granularity): {t1:.1f} s "
        f"(min-of-3); @100x ({n0 * 100:,} docs): {t100:.1f} s = "
        f"{t100 / t1:.1f}x wall for 100x data (df threshold scaled with "
        "the corpus so the removed set is identical)"
    )


def main() -> None:
    sections = sys.argv[1:] or ["size", "lsh", "ivf", "stream", "append", "ledger"]
    spark = get_spark("measure_r7")
    spark.sparkContext.setLogLevel("ERROR")
    for s in sections:
        {
            "size": section_size,
            "lsh": section_lsh,
            "ivf": section_ivf,
            "stream": section_stream,
            "append": section_append,
            "ledger": section_ledger,
            "semdedup": section_semdedup,
            "ingest": section_ingest,
            "pq": section_pq,
            "strip": section_strip,
        }[s](spark)


if __name__ == "__main__":
    main()
