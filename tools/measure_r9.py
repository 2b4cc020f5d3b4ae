"""r9 measurements for BASELINE.md — run each section standalone:

  python tools/measure_r9.py train_flat   # sample-based training cost
  python tools/measure_r9.py delete_cost  # takedown ∝ touched letters
  python tools/measure_r9.py residual     # residual vs raw ADC recall
  python tools/measure_r9.py tombstone    # ANN tombstone delete+probe

Methodology matches measure_r7/r8: one warm session per section,
replicated/rotated sf0.1 corpora for scale axes, wall times printed as
the BASELINE rows they become.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from map_reduce_using_cloud_functions_spark.session import get_spark
from map_reduce_using_cloud_functions_spark.sources import load_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _replicated_embeddings(spark, emb, rep: int):
    """rep copies with offset ids and per-replica circular rotation
    (decorrelated directions — no duplicate-flood artifacts)."""
    parts = []
    for r in range(rep):
        p = emb.select(
            (F.col("vec_id") + F.lit(r * 1_000_000)).alias("vec_id"),
            (
                F.concat(
                    F.slice("embedding", (r * 6 + 1) % 64 + 1, 64 - (r * 6 + 1) % 64),
                    F.slice("embedding", 1, (r * 6 + 1) % 64),
                )
                if r
                else F.col("embedding")
            ).alias("embedding"),
        )
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.localCheckpoint()


def train_flat():
    """Training cost vs corpus size at fixed k: full-corpus Lloyd grows
    with n (every round scans everything); train_sample_size pins it to
    the sample. k-means|| init included (it was also O(corpus)/round)."""
    from map_reduce_using_cloud_functions_spark.operators.similarity import (
        _train_or_seed,
    )

    spark = get_spark("measure_r9")
    emb = load_table(spark, SF, "embeddings")  # 2k vectors
    for rep in (10, 50):
        big = _replicated_embeddings(spark, emb, rep)
        n = big.count()
        for label, kw in (
            ("full", {}),
            ("sample10k", {"train_sample_size": 10_000}),
        ):
            t0 = time.time()
            cents = _train_or_seed(big, 16, True, 2, "kmeans||", **kw)
            cents.collect()
            print(
                f"train_flat n={n} {label}: {time.time() - t0:.1f}s "
                f"(k=16, 2 Lloyd rounds + kmeans|| init)"
            )


def delete_cost():
    """delete_documents cost ∝ touched letters — measured on BOTH data
    shapes: (a) narrow-vocabulary documents (each doc's words share a
    first letter — the shape where a takedown touches few partitions:
    per-language shards, URL/id postings, prefixed vocabularies), where
    the scoped fold rewrites only those letters; (b) the fixture's
    wide-vocabulary prose, where 5 documents touch every letter and the
    scoped fold honestly degenerates to ~a full fold (stated, not
    hidden — the mechanism prunes on the touched set, and prose touches
    everything)."""
    from map_reduce_using_cloud_functions_spark.operators import index as ix
    from map_reduce_using_cloud_functions_spark.sources.text_corpus import (
        documents_as_corpus,
    )

    spark = get_spark("measure_r9")
    import shutil

    corpus = documents_as_corpus(load_table(spark, SF, "documents")).localCheckpoint()

    # (a) narrow-vocab: one letter per document (letter = doc hash)
    narrow = corpus.select(
        "document",
        F.concat_ws(
            " ",
            F.transform(
                F.split("text", r"\s+"),
                lambda w: F.concat(
                    F.substring(
                        F.concat(F.lit("abcdefghijklmnopqrstuvwxyz"), F.lit("")),
                        (F.crc32(F.col("document")) % 26 + 1).cast("int"),
                        1,
                    ),
                    w,
                ),
            ),
        ).alias("text"),
    ).localCheckpoint()
    for label, cps in (("narrow", narrow), ("prose", corpus)):
        path = f"/tmp/m9_idx_{label}"
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.time()
        ix.write_index(ix.build_index(cps), path, versioned=True)
        build_s = time.time() - t0
        doomed = [
            r["document"]
            for r in cps.select("document").distinct().limit(5).collect()
        ]
        t0 = time.time()
        ix.delete_documents(spark, path, doomed)
        del_s = time.time() - t0
        v = ix.index_version(spark, path)
        lm = ix._commit_letter_map(spark, path, v) or {}
        touched = sum(1 for owner in lm.values() if owner == v)
        del_bytes = ix._dir_bytes(spark, ix._version_dir(path, v))
        t0 = time.time()
        merged = ix.read_index(spark, path).localCheckpoint()
        ix.write_index(merged, path)
        full_s = time.time() - t0
        full_bytes = ix._dir_bytes(
            spark, ix._version_dir(path, ix.index_version(spark, path))
        )
        # wall at this fixture scale is scheduler-bound (fixed ~2-3 s
        # per fold either way); BYTES REWRITTEN is the quantity that
        # extrapolates to 100 TB, so it leads the row.
        print(
            f"delete_cost[{label}]: delete 5 docs rewrote "
            f"{touched}/{len(lm)} letters = {del_bytes/1e6:.1f} MB vs "
            f"full fold {full_bytes/1e6:.1f} MB "
            f"({full_bytes / max(del_bytes, 1):.1f}x the data); walls "
            f"build {build_s:.1f}s / delete {del_s:.1f}s / full "
            f"{full_s:.1f}s (scheduler-bound at this fixture size)"
        )


def residual():
    """Residual vs raw ADC recall@5 on a clustered corpus (the data
    shape embeddings have in production), end-to-end built indexes."""
    import numpy as np

    from map_reduce_using_cloud_functions_spark.operators import pq
    from map_reduce_using_cloud_functions_spark.operators.similarity import (
        brute_force_topk,
    )

    spark = get_spark("measure_r9")
    rng = np.random.default_rng(7)
    n, n_true, dim, noise = 4000, 16, 32, 0.5
    centers = rng.normal(size=(n_true, dim))
    pts = centers[np.arange(n) % n_true] + noise * rng.normal(size=(n, dim))
    emb = spark.createDataFrame(
        [(int(i), [float(v) for v in pts[i]]) for i in range(n)],
        "vec_id bigint, embedding array<float>",
    ).localCheckpoint()
    q = emb.where("vec_id < 16").select("vec_id", "embedding").toDF(
        "query_id", "q_embedding"
    )
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, q, k=5).collect()
    }

    def recall(rows):
        return sum(1 for r in rows if (r["query_id"], r["neighbor_id"]) in truth) / len(
            truth
        )

    import shutil

    for pk in (16, 256):
        out = {}
        for kind, res in (("raw", False), ("residual", True)):
            path = f"/tmp/m9_ivfpq_{pk}_{kind}"
            shutil.rmtree(path, ignore_errors=True)
            t0 = time.time()
            pq.build_ivf_pq_index(
                emb, path, n_centroids=16, m=8, k=pk, train=True,
                train_iters=2, residual=res,
            )
            b = time.time() - t0
            got = pq.ivf_pq_topk_indexed(spark, path, q).collect()
            out[kind] = (recall(got), b)
        print(
            f"residual k={pk}: raw recall@5 {out['raw'][0]:.3f} "
            f"(build {out['raw'][1]:.1f}s) vs residual "
            f"{out['residual'][0]:.3f} (build {out['residual'][1]:.1f}s)"
        )


def tombstone():
    """delete_vectors cost and probe overhead: O(ids) write + commit;
    the probe pays one broadcast anti-join."""
    from map_reduce_using_cloud_functions_spark.operators import ann_commit as ac
    from map_reduce_using_cloud_functions_spark.operators import pq
    from map_reduce_using_cloud_functions_spark.operators.similarity import (
        queries_from_ids,
    )

    spark = get_spark("measure_r9")
    emb = _replicated_embeddings(spark, load_table(spark, SF, "embeddings"), 10)
    q = queries_from_ids(emb, 8)
    path = "/tmp/m9_tomb"
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    pq.build_ivf_pq_index(emb, path, n_centroids=16, m=8, k=16)
    t0 = time.time()
    pq.ivf_pq_topk_indexed(spark, path, q).collect()
    probe_before = time.time() - t0
    t0 = time.time()
    ac.delete_vectors(spark, path, list(range(0, 2000, 7)))
    del_s = time.time() - t0
    t0 = time.time()
    pq.ivf_pq_topk_indexed(spark, path, q).collect()
    probe_after = time.time() - t0
    print(
        f"tombstone: delete 286 of 20000 vectors {del_s:.1f}s "
        f"(zero corpus rewritten); probe {probe_before:.1f}s -> "
        f"{probe_after:.1f}s with the anti-join"
    )


def compaction():
    """Probe cost vs generation fan-out, and the compaction reset: 8
    appends → 8 unioned (pruned) scans per probe + a tombstone
    anti-join; one compact_ann_index → 1 scan, 0 anti-join."""
    from map_reduce_using_cloud_functions_spark.operators import ann_commit as ac
    from map_reduce_using_cloud_functions_spark.operators import pq
    from map_reduce_using_cloud_functions_spark.operators.similarity import (
        queries_from_ids,
    )

    spark = get_spark("measure_r9")
    emb = _replicated_embeddings(spark, load_table(spark, SF, "embeddings"), 10)
    q = queries_from_ids(emb, 8)
    path = "/tmp/m9_compact"
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    pq.build_ivf_pq_index(emb.where("vec_id % 8 = 0"), path, n_centroids=16, m=8, k=16)
    for r in range(1, 8):
        pq.append_ivf_pq_index(emb.where(f"vec_id % 8 = {r}"), path)
    ac.delete_vectors(spark, path, list(range(0, 2000, 11)))

    def probe():
        t0 = time.time()
        pq.ivf_pq_topk_indexed(spark, path, q).collect()
        return time.time() - t0

    probe()  # warm the plan shape
    info = ac.ann_index_info(spark, path)
    t_multi = min(probe() for _ in range(3))
    t0 = time.time()
    ac.compact_ann_index(spark, path)
    compact_s = time.time() - t0
    info2 = ac.ann_index_info(spark, path)
    probe()
    t_one = min(probe() for _ in range(3))
    print(
        f"compaction: probe at {info['generations']['codes']} code "
        f"generations + {info['tombstones']} tombstones {t_multi:.2f}s; "
        f"compact_ann_index {compact_s:.1f}s (one corpus rewrite); probe "
        f"at {info2['generations']['codes']} generation {t_one:.2f}s"
    )


def ledger_compaction():
    """Probe cost vs release fan-out on the MinHash ledger, and the
    compact_minhash_ledger reset: 40 admitted batches = 40 sigs
    partitions + 40×bands band directories unioned per probe; one fold
    → 2 releases (folded history + the kept tail)."""
    from map_reduce_using_cloud_functions_spark.operators import dedup as dd

    spark = get_spark("measure_r9")
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    prior = docs.where("doc_id % 25 != 0").localCheckpoint()
    batch = docs.where("doc_id % 25 = 0").localCheckpoint()
    path = "/tmp/m9_ledcompact"
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    n_rel = 40
    dd.init_minhash_ledger(spark, path)
    t0 = time.time()
    for r in range(n_rel):
        dd.append_minhash_ledger(
            prior.where(F.col("doc_id") % (n_rel + 1) == r), path, release=r
        )
    append_s = time.time() - t0

    def probe():
        t0 = time.time()
        dd.ledger_near_dup_pairs(spark, batch, path, threshold=0.5).collect()
        return time.time() - t0

    probe()  # warm the plan shape
    info = dd.ledger_info(spark, path)
    t_multi = min(probe() for _ in range(3))
    t0 = time.time()
    dd.compact_minhash_ledger(spark, path, keep_last=1)
    compact_s = time.time() - t0
    info2 = dd.ledger_info(spark, path)
    probe()
    t_one = min(probe() for _ in range(3))
    print(
        f"ledger_compaction: {info['n_docs']} docs across "
        f"{len(info['releases'])} releases ({info['band_dirs']} band "
        f"dirs; {append_s:.0f}s to append), probe {t_multi:.2f}s; "
        f"compact_minhash_ledger {compact_s:.1f}s (one sketch-relation "
        f"rewrite); probe at {len(info2['releases'])} releases "
        f"({info2['band_dirs']} band dirs) {t_one:.2f}s"
    )


def zorder():
    """Scan pruning vs layout at sf0.1 (600k lineitem rows, 32 files):
    footer-excluded row groups + wall for a 1/16-domain range predicate
    on each of the two z columns, z-order vs single-column sort."""
    from map_reduce_using_cloud_functions_spark.operators.layout import (
        write_zordered,
        zorder_scan_stats,
    )

    spark = get_spark("measure_r9")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    hi_ok = li.agg(F.max("l_orderkey")).first()[0]
    hi_pk = li.agg(F.max("l_partkey")).first()[0]
    import shutil

    for p in ("/tmp/m9_z", "/tmp/m9_zq", "/tmp/m9_one"):
        shutil.rmtree(p, ignore_errors=True)
    t0 = time.time()
    write_zordered(li, "/tmp/m9_z", ["l_orderkey", "l_partkey"], num_files=32)
    z_write = time.time() - t0
    t0 = time.time()
    write_zordered(
        li,
        "/tmp/m9_zq",
        ["l_orderkey", "l_partkey"],
        num_files=32,
        scaling="quantile",
    )
    zq_write = time.time() - t0
    t0 = time.time()
    (
        li.repartitionByRange(32, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet("/tmp/m9_one")
    )
    one_write = time.time() - t0

    def scan(path, col, hi):
        df = spark.read.parquet(path).where(
            (F.col(col) >= 0) & (F.col(col) <= hi * 0.0625)
        )
        t0 = time.time()
        df.agg(F.sum("l_extendedprice")).collect()
        return time.time() - t0

    for path, name, wt in (
        ("/tmp/m9_z", "zorder(linear)", z_write),
        ("/tmp/m9_zq", "zorder(quantile)", zq_write),
        ("/tmp/m9_one", "sort(l_orderkey)", one_write),
    ):
        scan(path, "l_orderkey", hi_ok)  # warm
        t_ok = min(scan(path, "l_orderkey", hi_ok) for _ in range(3))
        t_pk = min(scan(path, "l_partkey", hi_pk) for _ in range(3))
        s_ok = zorder_scan_stats(spark, path, "l_orderkey", 0, hi_ok * 0.0625)
        s_pk = zorder_scan_stats(spark, path, "l_partkey", 0, hi_pk * 0.0625)
        print(
            f"{name}: write {wt:.1f}s; orderkey-range scan {t_ok:.2f}s "
            f"(row groups skipped {s_ok['skipped']}/{s_ok['row_groups']}), "
            f"partkey-range scan {t_pk:.2f}s "
            f"(skipped {s_pk['skipped']}/{s_pk['row_groups']})"
        )


def semantic_gate():
    """Marginal cost of the semantic admission stage: admit 4 batches
    of sf0.1 documents with the MinHash gate alone vs MinHash +
    embedding ledger (hashed_doc_vectors embedder, r=8 b=8)."""
    import shutil

    from map_reduce_using_cloud_functions_spark.streaming.near_dedup import (
        admit_batch,
    )

    spark = get_spark("measure_r9")
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    batches = [
        docs.where(F.col("doc_id") % 4 == i).localCheckpoint() for i in range(4)
    ]
    for tag, sem in (("minhash-only", False), ("minhash+semantic", True)):
        root = f"/tmp/m9_semgate_{int(sem)}"
        shutil.rmtree(root, ignore_errors=True)
        t0 = time.time()
        for i, b in enumerate(batches):
            admit_batch(
                spark,
                b,
                f"{root}/led",
                f"{root}/out",
                i,
                semantic_ledger_path=f"{root}/sled" if sem else None,
            )
        wall = time.time() - t0
        n = spark.read.parquet(f"{root}/out").count()
        print(
            f"semantic_gate[{tag}]: 4 batches x {batches[0].count()} docs "
            f"in {wall:.1f}s ({wall / 4:.2f}s/batch), {n} admitted"
        )


if __name__ == "__main__":
    {
        "train_flat": train_flat,
        "delete_cost": delete_cost,
        "residual": residual,
        "tombstone": tombstone,
        "compaction": compaction,
        "ledger_compaction": ledger_compaction,
        "zorder": zorder,
        "semantic_gate": semantic_gate,
    }[sys.argv[1]]()
