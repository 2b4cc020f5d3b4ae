"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is forced by aggregating a hash over EVERY output column
(bit_xor of xxhash64 across the full result) — unlike a bare count(), this
makes Catalyst actually compute each projected column, so featurizer
queries (e.g. text_token_counts) are timed doing their work, while still
keeping driver IPC to one row. A warmup query first pays JVM/codegen
startup so per-query numbers reflect steady-state execution, and each
query is timed SPARK_GRAFT_BENCH_REPS times (default 2) with the min
recorded — the standard steady-state estimator (interference only ever
inflates a sample). The BASELINE.md anchor uses the same methodology.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyspark.sql.functions as F

import __spark_entry__ as entrymod
from map_reduce_using_cloud_functions_spark.session import get_spark


def force(df) -> None:
    """Consume every computed column without collecting the result
    (bit_xor of a row hash — overflow-free under ANSI mode)."""
    df.select(F.xxhash64(*[F.col(c) for c in df.columns]).alias("h")).agg(
        F.bit_xor("h")
    ).collect()

# Headline queries: one per operator family — index build (the
# reference's whole job), scan-heavy agg, star join, window, sessionize,
# dedup sketches, similarity, text featurizers.
BENCH_QUERIES = [
    "index_build",
    "index_lookup",
    "q1_pricing_summary",
    "revenue_by_region",
    "top_orders_per_customer",
    "events_sessionize",
    "events_tumbling_hourly",
    "events_asof_join",
    "dedup_exact_groups",
    "dedup_minhash_pairs",
    "dedup_clusters",
    "dedup_shingle_jaccard",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_embedding_pairs",
    "training_corpus_prep",
    "ann_topk_bruteforce",
    "ann_topk_vectorized",
    "text_tfidf",
    "text_stats",
    "text_token_counts",
    "text_chunks",
    "sample_corpus_mix",
    "token_packing",
    "corpus_upsample_shuffle",
    "corpus_decontaminate",
    "multimodal_asset_stats",
    # post-gate extras (tools/extra_queries.py) — benched like gate rows
    "text_repetition_flags",
    "corpus_mix_report",
    "text_unigram_logprob",
    "text_bigram_logprob",
    "corpus_split_assignment",
    "dedup_duplicate_spans",
    "ann_topk_lsh_banded",  # r5: banded multi-probe LSH retrieval
    "semdedup_survivors",  # r7: SemDeDup end-to-end (assign+pairs+prune)
    "ann_topk_pq",  # r7: product-quantized exhaustive ADC scan
    "corpus_boilerplate_strip",  # r7: cross-corpus line removal
    "ann_topk_ivfpq",  # r8: composed IVF routing + ADC scoring
    "ann_topk_ivfpq_residual",  # r9: residual encoding (FAISS default)
    "corpus_vocab_sketch",  # r9: bounded-state distinct estimation
    # r10: the SCALE-SAFE configs of the two fixed-resolution judged
    # rows — benched at every SF so a regression in exactly the
    # configuration a 100 TB run would use is visible per round
    "semdedup_survivors_scaled",
    "dedup_embedding_pairs_production",
    "multimodal_phash_pairs",  # r10: perceptual image near-dup (X5)
    "multimodal_audiohash_pairs",  # r11: audio energy-sign near-dup (X5)
    "multimodal_videohash_pairs",  # r12: temporal video near-dup (X5)
    "multimodal_image_embeddings",  # r12: asset semantic-gate featurizer
]


def bench_streaming(spark, sf_dir: str, n_files: int = 6) -> dict:
    """O19 streaming bench: drop the sf_dir documents as ``n_files``
    text files, drain them through ``start_file_index_stream`` as
    single-file micro-batches (maxFilesPerTrigger=1 — each batch
    tokenizes its file and partition-upserts the parquet index), and
    report steady-state sec/file. Runs in a temp dir; the main batch-query
    total stays untouched (separate JSON key, anchor-comparable)."""
    import shutil
    import tempfile

    from map_reduce_using_cloud_functions_spark.sources import load_table
    from map_reduce_using_cloud_functions_spark.streaming.file_index import (
        start_file_index_stream,
    )

    base = tempfile.mkdtemp(prefix="bench_stream_")
    watch = os.path.join(base, "watch")
    os.makedirs(watch)
    try:
        texts = [
            r["text"]
            for r in load_table(spark, sf_dir, "documents").select("text").collect()
        ]
        for i in range(n_files):
            with open(os.path.join(watch, f"part{i}.txt"), "w") as f:
                f.write("\n".join(texts[i::n_files]))
        t0 = time.perf_counter()
        q = start_file_index_stream(
            spark,
            watch,
            os.path.join(base, "index"),
            os.path.join(base, "ckpt"),
            max_files_per_trigger=1,
        )
        q.awaitTermination()
        total = time.perf_counter() - t0
        # Per-batch trigger durations (engine-reported, excludes harness
        # setup): the unit the A/B protocol takes minima over — a single
        # sec_per_file aggregate folds all six batches into one sample,
        # so one noisy batch poisons the whole section (the r6 "<1.3x is
        # noise" caveat). Sorted so rank-k batches align across passes.
        batch_ordered = [
            round(p["durationMs"]["triggerExecution"] / 1000.0, 3)
            for p in q.recentProgress
            if p["numInputRows"] > 0
        ]
        # batch_secs stays SORTED (rank-k batches align across A/B
        # passes); batch_secs_ordered keeps trigger order so a reader
        # can see that the big value is batch 0's JIT+init, not
        # last-batch growth (the r11 misread this key invites)
        batch_secs = sorted(batch_ordered)
        from map_reduce_using_cloud_functions_spark.operators.index import read_index

        n_postings = read_index(spark, os.path.join(base, "index")).count()
        return {
            "files": n_files,
            "total_sec": round(total, 3),
            "sec_per_file": round(total / n_files, 3),
            "batch_secs": batch_secs,
            "batch_secs_ordered": batch_ordered,
            "postings": n_postings,
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)


def bench_front_door(
    spark,
    sf_dir: str,
    n_files: int = 4,
    n_docs: int = 2000,
    min_quality: float | None = None,
    semantic: bool = False,
) -> dict:
    """Composed front-door stream (r8): per-batch cost of the two-sink
    foreachBatch — near-dup admission against the ledger AND additive
    index fold — over JSONL micro-batches. Separate JSON key; the
    legacy ``streaming`` section stays anchor-comparable.
    ``min_quality`` (r9) benches the quality-gated configuration — the
    gate adds one map-only text_features pass per batch. ``semantic``
    (late r9) adds the embedding-ledger gate (hashed-trick embedder):
    the full three-strength admission."""
    import json as _json
    import shutil
    import tempfile

    from map_reduce_using_cloud_functions_spark.sources import load_table
    from map_reduce_using_cloud_functions_spark.streaming.near_dedup import (
        start_front_door_stream,
    )
    from map_reduce_using_cloud_functions_spark.streaming.prep import (
        streaming_corpus_from_jsonl,
    )

    base = tempfile.mkdtemp(prefix="bench_fd_")
    watch = os.path.join(base, "in")
    os.makedirs(watch)
    try:
        docs = [
            (r["doc_id"], r["text"])
            for r in load_table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .limit(n_docs)
            .collect()
        ]
        for i in range(n_files):
            with open(os.path.join(watch, f"b{i}.jsonl"), "w") as f:
                for did, text in docs[i::n_files]:
                    f.write(_json.dumps({"doc_id": did, "text": text}) + "\n")
        t0 = time.perf_counter()
        q = start_front_door_stream(
            spark,
            # one file per trigger: per-batch admission is the measured
            # unit (one availableNow mega-batch would hide it)
            streaming_corpus_from_jsonl(spark, watch, max_files_per_trigger=1),
            os.path.join(base, "led"),
            os.path.join(base, "out"),
            os.path.join(base, "idx"),
            os.path.join(base, "ck"),
            min_quality=min_quality,
            semantic_ledger_path=(
                os.path.join(base, "sled") if semantic else None
            ),
        )
        q.awaitTermination()
        total = time.perf_counter() - t0
        batch_ordered = [
            round(p["durationMs"]["triggerExecution"] / 1000.0, 3)
            for p in q.recentProgress
            if p["numInputRows"] > 0
        ]
        # batch_secs stays SORTED (rank-k batches align across A/B
        # passes); batch_secs_ordered keeps trigger order so a reader
        # can see that the big value is batch 0's JIT+init, not
        # last-batch growth (the r11 misread this key invites)
        batch_secs = sorted(batch_ordered)
        from map_reduce_using_cloud_functions_spark.operators.index import read_index

        n_postings = read_index(spark, os.path.join(base, "idx")).count()
        n_admitted = spark.read.parquet(os.path.join(base, "out")).count()
        return {
            "files": n_files,
            "docs": len(docs),
            "total_sec": round(total, 3),
            "sec_per_batch": round(total / n_files, 3),
            "batch_secs": batch_secs,
            "batch_secs_ordered": batch_ordered,
            "admitted": n_admitted,
            "postings": n_postings,
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)


def bench_asset_front_door(
    spark, sf_dir: str, n_files: int = 4, n_assets: int = 2000
) -> dict:
    """Perceptual (image) front-door stream (r11): per-batch cost of
    phash admission — fingerprint the batch, within-batch near-dedup,
    probe the phash ledger, two release-partition writes — over
    ``n_files`` micro-batches of real PNG files (one file per asset,
    ``maxFilesPerTrigger`` slices them into batches). Fixture images
    are ``build_png_assets`` over the documents table — the same
    encode → decode → dHash path the oracle rows verify."""
    import shutil
    import tempfile

    from map_reduce_using_cloud_functions_spark.operators import (
        multimodal as mm,
    )
    from map_reduce_using_cloud_functions_spark.sources import load_table
    from map_reduce_using_cloud_functions_spark.streaming.near_dedup import (
        start_asset_admission_stream,
    )
    from map_reduce_using_cloud_functions_spark.streaming.prep import (
        streaming_assets_from_dir,
    )

    base = tempfile.mkdtemp(prefix="bench_afd_")
    watch = os.path.join(base, "in")
    os.makedirs(watch)
    try:
        assets = (
            mm.build_png_assets(
                load_table(spark, sf_dir, "documents").limit(n_assets)
            )
            .collect()
        )
        for r in assets:
            with open(
                os.path.join(watch, f"{r['asset_id']}.png"), "wb"
            ) as f:
                f.write(bytes(r["payload"]))
        per_batch = max(1, (len(assets) + n_files - 1) // n_files)
        t0 = time.perf_counter()
        q = start_asset_admission_stream(
            spark,
            streaming_assets_from_dir(
                spark, watch, max_files_per_trigger=per_batch
            ),
            os.path.join(base, "led"),
            os.path.join(base, "out"),
            os.path.join(base, "ck"),
        )
        q.awaitTermination()
        total = time.perf_counter() - t0
        batch_ordered = [
            round(p["durationMs"]["triggerExecution"] / 1000.0, 3)
            for p in q.recentProgress
            if p["numInputRows"] > 0
        ]
        # batch_secs stays SORTED (rank-k batches align across A/B
        # passes); batch_secs_ordered keeps trigger order so a reader
        # can see that the big value is batch 0's JIT+init, not
        # last-batch growth (the r11 misread this key invites)
        batch_secs = sorted(batch_ordered)
        n_admitted = spark.read.parquet(os.path.join(base, "out")).count()
        return {
            "files": n_files,
            "assets": len(assets),
            "total_sec": round(total, 3),
            "sec_per_batch": round(total / max(1, len(batch_secs)), 3),
            "batch_secs": batch_secs,
            "batch_secs_ordered": batch_ordered,
            "admitted": n_admitted,
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)


def bench_multimodal_front_door(
    spark, sf_dir: str, n_files: int = 4, n_docs: int = 800
) -> dict:
    """The multimodal admission ENVELOPE (r12): per-batch cost of one
    composed round — text strengths gate the record, then per-signal
    fingerprint doors gate its assets — over parquet record shipments
    (one file per trigger). Records carry the documents-table text
    plus derived real-media assets (PNG for every 72-byte-eligible
    doc, WAV at 130, y4m at 260 — the oracle-verified fixture paths),
    so a steady-state batch runs every sink the envelope owns: docs
    release, three signal subtrees, the MinHash ledger and three
    phash ledgers, under ONE release watermark."""
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from map_reduce_using_cloud_functions_spark.operators import multimodal as mm
    from map_reduce_using_cloud_functions_spark.sources import load_table
    from map_reduce_using_cloud_functions_spark.streaming.envelope import (
        start_multimodal_front_door_stream,
        streaming_multimodal_from_dir,
    )

    base = tempfile.mkdtemp(prefix="bench_mmfd_")
    watch = os.path.join(base, "in")
    os.makedirs(watch)
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            (
                "assets",
                pa.list_(
                    pa.struct(
                        [
                            ("asset_id", pa.int64()),
                            ("signal", pa.string()),
                            ("payload", pa.binary()),
                        ]
                    )
                ),
            ),
        ]
    )
    try:
        docs = (
            load_table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .limit(n_docs)
            .collect()
        )
        records = []
        for r in docs:
            text = r["text"] or ""
            raw = text.encode("utf-8")
            assets = []
            if len(raw) >= 72:
                import numpy as np

                pix = np.frombuffer(raw[:72], dtype=np.uint8).reshape(8, 9)
                assets.append(
                    {
                        "asset_id": r["doc_id"] * 10,
                        "signal": "image",
                        "payload": mm.encode_png(pix),
                    }
                )
            if len(raw) >= 130:
                import numpy as np

                assets.append(
                    {
                        "asset_id": r["doc_id"] * 10 + 1,
                        "signal": "audio",
                        "payload": mm.encode_wav(
                            np.frombuffer(raw[:130], dtype=np.uint8)
                        ),
                    }
                )
            if len(raw) >= 260:
                import numpy as np

                frames = np.frombuffer(raw[:260], dtype=np.uint8).reshape(
                    65, 2, 2
                )
                assets.append(
                    {
                        "asset_id": r["doc_id"] * 10 + 2,
                        "signal": "video",
                        "payload": mm.encode_y4m(frames),
                    }
                )
            records.append((r["doc_id"], text, assets))
        n_assets = sum(len(rec[2]) for rec in records)
        for i in range(n_files):
            ship = records[i::n_files]
            pq.write_table(
                pa.table(
                    {
                        "doc_id": [x[0] for x in ship],
                        "text": [x[1] for x in ship],
                        "assets": [x[2] for x in ship],
                    },
                    schema=schema,
                ),
                os.path.join(watch, f"b{i}.parquet"),
            )
        t0 = time.perf_counter()
        q = start_multimodal_front_door_stream(
            spark,
            streaming_multimodal_from_dir(
                spark, watch, max_files_per_trigger=1
            ),
            os.path.join(base, "mm"),
            os.path.join(base, "ck"),
        )
        q.awaitTermination()
        total = time.perf_counter() - t0
        batch_ordered = [
            round(p["durationMs"]["triggerExecution"] / 1000.0, 3)
            for p in q.recentProgress
            if p["numInputRows"] > 0
        ]
        # batch_secs stays SORTED (rank-k batches align across A/B
        # passes); batch_secs_ordered keeps trigger order so a reader
        # can see that the big value is batch 0's JIT+init, not
        # last-batch growth (the r11 misread this key invites)
        batch_secs = sorted(batch_ordered)
        n_docs_admitted = spark.read.parquet(
            os.path.join(base, "mm", "docs")
        ).count()
        n_assets_admitted = spark.read.parquet(
            os.path.join(base, "mm", "assets")
        ).count()
        return {
            "files": n_files,
            "docs": len(records),
            "assets": n_assets,
            "total_sec": round(total, 3),
            "sec_per_batch": round(total / max(1, len(batch_secs)), 3),
            "batch_secs": batch_secs,
            "batch_secs_ordered": batch_ordered,
            "docs_admitted": n_docs_admitted,
            "assets_admitted": n_assets_admitted,
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _run_tree_bench(tree: str, reps: int) -> dict:
    """One full bench pass of the repo tree at ``tree`` in a fresh
    subprocess (own JVM — no cross-tree session contamination), parsed
    from its one-line JSON contract."""
    import subprocess

    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_REPS"] = str(reps)
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=tree,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(
        f"bench in {tree} produced no JSON (rc={proc.returncode}): "
        f"{proc.stderr[-500:]}"
    )


def ab_main(ref_tree: str, passes: int) -> None:
    """Interleaved A/B protocol (BASELINE.md r5), mechanized: this host
    drifts ±30% within an hour, so single-shot cross-round comparisons
    are noise — only per-row minima over ALTERNATED full passes of the
    two trees on the same host prove a regression. Runs
    cur,ref,cur,ref,... (``passes`` each, reps=1 inside each pass),
    takes per-row minima per tree, and emits the normal bench JSON for
    the CURRENT tree plus an "ab" section with the ref rows and
    cur/ref ratios. A ratio meaningfully above 1 across interleaved
    minima is a real per-row regression; below 1, a real win."""
    here = os.path.dirname(os.path.abspath(__file__))
    cur_runs: list[dict] = []
    ref_runs: list[dict] = []
    for i in range(passes):
        print(f"ab pass {i + 1}/{passes}: current tree", file=sys.stderr)
        cur_runs.append(_run_tree_bench(here, reps=1))
        print(f"ab pass {i + 1}/{passes}: ref tree {ref_tree}", file=sys.stderr)
        ref_runs.append(_run_tree_bench(ref_tree, reps=1))

    def combine(runs: list[dict]) -> dict[str, float]:
        rows: dict[str, float] = {}
        for r in runs:
            for name, t in (r.get("queries") or {}).items():
                if t is not None:
                    rows[name] = min(t, rows.get(name, t))
        return rows

    def stream_min(runs: list[dict]) -> dict | None:
        """Per-TREE minima over the interleaved streaming sections (r6
        verdict task 3): min total/sec_per_file across passes, plus
        ELEMENT-WISE minima over the sorted per-batch durations — the
        per-file floor that makes streaming deltas as trustworthy as the
        batch rows' per-row minima (retires the '<1.3x is noise' band)."""
        rows = [
            r["streaming"]
            for r in runs
            if isinstance(r.get("streaming"), dict) and "sec_per_file" in r["streaming"]
        ]
        if not rows:
            return None
        best = dict(min(rows, key=lambda s: s["sec_per_file"]))
        best["sec_per_file"] = min(s["sec_per_file"] for s in rows)
        best["total_sec"] = min(s["total_sec"] for s in rows)
        batch_lists = [s["batch_secs"] for s in rows if s.get("batch_secs")]
        if batch_lists and len({len(b) for b in batch_lists}) == 1:
            best["batch_secs"] = [round(min(c), 3) for c in zip(*batch_lists)]
        return best

    cur, ref = combine(cur_runs), combine(ref_runs)
    cur_stream, ref_stream = stream_min(cur_runs), stream_min(ref_runs)
    streaming_ratio = None
    if (
        cur_stream
        and ref_stream
        and ref_stream.get("sec_per_file")
        and cur_stream.get("files") == ref_stream.get("files")
    ):
        streaming_ratio = round(
            cur_stream["sec_per_file"] / ref_stream["sec_per_file"], 3
        )
    common = sorted(set(cur) & set(ref))
    ratios = {
        n: round(cur[n] / ref[n], 3) for n in common if ref[n] > 0
    }
    cur_common = round(sum(cur[n] for n in common), 3)
    ref_common = round(sum(ref[n] for n in common), 3)
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(cur.values()), 3),
        "unit": "sec",
        "queries": cur,
        "sf": cur_runs[-1].get("sf"),
        "reps": passes,
        "streaming": cur_stream or cur_runs[-1].get("streaming"),
        "ab": {
            "ref_tree": ref_tree,
            "passes": passes,
            "cur_total_common": cur_common,
            "ref_total_common": ref_common,
            "total_ratio": round(cur_common / ref_common, 3) if ref_common else None,
            "ref_queries": ref,
            "ratio": ratios,
            "worst_rows": sorted(ratios.items(), key=lambda kv: -kv[1])[:5],
            "ref_streaming": ref_stream or ref_runs[-1].get("streaming"),
            # per-tree minima over interleaved streaming sections — the
            # sec_per_file ratio is now held to the same evidence
            # standard as the batch rows' per-row minima
            "streaming_ratio": streaming_ratio,
        },
    }
    print(json.dumps(out))


def main() -> None:
    if "--ab" in sys.argv:
        idx = sys.argv.index("--ab")
        ref_tree = sys.argv[idx + 1]
        passes = (
            int(sys.argv[sys.argv.index("--ab-passes") + 1])
            if "--ab-passes" in sys.argv
            else 2
        )
        ab_main(ref_tree, passes)
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(entrymod.queries())
    from tools.extra_queries import extra_queries

    qs.update(extra_queries())

    # Warmup: pay session/codegen startup outside the timed region
    # (text_quality reads the same sf_dir documents table but is not a
    # benched query, so no timed plan gets a warm shuffle).
    force(qs["text_quality"](spark, sf_dir))

    # Compile warmup: run every benched query once at the SMALLEST
    # fixture so whole-stage-codegen compilation (one-time per plan
    # shape; amortized to zero in production) happens outside the
    # timed region. The timed run at sf_dir still does all its own IO,
    # shuffles, and compute — only the JVM compile is pre-paid. Set
    # SPARK_GRAFT_BENCH_COLD=1 to skip (cold-compile numbers).
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.environ.get("SPARK_GRAFT_BENCH_COLD") and os.path.isdir(warm_dir):
        for name in BENCH_QUERIES:
            try:
                force(qs[name](spark, warm_dir))
            except Exception:
                pass  # the timed loop will surface the real error

    # Per-query isolation: a single failing query records null and the
    # bench keeps going — one regression must never zero the artifact.
    # Each query is timed SPARK_GRAFT_BENCH_REPS times (default 2) and
    # the minimum recorded: same-code totals on this box ranged 42-58 s
    # across same-day single-shot runs (BASELINE.md noise band), and
    # min-of-N is the standard steady-state estimator — one-off GC /
    # background interference inflates a single sample but never
    # deflates it. The BASELINE.md anchor uses the same methodology.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    timings: dict[str, float | None] = {}
    errors: dict[str, str] = {}
    flaky: dict[str, str] = {}
    for name in BENCH_QUERIES:
        best: float | None = None
        err: str | None = None
        for _ in range(reps):
            t0 = time.perf_counter()
            try:
                force(qs[name](spark, sf_dir))
            except Exception as exc:  # noqa: BLE001 — record and continue
                # every rep gets its attempt — a transient first-rep
                # failure must not null a query a later rep can time
                err = f"{type(exc).__name__}: {exc}"[:500]
                print(f"bench: {name} FAILED: {err}", file=sys.stderr)
                continue
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        if best is None:
            errors[name] = err or "no successful rep"
        elif err is not None:
            # timed successfully AND failed at least once — that is a
            # flaky query, and the artifact must say so, not mask it
            flaky[name] = err
        timings[name] = None if best is None else round(best, 3)

    total = round(sum(t for t in timings.values() if t is not None), 3)

    # Streaming path (O19): timed separately so the batch-query
    # total stays comparable to the BASELINE.md anchor across rounds.
    #
    # r13 measurement fix (r12 verdict task 2): the six streaming
    # sections were SINGLE-SHOT while every headline row takes
    # min-of-reps — so the driver's door totals swung 2-3x between
    # runs with identical code (r12: gated door 116 s at 32 cores vs
    # 29.7 s at 8 cores, same tree). Each section now runs
    # SPARK_GRAFT_STREAM_REPS times (default 2) in ALTERNATED full
    # cycles (all sections pass 1, then all pass 2 — host phases hit
    # every section, not one), and reports the same min estimator the
    # headline rows use: min total_sec / sec-per-unit across passes and
    # ELEMENT-WISE minima over the sorted per-batch durations. Every
    # pre-r13 key keeps its meaning (additions only: ``reps`` and the
    # per-pass ``rep_total_secs`` are new); set
    # SPARK_GRAFT_STREAM_REPS=1 for the old single-shot behavior.
    stream_reps = max(1, int(os.environ.get("SPARK_GRAFT_STREAM_REPS", "2")))
    sections: list[tuple[str, object]] = [
        ("streaming", lambda: bench_streaming(spark, sf_dir)),
        ("streaming_front_door", lambda: bench_front_door(spark, sf_dir)),
        (
            "streaming_front_door_gated",
            lambda: bench_front_door(spark, sf_dir, min_quality=0.3),
        ),
        (
            "streaming_front_door_semantic",
            lambda: bench_front_door(spark, sf_dir, semantic=True),
        ),
        ("streaming_front_door_phash", lambda: bench_asset_front_door(spark, sf_dir)),
        (
            "streaming_front_door_multimodal",
            lambda: bench_multimodal_front_door(spark, sf_dir),
        ),
    ]
    runs: dict[str, list[dict]] = {name: [] for name, _ in sections}
    for _ in range(stream_reps):
        for name, fn in sections:
            try:
                runs[name].append(fn())
            except Exception as exc:  # noqa: BLE001 — record and continue
                err = {"error": f"{type(exc).__name__}: {exc}"[:500]}
                runs[name].append(err)
                print(f"bench: {name} FAILED: {err['error']}", file=sys.stderr)

    def _merge_stream_reps(passes: list[dict]) -> dict:
        ok = [p for p in passes if "error" not in p]
        if not ok:
            return passes[0]
        best = dict(min(ok, key=lambda p: p["total_sec"]))
        best["total_sec"] = min(p["total_sec"] for p in ok)
        for key in ("sec_per_file", "sec_per_batch"):
            if key in best:
                best[key] = min(p[key] for p in ok)
        batch_lists = [p["batch_secs"] for p in ok if p.get("batch_secs")]
        if batch_lists and len({len(b) for b in batch_lists}) == 1:
            # sorted lists align rank-k batches across passes (the A/B
            # protocol's unit); element-wise min is the per-batch floor
            best["batch_secs"] = [round(min(c), 3) for c in zip(*batch_lists)]
        best["reps"] = len(passes)
        best["rep_total_secs"] = [p.get("total_sec") for p in passes]
        return best

    streaming = _merge_stream_reps(runs["streaming"])
    front_door = _merge_stream_reps(runs["streaming_front_door"])
    front_door_gated = _merge_stream_reps(runs["streaming_front_door_gated"])
    front_door_semantic = _merge_stream_reps(runs["streaming_front_door_semantic"])
    front_door_phash = _merge_stream_reps(runs["streaming_front_door_phash"])
    front_door_multimodal = _merge_stream_reps(
        runs["streaming_front_door_multimodal"]
    )

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "reps": reps,
                "streaming": streaming,
                "streaming_front_door": front_door,
                "streaming_front_door_gated": front_door_gated,
                "streaming_front_door_semantic": front_door_semantic,
                "streaming_front_door_phash": front_door_phash,
                "streaming_front_door_multimodal": front_door_multimodal,
                **({"errors": errors} if errors else {}),
                **({"flaky": flaky} if flaky else {}),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
