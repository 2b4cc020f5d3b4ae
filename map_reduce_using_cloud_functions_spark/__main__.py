"""Command-line surface — the reference's end-user flow without its
Streamlit UI (``main/app.py``: upload .txt files → index → query a
word). A reference user switches by pointing these commands at a local
or remote directory instead of a GCS bucket:

    python -m map_reduce_using_cloud_functions_spark build  CORPUS_DIR INDEX_PATH
    python -m map_reduce_using_cloud_functions_spark add    CORPUS_DIR INDEX_PATH
    python -m map_reduce_using_cloud_functions_spark query  INDEX_PATH WORD [--top N]
    python -m map_reduce_using_cloud_functions_spark watch  WATCH_DIR INDEX_PATH CKPT_DIR
    python -m map_reduce_using_cloud_functions_spark web    INDEX_PATH UPLOAD_DIR [--port P]
    python -m map_reduce_using_cloud_functions_spark info    INDEX_PATH
    python -m map_reduce_using_cloud_functions_spark compact INDEX_PATH [--if-tail-ratio R]
    python -m map_reduce_using_cloud_functions_spark gc      INDEX_PATH [--keep N]
    python -m map_reduce_using_cloud_functions_spark history INDEX_PATH
    python -m map_reduce_using_cloud_functions_spark diff    INDEX_PATH V_FROM V_TO
    python -m map_reduce_using_cloud_functions_spark rollback INDEX_PATH VERSION
    python -m map_reduce_using_cloud_functions_spark admit   WATCH_DIR LEDGER SURVIVORS CKPT [--index-path IDX] [--once]
    python -m map_reduce_using_cloud_functions_spark takedown DOC_ID... [--index IDX] [--ledger LED] [--survivors OUT]
    python -m map_reduce_using_cloud_functions_spark ann-info    ANN_INDEX_PATH
    python -m map_reduce_using_cloud_functions_spark ann-compact ANN_INDEX_PATH
    python -m map_reduce_using_cloud_functions_spark ann-query   ANN_INDEX_PATH QUERIES [--k K]

``web`` serves the reference UI itself (upload .txt → index → query a
word in the browser; ``webui.py``), closing the last presentation-layer
gap with the reference.

``build`` rebuilds from scratch; ``add`` is the incremental upsert
(replace-per-document; pass ``--additive`` for bug-level parity with
the reference's double-count merge); ``query`` prints per-document
counts most-frequent-first exactly like the UI table
(``main/app.py:104-124``); ``watch`` runs the streaming trigger path
(O19) until interrupted.

The r7 maintenance trio operates the table out-of-band (run them with
any stream paused — single writer): ``info`` prints layout/version,
the folded_through watermark, pending delta batches and base-vs-tail
bytes (``index_size_info``); ``compact`` folds the pending tail
(``--if-tail-ratio`` applies the size policy instead of folding
unconditionally); ``gc`` reclaims superseded versions and folded
deltas on the versioned layout.
"""

from __future__ import annotations

import argparse
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="map_reduce_using_cloud_functions_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="index a directory of text files (full rebuild)")
    b.add_argument("corpus_dir")
    b.add_argument("index_path")
    b.add_argument(
        "--versioned",
        action="store_true",
        help="crash-atomic rebuilds via versioned commits (v=N dirs + commit files)",
    )

    a = sub.add_parser("add", help="incrementally index new/changed files")
    a.add_argument("corpus_dir")
    a.add_argument("index_path")
    a.add_argument("--additive", action="store_true", help="reference double-count parity")

    q = sub.add_parser("query", help="per-document counts for one word")
    q.add_argument("index_path")
    q.add_argument("word")
    q.add_argument("--top", type=int, default=20)

    w = sub.add_parser("watch", help="stream: index files as they land")
    w.add_argument("watch_dir")
    w.add_argument("index_path")
    w.add_argument("checkpoint_dir")
    w.add_argument("--max-files-per-trigger", type=int, default=None)
    w.add_argument(
        "--additive",
        action="store_true",
        help="exactly-once additive deltas instead of replace-per-document",
    )
    w.add_argument(
        "--compact-tail-ratio",
        type=float,
        default=None,
        metavar="R",
        help="(additive) fold the delta tail in-stream at tail >= R x base "
        "bytes (default: auto - 1.0 on versioned tables, off on in-place)",
    )
    w.add_argument(
        "--no-auto-compact",
        action="store_true",
        help="disable the default in-stream auto-compaction entirely",
    )
    w.add_argument(
        "--in-place",
        action="store_true",
        help="opt OUT of the crash-atomic versioned table layout",
    )

    u = sub.add_parser(
        "web", help="serve the upload+query UI (reference main/app.py twin)"
    )
    u.add_argument("index_path")
    u.add_argument("upload_dir")
    u.add_argument("--host", default="127.0.0.1")
    u.add_argument("--port", type=int, default=8080)
    u.add_argument("--additive", action="store_true", help="reference double-count parity")

    i = sub.add_parser("info", help="layout, watermark, pending tail, sizes")
    i.add_argument("index_path")

    c = sub.add_parser("compact", help="fold pending additive deltas into the base")
    c.add_argument("index_path")
    c.add_argument(
        "--if-tail-ratio",
        type=float,
        default=None,
        metavar="R",
        help="only fold when tail_bytes >= R * base_bytes (the amortizing policy)",
    )
    c.add_argument(
        "--scoped",
        action="store_true",
        help="letter-scoped fold on a versioned table: rewrite only the "
        "touched first-letter partitions (O(touched), layered commit; "
        "refuses later replace-mode upserts until flattened)",
    )

    g = sub.add_parser("gc", help="reclaim superseded versions + folded deltas")
    g.add_argument("index_path")
    g.add_argument("--keep", type=int, default=2, help="base versions to retain")

    ad = sub.add_parser(
        "admit",
        help="stream: near-dup-gated corpus admission from landing JSONL",
    )
    ad.add_argument("watch_dir")
    ad.add_argument("ledger_path")
    ad.add_argument("survivors_path")
    ad.add_argument("checkpoint_dir")
    ad.add_argument("--threshold", type=float, default=0.5)
    ad.add_argument(
        "--index-path",
        default=None,
        help="also fold admitted documents' postings into this versioned "
        "word index (the composed front door: both sinks exactly-once "
        "on the same batch id)",
    )
    ad.add_argument(
        "--min-quality",
        type=float,
        default=None,
        help="front door only (--index-path): drop documents whose "
        "heuristic quality composite falls below this BEFORE admission",
    )
    ad.add_argument(
        "--semantic-ledger",
        default=None,
        help="also gate semantically: refuse documents whose embedding "
        "is a cosine near-dup of admitted content (paraphrases that "
        "share no shingles); embeddings via the deterministic "
        "hashing-trick featurizer",
    )
    ad.add_argument(
        "--semantic-threshold",
        type=float,
        default=0.85,
        help="cosine threshold for the semantic gate (default 0.85)",
    )
    ad.add_argument(
        "--compact-after",
        type=int,
        default=None,
        help="auto-compact the ledger(s) inside an admission round once more than N prior release partitions would be probed (folds history into release=-1 with keep_last=1 — the streaming-replay-safe fold); unset: compaction stays a manual ledger-compact verb",
    )
    ad.add_argument(
        "--once",
        action="store_true",
        help="drain what has landed and exit (availableNow trigger)",
    )

    aa = sub.add_parser(
        "admit-assets",
        help="stream: perceptually-gated media-asset admission from a "
        "landing dir (recompressed/edited copies of admitted assets "
        "refuse against the phash ledger)",
    )
    aa.add_argument("watch_dir")
    aa.add_argument("ledger_path", help="phash admission ledger path")
    aa.add_argument("survivors_path")
    aa.add_argument("checkpoint_dir")
    aa.add_argument(
        "--pattern",
        default="*.png",
        help="landing-file glob (default *.png; use *.wav with "
        "--signal audio, *.y4m with --signal video)",
    )
    aa.add_argument(
        "--grid",
        type=int,
        default=None,
        help="dHash grid (grid² fingerprint bits). Unset: adopt the "
        "existing ledger's stored grid, or 8 for a fresh ledger. Set: "
        "must MATCH an existing ledger (geometry is its identity)",
    )
    aa.add_argument(
        "--max-hamming",
        type=int,
        default=None,
        help="near-dup threshold in fingerprint bits (unset: stored "
        "meta, or 6 fresh; set: must match an existing ledger)",
    )
    aa.add_argument(
        "--signal",
        choices=("image", "audio", "video"),
        default=None,
        help="fingerprint modality: image (PNG dHash), audio (WAV "
        "energy-sign hash) or video (y4m temporal energy hash). Unset: "
        "stored meta, or image fresh; set: must match an existing ledger",
    )
    aa.add_argument(
        "--semantic-ledger",
        default=None,
        help="embedding-ledger path: adds the SEMANTIC strength (a "
        "crop/re-render defeats the perceptual hash; its content "
        "profile — block-mean luma / block-RMS energy — stays "
        "cosine-near and refuses)",
    )
    aa.add_argument(
        "--semantic-threshold",
        type=float,
        default=0.9,
        help="cosine refusal threshold for --semantic-ledger (default 0.9)",
    )
    aa.add_argument(
        "--compact-after",
        type=int,
        default=None,
        help="auto-compact the ledger(s) inside an admission round once more than N prior release partitions would be probed (folds history into release=-1 with keep_last=1 — the streaming-replay-safe fold); unset: compaction stays a manual ledger-compact verb",
    )
    aa.add_argument(
        "--once",
        action="store_true",
        help="drain what has landed and exit (availableNow trigger)",
    )

    am = sub.add_parser(
        "admit-multimodal",
        help="stream: ONE admission envelope for documents WITH their "
        "assets (parquet record shipments land; text strengths gate "
        "the record, per-signal fingerprint strengths gate its assets; "
        "every sink exactly-once on one release watermark)",
    )
    am.add_argument("watch_dir", help="landing dir of parquet record files")
    am.add_argument(
        "base_path", help="envelope base dir (docs/assets/ledgers layout)"
    )
    am.add_argument("checkpoint_dir")
    am.add_argument("--threshold", type=float, default=0.5)
    am.add_argument(
        "--min-quality",
        type=float,
        default=None,
        help="drop records whose text quality composite falls below this",
    )
    am.add_argument(
        "--text-semantic",
        action="store_true",
        help="add the text embedding-ledger strength ({base}/semantic)",
    )
    am.add_argument(
        "--asset-semantic",
        action="store_true",
        help="add the per-signal asset embedding strength "
        "({base}/asset_semantic/SIGNAL)",
    )
    am.add_argument(
        "--compact-after",
        type=int,
        default=None,
        help="auto-compact every touched ledger once more than N prior "
        "releases would be probed",
    )
    am.add_argument(
        "--once",
        action="store_true",
        help="drain what has landed and exit (availableNow trigger)",
    )

    h = sub.add_parser("history", help="commit log of a versioned index")
    h.add_argument("index_path")

    rb = sub.add_parser(
        "rollback", help="restore HEAD to an earlier committed snapshot"
    )
    rb.add_argument("index_path")
    rb.add_argument("version", type=int)

    f = sub.add_parser(
        "diff", help="posting-level changelog between two committed versions"
    )
    f.add_argument("index_path")
    f.add_argument("v_from", type=int)
    f.add_argument("v_to", type=int)
    f.add_argument("--top", type=int, default=50, help="rows to print")

    td = sub.add_parser(
        "takedown",
        help="remove documents everywhere they live: word-index postings "
        "(letter-scoped tombstone fold), admission-ledger sketches (they "
        "stop gating), shipped survivors partitions",
    )
    td.add_argument("doc_ids", nargs="+", help="document ids to retract")
    td.add_argument("--index", default=None, help="versioned/in-place word index path")
    td.add_argument("--ledger", default=None, help="minhash admission ledger path")
    td.add_argument(
        "--survivors", default=None, help="release-partitioned survivors path"
    )
    td.add_argument(
        "--semantic-ledger",
        default=None,
        help="embedding admission ledger path (retracted docs stop "
        "gating semantically)",
    )
    td.add_argument(
        "--phash-ledger",
        default=None,
        help="perceptual-hash (image/audio) admission ledger path "
        "(retracted assets stop gating perceptually)",
    )
    td.add_argument(
        "--ann-index",
        default=None,
        help="persisted ANN index path (any family with a tombstone "
        "read path): retracted vectors stop serving at the next "
        "committed read",
    )

    ai = sub.add_parser(
        "ann-info",
        help="persisted ANN index snapshot: family, version, per-artifact "
        "generation fan-out, tombstone count",
    )
    ai.add_argument("index_path")

    ak = sub.add_parser(
        "ann-compact",
        help="major compaction: fold generations into one, purge "
        "tombstones physically, refresh meta.n (run with writers quiesced)",
    )
    ak.add_argument("index_path")

    aq = sub.add_parser(
        "ann-query",
        help="top-k neighbors from ANY persisted ANN index (family "
        "detected from the index itself); queries from a parquet/JSONL "
        "file with (query_id|vec_id, q_embedding|embedding) columns",
    )
    aq.add_argument("index_path")
    aq.add_argument("queries_path", help="parquet file/dir or .jsonl of query vectors")
    aq.add_argument("--k", type=int, default=5, help="neighbors per query (default 5)")
    aq.add_argument(
        "--n-probe",
        type=int,
        default=None,
        help="IVF / IVF-PQ: lists probed per query (family default 2)",
    )
    aq.add_argument(
        "--probe-bits",
        type=int,
        default=None,
        help="LSH: multi-probe bucket flips per band (family default 1)",
    )
    aq.add_argument(
        "--shortlist",
        type=int,
        default=None,
        help="PQ / IVF-PQ: ADC shortlist size before exact re-rank",
    )
    aq.add_argument(
        "--embeddings",
        default=None,
        help="PQ / IVF-PQ: exact-vector parquet for the re-rank stage",
    )
    aq.add_argument(
        "--top",
        type=int,
        default=100,
        help="max result rows printed (default 100)",
    )

    pr = sub.add_parser(
        "profile",
        help="one-pass corpus profile from the sketch toolbox: doc/lang "
        "volumes, estimated vocabulary per lang (bounded-state distinct "
        "sketch), sampled length percentiles",
    )
    pr.add_argument(
        "corpus_path", help="documents parquet file/dir or JSONL directory"
    )
    pr.add_argument(
        "--vocab-k",
        type=int,
        default=256,
        help="distinct-sketch buckets (error ~1/sqrt(k); default 256)",
    )
    pr.add_argument(
        "--sample-frac",
        type=float,
        default=0.25,
        help="deterministic hash-sample fraction for the percentiles",
    )

    fr = sub.add_parser(
        "front-door-report",
        help="admission accounting from the committed artifacts: "
        "per-release admitted counts, per-strength ledger state "
        "(params, release fan-out, docs/release, band fan-in), index "
        "watermark/pending tail — JSON on stdout",
    )
    fr.add_argument("--survivors", default=None)
    fr.add_argument("--ledger", default=None, help="minhash admission ledger")
    fr.add_argument("--semantic-ledger", default=None)
    fr.add_argument("--phash-ledger", default=None)
    fr.add_argument("--index", default=None, help="composed front door's word index")
    fr.add_argument(
        "--multimodal",
        default=None,
        help="multimodal envelope base dir (streaming/envelope.py "
        "layout): docs/assets per release + every ledger under it",
    )

    li = sub.add_parser(
        "ledger-info",
        help="minhash admission ledger snapshot: sketch params, release "
        "ids (-1 = folded history), doc count, band-directory fan-out",
    )
    li.add_argument("ledger_path")

    lk = sub.add_parser(
        "ledger-compact",
        help="fold old ledger releases into the reserved release=-1 "
        "partition — resets probe fan-in after many admitted batches "
        "(run with the admitting stream quiesced)",
    )
    lk.add_argument("ledger_path")
    lk.add_argument(
        "--keep-last",
        type=int,
        default=1,
        help="highest releases to keep un-folded (default 1: the "
        "streaming replay contract needs the latest batch's release "
        "to stay its own partition)",
    )
    return p


def main(argv: list[str] | None = None, spark=None) -> int:
    args = _build_parser().parse_args(argv)
    from .session import get_spark

    owned = spark is None
    spark = spark or get_spark("map-reduce-using-cloud-functions-spark-cli")
    if owned:  # never mutate a caller-provided session's log level
        spark.sparkContext.setLogLevel("ERROR")
    try:
        from .engine import InvertedIndexEngine

        if args.cmd == "build":
            InvertedIndexEngine(spark, args.index_path).build(
                args.corpus_dir, versioned=args.versioned
            )
            print(f"indexed {args.corpus_dir} -> {args.index_path}")
        elif args.cmd == "add":
            InvertedIndexEngine(
                spark, args.index_path, additive=args.additive
            ).add(args.corpus_dir)
            print(f"merged {args.corpus_dir} into {args.index_path}")
        elif args.cmd == "query":
            from .operators.index import _hadoop_exists

            eng = InvertedIndexEngine(spark, args.index_path)
            if not eng.is_valid_query(args.word):
                print("invalid query: one word, no whitespace", file=sys.stderr)
                return 2
            if not _hadoop_exists(spark, args.index_path):
                print(f"no index at {args.index_path}", file=sys.stderr)
                return 2
            rows = eng.find_occurrences(args.word).limit(args.top).collect()
            if not rows:
                print("no occurrences")
            for r in rows:
                print(f"{r['document']}\t{r['count']}")
        elif args.cmd in ("info", "compact", "gc", "history", "diff", "rollback"):
            from .operators import index as ix

            if not ix.index_exists(spark, args.index_path):
                print(f"no index at {args.index_path}", file=sys.stderr)
                return 2
            if args.cmd == "info":
                base_dir, folded, version = ix._resolve_version(spark, args.index_path)
                info = ix.index_size_info(spark, args.index_path)
                layout = "versioned" if version is not None else "in-place"
                print(f"layout\t{layout}" + (f" (v={version})" if version is not None else ""))
                print(f"base_dir\t{base_dir}")
                print(f"folded_through\t{folded}")
                print(f"pending_batches\t{info['pending_batches']}")
                print(f"base_bytes\t{info['base_bytes']}")
                print(f"tail_bytes\t{info['tail_bytes']}")
            elif args.cmd == "compact":
                if args.if_tail_ratio is not None and not ix.should_compact(
                    spark, args.index_path, max_tail_ratio=args.if_tail_ratio
                ):
                    info = ix.index_size_info(spark, args.index_path)
                    print(
                        f"not compacting: tail {info['tail_bytes']} B < "
                        f"{args.if_tail_ratio} x base {info['base_bytes']} B"
                    )
                else:
                    pending = ix.pending_additive_batches(spark, args.index_path)
                    ix.compact_index(
                        spark,
                        args.index_path,
                        scoped="auto" if args.scoped else False,
                    )
                    print(f"compacted {len(pending)} pending batches into {args.index_path}")
            elif args.cmd == "gc":
                ix.gc_index_versions(spark, args.index_path, keep=args.keep)
                print(f"gc done (keep={args.keep})")
            elif args.cmd == "rollback":
                v = ix.rollback_index(spark, args.index_path, args.version)
                print(f"rolled back to v={args.version} contents as new v={v}")
            elif args.cmd == "history":
                hist = ix.index_history(spark, args.index_path)
                if not hist:
                    print("no history (in-place layout)")
                for h in hist:
                    print(f"v={h['v']}\tfolded_through={h['folded_through']}")
            else:  # diff
                rows = (
                    ix.index_diff(spark, args.index_path, args.v_from, args.v_to)
                    .orderBy("word", "document")
                    .limit(args.top)
                    .collect()
                )
                for r in rows:
                    print(
                        f"{r['word']}\t{r['document']}\t"
                        f"{r['count_from']}->{r['count_to']}\t{r['delta']:+d}"
                    )
        elif args.cmd == "web":
            from .webui import IndexWebApp, serve

            app = IndexWebApp(
                spark, args.index_path, args.upload_dir, additive=args.additive
            )
            srv = serve(app, args.host, args.port)
            print(f"serving http://{args.host}:{srv.server_address[1]}/ (ctrl-c to stop)")
            try:
                srv.serve_forever()
            except KeyboardInterrupt:
                srv.shutdown()
        elif args.cmd == "ann-info":
            import json as _json

            from .operators.ann_commit import ann_index_info

            print(_json.dumps(ann_index_info(spark, args.index_path)))
        elif args.cmd == "ann-query":
            import pyspark.sql.functions as F

            from .operators.ann import ann_search

            qpath = args.queries_path
            if qpath.rstrip("/").endswith((".jsonl", ".json")):
                q = spark.read.json(qpath)
            else:
                q = spark.read.parquet(qpath)
            # accept the fixtures' (vec_id, embedding) spelling too
            if "query_id" not in q.columns and "vec_id" in q.columns:
                q = q.withColumnRenamed("vec_id", "query_id")
            if "q_embedding" not in q.columns and "embedding" in q.columns:
                q = q.withColumnRenamed("embedding", "q_embedding")
            missing = {"query_id", "q_embedding"} - set(q.columns)
            if missing:
                print(
                    f"queries file lacks {sorted(missing)} (accepted "
                    "spellings: query_id|vec_id, q_embedding|embedding)",
                    file=sys.stderr,
                )
                return 2
            q = q.select(
                "query_id", F.col("q_embedding").cast("array<float>").alias("q_embedding")
            )
            # only options the caller actually set reach the family
            # check — a default must not trip the wrong-family refusal
            options = {
                name: val
                for name, val in (
                    ("n_probe", args.n_probe),
                    ("probe_bits", args.probe_bits),
                    ("shortlist", args.shortlist),
                )
                if val is not None
            }
            if args.embeddings is not None:
                options["embeddings"] = spark.read.parquet(args.embeddings)
            rows = (
                ann_search(spark, args.index_path, q, k=args.k, **options)
                .orderBy("query_id", "rank")
                .limit(args.top)
                .collect()
            )
            if not rows:
                print("no neighbors")
            for r in rows:
                print(
                    f"{r['query_id']}\t{r['neighbor_id']}\t{r['rank']}\t"
                    f"{r['score']:.6f}"
                )
        elif args.cmd == "ann-compact":
            from .operators.ann_commit import ann_index_info, compact_ann_index

            v = compact_ann_index(spark, args.index_path)
            info = ann_index_info(spark, args.index_path)
            print(
                f"compacted {args.index_path} -> v={v} "
                f"(generations: {info['generations']})"
            )
        elif args.cmd == "profile":
            import json as _json

            import pyspark.sql.functions as F

            from .operators.sketches import (
                sampled_percentiles,
                vocab_sketch,
            )
            from .sources.interchange import read_corpus_jsonl

            path = args.corpus_path
            if path.rstrip("/").endswith((".jsonl", ".json")) or any(
                f.endswith((".jsonl", ".json"))
                for f in (__import__("os").listdir(path) if __import__("os").path.isdir(path) else [])
            ):
                docs = read_corpus_jsonl(spark, path)
            else:
                docs = spark.read.parquet(path)
            has_lang = "lang" in docs.columns
            by = ["lang"] if has_lang else []
            docs = docs.withColumn("n_chars_live", F.length("text"))
            counts = {
                r["lang"] if has_lang else "all": r["n"]
                for r in docs.groupBy(*by)
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            vocab = {
                (r["lang"] if has_lang else "all"): r["est_vocab"]
                for r in vocab_sketch(docs, k=args.vocab_k, by=by).collect()
            }
            pct = {
                (r["lang"] if has_lang else "all"): {
                    "p50": r["p50"],
                    "p90": r["p90"],
                }
                for r in sampled_percentiles(
                    docs,
                    "n_chars_live",
                    key="doc_id",
                    frac=args.sample_frac,
                    by=by,
                ).collect()
            }
            print(
                _json.dumps(
                    {
                        "docs": counts,
                        "est_vocab": vocab,
                        "chars_sampled_percentiles": pct,
                        "vocab_k": args.vocab_k,
                        "sample_frac": args.sample_frac,
                    },
                    sort_keys=True,
                )
            )
        elif args.cmd == "front-door-report":
            import json as _json

            from .streaming.report import front_door_report

            if not (
                args.survivors
                or args.ledger
                or args.semantic_ledger
                or args.phash_ledger
                or args.index
                or args.multimodal
            ):
                print(
                    "front-door-report: pass at least one of --survivors/"
                    "--ledger/--semantic-ledger/--phash-ledger/--index/"
                    "--multimodal",
                    file=sys.stderr,
                )
                return 2
            print(
                _json.dumps(
                    front_door_report(
                        spark,
                        survivors_path=args.survivors,
                        ledger_path=args.ledger,
                        semantic_ledger_path=args.semantic_ledger,
                        phash_ledger_path=args.phash_ledger,
                        index_path=args.index,
                        multimodal_base=args.multimodal,
                    ),
                    sort_keys=True,
                )
            )
        elif args.cmd == "ledger-info":
            import json as _json

            from .operators.dedup import ledger_info

            print(_json.dumps(ledger_info(spark, args.ledger_path)))
        elif args.cmd == "ledger-compact":
            from .operators.dedup import (
                compact_embedding_ledger,
                compact_minhash_ledger,
                ledger_info,
                ledger_kind,
            )

            from .operators.dedup import compact_phash_ledger

            compactor = {
                "minhash": compact_minhash_ledger,
                "embedding": compact_embedding_ledger,
                "phash": compact_phash_ledger,
            }[ledger_kind(spark, args.ledger_path)]
            folded = compactor(
                spark, args.ledger_path, keep_last=args.keep_last
            )
            info = ledger_info(spark, args.ledger_path)
            print(
                f"folded releases {folded or 'nothing'} -> "
                f"releases now {info['releases']} "
                f"({info['band_dirs']} band dirs)"
            )
        elif args.cmd == "takedown":
            if not (
                args.index
                or args.ledger
                or args.survivors
                or args.semantic_ledger
                or args.phash_ledger
                or args.ann_index
            ):
                print(
                    "takedown: pass at least one of --index/--ledger/"
                    "--survivors/--semantic-ledger/--phash-ledger/"
                    "--ann-index (nothing to retract from)",
                    file=sys.stderr,
                )
                return 2
            if args.index:
                from .operators.index import delete_documents

                delete_documents(spark, args.index, list(args.doc_ids))
                print(f"purged {len(args.doc_ids)} doc(s) from index {args.index}")
            numeric = None
            if (
                args.ledger
                or args.survivors
                or args.semantic_ledger
                or args.phash_ledger
                or args.ann_index
            ):
                try:
                    numeric = [int(d) for d in args.doc_ids]
                except ValueError:
                    print(
                        "takedown: --ledger/--survivors/--semantic-ledger"
                        "/--phash-ledger/--ann-index key on numeric "
                        "doc_id; got a non-numeric id",
                        file=sys.stderr,
                    )
                    return 2
            if args.ledger:
                from .operators.dedup import delete_from_ledger

                delete_from_ledger(spark, args.ledger, numeric)
                print(f"unlisted {len(numeric)} doc(s) from ledger {args.ledger}")
            if args.semantic_ledger:
                from .operators.dedup import delete_from_embedding_ledger

                delete_from_embedding_ledger(
                    spark, args.semantic_ledger, numeric
                )
                print(
                    f"unlisted {len(numeric)} doc(s) from semantic ledger "
                    f"{args.semantic_ledger}"
                )
            if args.phash_ledger:
                from .operators.dedup import delete_from_phash_ledger

                delete_from_phash_ledger(spark, args.phash_ledger, numeric)
                print(
                    f"unlisted {len(numeric)} asset(s) from perceptual "
                    f"ledger {args.phash_ledger}"
                )
            if args.ann_index:
                from .operators.ann_commit import delete_vectors

                v = delete_vectors(spark, args.ann_index, numeric)
                print(
                    f"tombstoned {len(numeric)} vector(s) in ANN index "
                    f"{args.ann_index} (v={v})"
                )
            if args.survivors:
                from .operators.dedup import delete_from_survivors

                delete_from_survivors(spark, args.survivors, numeric)
                print(
                    f"removed {len(numeric)} doc(s) from survivors "
                    f"{args.survivors}"
                )
        elif args.cmd == "admit":
            from .streaming.near_dedup import (
                start_front_door_stream,
                start_near_dedup_stream,
            )
            from .streaming.prep import streaming_corpus_from_jsonl

            if args.index_path:
                q = start_front_door_stream(
                    spark,
                    streaming_corpus_from_jsonl(spark, args.watch_dir),
                    args.ledger_path,
                    args.survivors_path,
                    args.index_path,
                    args.checkpoint_dir,
                    threshold=args.threshold,
                    available_now=args.once,
                    min_quality=args.min_quality,
                    semantic_ledger_path=args.semantic_ledger,
                    semantic_threshold=args.semantic_threshold,
                    compact_after_releases=args.compact_after,
                )
            else:
                q = start_near_dedup_stream(
                    spark,
                    streaming_corpus_from_jsonl(spark, args.watch_dir),
                    args.ledger_path,
                    args.survivors_path,
                    args.checkpoint_dir,
                    threshold=args.threshold,
                    available_now=args.once,
                    semantic_ledger_path=args.semantic_ledger,
                    semantic_threshold=args.semantic_threshold,
                    compact_after_releases=args.compact_after,
                )
            print(
                f"admitting {args.watch_dir} -> {args.survivors_path} "
                f"(ledger {args.ledger_path}"
                + (f", indexing into {args.index_path}" if args.index_path else "")
                + (", draining once)" if args.once else "; ctrl-c to stop)")
            )
            try:
                q.awaitTermination()
            except KeyboardInterrupt:
                q.stop()
        elif args.cmd == "admit-assets":
            from .operators.dedup import (
                ledger_exists,
                load_phash_ledger_meta,
            )
            from .streaming.near_dedup import start_asset_admission_stream
            from .streaming.prep import streaming_assets_from_dir

            # unset flags ADOPT an existing ledger's stored meta (the
            # common restart case needs no flag restating); explicitly
            # set flags still refuse a mismatch downstream
            stored = (
                load_phash_ledger_meta(spark, args.ledger_path)
                if ledger_exists(spark, args.ledger_path)
                else {"grid": 8, "max_hamming": 6, "signal": "image"}
            )
            grid = args.grid if args.grid is not None else stored["grid"]
            max_hamming = (
                args.max_hamming
                if args.max_hamming is not None
                else stored["max_hamming"]
            )
            signal = (
                args.signal if args.signal is not None else stored["signal"]
            )
            q = start_asset_admission_stream(
                spark,
                streaming_assets_from_dir(
                    spark, args.watch_dir, pattern=args.pattern
                ),
                args.ledger_path,
                args.survivors_path,
                args.checkpoint_dir,
                grid=grid,
                max_hamming=max_hamming,
                signal=signal,
                available_now=args.once,
                semantic_ledger_path=args.semantic_ledger,
                semantic_threshold=args.semantic_threshold,
                compact_after_releases=args.compact_after,
            )
            print(
                f"admitting {signal} assets {args.watch_dir} -> "
                f"{args.survivors_path} (phash ledger {args.ledger_path}"
                + (", draining once)" if args.once else "; ctrl-c to stop)")
            )
            try:
                q.awaitTermination()
            except KeyboardInterrupt:
                q.stop()
        elif args.cmd == "admit-multimodal":
            from .streaming.envelope import (
                start_multimodal_front_door_stream,
                streaming_multimodal_from_dir,
            )

            q = start_multimodal_front_door_stream(
                spark,
                streaming_multimodal_from_dir(spark, args.watch_dir),
                args.base_path,
                args.checkpoint_dir,
                available_now=args.once,
                threshold=args.threshold,
                min_quality=args.min_quality,
                text_semantic=args.text_semantic,
                asset_semantic=args.asset_semantic,
                compact_after_releases=args.compact_after,
            )
            print(
                f"admitting multimodal records {args.watch_dir} -> "
                f"{args.base_path}"
                + (" (draining once)" if args.once else " (ctrl-c to stop)")
            )
            try:
                q.awaitTermination()
            except KeyboardInterrupt:
                q.stop()
        elif args.cmd == "watch":
            from .streaming.file_index import start_file_index_stream

            if args.no_auto_compact:
                ratio = None
            elif args.compact_tail_ratio is not None:
                ratio = args.compact_tail_ratio
            else:
                ratio = "auto"
            q = start_file_index_stream(
                spark,
                args.watch_dir,
                args.index_path,
                args.checkpoint_dir,
                additive=args.additive,
                available_now=False,
                max_files_per_trigger=args.max_files_per_trigger,
                compact_tail_ratio=ratio,
                versioned=not args.in_place,
            )
            print(f"watching {args.watch_dir} (ctrl-c to stop)")
            try:
                q.awaitTermination()
            except KeyboardInterrupt:
                # documented clean exit: stop the query so the last
                # checkpoint commit completes instead of a stack trace
                q.stop()
        return 0
    finally:
        if owned:
            spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
