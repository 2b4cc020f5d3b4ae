"""Front-door observability (r11, verdict task 7): one admission
report over the COMMITTED artifacts — the accounting the r10 semantic
soak computed ad hoc, as a first-class operator.

Everything here is read from what the door already persists (survivors
release partitions, each ledger's meta/data/bands, the versioned index
watermark): deterministic, replayable, zero instrumentation in the hot
path. Refusals are NOT persisted by design (a refused document leaves
no artifact — that is the door's storage contract), so the report
derives them per release when the caller supplies the landing batch
sizes, and otherwise reports admitted volumes and per-strength ledger
growth, which at steady state is the same curve.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..operators.dedup import ledger_exists


def _ledger_section(spark, path: str) -> dict:
    from ..operators.dedup import (
        CORRUPT_SIDECAR_DIR,
        _plain_dir_releases,
        ledger_info,
    )

    # count_docs=False: the per-release groupBy below is the ONE scan
    # of the data dir — n_docs is its sum, not a second full read
    info = ledger_info(spark, path, count_docs=False)
    data_dir = {"minhash": "sigs", "embedding": "vecs", "phash": "prints"}[
        info["kind"]
    ]
    per_release = {}
    if info["releases"]:
        rows = (
            spark.read.parquet(f"{path}/{data_dir}")
            .groupBy("release")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        per_release = {int(r["release"]): int(r["n"]) for r in rows}
    info["per_release"] = per_release
    info["n_docs"] = sum(per_release.values())
    if info["kind"] == "phash" and _plain_dir_releases(
        spark, f"{path}/{CORRUPT_SIDECAR_DIR}"
    ):
        # the exact-byte gate's state: admitted-corrupt content hashes
        # per release (folds into -1 with the rest of the ledger)
        rows = (
            spark.read.parquet(f"{path}/{CORRUPT_SIDECAR_DIR}")
            .groupBy("release")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        info["corrupt_per_release"] = {
            int(r["release"]): int(r["n"]) for r in rows
        }
    return info


def front_door_report(
    spark,
    survivors_path: str | None = None,
    ledger_path: str | None = None,
    semantic_ledger_path: str | None = None,
    phash_ledger_path: str | None = None,
    index_path: str | None = None,
    batch_sizes: dict[int, int] | None = None,
    multimodal_base: str | None = None,
) -> dict:
    """Admission accounting from the committed artifacts: per-release
    admitted counts (survivors partitions), per-strength ledger state
    (sketch params, release fan-out, docs per release, band-directory
    fan-in a probe pays — the number ``ledger-compact`` resets, the
    corrupt exact-gate sidecar for phash ledgers), and the composed
    index's watermark/pending tail. ``batch_sizes`` (release → landed
    count, e.g. from the producer's manifest) adds per-release refusal
    counts. ``multimodal_base``: one envelope root
    (``streaming/envelope.py`` layout) — reports admitted documents
    per release, admitted assets per (signal, release), and every
    ledger under the base, in one call."""
    report: dict = {}
    if multimodal_base is not None:
        from ..operators.index import _hadoop_exists
        from .envelope import multimodal_paths

        paths = multimodal_paths(multimodal_base)
        mm_sec: dict = {}
        if _hadoop_exists(spark, paths["docs"]):
            rows = (
                spark.read.parquet(paths["docs"])
                .groupBy("release")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            docs = {int(r["release"]): int(r["n"]) for r in rows}
            mm_sec["docs_per_release"] = dict(sorted(docs.items()))
            mm_sec["docs_total"] = sum(docs.values())
        if _hadoop_exists(spark, paths["assets"]):
            rows = (
                spark.read.parquet(paths["assets"])
                .groupBy("signal", "release")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            per_sig: dict = {}
            for r in rows:
                per_sig.setdefault(r["signal"], {})[int(r["release"])] = int(
                    r["n"]
                )
            mm_sec["assets_per_release"] = {
                s: dict(sorted(v.items())) for s, v in sorted(per_sig.items())
            }
            mm_sec["assets_total"] = sum(
                n for v in per_sig.values() for n in v.values()
            )
        if ledger_exists(spark, paths["ledger"]):
            mm_sec["minhash_ledger"] = _ledger_section(spark, paths["ledger"])
        if ledger_exists(spark, paths["semantic"]):
            mm_sec["semantic_ledger"] = _ledger_section(
                spark, paths["semantic"]
            )
        for sig, p in paths["phash"].items():
            if ledger_exists(spark, p):
                mm_sec[f"phash_ledger_{sig}"] = _ledger_section(spark, p)
        for sig, p in paths["asset_semantic"].items():
            if ledger_exists(spark, p):
                mm_sec[f"asset_semantic_ledger_{sig}"] = _ledger_section(
                    spark, p
                )
        report["multimodal"] = mm_sec
    if survivors_path is not None:
        rows = (
            spark.read.parquet(survivors_path)
            .groupBy("release")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        admitted = {int(r["release"]): int(r["n"]) for r in rows}
        report["admitted_per_release"] = dict(sorted(admitted.items()))
        report["admitted_total"] = sum(admitted.values())
        if batch_sizes:
            report["refused_per_release"] = {
                int(rel): int(n) - admitted.get(int(rel), 0)
                for rel, n in sorted(batch_sizes.items())
            }
    strengths = {
        "minhash_ledger": ledger_path,
        "semantic_ledger": semantic_ledger_path,
        "phash_ledger": phash_ledger_path,
    }
    for key, path in strengths.items():
        if path is not None:
            report[key] = _ledger_section(spark, path)
    if index_path is not None:
        from ..operators.index import (
            _resolve_version,
            index_size_info,
            pending_additive_batches,
        )

        _base, folded, version = _resolve_version(spark, index_path)
        info = index_size_info(spark, index_path)
        report["index"] = {
            "version": version,
            "folded_through": folded,
            "pending_batches": pending_additive_batches(spark, index_path),
            "base_bytes": info["base_bytes"],
            "tail_bytes": info["tail_bytes"],
        }
    return report
