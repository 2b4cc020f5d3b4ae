"""Unified ANN serving door (X3, r9 verdict task 7).

Four persisted index families exist (IVF, banded LSH, PQ, IVF-PQ),
each with its own probe function and parameter surface. A caller that
picks the wrong prober for a path gets a confusing schema error at
best and a silently-wrong scan at worst — the per-family meta
validation only half covers it (e.g. a PQ prober pointed at an IVF-PQ
index reads a codes relation that exists but routes nothing).
``ann_search`` reads the index's own identity and dispatches:

- protocol indexes (r9 ``ann_commit`` layout) carry ``family`` in the
  committed manifest — authoritative;
- legacy fixed-subdir indexes are sniffed from which artifacts exist
  (the four layouts are pairwise distinguishable: lists ⇒ IVF,
  buckets ⇒ LSH, codes+centroids ⇒ IVF-PQ, codes alone ⇒ PQ);
- options not meaningful for the detected family REFUSE loudly
  instead of being dropped (passing ``n_probe`` to a PQ index is a
  caller who thinks they're talking to a routed index — silence would
  hide a recall bug).

Queries: (query_id, q_embedding) — the house contract shared by every
probe path. Returns (query_id, neighbor_id, rank, score).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .ann_commit import ann_head, resolve_artifact

# option name -> families it is meaningful for
_OPTIONS = {
    "n_probe": {"ivf", "ivf_pq"},
    "probe_bits": {"lsh"},
    "scale_guard": {"lsh"},
    "shortlist": {"pq", "ivf_pq"},
    "embeddings": {"pq", "ivf_pq"},
}


def ann_index_family(spark, path: str) -> str:
    """The family an index at ``path`` serves — from the committed
    manifest when present, else sniffed from the legacy fixed layout.
    Raises with the layout evidence when the path is not an index."""
    head = ann_head(spark, path)
    if head is not None:
        return head["family"]
    present = {
        name
        for name in ("lists", "buckets", "codes", "assign", "centroids", "books", "meta")
        if resolve_artifact(spark, path, name)
    }
    if "lists" in present:
        return "ivf"
    if "buckets" in present:
        return "lsh"
    if "codes" in present:
        return "ivf_pq" if "centroids" in present else "pq"
    if "assign" in present:
        return "semdedup"
    raise ValueError(
        f"{path} is not a persisted ANN index: no commit manifest and "
        f"no recognizable artifacts (found {sorted(present) or 'nothing'}). "
        "Build one with build_ivf_index / build_lsh_index / "
        "build_pq_index / build_ivf_pq_index."
    )


def ann_search(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    **options,
) -> DataFrame:
    """Top-k against ANY persisted ANN index: detect the family, check
    the options against it, dispatch to the family's prober. One
    serving call site regardless of which index a pipeline built."""
    from .pq import ivf_pq_topk_indexed, pq_topk_indexed
    from .similarity import ivf_topk_indexed, lsh_banded_topk_indexed

    family = ann_index_family(spark, path)
    if family == "semdedup":
        raise ValueError(
            f"ann_search: {path} is a persisted SemDeDup assignment, not a "
            "top-k index — probe it with semdedup_pairs_indexed / "
            "semdedup_survivors_indexed instead."
        )
    bad = [o for o in options if o not in _OPTIONS]
    if bad:
        raise ValueError(
            f"ann_search: unknown option(s) {sorted(bad)} — supported: "
            f"{sorted(_OPTIONS)}"
        )
    wrong = [o for o in options if family not in _OPTIONS[o]]
    if wrong:
        raise ValueError(
            f"ann_search: option(s) {sorted(wrong)} do not apply to the "
            f"{family!r} index at {path} (each is for "
            f"{ {o: sorted(_OPTIONS[o]) for o in wrong} }). A mismatched "
            "option usually means the caller expected a different index "
            "family — check the path."
        )
    if family == "ivf":
        return ivf_topk_indexed(
            spark, path, queries, k=k, n_probe=options.get("n_probe", 2)
        )
    if family == "lsh":
        return lsh_banded_topk_indexed(
            spark,
            path,
            queries,
            k=k,
            probe_bits=options.get("probe_bits", 1),
            scale_guard=options.get("scale_guard", "raise"),
        )
    if family == "pq":
        return pq_topk_indexed(
            spark,
            path,
            queries,
            k=k,
            shortlist=options.get("shortlist"),
            embeddings=options.get("embeddings"),
        )
    return ivf_pq_topk_indexed(
        spark,
        path,
        queries,
        k=k,
        n_probe=options.get("n_probe", 2),
        shortlist=options.get("shortlist"),
        embeddings=options.get("embeddings"),
    )
