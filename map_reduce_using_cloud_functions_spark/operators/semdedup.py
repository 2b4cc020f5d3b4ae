"""SemDeDup — semantic deduplication by embedding clustering (X2/X3).

Published method (Abbas et al., *SemDeDup: Data-efficient learning at
web-scale through semantic deduplication*, arXiv:2303.09540): k-means
the corpus embeddings, compute pairwise cosine WITHIN each cluster only
(the quadratic term is bounded per cluster, never corpus-wide), call a
pair above ``threshold`` a semantic duplicate, and keep the member with
the LOWEST cosine to its cluster centroid — the paper's
keep-the-"edge"-examples rule (§3: "we keep the example with the lowest
cosine similarity to the cluster centroid"). The reference repo's
dedup story is exact word counts only; this is the embedding-space
sibling of ``dedup.py``'s MinHash family for the near-dup semantics
exact hashing can't see (paraphrases, re-encodings, templated text).

Spark-first shape:

- assignment = one broadcast join against the tiny centroid table +
  partial-aggregated ``max_by`` argmax (shared objective with the IVF
  family via the same expressions — see
  ``similarity._assign_nearest_list``), computed ONCE and checkpointed:
  at k clusters the argmax is k cosines per vector — the most expensive
  map in the plan — and three consumers read it (the guard's histogram
  and both self-join sides), so recomputing per consumer would triple
  the dominant cost; the materialization is one corpus-sized write,
  the same trade ``build_ivf_index`` makes durable;
- candidate pairs = a plain hash equi-join of the assignment relation
  with itself on ``list_id`` — Catalyst shuffles both sides once on the
  cluster key and AQE splits a skewed cluster's partitions; there is NO
  corpus-wide cross join anywhere;
- the keep/drop rule is a per-pair struct comparison + one distinct —
  no window over the corpus, no driver-side loop.

Scale contract: within-cluster pair volume is Σ_c n_c·(n_c−1)/2. With
k ∝ n (the paper runs 50k clusters for ~a few hundred million docs)
cluster sizes — and therefore per-cluster work — stay constant as the
corpus grows; with k fixed the volume grows quadratically. The guard
measures the actual histogram at plan-build time (one extra corpus
pass: broadcast-argmax + a k-row aggregate) and REFUSES a configuration
whose measured volume exceeds the budget, naming the k that fits —
auto-escalating k would silently change which pairs are comparable
(cluster granularity IS the recall knob), so unlike the LSH guard there
is no auto mode. ``scale_guard="off"`` skips the extra pass.

Determinism: seeded centroids (``train=False``, the oracle-replayed
configuration) are the hash-slot seeds the DuckDB twin replays;
``train=True`` runs the deterministic Lloyd/k-means|| fit (better
balance, pytest-verified recall, not SQL-twinned). Ties in the
keep/drop rule (exact-duplicate vectors have identical centroid
cosines) break toward keeping the smaller ``vec_id``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.vectors import dot, l2_norm
from .similarity import _train_or_seed

# Measured-volume ceiling for the within-cluster self-join. Matches the
# LSH candidate budget's order of magnitude: ~5e8 exact-cosine pairs is
# hours of work on one box and a fair shuffle on a cluster; beyond it
# the right fix is more clusters, not a bigger join.
SEMDEDUP_PAIR_BUDGET = 500_000_000


def assign_clusters(embeddings: DataFrame, centroids: DataFrame) -> DataFrame:
    """Corpus → (vec_id, embedding, norm, list_id, c_score): nearest
    centroid plus the winning cosine (the paper's pruning key). Same
    argmax objective and tie rule as ``similarity._assign_nearest_list``
    (ties toward the smaller centroid_id), kept separate only because
    SemDeDup needs the score the IVF path drops.

    Norms are computed ONCE per vector/centroid and divided out, never
    re-folded per comparison: the higher-order array folds are
    interpreted (no codegen), so each k-way argmax pays 1 norm + k dots
    instead of k·(1 dot + 2 norms), and the pair join downstream reuses
    the stored ``norm``. The arithmetic is operation-for-operation the
    shared ``cosine`` builder's (``dot/(l2(a)·l2(b))``, same fold
    order), so scores stay bit-identical to the oracle twin."""
    cents = centroids.withColumn("c_norm", l2_norm(F.col("c_embedding")))
    scored = (
        embeddings.select(
            "vec_id", "embedding", l2_norm(F.col("embedding")).alias("norm")
        )
        .crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "embedding",
            "norm",
            "centroid_id",
            F.try_divide(
                dot(F.col("embedding"), F.col("c_embedding")),
                F.col("norm") * F.col("c_norm"),
            ).alias("c_score"),
        )
    )
    return scored.groupBy("vec_id", "embedding", "norm").agg(
        F.max_by(
            "centroid_id",
            F.struct(F.col("c_score"), (-F.col("centroid_id")).alias("nc")),
        ).alias("list_id"),
        F.max("c_score").alias("c_score"),
    )


def _guard_cluster_volume(
    assigned: DataFrame,
    n_clusters: int,
    what: str,
    scale_guard: str,
    budget: int | None = None,
) -> None:
    """Refuse a clustering whose measured within-cluster pair volume
    exceeds ``budget`` — BEFORE the self-join runs. One extra corpus
    pass (the broadcast argmax feeding a k-row histogram); the remedy
    names the cluster count that would fit, because escalating k
    silently changes which pairs are comparable (granularity is the
    recall knob) — so no auto mode, by design."""
    if budget is None:
        budget = SEMDEDUP_PAIR_BUDGET  # late-bound: tests patch it
    if scale_guard == "off":
        return
    if scale_guard != "raise":
        raise ValueError(
            f"scale_guard must be raise|off for semdedup (escalating "
            f"n_clusters would change pair comparability), got "
            f"{scale_guard!r}"
        )
    row = (
        assigned.groupBy("list_id")
        .agg(F.count("*").alias("n"))
        .agg(
            F.sum(F.col("n") * (F.col("n") - F.lit(1)) / F.lit(2)).alias("pairs"),
            F.max("n").alias("max_n"),
            F.sum("n").alias("total"),
        )
        .collect()
    )
    if not row or row[0]["pairs"] is None:
        return
    pairs, max_n, total = row[0]["pairs"], row[0]["max_n"], row[0]["total"]
    if pairs <= budget:
        return
    # target: average cluster small enough that even the measured skew
    # factor (max_n / mean_n) keeps the quadratic sum inside budget
    mean_n = max(total / max(n_clusters, 1), 1.0)
    skew = max(max_n / mean_n, 1.0)
    import math

    fit_k = math.ceil(total * skew * total / (2 * budget))
    raise ValueError(
        f"{what}: measured within-cluster pair volume ≈{pairs:.2e} at "
        f"n_clusters={n_clusters} exceeds the {budget:.0e} budget "
        f"(largest cluster {max_n} of {total} vectors) — the "
        "within-cluster self-join would be the corpus-wide cross join "
        "the clustering exists to avoid. Raise n_clusters (≈"
        f"{min(fit_k, total)} fits at the measured skew; SemDeDup runs "
        "k ∝ corpus size), pass train=True for better-balanced "
        "clusters, or scale_guard='off' if you have measured the "
        "volume."
    )


def semdedup_pairs(
    embeddings: DataFrame,
    n_clusters: int = 8,
    threshold: float = 0.4,
    train: bool = False,
    train_iters: int = 2,
    train_init: str = "hash",
    train_sample_size: int | None = None,
    centroids: DataFrame | None = None,
    scale_guard: str = "raise",
) -> DataFrame:
    """Within-cluster semantic-duplicate pairs:
    (list_id, vec_a, vec_b, score) with ``vec_a < vec_b`` and exact
    cosine ``score >= threshold``, rounded to 6 places (the engine-wide
    oracle-comparison contract). Recall is by construction ≤ the
    all-pairs relation: a duplicate pair split across clusters is
    invisible — that approximation IS the method (arXiv:2303.09540
    accepts it for the quadratic-cost bound); finer k trades recall
    for cost."""
    cents = (
        centroids
        if centroids is not None
        else _train_or_seed(
            embeddings,
            n_clusters,
            train,
            train_iters,
            train_init,
            train_sample_size=train_sample_size,
        )
    )
    assigned = assign_clusters(embeddings, cents).localCheckpoint()
    _guard_cluster_volume(assigned, n_clusters, "semdedup_pairs", scale_guard)
    return _pairs_from_assigned(assigned, threshold)


def _pairs_from_assigned(assigned: DataFrame, threshold: float) -> DataFrame:
    # per-pair work is ONE interpreted array fold (the dot) — both
    # norms come precomputed from the materialized assignment
    a = assigned.select(
        "list_id",
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("norm").alias("norm_a"),
        F.col("c_score").alias("c_score_a"),
    )
    b = assigned.select(
        "list_id",
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("norm").alias("norm_b"),
        F.col("c_score").alias("c_score_b"),
    )
    return (
        a.join(b, "list_id")
        .where(F.col("vec_a") < F.col("vec_b"))
        .select(
            "list_id",
            "vec_a",
            "vec_b",
            "c_score_a",
            "c_score_b",
            F.try_divide(
                dot(F.col("emb_a"), F.col("emb_b")),
                F.col("norm_a") * F.col("norm_b"),
            ).alias("raw_score"),
        )
        .where(F.col("raw_score") >= threshold)
        .select(
            "list_id",
            "vec_a",
            "vec_b",
            "c_score_a",
            "c_score_b",
            F.round("raw_score", 6).alias("score"),
        )
    )


def _dropped(pairs: DataFrame) -> DataFrame:
    """The paper's keep rule, relational form: of each duplicate pair,
    drop the member with the HIGHER cosine to its centroid (keep the
    "edge" example); exact ties — identical vectors — keep the smaller
    vec_id. Struct comparison orders (c_score, vec_id) fieldwise in
    both engines, so the DuckDB twin is a row-value CASE."""
    loser = F.when(
        F.struct(F.col("c_score_a"), F.col("vec_a"))
        > F.struct(F.col("c_score_b"), F.col("vec_b")),
        F.col("vec_a"),
    ).otherwise(F.col("vec_b"))
    return pairs.select(loser.alias("vec_id")).distinct()


def semdedup_survivors(
    embeddings: DataFrame,
    n_clusters: int = 8,
    threshold: float = 0.4,
    train: bool = False,
    train_iters: int = 2,
    train_init: str = "hash",
    train_sample_size: int | None = None,
    centroids: DataFrame | None = None,
    scale_guard: str = "raise",
) -> DataFrame:
    """The deduplicated corpus: (vec_id, list_id, c_score) for every
    vector NOT dominated by a same-cluster semantic duplicate with a
    lower centroid cosine. This is the relation a training pipeline
    joins back to ``documents`` to materialize the kept set.

    Note the rule is the single-pass dominance form (Meta's published
    implementation): x is dropped iff SOME same-cluster duplicate
    precedes it in the keep order — not the sequential greedy walk, so
    a chain a–b–c (a,c not duplicates) keeps only a where greedy would
    keep a and c. Deterministic, order-free, and one shuffle; the
    difference only appears on chains whose ends are not themselves
    duplicates."""
    cents = (
        centroids
        if centroids is not None
        else _train_or_seed(
            embeddings,
            n_clusters,
            train,
            train_iters,
            train_init,
            train_sample_size=train_sample_size,
        )
    )
    assigned = assign_clusters(embeddings, cents).localCheckpoint()
    _guard_cluster_volume(assigned, n_clusters, "semdedup_survivors", scale_guard)
    pairs = _pairs_from_assigned(assigned, threshold)
    return (
        assigned.join(_dropped(pairs), "vec_id", "left_anti")
        .select("vec_id", "list_id", F.round("c_score", 6).alias("c_score"))
    )


# --- persisted assignment index (the build_ivf_index treatment) -----------


def build_semdedup_index(
    embeddings: DataFrame,
    path: str,
    n_clusters: int = 8,
    train: bool = False,
    train_iters: int = 2,
    train_init: str = "hash",
    train_sample_size: int | None = None,
    scale_guard: str = "raise",
) -> None:
    """Persist the clustering assignment so SemDeDup's expensive pass
    amortizes: the broadcast argmax (k cosines per corpus vector — the
    dominant map) runs ONCE at build, and every threshold re-run or
    survivor join afterwards is a scan + within-cluster equi-join over
    the stored relation. Thresholding is a post-assignment filter in
    this method (arXiv:2303.09540 sweeps ε over fixed clusters the same
    way), so one build serves the whole threshold sweep a data-curation
    pipeline actually runs.

    Layout under ``path``:

    - ``meta/`` — one row (n_clusters, dim, n);
    - ``centroids/`` — the (tiny) centroid table, ``array<double>``
      (the ``build_ivf_index`` schema/read path);
    - ``assign/`` — (vec_id, embedding, norm, c_score) **partitioned by
      list_id**: the within-cluster self-join becomes partition-local
      reads of one directory per cluster, and a threshold re-run never
      touches the argmax. The embedding rides along (≈ one corpus copy)
      so the pair join is self-contained — without it every re-run
      would shuffle the original corpus back in by vec_id, which is the
      cost the index exists to kill.

    The volume guard runs at build (same refusal contract as the
    in-plan path — a persisted under-clustered assignment would bake
    the quadratic join in); the assignment is written from the
    READ-BACK centroids so the persisted values are by construction the
    ones the assignment used."""
    from .ann_commit import ann_commit, ann_head, gc_ann_index, new_generation, sweep_superseded_fixed

    spark = embeddings.sparkSession
    head = ann_head(spark, path)
    parent = head["v"] if head else None
    gen, gdir = new_generation(path)
    base = embeddings.select("vec_id", "embedding")
    dim_row = base.select(F.size("embedding").alias("d")).first()
    n = base.count()
    cents = _train_or_seed(
        base, n_clusters, train, train_iters, train_init,
        train_sample_size=train_sample_size,
    )
    (
        cents.select(
            "centroid_id",
            F.col("c_embedding").cast("array<double>").alias("c_embedding"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{gdir}/centroids")
    )
    (
        spark.createDataFrame(
            [(n_clusters, dim_row["d"], n)], "n_clusters int, dim int, n bigint"
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{gdir}/meta")
    )
    saved = spark.read.schema(
        "centroid_id int, c_embedding array<double>"
    ).parquet(f"{gdir}/centroids")
    assigned = assign_clusters(base, saved).localCheckpoint()
    _guard_cluster_volume(assigned, n_clusters, "build_semdedup_index", scale_guard)
    (
        assigned.select("vec_id", "embedding", "norm", "c_score", "list_id")
        .hint("rebalance", "list_id")
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(f"{gdir}/assign")
    )
    # one atomic visibility switch (the r9 ANN crash protocol): a crash
    # anywhere above leaves the previous commit serving a consistent
    # (meta, centroids, assign) set; a rebuild with fewer clusters or a
    # shrunk corpus supersedes the whole old generation, so the stale-
    # partition rebuild hazard is structurally gone too.
    ann_commit(
        spark,
        path,
        "semdedup",
        {
            "meta": f"{gen}/meta",
            "centroids": f"{gen}/centroids",
            "assign": [f"{gen}/assign"],
        },
        parent,
    )
    gc_ann_index(spark, path)
    sweep_superseded_fixed(spark, path, "semdedup")


def load_semdedup_meta(spark, path: str) -> dict:
    from .ann_commit import read_artifact

    row = read_artifact(
        spark, path, "meta", "n_clusters int, dim int, n bigint"
    ).first()
    return row.asDict()


def _load_assignment(spark, path: str) -> DataFrame:
    """The live assignment relation: every serving read anti-joins the
    (tiny, broadcast) tombstone relation, so a taken-down vector stops
    GATING pair generation and stops appearing as a survivor at the
    next committed read — ``ann_commit.delete_vectors`` is the write
    side, ``compact_ann_index`` the physical purge."""
    from .ann_commit import apply_tombstones, read_artifact

    return apply_tombstones(
        spark,
        path,
        read_artifact(
            spark,
            path,
            "assign",
            "vec_id bigint, embedding array<float>, norm double, "
            "c_score double, list_id int",
        ),
    )


def semdedup_pairs_indexed(spark, path: str, threshold: float = 0.4) -> DataFrame:
    """``semdedup_pairs`` served from a persisted assignment: the
    argmax pass is gone; cost is the within-cluster equi-join alone
    (partition-co-located reads of ``assign/``). Identical answers to
    the in-plan path for identical centroids (oracle row pins it)."""
    return _pairs_from_assigned(_load_assignment(spark, path), threshold)


def semdedup_survivors_indexed(
    spark, path: str, threshold: float = 0.4
) -> DataFrame:
    """``semdedup_survivors`` from the persisted assignment — the
    threshold-sweep serving path: each ε re-run pays one join over the
    stored relation, never the corpus argmax."""
    assigned = _load_assignment(spark, path)
    pairs = _pairs_from_assigned(assigned, threshold)
    return assigned.join(_dropped(pairs), "vec_id", "left_anti").select(
        "vec_id", "list_id", F.round("c_score", 6).alias("c_score")
    )


def append_semdedup_index(embeddings: DataFrame, path: str) -> None:
    """Grow a persisted SemDeDup assignment by O(new batch): assign the
    batch against the FROZEN stored centroids and commit its rows as a
    new ``assign/`` generation — the continuous-corpus shape (each
    release's vectors join the semantic-dedup corpus without
    re-running the argmax over anything standing). Inherits the IVF
    append contract exactly: centroids are frozen at build time, so
    pair comparability never drifts mid-stream and
    appended ≡ joint-build for identical centroids (the oracle row pins
    it); distribution drift shows up as skewed ``assign`` partition
    sizes (``ivf_list_occupancy``) and the remedy is a rebuild. The
    r9 commit protocol makes the append atomic (meta count + batch rows
    in ONE CAS-fenced commit) and fences concurrent writers. ``vec_id``
    uniqueness across build + appends is the caller's contract. The
    volume guard re-measures the COMBINED occupancy before committing —
    appends grow clusters, and a persisted under-clustered assignment
    would bake the quadratic join in for every later re-run."""
    from .ann_commit import (
        adopt_legacy,
        ann_commit,
        ann_head,
        gc_ann_index,
        new_generation,
        read_artifact,
    )
    from .similarity import load_ivf_centroids

    spark = embeddings.sparkSession
    meta = load_semdedup_meta(spark, path)
    base = embeddings.select("vec_id", "embedding")
    dim = base.select(F.size("embedding").alias("d")).first()["d"]
    if dim != meta["dim"]:
        raise ValueError(
            f"append_semdedup_index: batch dimension {dim} != index "
            f"dimension {meta['dim']} at {path} — centroids are "
            "dimension-specific; rebuild the index or fix the batch."
        )
    head = ann_head(spark, path)
    if head is None:
        adopt_legacy(spark, path, "semdedup")
        head = ann_head(spark, path)
    n_new = base.count()
    cents = load_ivf_centroids(spark, path)
    assigned = assign_clusters(base, cents).localCheckpoint()
    standing = _load_assignment(spark, path).select("vec_id", "list_id")
    _guard_cluster_volume(
        standing.unionByName(assigned.select("vec_id", "list_id")),
        meta["n_clusters"],
        "append_semdedup_index",
        "raise",
    )
    gen, gdir = new_generation(path)
    (
        spark.createDataFrame(
            [(meta["n_clusters"], meta["dim"], meta["n"] + n_new)],
            "n_clusters int, dim int, n bigint",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{gdir}/meta")
    )
    (
        assigned.select("vec_id", "embedding", "norm", "c_score", "list_id")
        .hint("rebalance", "list_id")
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(f"{gdir}/assign")
    )
    ann_commit(
        spark,
        path,
        "semdedup",
        {
            **head["dirs"],
            "meta": f"{gen}/meta",
            "assign": head["dirs"]["assign"] + [f"{gen}/assign"],
        },
        head["v"],
    )
    gc_ann_index(spark, path)
