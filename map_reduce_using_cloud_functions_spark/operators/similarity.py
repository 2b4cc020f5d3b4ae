"""Similarity search over embeddings (SURVEY.md §2.b X3).

Two strategies over ``embeddings(vec_id, embedding: array<float>, label)``:

- ``brute_force_topk`` — exact cosine top-k: broadcast the (small) query
  set against the full corpus, score with JVM-side ``zip_with``/
  ``aggregate`` arithmetic, rank with a window partitioned by query.
  At 100 TB this is the correct baseline when |queries| is small: one
  broadcast, one scan, no shuffle of the corpus (the window partitions
  by query id, so the shuffle moves only (query, candidate, score) rows).

- ``lsh_bucketed_topk`` — the scale path for large query sets: random-
  hyperplane LSH (sign sketch) buckets both sides; candidates only meet
  inside a bucket (equi-join), then exact cosine re-ranks. Hyperplane
  components are derived from the portable hash (deterministic, engine-
  reproducible — no RNG state), so the oracle can replay the bucketing.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions.hashing import hex64
from ..functions.vectors import cosine

LSH_PLANES = 8


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    ``queries``: (query_id, q_embedding). Self-matches (same id) are
    excluded. Deterministic under ties via neighbor-id tiebreak.
    Returns (query_id, neighbor_id, rank, score).
    """
    scored = (
        embeddings.join(
            F.broadcast(queries), F.col("vec_id") != F.col("query_id")
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("q_embedding"), F.col("embedding")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("score", 6).alias("score"))
    )


def queries_from_ids(embeddings: DataFrame, max_id: int) -> DataFrame:
    """Fixture query set: vectors with vec_id < max_id."""
    return embeddings.where(F.col("vec_id") < max_id).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )


def _sign_sketch(df: DataFrame, vec_col: str, planes: int = LSH_PLANES) -> DataFrame:
    """Append ``bucket``: integer of sign bits of <v, u_p> for p random-
    but-deterministic hyperplanes.

    u_p[d] = (hash(p|d) mod 2001 - 1000) / 1000 ∈ [-1, 1] — derived from
    the portable hash so any engine rebuilds the exact planes.
    """
    p = F.explode(F.sequence(F.lit(0), F.lit(planes - 1))).alias("plane")
    d = F.posexplode(F.col(vec_col))
    comp = df.select("*", p).select("*", d.alias("dim", "x"))
    u = (
        hex64(F.concat_ws("|", F.col("plane"), F.col("dim"))) % 2001 - 1000
    ).cast("double") / 1000.0
    dots = (
        comp.withColumn("c", F.col("x").cast("double") * u)
        .groupBy(*df.columns, "plane")
        .agg(F.sum("c").alias("dot"))
    )
    return (
        dots.withColumn(
            "bit",
            F.when(F.col("dot") > 0, F.expr("shiftleft(cast(1 as bigint), plane)")).otherwise(
                F.lit(0).cast("bigint")
            ),
        )
        .groupBy(*df.columns)
        .agg(F.sum("bit").alias("bucket"))
    )


def lsh_bucketed_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5, planes: int = LSH_PLANES
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    Recall < 1.0 by construction (that is the approximation); the win is
    the equi-join on ``bucket`` replacing the full cross product —
    corpus-side sketches are computed once and reusable across query
    batches. Returns (query_id, neighbor_id, rank, score).
    """
    corpus_b = _sign_sketch(embeddings.select("vec_id", "embedding"), "embedding", planes)
    queries_b = _sign_sketch(queries, "q_embedding", planes)
    scored = (
        corpus_b.join(queries_b, "bucket")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("q_embedding"), F.col("embedding")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("score", 6).alias("score"))
    )


def brute_force_topk_vectorized(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Exact top-k via Arrow-batched NumPy matmul — the scale path for
    *many* queries.

    The expression-based ``brute_force_topk`` evaluates one cosine per
    (query, candidate) row: |Q|·|C| rows through codegen. Here the
    query matrix (small, normalized once) is a broadcast variable and
    each Arrow batch of candidates does ONE |batch|×dim · dim×|Q|
    matmul in BLAS, emitting only each batch's local candidates; the
    final global top-k is a window over |batches|·k·|Q| rows instead of
    |C|·|Q|. Same results as the expression path (tested), ~matmul
    speed instead of per-row expression evaluation."""
    import numpy as np

    sess = embeddings.sparkSession
    q_rows = queries.collect()
    q_ids = np.array([r["query_id"] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r["q_embedding"] for r in q_rows], dtype=np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    bc = sess.sparkContext.broadcast((q_ids, q_mat, k))

    def score_batches(batches):
        import pandas as pd

        q_ids_l, q_mat_l, k_l = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            c_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            c_mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            c_mat /= np.linalg.norm(c_mat, axis=1, keepdims=True)
            scores = c_mat @ q_mat_l.T  # |batch| x |Q|
            out_q, out_n, out_s = [], [], []
            for j, qid in enumerate(q_ids_l):
                col = scores[:, j]
                mask = c_ids != qid
                ids, vals = c_ids[mask], col[mask]
                top = min(k_l, len(vals))
                if not top:
                    continue
                part = np.argpartition(-vals, top - 1)[:top]
                out_q.extend([qid] * top)
                out_n.extend(ids[part])
                out_s.extend(vals[part])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "score": out_s}
            )

    local_top = embeddings.select("vec_id", "embedding").mapInPandas(
        score_batches, schema="query_id bigint, neighbor_id bigint, score double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        local_top.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("score", 6).alias("score"))
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
) -> DataFrame:
    """IVF-style approximate top-k: partition the corpus into inverted
    lists by nearest centroid, probe only the query's ``n_probe``
    closest lists.

    Centroids are chosen deterministically (the vectors whose id hashes
    into the first ``n_centroids`` slots — reservoir-free, reproducible;
    a production build would k-means these, the *plan* is identical):
    assignment and probing are broadcast nested-loop joins against the
    tiny centroid set, the candidate join is a plain equi-join on
    ``list_id`` — the corpus never cross-joins the query set.

    Approximation contract: every returned neighbor carries its exact
    cosine; recall < 1 when a true neighbor lives in an unprobed list.
    """
    cents = (
        embeddings.where((F.col("vec_id") % 97) < n_centroids)
        .select(
            (F.col("vec_id") % 97).cast("int").alias("centroid_id"),
            "vec_id",
            F.col("embedding").alias("c_embedding"),
        )
    )
    # dedupe slot collisions deterministically: min vec_id per slot
    w = Window.partitionBy("centroid_id").orderBy("vec_id")
    cents = (
        cents.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("centroid_id", "c_embedding")
    )

    def nearest_lists(df: DataFrame, vec_col: str, id_col: str, n: int) -> DataFrame:
        scored = df.crossJoin(F.broadcast(cents)).select(
            id_col,
            vec_col,
            "centroid_id",
            cosine(F.col(vec_col), F.col("c_embedding")).alias("c_score"),
        )
        wn = Window.partitionBy(id_col).orderBy(F.desc("c_score"), F.asc("centroid_id"))
        return (
            scored.withColumn("crn", F.row_number().over(wn))
            .where(F.col("crn") <= n)
            .select(id_col, vec_col, F.col("centroid_id").alias("list_id"))
        )

    corpus_lists = nearest_lists(
        embeddings.select("vec_id", "embedding"), "embedding", "vec_id", 1
    )
    query_lists = nearest_lists(queries, "q_embedding", "query_id", n_probe)

    scored = (
        corpus_lists.join(query_lists, "list_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("q_embedding"), F.col("embedding")).alias("score"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("score", 6).alias("score"))
    )


def pairwise_near_dup(embeddings: DataFrame, threshold: float) -> DataFrame:
    """X2 embedding-cosine near-dup: all pairs with cosine ≥ threshold.

    Exact all-pairs (the oracle-checkable form). The scale path is the
    same scoring after an LSH-bucket equi-join (see lsh_bucketed_topk) —
    identical expression, restricted candidate space.
    Returns (vec_a, vec_b, score).
    """
    a = embeddings.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = embeddings.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("score", cosine(F.col("ea"), F.col("eb")))
        .where(F.col("score") >= threshold)
        .select("vec_a", "vec_b", F.round("score", 6).alias("score"))
    )
