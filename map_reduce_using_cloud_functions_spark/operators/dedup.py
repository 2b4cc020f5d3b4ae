"""Deduplication family (SURVEY.md §2.b X1/X2) — the LLM-pipeline dedup
toolbox over ``documents(doc_id, text, ...)``.

Every variant is a declarative DataFrame plan with a DuckDB-expressible
twin (the driver's oracle), built on the portable md5-derived hash
(functions/hashing.py) so hash *values* agree across engines.

Scale notes (100 TB design points):
- exact: one shuffle on a 64-bit text hash, not on the text itself —
  shuffle payload is (hash, doc_id), bytes-per-row ~16, not the document.
- minhash: signatures are k rows per doc (k=16); LSH banding turns the
  O(n²) pair space into an equi-join on (band, band_hash) — only
  colliding buckets produce candidates. Band buckets are skew-prone
  (empty docs hash alike): AQE skew-join handles it; candidates are
  verified with the exact signature overlap before reporting.
- simhash: 32-bit fingerprint per doc via one explode(k bits) + sum —
  near-dup candidates are fingerprints at small Hamming distance.
- token-set Jaccard: exact verification path; joined on shared token so
  disjoint docs never meet (inverted-index join, not cross join).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.hashing import hex64, portable_hash64
from ..functions.text import tokens_array

# MinHash configuration — fixed so Spark and the oracle agree.
MINHASH_K = 16
LSH_BANDS = 4  # 4 bands x 4 rows
SIMHASH_BITS = 32


def exact_dedup_groups(documents: DataFrame) -> DataFrame:
    """X1 exact dedup: group identical texts by 64-bit content hash.

    Returns ``(text_hash, keep_id, n_copies)`` — keep_id is the smallest
    doc_id of the group (deterministic survivor). Collision risk at 60
    bits is ~n²/2⁶¹; the scale-out variant would use the full sha2-256
    hex as the key at identical plan shape.
    """
    return (
        documents.select(F.col("doc_id"), hex64(F.col("text")).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exact_dedup(documents: DataFrame) -> DataFrame:
    """X1: the deduplicated relation itself — first doc_id per text hash
    wins (``row_number`` over the hash group)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(hex64(F.col("text"))).orderBy("doc_id")
    return (
        documents.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


def _shingles(documents: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle): distinct word n-grams per document.

    Built from the same tokenizer as the index so dedup and indexing
    agree on text normalization."""
    toks = F.col("toks")
    # Guard: sequence(1, 0) in Spark is the DESCENDING [1, 0], not empty,
    # so short docs need an explicit empty-array branch.
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    gram = F.when(
        F.size(toks) >= n,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + off) for off in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        documents.select("doc_id", tokens_array(F.col("text")).alias("toks"))
        .select("doc_id", F.explode(gram).alias("shingle"))
        .distinct()
    )


def minhash_signatures(documents: DataFrame, k: int = MINHASH_K, shingle_n: int = 3) -> DataFrame:
    """X2 MinHash: (doc_id, seed, minhash) long-format signatures —
    min over shingles of the seeded portable hash, one row per seed.

    Long format keeps the plan a single explode + groupBy (no 16-column
    pivot) and matches the oracle SQL shape 1:1."""
    sh = _shingles(documents, shingle_n)
    seeds = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("seed")
    return (
        sh.select("doc_id", "shingle", seeds)
        .select(
            "doc_id",
            "seed",
            hex64(
                F.concat(F.col("seed").cast("string"), F.lit("|"), F.col("shingle"))
            ).alias("h"),
        )
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("minhash"))
    )


def minhash_lsh_candidates(signatures: DataFrame, bands: int = LSH_BANDS) -> DataFrame:
    """Band the k-row signatures and equi-join on (band, band_hash):
    only documents colliding in ≥1 band become candidate pairs.

    band_hash = portable hash of the band's minhashes joined in seed
    order — computed with sort_array(collect_list(struct(seed, minhash)))
    so the concatenation order is deterministic under any partitioning.
    """
    rows_per_band = MINHASH_K // bands
    banded = (
        signatures.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            hex64(
                F.array_join(
                    F.transform(
                        F.sort_array(F.collect_list(F.struct("seed", "minhash"))),
                        lambda s: s["minhash"].cast("string"),
                    ),
                    ",",
                )
            ).alias("band_hash")
        )
    )
    other = banded.select(
        F.col("doc_id").alias("doc_b"), "band", "band_hash"
    )
    return (
        banded.join(other, ["band", "band_hash"])
        .where(F.col("doc_id") < F.col("doc_b"))
        .select(F.col("doc_id").alias("doc_a"), "doc_b")
        .distinct()
    )


def minhash_dedup_pairs(
    documents: DataFrame, threshold: float = 0.5, k: int = MINHASH_K
) -> DataFrame:
    """X2 end-to-end: LSH candidates verified by estimated Jaccard
    (fraction of agreeing signature rows). Returns
    ``(doc_a, doc_b, est_jaccard)`` with est_jaccard ≥ threshold."""
    sigs = minhash_signatures(documents, k)
    cands = minhash_lsh_candidates(sigs)
    a = sigs.select(F.col("doc_id").alias("doc_a"), "seed", F.col("minhash").alias("mh_a"))
    b = sigs.select(F.col("doc_id").alias("doc_b"), "seed", F.col("minhash").alias("mh_b"))
    return (
        cands.join(a, "doc_a")
        .join(b, ["doc_b", "seed"])
        .groupBy("doc_a", "doc_b")
        .agg(
            (F.sum((F.col("mh_a") == F.col("mh_b")).cast("int")) / F.lit(k)).alias(
                "est_jaccard"
            )
        )
        .where(F.col("est_jaccard") >= threshold)
    )


def simhash_fingerprints(documents: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """X2 SimHash: one integer fingerprint per document.

    bit_b = sign of Σ_token count(token) · (2·bit_b(hash(token)) − 1);
    fingerprint = Σ bit_b · 2^b. One explode(bits) + two aggregations,
    all JVM-side bitwise ops — matches the oracle's >>/& arithmetic."""
    tok = (
        documents.select("doc_id", F.explode(tokens_array(F.col("text"))).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("h", hex64(F.col("word")))
    )
    b = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    # shiftright/shiftleft with a *column* shift amount needs the SQL
    # form (the Python wrappers only take int literals).
    return (
        tok.select("doc_id", "cnt", "h", b)
        .withColumn("contrib", F.col("cnt") * (F.expr("shiftright(h, bit)").bitwiseAND(F.lit(1)) * 2 - 1))
        .groupBy("doc_id", "bit")
        .agg(F.sum("contrib").alias("s"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("s") > 0, F.expr("shiftleft(cast(1 as bigint), bit)")).otherwise(
                    F.lit(0).cast("bigint")
                )
            ).alias("simhash")
        )
    )


def jaccard_token_pairs(documents: DataFrame, threshold: float = 0.6) -> DataFrame:
    """X2 exact n-gram/token-set Jaccard: pairs sharing ≥1 token, scored
    |A∩B| / |A∪B|, kept at ≥ threshold.

    The join key is the token itself (inverted-index join): documents
    with no overlap never pair, so the pair space is Σ_token df(token)²
    — at 100 TB the handful of ultra-high-df tokens are the skew risk,
    handled by dropping top-df tokens (stopword-like) before joining in
    the scale configuration (kept here for oracle fidelity)."""
    toks = (
        documents.select("doc_id", F.explode(tokens_array(F.col("text"))).alias("word"))
        .distinct()
    )
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = toks.select(F.col("doc_id").alias("doc_a"), "word")
    b = toks.select(F.col("doc_id").alias("doc_b"), "word")
    common = (
        a.join(b, "word")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    return (
        common.join(F.broadcast(na), "doc_a")
        .join(F.broadcast(nb), "doc_b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )
