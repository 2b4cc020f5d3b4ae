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
  (boilerplate/templated docs share signatures): AQE skew-join handles
  it; candidates are verified with the exact signature overlap before
  reporting. Scope note: documents with fewer than ``shingle_n`` tokens
  produce NO shingles, hence no signature — they are invisible to
  MinHash near-dup BY DESIGN (near-similarity of 1-2-token docs is not
  meaningful); ``exact_dedup`` keys the full text and covers them.
- simhash: 32-bit fingerprint per doc via one explode(k bits) + sum —
  near-dup candidates are fingerprints at small Hamming distance.
- token-set Jaccard: exact verification path; joined on shared token so
  disjoint docs never meet (inverted-index join, not cross join).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions.hashing import hex64
from ..functions.text import gram_array, tokens_array

# MinHash configuration — fixed so Spark and the oracle agree.
MINHASH_K = 16
LSH_BANDS = 4  # 4 bands x 4 rows
SIMHASH_BITS = 32

# Seeded hash family for MinHash: ONE md5 per shingle, then k linear
# transforms h_i = (a_i·(h mod p) + b_i) mod p over the Mersenne prime
# p = 2³¹−1. a_i·(h mod p) < 2⁶² keeps everything in int64; the
# transforms are pure whole-stage-codegen arithmetic (k× cheaper than
# k seeded md5 calls) and trivially reproducible in the DuckDB oracle.
MINHASH_P = 2147483647


def _mh_a(i: int) -> int:
    return 2 * i + 1


def _mh_b(i: int) -> int:
    return i * 7919 + 13


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
    wins.

    Plan: survivors = groupBy(hash).min(doc_id) (partial-aggregable,
    16-byte shuffle rows), then a semi-join back on doc_id. Two narrow
    shuffles instead of the window alternative's full shuffle-SORT of
    the corpus rows (documents carry the text — sorting them is the
    expensive part at scale)."""
    keep = (
        documents.select(F.col("doc_id"), hex64(F.col("text")).alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return documents.join(keep, "doc_id", "left_semi")


def _shingles(
    documents: DataFrame,
    n: int = 3,
    distinct: bool = True,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, *keep, shingle): word n-grams per document (distinct by
    default; duplicate-insensitive consumers like MinHash skip the
    dedup shuffle). ``keep`` carries extra input columns through —
    streaming callers can't join them back without a stream-stream
    join.

    Built from the same tokenizer as the index so dedup and indexing
    agree on text normalization."""
    gram = gram_array(F.col("toks"), n)
    out = documents.select(
        "doc_id", *keep, tokens_array(F.col("text")).alias("toks")
    ).select("doc_id", *keep, F.explode(gram).alias("shingle"))
    return out.distinct() if distinct else out


def minhash_signatures_wide(
    documents: DataFrame, k: int = MINHASH_K, shingle_n: int = 3
) -> DataFrame:
    """X2 MinHash signatures, one row per doc: (doc_id, sig: array<k longs>).

    Scale design: the k seeded hashes are computed per shingle as an
    array projection (no k× row blowup), and the groupBy carries k
    ``min`` partial aggregates — so the only wide shuffle moves k longs
    per document, not k×|shingles| rows. The shingle set is NOT
    deduplicated first: min() is duplicate-insensitive, and skipping
    ``distinct`` saves a full shuffle of the shingle relation.
    """
    sh = _shingles(documents, shingle_n, distinct=False)
    base = sh.select("doc_id", (hex64(F.col("shingle")) % MINHASH_P).alias("h"))
    # SQL-text projections, not per-Column construction: k hash columns
    # built Column-by-Column cost ~6 py4j round-trips each (the same
    # driver-side plan-build tax measured on the LSH sketch, r5); one
    # selectExpr/expr string per stage is a single parse. L suffixes
    # keep every literal BIGINT — identical arithmetic to the previous
    # lit()*col()%P chain (a·h+b < 2^62, no overflow).
    hashes = [
        f"(({_mh_a(i)}L * h + {_mh_b(i)}L) % {MINHASH_P}L) AS h{i}"
        for i in range(k)
    ]
    mins = [F.expr(f"min(h{i}) AS m{i}") for i in range(k)]
    sig = "array(" + ", ".join(f"m{i}" for i in range(k)) + ") AS sig"
    return (
        base.selectExpr("doc_id", *hashes)
        .groupBy("doc_id")
        .agg(*mins)
        .selectExpr("doc_id", sig)
    )


def minhash_signatures(documents: DataFrame, k: int = MINHASH_K, shingle_n: int = 3) -> DataFrame:
    """Long-format view (doc_id, seed, minhash) of the wide signatures —
    the oracle-friendly shape; posexplode after the aggregate is cheap
    (k rows per doc, produced map-side from the agg result)."""
    return minhash_signatures_wide(documents, k, shingle_n).select(
        "doc_id", F.posexplode("sig").alias("seed", "minhash")
    )


def _band_hashes(
    sig_wide: DataFrame,
    bands: int = LSH_BANDS,
    k: int = MINHASH_K,
    keep_sig: bool = False,
) -> DataFrame:
    """(doc_id, band, band_hash[, sig]) from wide signatures — a pure
    projection (no shuffle): each band hashes its slice of the array.
    ``keep_sig`` carries the full signature alongside so the verify step
    can run inside the banding join without re-reading the signatures."""
    if k % bands:
        raise ValueError(
            f"k={k} must divide evenly into bands={bands}: the trailing "
            f"k % bands signature positions would silently never reach a "
            f"band (reduced recall with no error)"
        )
    rows_per_band = k // bands
    cols = [
        F.struct(
            F.lit(b).alias("band"),
            hex64(
                F.array_join(
                    F.transform(
                        F.slice("sig", b * rows_per_band + 1, rows_per_band),
                        lambda m: m.cast("string"),
                    ),
                    ",",
                )
            ).alias("band_hash"),
        )
        for b in range(bands)
    ]
    extra = ["sig"] if keep_sig else []
    return sig_wide.select(
        "doc_id", *extra, F.explode(F.array(*cols)).alias("bb")
    ).select(
        "doc_id",
        *extra,
        F.col("bb.band").alias("band"),
        F.col("bb.band_hash").alias("band_hash"),
    )


def minhash_lsh_candidates(
    sig_wide: DataFrame, bands: int = LSH_BANDS, k: int = MINHASH_K
) -> DataFrame:
    """Equi-join documents on (band, band_hash): only bucket collisions
    become candidate pairs — the step that replaces the O(n²) pair space.
    Bucket skew (many boilerplate/near-identical docs sharing a band
    hash) is handled by AQE skew-join splitting at runtime."""
    banded = _band_hashes(sig_wide, bands, k)
    other = banded.select(F.col("doc_id").alias("doc_b"), "band", "band_hash")
    return (
        banded.join(other, ["band", "band_hash"])
        .where(F.col("doc_id") < F.col("doc_b"))
        .select(F.col("doc_id").alias("doc_a"), "doc_b")
        .distinct()
    )


def minhash_dedup_pairs(
    documents: DataFrame,
    threshold: float = 0.5,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    shingle_n: int = 3,
) -> DataFrame:
    """X2 end-to-end: LSH candidates verified by estimated Jaccard =
    fraction of agreeing signature positions, compared as arrays
    (zip_with + filter — no per-seed join). Returns
    ``(doc_a, doc_b, est_jaccard)`` with est_jaccard ≥ threshold.

    Plan shape: the signatures ride *through* the banding projection, so
    the verify step happens inside the (band, band_hash) equi-join itself
    — no second join back to the signature table. The banded relation
    (doc_id, sig, band, band_hash — ~150 bytes/row, corpus text never
    included) is materialized ONCE with ``localCheckpoint`` and both
    join sides scan the materialized blocks; unlike ``persist``, the
    blocks are released by the ContextCleaner as soon as the caller
    drops the result (no cache leak across repeated calls in a
    long-lived session). This is the local analogue of a production
    pipeline writing the signature table before banding against it.
    Duplicate (doc_a, doc_b) hits from multi-band collisions are folded
    by the final groupBy (est_jaccard is band-invariant, so max == the
    value); filtering *before* that groupBy keeps the fold's shuffle to
    surviving pairs only."""
    sigs = minhash_signatures_wide(documents, k, shingle_n)
    banded = _band_hashes(sigs, bands=bands, k=k, keep_sig=True).localCheckpoint()
    a = banded.select(
        F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"), "band", "band_hash"
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"), "band", "band_hash"
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq
        )
    )
    return (
        a.join(b, ["band", "band_hash"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            (agree.cast("double") / F.lit(k)).alias("est_jaccard"),
        )
        .where(F.col("est_jaccard") >= threshold)
        .groupBy("doc_a", "doc_b")
        .agg(F.max("est_jaccard").alias("est_jaccard"))
    )


def simhash_fingerprints(documents: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """X2 SimHash: one integer fingerprint per document.

    bit_b = sign of Σ_occurrence (2·bit_b(hash(token)) − 1);
    fingerprint = Σ_{b: bit_b set} 2^b. (Summing ±1 per occurrence is
    identical to weighting distinct tokens by their counts, so no
    per-(doc, word) pre-aggregation is needed.)

    Scale design: the per-bit contributions are ``bits`` sum aggregates
    over a projection of the token stream — ONE shuffle whose payload is
    ``bits`` partial sums per document, with no bits× row explosion and
    no intermediate (doc, bit) relation."""
    tok = documents.select(
        "doc_id", F.explode(tokens_array(F.col("text"))).alias("word")
    ).select("doc_id", hex64(F.col("word")).alias("h"))
    # SQL-text projections, not per-Column construction (the 61cda9c /
    # 7eaf491 treatment): the bits× contribution/sum/fold chains built
    # Column-by-Column cost ~6.5k py4j round-trips per plan; one parsed
    # string per stage is ~1 round-trip per expression. L suffixes keep
    # every literal BIGINT — identical arithmetic to the previous
    # shiftright/bitwiseAND/when chain, pinned bit-identical by the
    # dedup_simhash oracle row.
    contribs = [
        f"((shiftright(h, {b}) & 1L) * 2L - 1L) AS c{b}" for b in range(bits)
    ]
    sums = [F.expr(f"sum(c{b}) AS s{b}") for b in range(bits)]
    fingerprint = " + ".join(
        f"if(s{b} > 0, {1 << b}L, 0L)" for b in range(bits)
    )
    return (
        tok.selectExpr("doc_id", *contribs)
        .groupBy("doc_id")
        .agg(*sums)
        .selectExpr("doc_id", f"({fingerprint}) AS simhash")
    )


def jaccard_shingle_pairs(
    documents: DataFrame, threshold: float = 0.2, n: int = 3
) -> DataFrame:
    """X2 exact n-gram (shingle) Jaccard: the ground truth MinHash
    estimates. Same inverted-index join pattern as the token variant but
    over word n-grams — shingle df is near-1 for natural text, so the
    pair space stays close to the true near-dup set even without LSH.
    Returns (doc_a, doc_b, jaccard ≥ threshold)."""
    sh = _shingles(documents, n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    # no broadcast hint on the sizes relation: it is one row per
    # DOCUMENT (corpus-sized at the 100 TB design point) — forcing it
    # driver-side would OOM; AQE broadcasts it only when it is small
    return (
        common.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def jaccard_token_pairs(
    documents: DataFrame,
    threshold: float = 0.6,
    max_df: int | None = None,
    max_df_frac: float | None = None,
) -> DataFrame:
    """X2 exact n-gram/token-set Jaccard: pairs sharing ≥1 token, scored
    |A∩B| / |A∪B|, kept at ≥ threshold.

    The join key is the token itself (inverted-index join): documents
    with no overlap never pair, so the pair space is Σ_token df(token)².
    At 100 TB the handful of ultra-high-df tokens dominate that sum —
    "the" joins every English doc pair. The guard restricts the
    computation to the vocabulary of tokens appearing in ≤ max_df
    documents (``max_df_frac`` expresses the cap as a corpus fraction,
    so the same setting holds at any scale): BOTH the intersection and
    the set sizes |A|, |B| count only that vocabulary, so the result is
    the exact Jaccard over the df-filtered token sets (the standard
    stopword-removed similarity; self-consistent, but a different
    measure than the unfiltered score). The judged/oracle configuration
    is ``max_df_frac=0.5`` — drop tokens present in more than half the
    corpus, which caps any token's pair contribution at (N/2)² while
    leaving near-dup pairs intact (planted duplicates share their rare
    vocabulary). ``max_df=max_df_frac=None`` disables the guard — exact
    Jaccard over full token sets, a ground-truth tool for small slices,
    not a 100 TB plan."""
    toks = (
        documents.select("doc_id", F.explode(tokens_array(F.col("text"))).alias("word"))
        .distinct()
    )
    if max_df_frac is not None and max_df is not None:
        raise ValueError("pass max_df or max_df_frac, not both")
    if max_df is not None or max_df_frac is not None:
        df_counts = toks.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
        if max_df is not None:
            rare = df_counts.where(F.col("df") <= F.lit(max_df))
        else:
            # lazy fractional cap: floor(frac * N) joined in as a 1-row
            # broadcast aggregate, so BUILDING this plan runs no job
            # (plan dumps, plan-shape tests, and bench reps stay free)
            # and the corpus is never scanned solely for its count
            nd = documents.agg(F.count(F.lit(1)).alias("_n"))
            rare = df_counts.join(F.broadcast(nd)).where(
                F.col("df") <= F.floor(F.lit(max_df_frac) * F.col("_n"))
            )
        toks = toks.join(rare.select("word"), "word", "left_semi")
    # sizes over the SAME (possibly df-filtered) relation as the join:
    # numerator and denominator agree on the vocabulary, keeping the
    # score a true Jaccard rather than a mixed-domain underestimate.
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
    # no broadcast hint on the sizes relation: it is one row per
    # DOCUMENT (corpus-sized at the 100 TB design point) — forcing it
    # driver-side would OOM; AQE broadcasts it only when it is small
    return (
        common.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def duplicate_spans(
    documents: DataFrame, n: int = 8, min_occurrences: int = 2
) -> DataFrame:
    """X2 sub-document duplication: ExactSubstr-style duplicated-span
    detection (Lee, Ippolito et al. 2022, "Deduplicating Training Data
    Makes Language Models Better" — the suffix-array pass restated as
    dataflow over fixed-width grams).

    A token position is *duplicated* when it is covered by an n-gram
    occurring ≥ ``min_occurrences`` times corpus-wide (within- or
    cross-document — boilerplate headers, license blocks, templated
    spans). Overlapping/adjacent hits merge into MAXIMAL spans via
    gaps-and-islands. Returns one row per maximal span:
    ``(doc_id, span_id, span_start, span_end, span_tokens)`` with
    1-based inclusive token positions, span_id numbered per doc in
    position order.

    Scale shape: gram occurrence counting shuffles the 64-bit gram hash
    (8 B/row, partial-agged); only grams that ARE duplicated come back
    as hits (left-semi), so the span-merge windows run over the small
    hit relation, partitioned per doc and bounded by doc length — no
    corpus-wide sort anywhere. Versus true ExactSubstr (suffix array,
    arbitrary-length matches ≥50 chars), fixed-n grams detect exactly
    the spans whose every n-window repeats — maximal repeated regions
    ≥ n tokens — at dataflow cost; n tunes the sensitivity/precision
    trade like the 50-char threshold does."""
    pos_grams = (
        documents.select("doc_id", tokens_array(F.col("text")).alias("toks"))
        .select(
            "doc_id",
            F.posexplode(gram_array(F.col("toks"), n)).alias("p", "gram"),
        )
        # posexplode is 0-based; span positions stay 1-based
        .select("doc_id", (F.col("p") + 1).alias("i"), hex64(F.col("gram")).alias("gh"))
    )
    dup = (
        pos_grams.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= min_occurrences)
        .select("gh")
    )
    hits = pos_grams.join(dup, "gh", "left_semi").select("doc_id", "i")
    w = Window.partitionBy("doc_id").orderBy(F.asc("i"))
    flagged = hits.withColumn(
        "is_new",
        F.when(
            F.lag("i").over(w).isNull() | (F.col("i") > F.lag("i").over(w) + n),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spans = flagged.withColumn("span_id", F.sum("is_new").over(w_run))
    return spans.groupBy("doc_id", "span_id").agg(
        F.min("i").alias("span_start"),
        (F.max("i") + F.lit(n - 1)).alias("span_end"),
        (F.max("i") + F.lit(n) - F.min("i")).alias("span_tokens"),
    )


def duplicate_span_stats(
    documents: DataFrame, n: int = 8, min_occurrences: int = 2
) -> DataFrame:
    """Per-document rollup of ``duplicate_spans``: how much of each doc
    is duplicated material — the signal a span-level scrub or a
    doc-level drop policy thresholds on. Returns every document
    (zero-span docs included): ``(doc_id, n_tokens, n_spans,
    dup_tokens, dup_token_frac)``."""
    spans = duplicate_spans(documents, n, min_occurrences)
    agg = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("span_tokens").alias("dup_tokens"),
    )
    lens = documents.select(
        "doc_id", F.size(tokens_array(F.col("text"))).alias("n_tokens")
    )
    return (
        lens.join(agg, "doc_id", "left")
        .na.fill(0, ["n_spans", "dup_tokens"])
        .select(
            "doc_id",
            "n_tokens",
            "n_spans",
            "dup_tokens",
            F.round(
                F.col("dup_tokens")
                / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double"),
                6,
            ).alias("dup_token_frac"),
        )
    )


def scrub_duplicate_spans(
    documents: DataFrame, n: int = 8, min_occurrences: int = 2
) -> DataFrame:
    """Span-level scrub: drop every duplicated-span token (ALL
    occurrences — the boilerplate/license/template scrub policy; a
    keep-one-occurrence policy needs a global occurrence ranking, which
    is ``exact_dedup``'s job at doc level) and rebuild the normalized
    text. Returns ``(doc_id, clean_text, n_tokens, n_removed)``.

    The span list per doc is tiny (collect_list over per-doc spans);
    token filtering is a JVM-side higher-order-function projection —
    no UDF, no explode of the corpus."""
    spans = duplicate_spans(documents, n, min_occurrences)
    doc_spans = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    toks_df = documents.select(
        "doc_id", tokens_array(F.col("text")).alias("toks")
    ).join(doc_spans, "doc_id", "left")
    sp = F.coalesce(
        F.col("_spans"),
        F.array().cast("array<struct<span_start:int,span_end:int>>"),
    )
    indexed = F.transform(
        F.col("toks"), lambda t, i: F.struct(t.alias("t"), (i + 1).alias("i"))
    )
    kept = F.filter(
        indexed,
        lambda s: ~F.exists(
            sp,
            lambda r: (r["span_start"] <= s["i"]) & (s["i"] <= r["span_end"]),
        ),
    )
    return toks_df.select(
        "doc_id",
        F.array_join(F.transform(kept, lambda s: s["t"]), " ").alias("clean_text"),
        F.size("toks").alias("n_tokens"),
        (F.size("toks") - F.size(kept)).alias("n_removed"),
    )


# Directed-edge cap for dedup_clusters' driver-side union-find fast
# path; an edge set that collects over this bound falls through to the
# distributed iterative propagation (tests patch it to 0 to drive the
# iterative path on small fixtures).
DRIVER_CC_MAX_EDGES = 200_000

# Row cap above which a ledger probe's batch side is NOT pinned as the
# broadcast build side (r13, r12 ADVICE): the streaming doors' batches
# are trigger-bounded by contract (they assert it with
# ``bounded_batch=True`` and skip the probe job), but the same probes
# are documented batch APIs — a caller auditing a release history with
# a huge "batch" must degrade to a planner-chosen shuffle join, not a
# driver OOM against Spark's 8 GB broadcast hard cap. 4M rows of the
# narrow band relations is well under that cap; tests patch this to 0
# to drive the unpinned path on small fixtures.
LEDGER_BROADCAST_MAX_ROWS = 4_000_000


def _batch_is_bounded(df: DataFrame) -> bool:
    """One BOUNDED job: count at most ``LEDGER_BROADCAST_MAX_ROWS + 1``
    rows of ``df`` (the probes pass their localCheckpoint'ed batch, so
    this reads materialized blocks) — never a full count of a
    potentially unbounded relation."""
    cap = LEDGER_BROADCAST_MAX_ROWS
    return df.limit(cap + 1).count() <= cap


def dedup_clusters(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """X2 cluster resolution: near-dup pairs → connected components.

    Input: (doc_a, doc_b[, ...]) candidate pairs (any of the pair
    producers above). Output: (doc_id, cluster_rep) for every document
    appearing in ≥1 pair, where cluster_rep is the component-wide
    minimum doc_id — the deterministic survivor, matching
    ``exact_dedup``'s min-id policy.

    Algorithm: iterative min-label propagation to fixpoint — each round,
    every node takes min(own label, neighbors' labels); convergence in
    ≤ diameter rounds (near-dup components are dense, near-clique
    clusters, so 2–3 rounds in practice). Each round is one equi-join +
    one partial-aggregated groupBy; ``localCheckpoint`` truncates the
    lineage so round N's plan doesn't replay rounds 1..N-1 (the standard
    Spark iterative-algorithm pattern). At 100 TB the edge relation is
    the (small) near-dup pair set, not the corpus — the corpus never
    enters the loop.
    """
    sym = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    # Materialize the DISTINCT edge set once, up front (r13): the pair
    # producer is the expensive subplan and BOTH paths need its edges,
    # so probing the raw relation first (the r12 shape) re-ran the
    # producer from scratch on the fall-through — the declared 100 TB
    # path paid its most expensive subtree twice. The probe now reads
    # the checkpointed blocks (bounded driver fetch, near-free job),
    # and the cap bounds UNIQUE edges, so a duplicate-heavy pair set
    # with few distinct edges stays on the fast path instead of
    # spuriously falling through (r12 ADVICE, both items).
    #
    # Fast path (r12): near-dup edge sets are usually tiny relative to
    # the corpus (the pair producer already thresholded them) — resolve
    # components with a driver-side union-find instead of 2+ jobs per
    # propagation round (each round cost a localCheckpoint job + a
    # convergence count; the admission doors pay this every batch). An
    # oversized edge set falls through to the iterative min-label
    # propagation below, which remains the 100 TB path — now off the
    # SAME checkpointed edges. Same values: union-find's root = the
    # component-wide min id = the propagation fixpoint.
    _cap = DRIVER_CC_MAX_EDGES
    edges = sym.distinct().localCheckpoint()
    head = edges.limit(_cap + 1).collect()
    if len(head) <= _cap:
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for row in head:
            a, b = row["src"], row["dst"]
            if a not in parent:
                parent[a] = a
            if b not in parent:
                parent[b] = b
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by MIN id so every root is its component's min
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        out = sorted((x, find(x)) for x in parent)
        spark = pairs.sparkSession
        from pyspark.sql.types import StructField, StructType

        t = sym.schema["src"].dataType
        return spark.createDataFrame(
            out,
            StructType(
                [
                    StructField("doc_id", t, False),
                    StructField("cluster_rep", t, False),
                ]
            ),
        )
    labels = edges.select(
        F.col("src").alias("doc_id"), F.col("src").alias("label")
    ).distinct().localCheckpoint()
    for _ in range(max_iter):
        nbr = (
            edges.join(labels.withColumnRenamed("doc_id", "dst"), "dst")
            .select(F.col("src").alias("doc_id"), "label")
        )
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("doc_id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.withColumnRenamed("label", "new_label")
            .join(labels, "doc_id")
            .where(F.col("new_label") != F.col("label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # Returning non-converged labels would silently split one
        # component into several "clusters" (and near_dedup would keep
        # several survivors from one duplicate set) — fail loudly.
        raise RuntimeError(
            f"dedup_clusters did not converge in {max_iter} rounds: a "
            "component's diameter exceeds max_iter (long near-dup "
            "chain). Re-run with a larger max_iter."
        )
    return labels.select("doc_id", F.col("label").alias("cluster_rep"))


def cluster_survivors(
    rows: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Shared survivor policy for every near-dedup composition: pairs →
    connected components (``dedup_clusters``) → drop every
    non-representative cluster member from ``rows`` (anti-join on
    ``id_col``). The anti-join's right side carries ids only and gets
    no broadcast hint — for a mostly-clean corpus AQE broadcasts it
    from runtime stats, and for a duplicate-heavy corpus (losers ~
    corpus size) forcing a broadcast would be exactly wrong."""
    clusters = dedup_clusters(pairs)
    losers = clusters.where(F.col("doc_id") != F.col("cluster_rep")).select(
        F.col("doc_id").alias(id_col)
    )
    return rows.join(losers, id_col, "left_anti")


def near_dedup(
    documents: DataFrame,
    threshold: float = 0.5,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    shingle_n: int = 3,
) -> DataFrame:
    """X2 end-to-end near-dedup: MinHash+LSH pairs → connected
    components → keep one survivor (min doc_id) per cluster
    (``cluster_survivors``). Returns the deduplicated documents
    relation: every doc that is not a non-representative member of a
    near-dup cluster. ``bands``/``shingle_n`` reach the sketch, so a
    caller coordinating with a ledger (the streaming admitter) gets the
    SAME sketch within-batch and cross-release."""
    pairs = minhash_dedup_pairs(
        documents, threshold=threshold, k=k, bands=bands, shingle_n=shingle_n
    )
    return cluster_survivors(documents, pairs)


def _fp_band_layout(max_hamming: int, bits: int) -> tuple[list[int], list[int]]:
    """Band widths/offsets for the pigeonhole trick: ``max_hamming+1``
    contiguous bands PARTITION the ``bits``-bit fingerprint, the first
    (bits % n_bands) bands one bit wider — a fixed ceil-width layout
    would leave high bands empty (all-zero band_bits ⇒ every row
    collides ⇒ an accidental all-pairs join)."""
    n_bands = max_hamming + 1
    if n_bands > bits:
        raise ValueError(
            f"max_hamming={max_hamming} needs {n_bands} non-empty bands "
            f"from a {bits}-bit fingerprint — impossible; raise bits or "
            f"lower max_hamming"
        )
    base, rem = divmod(bits, n_bands)
    widths = [base + 1 if i < rem else base for i in range(n_bands)]
    offsets = [sum(widths[:i]) for i in range(n_bands)]
    return widths, offsets


def _fp_bands(
    df: DataFrame, id_col: str, fp_col: str, max_hamming: int, bits: int
) -> DataFrame:
    """Explode a fingerprint relation into its pigeonhole bands:
    (``id_col``, ``fp_col``, band, band_bits). Shift amounts must be
    literals (Spark's shiftrightunsigned takes no column count), so
    each band's extraction is a CASE over the exploded band index —
    all JVM-side integer ops, assembled as ONE parsed SQL string (not
    n_bands when() Columns — the same py4j plan-build tax fixed in
    simhash_fingerprints)."""
    widths, offsets = _fp_band_layout(max_hamming, bits)
    n_bands = len(widths)
    band_bits = " + ".join(
        f"if(band = {i}, shiftrightunsigned({fp_col}, {offsets[i]}) "
        f"& {(1 << widths[i]) - 1}L, 0L)"
        for i in range(n_bands)
    )
    return df.selectExpr(
        id_col,
        fp_col,
        f"explode(array({', '.join(str(i) for i in range(n_bands))})) AS band",
    ).selectExpr(id_col, fp_col, "band", f"({band_bits}) AS band_bits")


def fingerprint_hamming_pairs(
    prints: DataFrame,
    max_hamming: int,
    bits: int,
    id_col: str = "doc_id",
    fp_col: str = "simhash",
    out: tuple[str, str] = ("doc_a", "doc_b"),
) -> DataFrame:
    """Hamming-≤d pairs over ANY integer fingerprint column — the
    banded pigeonhole engine shared by ``simhash_pairs`` (text SimHash)
    and ``multimodal.phash_pairs`` (perceptual image dHash).

    Scale shape is the pigeonhole band trick: split the ``bits``-bit
    fingerprint into ``max_hamming + 1`` contiguous bands; two prints
    within hamming distance d ≤ max_hamming agree EXACTLY on at least
    one band (d flipped bits can touch at most d bands). So candidates
    come from an equi-join on (band_idx, band_bits) — never an all-pairs
    scan — and the exact popcount(xor) filter keeps no false positives.
    Same candidate-generation/verify economics as MinHash-LSH banding,
    but over one integer per row (the cheapest sketch there is).

    Returns ``(out[0], out[1], hamming)``, ``out[0] < out[1]``,
    deduplicated across bands by the final aggregation (hamming is
    band-invariant)."""
    out_a, out_b = out
    fp = prints.select(
        F.col(id_col).alias("_fpid"), F.col(fp_col).cast("long").alias("_fp")
    )
    bands = _fp_bands(fp, "_fpid", "_fp", max_hamming, bits)
    a = bands.select(
        F.col("_fpid").alias(out_a), F.col("_fp").alias("fp_a"), "band", "band_bits"
    )
    b = bands.select(
        F.col("_fpid").alias(out_b), F.col("_fp").alias("fp_b"), "band", "band_bits"
    )
    xor = F.col("fp_a").bitwiseXOR(F.col("fp_b"))
    return (
        a.join(b, ["band", "band_bits"])
        .where(F.col(out_a) < F.col(out_b))
        .withColumn("hamming", F.bit_count(xor))
        .where(F.col("hamming") <= max_hamming)
        .groupBy(out_a, out_b)
        .agg(F.min("hamming").alias("hamming"))
    )


def simhash_pairs(
    documents: DataFrame,
    max_hamming: int = 3,
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """X2: near-duplicate PAIRS from SimHash fingerprints — documents
    whose fingerprints differ in at most ``max_hamming`` bits. The
    candidate/verify engine is ``fingerprint_hamming_pairs`` (banded
    pigeonhole equi-join — never all-pairs).

    Returns (doc_a, doc_b, hamming), doc_a < doc_b, deduplicated across
    bands by the final aggregation (hamming is band-invariant)."""
    fp = simhash_fingerprints(documents, bits)
    return fingerprint_hamming_pairs(
        fp, max_hamming=max_hamming, bits=bits, id_col="doc_id", fp_col="simhash"
    )


def simhash_near_dedup(
    documents: DataFrame, max_hamming: int = 3, bits: int = SIMHASH_BITS
) -> DataFrame:
    """X2 end-to-end near-dedup over the SimHash metric: banded pairs →
    connected components → keep min-doc_id survivor per cluster — the
    ``near_dedup`` composition with hamming-distance semantics instead
    of Jaccard (cheaper sketch: one 32-bit int per doc vs k minhashes;
    coarser notion of 'near'). Survivor policy shared via
    ``cluster_survivors``."""
    pairs = simhash_pairs(documents, max_hamming=max_hamming, bits=bits).select(
        "doc_a", "doc_b"
    )
    return cluster_survivors(documents, pairs)


def dedup_against_reference(
    documents: DataFrame,
    seen_hashes: DataFrame,
    use_bloom: bool = False,
    fpp: float = 0.01,
) -> DataFrame:
    """Incremental cross-release dedup: drop documents whose content
    hash already shipped in a prior corpus release.

    ``seen_hashes`` is the persisted hash ledger of everything released
    so far — one ``text_hash`` column, the same 64-bit content hash
    ``exact_dedup_groups`` emits — so each release appends its hashes
    and the next release dedups against the ledger WITHOUT touching any
    previous release's text. Returns the surviving rows of
    ``documents``, all columns intact.

    Two exact paths:
    - default: hash anti join. The new-shard side shuffles only when
      the ledger exceeds the broadcast threshold (AQE decides).
    - ``use_bloom``: for ledgers way past broadcast size (billions of
      hashes). Definite-new documents (bloom miss) pass MAP-ONLY with
      their text; only bloom hits project down to (doc_id, hash) for
      the exact confirm anti join against the ledger, and the few
      surviving false positives rejoin their text via a doc_id
      semi-join (a tiny id relation — AQE broadcasts it). Document
      text never enters a hash-partitioned shuffle on either branch.
    """
    seen = seen_hashes.select(F.col("text_hash").alias("_h")).distinct()
    if not use_bloom:
        return (
            documents.withColumn("_h", hex64(F.col("text")))
            .join(seen, "_h", "left_anti")
            .drop("_h")
        )
    from .bloom import _probed, bloom_bitmap

    bitmap, m, k = bloom_bitmap(seen, "_h", fpp=fpp)
    probed = _probed(documents.withColumn("_h", hex64(F.col("text"))), bitmap, "_h", m, k)
    definite_new = probed.where(~F.col("_bloom_hit")).drop("_bloom_hit", "_h")
    maybe_ids = (
        probed.where(F.col("_bloom_hit"))
        .select("doc_id", "_h")
        .join(seen, "_h", "left_anti")
        .select("doc_id")
    )
    recovered = documents.join(maybe_ids, "doc_id", "left_semi")
    return definite_new.unionByName(recovered)


# ------------------------------------------- cross-release NEAR-dup ledger
#
# ``dedup_against_reference`` covers exact cross-release dedup; this is
# its near-dup sibling: a persisted MinHash signature + band-bucket
# ledger of everything released so far, probed by each new release so
# near-duplicates of PRIOR text are caught without re-sketching (or even
# re-reading) any previous release. At 100 TB the standing corpus is the
# expensive side — the ledger stores k=16 longs per doc (sigs/) plus a
# narrow (doc_id, band_hash) relation (bands/), ~200 bytes/doc total,
# and a probe costs O(new batch) sketch + an equi-join on band buckets.
#
# MinHash parameters are pure functions of the portable hash — NOT of
# any corpus sample — so ledger probes are bit-identical in sketch space
# to a from-scratch joint sketch (the ``dedup_ledger_pairs`` oracle row
# pins batch-vs-ledger pairs against exactly the joint-corpus SQL twin).
# No drift, no rebuild-for-quality, ever.


def _ledger_meta_path(path: str) -> str:
    return f"{path}/meta"


def build_minhash_ledger(
    documents: DataFrame,
    path: str,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    shingle_n: int = 3,
    release: int = 0,
) -> None:
    """Create the ledger at ``path`` from the first release.

    Layout:

    - ``meta/`` — one row (k, bands, shingle_n): the sketch parameters
      every append and probe must replay (they ARE the ledger identity —
      mixing parameters would silently compare incomparable sketches,
      so both re-read them from here rather than taking arguments);
    - ``sigs/`` — (doc_id, sig: array<k longs>) partitioned by
      ``release``, stored ONCE per doc (the verify step fetches
      signatures only for colliding candidates — bands never carry
      them, the same narrow-relation rule as ``build_lsh_index``);
    - ``bands/`` — (doc_id, band_hash) partitioned by
      (``release``, ``band``): band-level partition pruning for probes
      that only care about some bands, release-level pruning for
      audits, and — the reason release leads — each release writes
      ONLY its own partition directories.
    """
    init_minhash_ledger(
        documents.sparkSession, path, k=k, bands=bands, shingle_n=shingle_n
    )
    append_minhash_ledger(documents, path, release=release)


def init_minhash_ledger(
    spark,
    path: str,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    shingle_n: int = 3,
) -> None:
    """Write the ledger's parameter row only — an empty ledger every
    append/probe replays parameters from. The streaming admitter uses
    this for its first batch (its survivors aren't known until after
    the within-batch dedup, so init and append are separate steps
    there)."""
    if k % bands:
        raise ValueError(
            f"k={k} must divide evenly into bands={bands} (same contract "
            "as _band_hashes: trailing positions would never reach a band)"
        )
    (
        spark.createDataFrame(
            [(k, bands, shingle_n)], "k int, bands int, shingle_n int"
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(_ledger_meta_path(path))
    )


def ledger_exists(spark, path: str) -> bool:
    """True once ``build_minhash_ledger`` has written the parameter
    row — the ledger's identity; sigs/bands may still be empty."""
    from .index import _hadoop_exists

    return _hadoop_exists(spark, _ledger_meta_path(path))


def ledger_releases(spark, path: str) -> list[int]:
    """Release ids recorded in the ledger (ascending) — read from the
    ``bands/release=N`` partition directories, no data scan."""
    from .index import _hadoop_exists, _hadoop_fs, _hadoop_path

    bands = f"{path}/bands"
    if not _hadoop_exists(spark, bands):
        return []
    out = []
    for st in _hadoop_fs(spark, bands).listStatus(_hadoop_path(spark, bands)):
        name = st.getPath().getName()
        if name.startswith("release="):
            out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def load_ledger_meta(spark, path: str) -> dict:
    row = (
        spark.read.schema("k int, bands int, shingle_n int")
        .parquet(_ledger_meta_path(path))
        .first()
    )
    return row.asDict()


def append_minhash_ledger(documents: DataFrame, path: str, release: int) -> None:
    """Record a release in the ledger: sketch it with the stored
    parameters and write its ``sigs/`` and ``bands/`` partitions.

    Replay-idempotent by layout: the write uses dynamic partition
    overwrite, so re-running a release (crash recovery, a corrected
    re-ship) REPLACES that release's partitions instead of
    double-inserting — the property parquet ``append`` mode cannot give
    (and the reason this ledger doesn't need the word index's batch-id
    watermark protocol: the release id in the path IS the watermark).
    Distinct releases are the caller's contract, exactly like
    ``dedup_against_reference``'s append-per-release hash ledger."""
    spark = documents.sparkSession
    meta = load_ledger_meta(spark, path)
    if not documents.head(1):
        return  # empty release = no-op (see append_phash_ledger)
    sigs = minhash_signatures_wide(
        documents, k=meta["k"], shingle_n=meta["shingle_n"]
    ).withColumn("release", F.lit(release))
    (
        sigs.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("release")
        .parquet(f"{path}/sigs")
    )
    banded = (
        _band_hashes(
            spark.read.parquet(f"{path}/sigs").where(F.col("release") == release),
            bands=meta["bands"],
            k=meta["k"],
        )
        .withColumn("release", F.lit(release))
        .select("doc_id", "band_hash", "release", "band")
    )
    (
        banded.repartition("band")
        .sortWithinPartitions("band_hash")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("release", "band")
        .parquet(f"{path}/bands")
    )


def ledger_near_dup_pairs(
    spark,
    documents: DataFrame,
    path: str,
    threshold: float = 0.5,
    before_release: int | None = None,
    exclude_release: int | None = None,
    bounded_batch: bool | None = None,
) -> DataFrame:
    """Probe the ledger with a NEW batch: returns
    ``(doc_id, ledger_doc, est_jaccard)`` — each batch document paired
    with every prior-release document whose estimated Jaccard clears
    ``threshold``.

    Plan shape: sketch ONLY the batch (signatures ride through its
    banding projection); equi-join the persisted narrow ``bands/``
    relation on (band, band_hash); dedup candidate (doc_id, ledger_doc)
    pairs across bands BEFORE fetching ledger signatures (each
    candidate fetches/verifies exactly once — multi-band collisions
    are folded on the narrow relation, not after the sig join); then
    one equi-join against ``sigs/`` verifies with the exact
    zip_with overlap. No previous release's text — or signature that
    doesn't collide — is ever read; the batch side never shuffles its
    text at all.

    ``before_release``: probe only releases strictly below it — a
    partition-pruned predicate on both ledger reads, for batch callers
    auditing a prefix of the release history. ``exclude_release``:
    probe every release EXCEPT that one — the streaming replay
    contract: a replayed batch must skip its own (already-appended)
    release or every replayed document matches itself and is dropped
    as a dup of itself, but it must still see releases with HIGHER ids
    (an adopting stream's fresh batch ids can start below the ledger's
    existing release ids — ``release < batch_id`` would silently skip
    those releases and admit duplicates of admitted content).
    ``streaming/near_dedup.py`` passes its batch id as
    ``exclude_release``.

    ``bounded_batch``: whether the probe batch is small enough to pin
    as the broadcast build side of the ledger joins. ``True`` — the
    streaming doors' trigger-bounded contract — pins it with no extra
    job; ``False`` leaves the join strategy to the planner; ``None``
    (default) decides with one bounded count over the checkpointed
    batch sketch (``LEDGER_BROADCAST_MAX_ROWS``), so a batch caller
    probing with a huge relation degrades to a shuffle join instead of
    a driver OOM (r12 ADVICE)."""
    meta = load_ledger_meta(spark, path)
    batch = _band_hashes(
        minhash_signatures_wide(documents, k=meta["k"], shingle_n=meta["shingle_n"]),
        bands=meta["bands"],
        k=meta["k"],
        keep_sig=True,
    ).localCheckpoint()
    if bounded_batch is None:
        bounded_batch = _batch_is_bounded(batch)
    _hint = F.broadcast if bounded_batch else (lambda df: df)
    ledger_bands_raw = spark.read.parquet(f"{path}/bands")
    if before_release is not None:
        ledger_bands_raw = ledger_bands_raw.where(
            F.col("release") < F.lit(before_release)
        )
    if exclude_release is not None:
        ledger_bands_raw = ledger_bands_raw.where(
            F.col("release") != F.lit(exclude_release)
        )
    ledger_bands = ledger_bands_raw.select(
        F.col("doc_id").alias("ledger_doc"), "band", "band_hash"
    )
    # r12: a BOUNDED probe batch broadcasts as the build side of every
    # join — the ledger's narrow bands relation streams through a
    # BroadcastHashJoin instead of paying a full exchange per probe
    # (the admission doors pay this every batch; localCheckpoint
    # sources defeat the planner's size estimate, so the hint is
    # explicit). r13: the pin is guarded by ``bounded_batch`` above.
    cands = (
        _hint(batch.select("doc_id", "band", "band_hash"))
        .join(ledger_bands, ["band", "band_hash"])
        .select("doc_id", "ledger_doc")
        .distinct()
    )
    lsigs_raw = spark.read.parquet(f"{path}/sigs")
    if before_release is not None:
        lsigs_raw = lsigs_raw.where(F.col("release") < F.lit(before_release))
    if exclude_release is not None:
        lsigs_raw = lsigs_raw.where(F.col("release") != F.lit(exclude_release))
    lsigs = lsigs_raw.select(
        F.col("doc_id").alias("ledger_doc"), F.col("sig").alias("lsig")
    )
    bsigs = batch.select("doc_id", "sig").distinct()
    agree = F.size(
        F.filter(F.zip_with("sig", "lsig", lambda x, y: x == y), lambda eq: eq)
    )
    return (
        cands.join(_hint(bsigs), "doc_id")
        .join(lsigs, "ledger_doc")
        .select(
            "doc_id",
            "ledger_doc",
            (agree.cast("double") / F.lit(meta["k"])).alias("est_jaccard"),
        )
        .where(F.col("est_jaccard") >= threshold)
    )


def near_dedup_against_ledger(
    spark,
    documents: DataFrame,
    path: str,
    threshold: float = 0.5,
    before_release: int | None = None,
    exclude_release: int | None = None,
    bounded_batch: bool | None = None,
) -> DataFrame:
    """Cross-release near-dedup: the rows of ``documents`` that are NOT
    a near-duplicate of anything already in the ledger, all columns
    intact — ``dedup_against_reference``'s contract at near-dup
    strength. Ship the survivors, then ``append_minhash_ledger`` them
    as the next release. ``before_release`` restricts the probe to
    earlier releases; ``exclude_release`` skips exactly one release
    (the streaming replay contract — see ``ledger_near_dup_pairs``).
    ``bounded_batch``: see ``ledger_near_dup_pairs`` — the anti-join's
    matched side is pinned as broadcast only under the doors' explicit
    ``True`` assertion; batch callers keep the planner's choice."""
    matched = ledger_near_dup_pairs(
        spark,
        documents,
        path,
        threshold,
        before_release=before_release,
        exclude_release=exclude_release,
        bounded_batch=bounded_batch,
    ).select("doc_id")
    # matched ⊆ the probe batch — broadcast the anti-join's right side
    # only when the caller ASSERTS the trigger-bounded contract (r13;
    # probing matched's size here would run the whole probe twice)
    if bounded_batch:
        matched = F.broadcast(matched)
    return documents.join(matched, "doc_id", "left_anti")


def delete_from_ledger(spark, path: str, doc_ids: list[int]) -> None:
    """Takedown on the admission side: remove the given documents'
    sketches from the ledger so retracted content stops GATING — a
    future near-duplicate of a deleted document is admissible again
    (right-to-be-forgotten means the corpus must be able to re-learn
    the content from a legitimate source; pair with the word index's
    ``delete_documents`` to stop SERVING it).

    Cost ∝ touched releases: one narrow scan of ``sigs/`` finds which
    release partitions hold the documents (16 longs per doc — the
    relation is ~200 bytes/doc), then only those partitions rewrite
    (dynamic partition overwrite; a release left empty has its
    directories deleted outright — dynamic overwrite never replaces a
    partition it produced no rows for). Bands are recomputed from the
    REWRITTEN signatures, so sigs and bands cannot drift.

    Crash direction, stated exactly: sigs rewrite first, bands second —
    every intermediate state gates LESS than before (a bands row whose
    sig was deleted produces a candidate that fails the verify join; a
    deleted bands row produces no candidate), which is the desired
    direction for a takedown; a replay converges to the full delete."""
    _require_ledger_kind(spark, path, "minhash", "delete_from_ledger")
    meta = load_ledger_meta(spark, path)

    def reband(rel_sigs: DataFrame, rel: int) -> DataFrame:
        return (
            _band_hashes(rel_sigs, bands=meta["bands"], k=meta["k"])
            .withColumn("release", F.lit(rel))
            .select("doc_id", "band_hash", "release", "band")
        )

    _delete_from_banded_ledger(spark, path, doc_ids, "sigs", "doc_id", reband)


def _delete_from_banded_ledger(
    spark, path: str, ids_in, data_dir: str, id_col: str, reband
) -> None:
    """Shared takedown machinery for the banded ledgers (MinHash
    ``sigs/``, embedding ``vecs/``): rewrite only the release
    partitions holding the ids (emptied releases' directories deleted
    outright — dynamic overwrite never replaces a partition it
    produced no rows for), then recompute those partitions' bands from
    the REWRITTEN data via ``reband(release_rows, release)`` so data
    and bands cannot drift. Data first, bands second — the gates-LESS
    crash direction both public delete functions document."""
    ids = sorted(set(ids_in))
    if not ids:
        return
    from .index import _hadoop_delete, _hadoop_exists

    data_path, bands_path = f"{path}/{data_dir}", f"{path}/bands"
    if not _hadoop_exists(spark, data_path):
        return  # no releases ever banded (e.g. a corrupt-only door)
    data = spark.read.parquet(data_path)
    touched = sorted(
        r["release"]
        for r in data.where(F.col(id_col).isin(ids))
        .select("release")
        .distinct()
        .collect()
    )
    for rel in touched:
        remaining = (
            data.where((F.col("release") == rel) & ~F.col(id_col).isin(ids))
            .localCheckpoint()  # materialize BEFORE overwriting its source
        )
        if not remaining.head(1):
            _hadoop_delete(spark, f"{data_path}/release={rel}")
            _hadoop_delete(spark, f"{bands_path}/release={rel}")
            continue
        (
            remaining.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("release")
            .parquet(data_path)
        )
        banded = reband(
            spark.read.parquet(data_path).where(F.col("release") == rel), rel
        )
        sort_col = next(
            c for c in ("band_hash", "band_bucket", "band_bits")
            if c in banded.columns
        )
        (
            banded.repartition("band")
            .sortWithinPartitions(sort_col)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("release", "band")
            .parquet(bands_path)
        )


def delete_from_survivors(spark, survivors_path: str, doc_ids: list[int]) -> None:
    """Remove retracted documents from a release-partitioned survivors
    table (the admission pipeline's shipped corpus). Rewrites ONLY the
    release partitions that hold the documents; a release left empty
    has its directory deleted (the dynamic-overwrite no-rows gap,
    handled as in ``delete_from_ledger``)."""
    ids = sorted(set(doc_ids))
    if not ids:
        return
    from .index import _hadoop_delete

    surv = spark.read.parquet(survivors_path)
    touched = sorted(
        r["release"]
        for r in surv.where(F.col("doc_id").isin(ids))
        .select("release")
        .distinct()
        .collect()
    )
    for rel in touched:
        remaining = (
            surv.where((F.col("release") == rel) & ~F.col("doc_id").isin(ids))
            .localCheckpoint()
        )
        if not remaining.head(1):
            _hadoop_delete(spark, f"{survivors_path}/release={rel}")
            continue
        (
            remaining.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("release")
            .parquet(survivors_path)
        )


# The release id the ledger's major compaction folds history into.
# Negative BY CONTRACT: streaming batch ids (and the batch pipeline's
# release ids) are >= 0, so a folded partition can never collide with a
# replayable release — ``exclude_release=batch_id`` keeps hiding exactly
# the batch's own rows, and the foreign-id refusal never fires on it.
FOLDED_RELEASE = -1

# Adoption-time snapshot of a ledger's pre-existing (foreign) release
# ids — written by ``streaming/near_dedup.py`` at checkpoint adoption,
# refreshed here when compaction folds a foreign release away (the
# collision it guards against is with that release's PARTITION, which
# no longer exists after the fold).
FOREIGN_RELEASES_MARKER = "_foreign_releases"


def compact_minhash_ledger(spark, path: str, keep_last: int = 1) -> list[int]:
    """Major compaction for the MinHash ledger: fold old releases into
    the single reserved ``release=-1`` partition — the LSM compaction
    the admission pipeline's write side needs, exactly as
    ``compact_ann_index`` is the ANN side's and ``compact_index`` the
    word index's.

    Why it exists: every admitted batch appends one ``sigs/`` release
    partition and ``bands`` band-partition directories under it, and a
    probe unions a scan per directory. The per-batch trade is right
    (O(batch) appends, replay-idempotent by partition overwrite) — and
    it accumulates: a year of hourly batches is ~9k releases and ~9k ×
    bands directories, a file-count tax every probe pays. One
    compaction pays one read+rewrite of the (narrow, ~200 bytes/doc)
    sketch relations to reset probe fan-in to ``keep_last + 1``
    directories per band.

    ``keep_last`` (default 1) keeps the highest non-negative releases
    as their own partitions. The default protects the streaming replay
    contract: only the LATEST batch can be uncommitted in a stream's
    checkpoint, and its replay relies on ``exclude_release=batch_id``
    hiding that release's own rows — folding it would make replayed
    documents match themselves and be refused as duplicates of
    themselves. ``keep_last=0`` folds everything and is safe only for
    a quiesced producer whose last append is known committed. Run with
    writers quiesced (the ``ann-compact`` discipline).

    Crash direction, stated exactly: folded sigs land in ``release=-1``
    FIRST (materialized before the write — the fold may include the
    previous ``-1``), bands second, old release directories are deleted
    last — every intermediate state gates AT LEAST as much as before
    (a doc present in both ``-1`` and its old release yields a
    duplicate candidate row that verifies to the same pair; downstream
    admission anti-joins on doc_id and is unaffected), and a re-run
    converges (the fold set is recomputed from surviving directories
    and the sig relation is deduplicated before the rewrite).

    What a fold gives up: per-release audit granularity below the fold
    line. ``before_release`` prunes only un-folded releases afterwards
    (``-1`` sorts below every real release, so folded history is always
    in scope — the conservative direction for a dedup gate); takedowns
    keep working (``delete_from_ledger`` rewrites ``release=-1`` like
    any other touched partition).

    Returns the folded (non-negative) release ids, ``[]`` on no-op."""
    _require_ledger_kind(spark, path, "minhash", "compact_minhash_ledger")
    meta = load_ledger_meta(spark, path)  # raises on a non-ledger path

    def reband(folded_sigs: DataFrame) -> DataFrame:
        return (
            _band_hashes(folded_sigs, bands=meta["bands"], k=meta["k"])
            .withColumn("release", F.lit(FOLDED_RELEASE))
            .select("doc_id", "band_hash", "release", "band")
        )

    return _compact_banded_ledger(
        spark, path, keep_last, data_dir="sigs", reband=reband
    )


def _compact_banded_ledger(
    spark, path: str, keep_last: int, data_dir: str, reband,
    extra_plain_dirs: tuple[str, ...] = (),
) -> list[int]:
    """Shared fold machinery for the banded ledgers (MinHash ``sigs/``,
    embedding ``vecs/``, phash ``prints/``): fold the non-kept
    releases' data partitions into ``release=-1``, recompute that
    partition's bands via ``reband`` (a folded-data → band-rows
    function), sweep the old release directories, refresh the
    foreign-id sidecar. ``extra_plain_dirs`` names plain (band-less)
    release-partitioned sidecars that fold by the same rule (the phash
    door's ``corrupt/`` content-hash relation); a sidecar can hold
    release ids the main relation lacks (a batch whose only admissions
    were corrupt writes no prints partition), so the kept set is
    computed over the UNION of release ids. The crash ordering (data →
    bands → sidecars → sweep → marker) is the over-gate-then-converge
    contract both public compactors document."""
    import json

    from .index import (
        _hadoop_delete,
        _hadoop_exists,
        _read_small_file,
        _write_small_file,
    )

    if keep_last < 0:
        raise ValueError(f"keep_last must be >= 0, got {keep_last}")
    releases = ledger_releases(spark, path)
    extra_releases = {
        d: _plain_dir_releases(spark, f"{path}/{d}") for d in extra_plain_dirs
    }
    all_real = sorted(
        {r for r in releases if r >= 0}
        | {r for rs in extra_releases.values() for r in rs if r >= 0}
    )
    kept = set(all_real[len(all_real) - keep_last :]) if keep_last else set()
    fold = [r for r in releases if r not in kept]
    folded_real = sorted(r for r in fold if r >= 0)
    extra_folds = {
        d: [r for r in rs if r not in kept]
        for d, rs in extra_releases.items()
    }
    folded_extra_real = sorted(
        {r for rs in extra_folds.values() for r in rs if r >= 0}
    )
    if not folded_real and not folded_extra_real:
        return []
    data_path, bands_path = f"{path}/{data_dir}", f"{path}/bands"
    if folded_real:
        data = spark.read.parquet(data_path)
        folded = (
            data.where(F.col("release").isin(fold))
            .select(*[c for c in data.columns if c != "release"])
            .distinct()  # a crashed fold leaves identical rows in -1 and the source release
            .withColumn("release", F.lit(FOLDED_RELEASE))
            .localCheckpoint()  # materialize BEFORE overwriting a source partition
        )
        (
            folded.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("release")
            .parquet(data_path)
        )
        banded = reband(
            spark.read.parquet(data_path).where(
                F.col("release") == FOLDED_RELEASE
            )
        )
        sort_col = next(
            c for c in ("band_hash", "band_bucket", "band_bits")
            if c in banded.columns
        )
        (
            banded.repartition("band")
            .sortWithinPartitions(sort_col)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("release", "band")
            .parquet(bands_path)
        )
    for d, f_rs in extra_folds.items():
        f_real = sorted(r for r in f_rs if r >= 0)
        if not f_real:
            continue
        dpath = f"{path}/{d}"
        side = spark.read.parquet(dpath)
        side_folded = (
            side.where(F.col("release").isin(f_rs))
            .select(*[c for c in side.columns if c != "release"])
            .distinct()
            .withColumn("release", F.lit(FOLDED_RELEASE))
            .localCheckpoint()
        )
        (
            side_folded.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("release")
            .parquet(dpath)
        )
        for rel in f_real:
            _hadoop_delete(spark, f"{dpath}/release={rel}")
    for rel in folded_real:
        _hadoop_delete(spark, f"{data_path}/release={rel}")
        _hadoop_delete(spark, f"{bands_path}/release={rel}")
    folded_real = sorted(set(folded_real) | set(folded_extra_real))
    marker = f"{path}/{FOREIGN_RELEASES_MARKER}"
    if _hadoop_exists(spark, marker):
        foreign = set(json.loads(_read_small_file(spark, marker).decode("ascii")))
        still_foreign = sorted(foreign - set(folded_real))
        # no pre-delete: _write_small_file replaces atomically (tmp →
        # rename), and a crash before it must leave the OLD marker —
        # a missing marker would strip collision protection from the
        # still-unfolded foreign releases
        _write_small_file(
            spark, marker, json.dumps(still_foreign).encode("ascii")
        )
    return folded_real


def _plain_dir_releases(spark, dir_path: str) -> list[int]:
    """Release ids recorded in a plain release-partitioned sidecar
    directory (no bands relation), ascending; [] when absent."""
    from .index import _hadoop_exists, _hadoop_fs, _hadoop_path

    if not _hadoop_exists(spark, dir_path):
        return []
    out = []
    for st in _hadoop_fs(spark, dir_path).listStatus(
        _hadoop_path(spark, dir_path)
    ):
        name = st.getPath().getName()
        if name.startswith("release="):
            out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def ledger_kind(spark, path: str) -> str:
    """``"minhash"``, ``"embedding"`` or ``"phash"`` — sniffed from the
    meta row's own columns (the flavors share the layout discipline but
    not the sketch schema, and folding one with another's parameters
    would corrupt the band relation). Raises when ``path`` is not a
    ledger."""
    meta_path = _ledger_meta_path(path)
    from .index import _hadoop_exists

    if not _hadoop_exists(spark, meta_path):
        raise ValueError(f"{path} is not a ledger: no meta/ parameter row")
    cols = set(spark.read.parquet(meta_path).columns)
    if "shingle_n" in cols:
        return "minhash"
    if "planes_per_band" in cols:
        return "embedding"
    if "grid" in cols:
        return "phash"
    raise ValueError(
        f"{path}/meta has columns {sorted(cols)} — not the MinHash "
        "(k, bands, shingle_n), embedding (planes_per_band, bands, dim) "
        "or perceptual-hash (grid, max_hamming) parameter row"
    )


# Wrong-flavor refusals name the op that DOES fit the ledger at hand:
# per op family, the flavor-specific spelling for every ledger kind.
_LEDGER_OPS = {
    "compact": {
        "minhash": "compact_minhash_ledger",
        "embedding": "compact_embedding_ledger",
        "phash": "compact_phash_ledger",
    },
    "delete": {
        "minhash": "delete_from_ledger",
        "embedding": "delete_from_embedding_ledger",
        "phash": "delete_from_phash_ledger",
    },
}
_LEDGER_OP_FAMILY = {
    op: family for family, m in _LEDGER_OPS.items() for op in m.values()
}


def _require_ledger_kind(spark, path: str, want: str, op: str) -> None:
    kind = ledger_kind(spark, path)
    if kind != want:
        family = _LEDGER_OP_FAMILY.get(op)
        other = _LEDGER_OPS.get(family, {}).get(
            kind, f"the {kind}-flavor op"
        )
        raise ValueError(
            f"{op}: {path} is an {kind} ledger — use {other} (operating "
            "with the wrong sketch parameters would corrupt the band "
            "relation)."
        )


def ledger_info(spark, path: str, count_docs: bool = True) -> dict:
    """Operational snapshot of a ledger (any flavor): sketch
    parameters, release ids (``-1`` = the folded-history partition),
    doc count, and the band-directory fan-out a probe pays — the
    number compaction resets. ``count_docs=False`` skips the data-dir
    scan (``n_docs`` reads 0) for callers that derive counts from
    their own pass over the same relation (``front_door_report``
    aggregates per release and sums — one scan instead of two)."""
    kind = ledger_kind(spark, path)
    if kind == "minhash":
        meta = load_ledger_meta(spark, path)
        data_dir = "sigs"
    elif kind == "embedding":
        meta = load_embedding_ledger_meta(spark, path)
        data_dir = "vecs"
    else:
        meta = load_phash_ledger_meta(spark, path)
        data_dir = "prints"
    releases = ledger_releases(spark, path)
    n_docs = 0
    band_dirs = 0
    if releases:
        if count_docs:
            n_docs = spark.read.parquet(f"{path}/{data_dir}").count()
        from .index import _hadoop_fs, _hadoop_path

        bands = f"{path}/bands"
        fs = _hadoop_fs(spark, bands)
        for st in fs.listStatus(_hadoop_path(spark, bands)):
            if st.getPath().getName().startswith("release="):
                band_dirs += sum(
                    1
                    for b in fs.listStatus(st.getPath())
                    if b.getPath().getName().startswith("band=")
                )
    return {
        "kind": kind,
        **meta,
        "releases": releases,
        "n_docs": n_docs,
        "band_dirs": band_dirs,
    }


# --------------------------------------- cross-release EMBEDDING ledger
#
# The third admission strength: ``dedup_against_reference`` gates on
# exact content hashes, the MinHash ledger on lexical near-duplicates —
# this one gates on SEMANTIC near-duplicates (embedding cosine), so a
# paraphrase of admitted content is refused even when it shares no
# shingles. Same persisted discipline as the MinHash ledger, at
# embedding strength:
#
# - ``meta/`` — (planes_per_band, bands, dim): the sign-sketch geometry
#   every append and probe replays (the ledger's identity);
# - ``vecs/`` — (vec_id, embedding, norm) partitioned by ``release``;
# - ``bands/`` — (vec_id, band, band_bucket) partitioned by
#   (``release``, ``band``).
#
# The hyperplanes are pure hash functions of (plane, dimension)
# (similarity._plane_matrix) — corpus-INDEPENDENT, like the MinHash
# hash family — so a ledger probe is bit-identical in sketch space to a
# from-scratch joint sketch: sketch ONLY the batch, equi-join the
# persisted narrow band relation, exact-cosine-verify the candidates.
# Release-partition dynamic overwrite keeps appends replay-idempotent;
# ``compact_embedding_ledger`` folds history into ``release=-1``.


def init_embedding_ledger(
    spark,
    path: str,
    dim: int,
    planes_per_band: int = 8,
    bands: int = 8,
) -> None:
    """Write the embedding ledger's parameter row. The r=8, b=8 default
    is the production-threshold banding (recall 1-(1-p^r)^b at τ ≥ 0.8;
    the fixture-scale r=4 default of ``pairwise_near_dup`` is NOT a
    ledger default — a persisted under-banded geometry would bake the
    candidate explosion in for every later batch)."""
    if planes_per_band < 1 or bands < 1:
        raise ValueError(
            f"planes_per_band={planes_per_band} and bands={bands} must be >= 1"
        )
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    (
        spark.createDataFrame(
            [(planes_per_band, bands, dim)],
            "planes_per_band int, bands int, dim int",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(_ledger_meta_path(path))
    )


def load_embedding_ledger_meta(spark, path: str) -> dict:
    row = (
        spark.read.schema("planes_per_band int, bands int, dim int")
        .parquet(_ledger_meta_path(path))
        .first()
    )
    return row.asDict()


def _emb_check_dim(embeddings: DataFrame, dim: int, where: str) -> None:
    # min AND max in one aggregate: a first-row-only check would let a
    # mixed-dimension batch through, and the mismatched rows would then
    # silently never match (zip_with pads with null -> null score ->
    # filtered out) — under-gating where the contract demands an error.
    got = embeddings.select(
        F.min(F.size("embedding")).alias("lo"),
        F.max(F.size("embedding")).alias("hi"),
    ).first()
    if got is None or got["lo"] is None:
        return
    if got["lo"] != dim or got["hi"] != dim:
        batch = (
            f"dim {got['lo']}"
            if got["lo"] == got["hi"]
            else f"mixed dims {got['lo']}..{got['hi']}"
        )
        raise ValueError(
            f"{where}: batch embeddings have {batch} but the "
            f"ledger was built for dim {dim} — sketches over different "
            "dimensionalities are incomparable."
        )


def build_embedding_ledger(
    embeddings: DataFrame,
    path: str,
    planes_per_band: int = 8,
    bands: int = 8,
    release: int = 0,
) -> None:
    """Create the embedding ledger at ``path`` from the first release
    (``(vec_id, embedding)`` rows)."""
    spark = embeddings.sparkSession
    dim_row = embeddings.select(F.size("embedding").alias("d")).first()
    if dim_row is None:
        raise ValueError(
            "build_embedding_ledger: empty first release — use "
            "init_embedding_ledger(dim=...) and append later releases"
        )
    init_embedding_ledger(
        spark, path, dim_row["d"], planes_per_band=planes_per_band, bands=bands
    )
    append_embedding_ledger(embeddings, path, release=release)


def append_embedding_ledger(
    embeddings: DataFrame, path: str, release: int
) -> None:
    """Record a release: sketch with the stored geometry, write its
    ``vecs/`` and ``bands/`` partitions (dynamic partition overwrite —
    replay-idempotent, the release id in the path IS the watermark)."""
    from ..functions.vectors import l2_norm
    from .similarity import _sign_sketch_bands

    spark = embeddings.sparkSession
    meta = load_embedding_ledger_meta(spark, path)
    _emb_check_dim(embeddings, meta["dim"], "append_embedding_ledger")
    if not embeddings.head(1):
        return  # empty release = no-op (see append_phash_ledger)
    base = embeddings.select(
        "vec_id",
        F.col("embedding").cast("array<float>").alias("embedding"),
        l2_norm(F.col("embedding")).alias("norm"),
    )
    (
        base.withColumn("release", F.lit(release))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("release")
        .parquet(f"{path}/vecs")
    )
    banded = _sign_sketch_bands(
        spark.read.parquet(f"{path}/vecs")
        .where(F.col("release") == release)
        .select("vec_id", "embedding"),
        "embedding",
        planes_per_band=meta["planes_per_band"],
        bands=meta["bands"],
    ).select(
        "vec_id",
        "band",
        "band_bucket",
        F.lit(release).alias("release"),
    )
    (
        banded.repartition("band")
        .sortWithinPartitions("band_bucket")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("release", "band")
        .parquet(f"{path}/bands")
    )


def ledger_embedding_pairs(
    spark,
    embeddings: DataFrame,
    path: str,
    threshold: float = 0.8,
    before_release: int | None = None,
    exclude_release: int | None = None,
    scale_guard: str = "raise",
    bounded_batch: bool | None = None,
) -> DataFrame:
    """Probe the ledger with a NEW batch: ``(vec_id, ledger_vec,
    score)`` for every batch vector whose cosine against a prior-
    release vector clears ``threshold``. Sketch ONLY the batch;
    candidates meet on the persisted narrow (band, band_bucket)
    relation; each candidate pair fetches/verifies exactly once.
    ``before_release``/``exclude_release``: the MinHash ledger's
    audit/replay contracts, verbatim.

    ``scale_guard``: the banding is frozen in the ledger, so the
    random-collision estimate bands·|batch|·|ledger|/2^r either fits
    the budget or the remedy is a rebuild at higher r — ``"raise"``
    (default) refuses with that remedy, ``"off"`` proceeds.

    ``bounded_batch``: see ``ledger_near_dup_pairs``. ``None`` reuses
    the scale guard's exact batch count when available (no extra job),
    else one bounded count over the batch ids."""
    from ..functions.vectors import dot, l2_norm
    from .similarity import LSH_CANDIDATE_BUDGET, _sign_sketch_bands

    meta = load_embedding_ledger_meta(spark, path)
    _emb_check_dim(embeddings, meta["dim"], "ledger_embedding_pairs")
    r, b = meta["planes_per_band"], meta["bands"]

    def _rel_filter(df):
        if before_release is not None:
            df = df.where(F.col("release") < F.lit(before_release))
        if exclude_release is not None:
            df = df.where(F.col("release") != F.lit(exclude_release))
        return df

    ledger_vecs = _rel_filter(spark.read.parquet(f"{path}/vecs"))
    if scale_guard not in ("raise", "off"):
        raise ValueError(f"scale_guard must be 'raise' or 'off', got {scale_guard!r}")
    if scale_guard == "raise":
        # both counts in ONE action (r12): union of the two 1-row
        # aggregates — the admission doors pay this guard every batch
        counts = (
            embeddings.agg(F.count(F.lit(1)).alias("n"))
            .unionByName(ledger_vecs.agg(F.count(F.lit(1)).alias("n")))
            .collect()
        )
        n_batch, n_ledger = counts[0]["n"], counts[1]["n"]
        if bounded_batch is None:
            # the guard already counted the batch exactly — reuse it
            bounded_batch = n_batch <= LEDGER_BROADCAST_MAX_ROWS
        est = b * n_batch * n_ledger / (2 ** r)
        if est > LSH_CANDIDATE_BUDGET:
            raise ValueError(
                f"ledger_embedding_pairs: estimated candidate volume "
                f"{est:.1e} (bands={b}, r={r}, batch={n_batch}, "
                f"ledger={n_ledger}) exceeds the {LSH_CANDIDATE_BUDGET:.0e} "
                "budget — rebuild the ledger with more planes_per_band "
                "(each +1 halves random collisions), or pass "
                "scale_guard='off' if this volume is intended."
            )
    if bounded_batch is None:
        # scale_guard='off' skipped the exact count — one bounded job
        bounded_batch = _batch_is_bounded(embeddings.select("vec_id"))
    _hint = F.broadcast if bounded_batch else (lambda df: df)
    # r12: the sketch is a pure projection against plan-literal
    # hyperplanes — no checkpoint needed once it has a single consumer
    # (bvecs now derives straight from the batch relation instead of
    # distinct-ing the b-way band explode back down). A BOUNDED probe
    # batch broadcasts as the build side of every join; the ledger's
    # narrow bands relation streams through a BroadcastHashJoin
    # instead of paying a full exchange per probe (r13: guarded by
    # ``bounded_batch`` above).
    batch = _sign_sketch_bands(
        embeddings.select(
            "vec_id",
            F.col("embedding").cast("array<float>").alias("embedding"),
        ),
        "embedding",
        planes_per_band=r,
        bands=b,
    )
    ledger_bands = _rel_filter(spark.read.parquet(f"{path}/bands")).select(
        F.col("vec_id").alias("ledger_vec"), "band", "band_bucket"
    )
    cands = (
        _hint(batch.select("vec_id", "band", "band_bucket"))
        .join(ledger_bands, ["band", "band_bucket"])
        .select("vec_id", "ledger_vec")
        .distinct()
    )
    bvecs = (
        embeddings.select(
            "vec_id",
            F.col("embedding").cast("array<float>").alias("embedding"),
        )
        .distinct()
        .withColumn("b_norm", l2_norm(F.col("embedding")))
        .select("vec_id", F.col("embedding").alias("b_emb"), "b_norm")
    )
    lvecs = ledger_vecs.select(
        F.col("vec_id").alias("ledger_vec"),
        F.col("embedding").alias("l_emb"),
        F.col("norm").alias("l_norm"),
    )
    score = F.try_divide(
        dot(F.col("b_emb"), F.col("l_emb")), F.col("b_norm") * F.col("l_norm")
    )
    # threshold the RAW score, round only in the output — the order
    # pairwise_near_dup and the DuckDB twin both use; rounding first
    # would admit pairs in the [threshold - 5e-7, threshold) window
    # and break the probe ≡ joint-sketch contract
    return (
        cands.join(_hint(bvecs), "vec_id")
        .join(lvecs, "ledger_vec")
        .select("vec_id", "ledger_vec", score.alias("raw_score"))
        .where(F.col("raw_score") >= threshold)
        .select(
            "vec_id",
            "ledger_vec",
            F.round("raw_score", 6).alias("score"),
        )
    )


def near_dedup_against_embedding_ledger(
    spark,
    embeddings: DataFrame,
    path: str,
    threshold: float = 0.8,
    before_release: int | None = None,
    exclude_release: int | None = None,
    scale_guard: str = "raise",
    bounded_batch: bool | None = None,
) -> DataFrame:
    """Rows of ``embeddings`` that are NOT a semantic near-duplicate of
    anything already in the ledger, all columns intact. Ship the
    survivors, then ``append_embedding_ledger`` them as the next
    release. ``bounded_batch``: see ``near_dedup_against_ledger``."""
    matched = ledger_embedding_pairs(
        spark,
        embeddings,
        path,
        threshold,
        before_release=before_release,
        exclude_release=exclude_release,
        scale_guard=scale_guard,
        bounded_batch=bounded_batch,
    ).select("vec_id")
    # matched ⊆ the probe batch — broadcast only under the doors'
    # explicit trigger-bounded assertion (r13; see near_dedup_against_
    # ledger)
    if bounded_batch:
        matched = F.broadcast(matched)
    return embeddings.join(matched, "vec_id", "left_anti")


def delete_from_embedding_ledger(spark, path: str, vec_ids: list[int]) -> None:
    """Takedown: remove vectors from the embedding ledger so retracted
    content stops gating semantically. Cost ∝ touched releases; vecs
    rewrite first, bands second — every intermediate state gates LESS
    (a bands row without its vector fails the verify join), the safe
    direction for a takedown; replay converges. Shares the rewrite
    machinery with ``delete_from_ledger`` (``_delete_from_banded_ledger``)."""
    from .similarity import _sign_sketch_bands

    _require_ledger_kind(
        spark, path, "embedding", "delete_from_embedding_ledger"
    )
    meta = load_embedding_ledger_meta(spark, path)

    def reband(rel_vecs: DataFrame, rel: int) -> DataFrame:
        return _sign_sketch_bands(
            rel_vecs.select("vec_id", "embedding"),
            "embedding",
            planes_per_band=meta["planes_per_band"],
            bands=meta["bands"],
        ).select(
            "vec_id", "band", "band_bucket", F.lit(rel).alias("release")
        )

    _delete_from_banded_ledger(spark, path, vec_ids, "vecs", "vec_id", reband)


def compact_embedding_ledger(spark, path: str, keep_last: int = 1) -> list[int]:
    """Major compaction for the embedding ledger: fold old releases
    into ``release=-1`` — ``compact_minhash_ledger``'s contract
    verbatim (same keep_last replay protection, same over-gate-then-
    converge crash direction, same foreign-marker refresh)."""
    from .similarity import _sign_sketch_bands

    _require_ledger_kind(spark, path, "embedding", "compact_embedding_ledger")
    meta = load_embedding_ledger_meta(spark, path)

    def reband(folded_vecs: DataFrame) -> DataFrame:
        return _sign_sketch_bands(
            folded_vecs.select("vec_id", "embedding"),
            "embedding",
            planes_per_band=meta["planes_per_band"],
            bands=meta["bands"],
        ).select(
            "vec_id",
            "band",
            "band_bucket",
            F.lit(FOLDED_RELEASE).alias("release"),
        )

    return _compact_banded_ledger(
        spark, path, keep_last, data_dir="vecs", reband=reband
    )


# ------------------------------------ cross-release PERCEPTUAL-HASH ledger
#
# The image-side admission ledger (r10): ``dedup_against_reference``
# gates on exact content hashes, the MinHash ledger on lexical
# near-duplicates, the embedding ledger on semantic ones — this one
# gates IMAGE assets on perceptual near-duplicates (dHash hamming), so
# a recompressed or lightly-edited copy of an already-shipped image is
# refused even though it shares no bytes. Same persisted discipline as
# its siblings, at fingerprint strength:
#
# - ``meta/`` — (grid, max_hamming): grid² fingerprint bits and the
#   band layout (``max_hamming + 1`` pigeonhole bands — the persisted
#   band relation bakes the layout in, so it IS ledger identity);
# - ``prints/`` — (asset_id, phash) partitioned by ``release``;
# - ``bands/`` — (asset_id, band_bits) partitioned by
#   (``release``, ``band``).
#
# The fingerprint is a pure function of pixel content
# (multimodal.dhash64) and the banding a pure function of the
# fingerprint, so a ledger probe is EXACT vs the joint relation — not
# merely sketch-identical: every cross-release pair within
# ``max_hamming`` is found (pigeonhole guarantee), none is missed.
# Probing at a SMALLER max_hamming than stored stays exact (d ≤ probe
# ≤ stored still forces agreement on one stored band); a LARGER one is
# refused (the stored bands cannot certify it).


PHASH_SIGNALS = ("image", "audio", "video")


def init_phash_ledger(
    spark,
    path: str,
    grid: int = 8,
    max_hamming: int = 6,
    signal: str = "image",
) -> None:
    """Write the perceptual-hash ledger's parameter row. ``signal``
    names the modality the fingerprints were computed from (``image``:
    ``multimodal.phash_assets`` dHash; ``audio``: ``multimodal.
    audiohash_assets`` energy-sign hash; ``video``: ``multimodal.
    videohash_assets`` temporal frame-energy hash) — hamming distance between
    fingerprints of DIFFERENT modalities is meaningless, and the
    fingerprint itself is an opaque long that cannot reveal the mixup,
    so the ledger records it and admission refuses a mismatch."""
    if not (1 <= grid <= 8):
        raise ValueError(f"grid must be in [1, 8] (grid² bits ≤ 64), got {grid}")
    if signal not in PHASH_SIGNALS:
        raise ValueError(f"signal must be one of {PHASH_SIGNALS}, got {signal!r}")
    _fp_band_layout(max_hamming, grid * grid)  # validates the layout
    (
        spark.createDataFrame(
            [(grid, max_hamming, signal)],
            "grid int, max_hamming int, signal string",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(_ledger_meta_path(path))
    )


def load_phash_ledger_meta(spark, path: str) -> dict:
    row = (
        spark.read.schema("grid int, max_hamming int, signal string")
        .parquet(_ledger_meta_path(path))
        .first()
    )
    meta = row.asDict()
    if meta["signal"] is None:  # pre-r11 ledgers stored no signal column
        meta["signal"] = "image"
    return meta


def _phash_prints(hashes: DataFrame, where: str) -> DataFrame:
    """Normalize a fingerprint batch to (asset_id, phash): accepts the
    raw relation or ``multimodal.phash_assets`` output, dropping its
    ``ok=false`` rows (an undecodable asset has no perceptual identity
    to gate on — the caller's corrupt-row policy lives upstream)."""
    cols = set(hashes.columns)
    if not {"asset_id", "phash"} <= cols:
        raise ValueError(
            f"{where}: expected (asset_id, phash[, ok]) columns, got "
            f"{sorted(cols)}"
        )
    if "ok" in cols:
        hashes = hashes.where(F.col("ok"))
    return hashes.select("asset_id", F.col("phash").cast("long").alias("phash"))


def build_phash_ledger(
    hashes: DataFrame,
    path: str,
    grid: int = 8,
    max_hamming: int = 6,
    release: int = 0,
    signal: str = "image",
) -> None:
    """Create the perceptual-hash ledger at ``path`` from the first
    release of fingerprints (``multimodal.phash_assets`` output for
    images, ``multimodal.audiohash_assets`` renamed ``ahash``→``phash``
    for audio, or raw (asset_id, phash) rows — ``signal`` records
    which, see ``init_phash_ledger``)."""
    init_phash_ledger(
        hashes.sparkSession,
        path,
        grid=grid,
        max_hamming=max_hamming,
        signal=signal,
    )
    append_phash_ledger(hashes, path, release=release)


def append_phash_ledger(hashes: DataFrame, path: str, release: int) -> None:
    """Record a release: write its ``prints/`` partition and band the
    fingerprints with the stored layout (dynamic partition overwrite —
    replay-idempotent, the release id in the path IS the watermark)."""
    spark = hashes.sparkSession
    meta = load_phash_ledger_meta(spark, path)
    prints = _phash_prints(hashes, "append_phash_ledger")
    if not prints.head(1):
        # an empty release is a no-op, not an empty partition: dynamic
        # overwrite would write nothing, and reading the release back
        # for banding would fail on a schema-less directory when this
        # is the ledger's FIRST append (a door batch whose only
        # admissions were corrupt ok=false rows takes this path)
        return
    (
        prints.withColumn("release", F.lit(release))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("release")
        .parquet(f"{path}/prints")
    )
    banded = _fp_bands(
        spark.read.parquet(f"{path}/prints")
        .where(F.col("release") == release)
        .select("asset_id", "phash"),
        "asset_id",
        "phash",
        meta["max_hamming"],
        meta["grid"] * meta["grid"],
    ).select(
        "asset_id", "band", "band_bits", F.lit(release).alias("release")
    )
    (
        banded.repartition("band")
        .sortWithinPartitions("band_bits")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("release", "band")
        .parquet(f"{path}/bands")
    )


def ledger_phash_pairs(
    spark,
    hashes: DataFrame,
    path: str,
    max_hamming: int | None = None,
    before_release: int | None = None,
    exclude_release: int | None = None,
    bounded_batch: bool | None = None,
) -> DataFrame:
    """Probe the ledger with a NEW batch of fingerprints:
    ``(asset_id, ledger_asset, hamming)`` for every batch asset within
    ``max_hamming`` bits of a prior-release asset. Band ONLY the batch
    (with the ledger's stored layout); candidates meet on the persisted
    narrow (band, band_bits) relation; each candidate pair verifies
    exactly once with the popcount. EXACT, not approximate — the
    pigeonhole property guarantees every in-threshold pair collides on
    at least one stored band. ``before_release``/``exclude_release``:
    the MinHash ledger's audit/replay contracts, verbatim.

    CALLER CONTRACT: the probe batch must be fingerprinted at the
    ledger's stored ``meta['grid']`` (use ``multimodal.phash_for_
    ledger``, which reads it for you, or the streaming
    ``admit_assets_batch``, which fingerprints internally). A phash is
    an opaque long — unlike the MinHash sibling, which re-sketches from
    text with stored parameters, this probe CANNOT detect a batch
    hashed at a different grid, and cross-grid hamming distances are
    meaningless.

    ``bounded_batch``: see ``ledger_near_dup_pairs``."""
    meta = load_phash_ledger_meta(spark, path)
    stored_mh, bits = meta["max_hamming"], meta["grid"] * meta["grid"]
    if max_hamming is None:
        max_hamming = stored_mh
    if max_hamming > stored_mh:
        raise ValueError(
            f"ledger_phash_pairs: max_hamming={max_hamming} exceeds the "
            f"ledger's stored band layout (max_hamming={stored_mh}) — the "
            f"persisted bands can only certify distances ≤ {stored_mh}; "
            "rebuild the ledger with a wider threshold."
        )

    def _rel_filter(df):
        if before_release is not None:
            df = df.where(F.col("release") < F.lit(before_release))
        if exclude_release is not None:
            df = df.where(F.col("release") != F.lit(exclude_release))
        return df

    batch = _fp_bands(
        _phash_prints(hashes, "ledger_phash_pairs"),
        "asset_id",
        "phash",
        stored_mh,
        bits,
    ).localCheckpoint()
    if bounded_batch is None:
        bounded_batch = _batch_is_bounded(batch)
    _hint = F.broadcast if bounded_batch else (lambda df: df)
    ledger_bands = _rel_filter(spark.read.parquet(f"{path}/bands")).select(
        F.col("asset_id").alias("ledger_asset"), "band", "band_bits"
    )
    # r12: a BOUNDED probe batch broadcasts its side of every join so
    # the ledger's narrow relations stream through BroadcastHashJoins
    # instead of paying a full exchange per probe (see
    # ledger_near_dup_pairs; r13: guarded by ``bounded_batch``)
    cands = (
        _hint(batch.select("asset_id", "band", "band_bits"))
        .join(ledger_bands, ["band", "band_bits"])
        .select("asset_id", "ledger_asset")
        .distinct()
    )
    bfp = batch.select("asset_id", "phash").distinct()
    lfp = _rel_filter(spark.read.parquet(f"{path}/prints")).select(
        F.col("asset_id").alias("ledger_asset"),
        F.col("phash").alias("l_phash"),
    )
    return (
        cands.join(_hint(bfp), "asset_id")
        .join(lfp, "ledger_asset")
        .withColumn(
            "hamming", F.bit_count(F.col("phash").bitwiseXOR(F.col("l_phash")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("asset_id", "ledger_asset", "hamming")
    )


def near_dedup_against_phash_ledger(
    spark,
    hashes: DataFrame,
    path: str,
    max_hamming: int | None = None,
    before_release: int | None = None,
    exclude_release: int | None = None,
    bounded_batch: bool | None = None,
) -> DataFrame:
    """Rows of ``hashes`` whose asset is NOT a perceptual near-duplicate
    of anything already in the ledger, all columns intact (``ok=false``
    rows pass — no perceptual identity to gate on). Ship the survivors,
    then ``append_phash_ledger`` them as the next release.
    ``bounded_batch``: see ``near_dedup_against_ledger``."""
    matched = ledger_phash_pairs(
        spark,
        hashes,
        path,
        max_hamming=max_hamming,
        before_release=before_release,
        exclude_release=exclude_release,
        bounded_batch=bounded_batch,
    ).select("asset_id")
    # matched ⊆ the probe batch — broadcast only under the doors'
    # explicit trigger-bounded assertion (r13; see near_dedup_against_
    # ledger)
    if bounded_batch:
        matched = F.broadcast(matched)
    return hashes.join(matched, "asset_id", "left_anti")


def delete_from_phash_ledger(spark, path: str, asset_ids: list[int]) -> None:
    """Takedown: remove assets from the perceptual-hash ledger so
    retracted images stop gating. Cost ∝ touched releases; prints
    rewrite first, bands second — every intermediate state gates LESS
    (the gates-less crash direction every ledger takedown documents);
    replay converges. Shares ``_delete_from_banded_ledger``."""
    _require_ledger_kind(spark, path, "phash", "delete_from_phash_ledger")
    meta = load_phash_ledger_meta(spark, path)

    def reband(rel_prints: DataFrame, rel: int) -> DataFrame:
        return _fp_bands(
            rel_prints.select("asset_id", "phash"),
            "asset_id",
            "phash",
            meta["max_hamming"],
            meta["grid"] * meta["grid"],
        ).select(
            "asset_id", "band", "band_bits", F.lit(rel).alias("release")
        )

    _delete_from_banded_ledger(
        spark, path, asset_ids, "prints", "asset_id", reband
    )
    # retracted corrupt assets stop exact-gating too (the sidecar is
    # part of the same door; swept after the banded relation — the
    # gates-less direction holds for both)
    delete_from_corrupt_sidecar(spark, path, asset_ids)


# --- corrupt-content sidecar (r11 ADVICE): exact-byte gate for assets
# that decode to NO perceptual identity. An ok=false asset is admitted
# (the caller's quarantine/re-fetch policy must see it) but cannot
# enter the banded relation — so without this sidecar the IDENTICAL
# corrupt payload re-landing in every later batch would be re-admitted
# forever. The sidecar records the admitted corrupt payloads' content
# hashes per release (same dynamic-overwrite replay discipline as
# prints/), and the door refuses exact repeats. Deliberately NOT a
# perceptual gate: one flipped byte is a different corrupt payload and
# still admits — the no-perceptual-identity policy stands.
CORRUPT_SIDECAR_DIR = "corrupt"


def corrupt_content_hashes(assets: DataFrame) -> DataFrame:
    """(asset_id, content_hash) for an asset batch — the exact-byte
    identity the corrupt sidecar gates on (xxhash64 of the payload,
    deterministic across executors and replays)."""
    return assets.select(
        "asset_id", F.xxhash64("payload").alias("content_hash")
    )


def refuse_known_corrupt(
    spark, rows: DataFrame, path: str, exclude_release: int | None = None
) -> DataFrame:
    """Rows of ``rows`` (asset_id, content_hash) whose content hash is
    NOT already recorded in the ledger's corrupt sidecar.
    ``exclude_release``: the streaming replay contract — a crashed
    attempt's own append must not self-match (verbatim from the banded
    probes)."""
    side = f"{path}/{CORRUPT_SIDECAR_DIR}"
    from .index import _hadoop_exists

    if not _hadoop_exists(spark, side):
        return rows
    led = spark.read.parquet(side)
    if exclude_release is not None:
        led = led.where(F.col("release") != F.lit(exclude_release))
    return rows.join(
        led.select("content_hash"), "content_hash", "left_anti"
    )


def append_corrupt_hashes(rows: DataFrame, path: str, release: int) -> None:
    """Record a release's admitted corrupt payloads (asset_id,
    content_hash) — dynamic partition overwrite, replay-idempotent like
    every other release append."""
    (
        rows.select("asset_id", "content_hash")
        .withColumn("release", F.lit(release))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("release")
        .parquet(f"{path}/{CORRUPT_SIDECAR_DIR}")
    )


def delete_from_corrupt_sidecar(spark, path: str, asset_ids) -> None:
    """Takedown for the corrupt sidecar: rewrite only the touched
    release partitions (emptied directories deleted outright) — the
    gates-less crash direction of every ledger takedown."""
    ids = sorted(set(asset_ids))
    if not ids:
        return
    from .index import _hadoop_delete, _hadoop_exists

    side = f"{path}/{CORRUPT_SIDECAR_DIR}"
    if not _hadoop_exists(spark, side):
        return
    data = spark.read.parquet(side)
    touched = sorted(
        r["release"]
        for r in data.where(F.col("asset_id").isin(ids))
        .select("release")
        .distinct()
        .collect()
    )
    for rel in touched:
        remaining = (
            data.where(
                (F.col("release") == rel) & ~F.col("asset_id").isin(ids)
            ).localCheckpoint()  # materialize BEFORE overwriting its source
        )
        if not remaining.head(1):
            _hadoop_delete(spark, f"{side}/release={rel}")
            continue
        (
            remaining.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("release")
            .parquet(side)
        )


def compact_phash_ledger(spark, path: str, keep_last: int = 1) -> list[int]:
    """Major compaction: fold old releases into ``release=-1`` —
    ``compact_minhash_ledger``'s contract verbatim (same ``keep_last``
    replay protection, same over-gate-then-converge crash direction,
    same foreign-marker refresh), plus the corrupt-content sidecar
    (which folds by the same rule; it can hold release ids prints/
    lacks when a batch admitted only corrupt assets)."""
    _require_ledger_kind(spark, path, "phash", "compact_phash_ledger")
    meta = load_phash_ledger_meta(spark, path)

    def reband(folded_prints: DataFrame) -> DataFrame:
        return _fp_bands(
            folded_prints.select("asset_id", "phash"),
            "asset_id",
            "phash",
            meta["max_hamming"],
            meta["grid"] * meta["grid"],
        ).select(
            "asset_id",
            "band",
            "band_bits",
            F.lit(FOLDED_RELEASE).alias("release"),
        )

    return _compact_banded_ledger(
        spark,
        path,
        keep_last,
        data_dir="prints",
        reband=reband,
        extra_plain_dirs=(CORRUPT_SIDECAR_DIR,),
    )
