"""Training-data prep operators beyond dedup (SURVEY.md §2.b X4 family):
token-window chunking, PII redaction, and deterministic corpus mixing.

These are the remaining steps of a production LLM-pretraining pipeline
(after quality filtering + dedup, before tokenization): split documents
into model-context-sized chunks, scrub contact-info PII, and sample each
language/source stratum to hit a target mixture. All three are pure
built-in Column expressions — chunking is a projection + one explode
(zero shuffles), redaction is a projection (zero shuffles), mixing is
one tiny-aggregate broadcast join + a filter — so every one of them
scales to a 100 TB corpus exactly as well as a parquet scan does.

Reference parity note: the reference engine (inverted index over text
files) has no prep surface; these extend the documents-table toolbox the
same way dedup/similarity do (mandated scope: large-scale training-data
pipeline operations). Hash derivations reuse functions/hashing.hex64
(md5-hex15 → int64) so the DuckDB oracle replays results bit-for-bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.hashing import hex64
from ..functions.text import gram_array, tokens_array

# RE2-and-Java-compatible PII patterns (no lookaround, no backrefs —
# the least common denominator of Spark's Java regex and DuckDB's RE2).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# Deterministic-mixing resolution: rates are applied as integer
# thresholds out of 1e6 against a doc-id hash, so a rate is honored to
# ±1e-6 and identically in any engine that replays the hash.
MIX_RESOLUTION = 1_000_000
MIX_SALT = "|mix"

# Default target mixture for sample_corpus_mix: upweight English, split
# the rest evenly — the shape of a real pretraining language schedule.
DEFAULT_MIX_WEIGHTS: dict[str, float] = {
    "en": 0.4,
    "de": 0.15,
    "es": 0.15,
    "fr": 0.15,
    "zh": 0.15,
}


def chunk_documents(
    documents: DataFrame, window: int = 64, stride: int = 48
) -> DataFrame:
    """Token-window chunking: split each document's token stream into
    chunks of ``window`` tokens starting every ``stride`` tokens
    (``window > stride`` ⇒ overlapping context, the usual pretraining
    layout). Returns (doc_id, chunk_id, n_tokens, chunk_hash) — one row
    per chunk, chunk_id dense from 0, chunk_hash the portable hex64 of
    the space-joined chunk text (what a downstream exact-dedup of
    chunks would key on).

    Plan shape: tokenize (projection) → sequence of chunk starts
    (projection) → one explode → slice + hash (projection). NO shuffle,
    no window function, no driver participation: at 100 TB this is a
    map-only pass whose output is ~len/stride rows per doc. The final
    chunk is allowed to be short (the tail of the doc); empty documents
    produce no chunks.
    """
    toks = F.col("toks")
    starts = F.when(
        F.size(toks) > 0,
        F.sequence(F.lit(1), F.size(toks), F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    chunk = F.slice(toks, F.col("start"), window)
    return (
        documents.select("doc_id", tokens_array(F.col("text")).alias("toks"))
        .select("doc_id", "toks", F.explode(starts).alias("start"))
        .select(
            "doc_id",
            ((F.col("start") - 1) / stride).cast("int").alias("chunk_id"),
            F.size(chunk).alias("n_tokens"),
            hex64(F.concat_ws(" ", chunk)).alias("chunk_hash"),
        )
    )


def redact_pii(documents: DataFrame) -> DataFrame:
    """PII scrub: count and redact emails, US-style phone numbers, and
    IPv4 addresses. Returns (doc_id, n_emails, n_phones, n_ips,
    redacted_hash) — counts are per original text (independent per
    pattern), redacted_hash is the portable hash of the text after
    replacing matches with <EMAIL>/<IP>/<PHONE> tags in that order
    (emails first: an email's host part must not be half-eaten by the
    IP pattern first).

    Plan shape: pure projection — regexp_count + a regexp_replace
    chain, all whole-stage codegen, zero shuffles. The patterns are
    RE2-compatible so the DuckDB oracle replays both the counts and the
    redacted bytes exactly.
    """
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), EMAIL_RE, "<EMAIL>"),
            IPV4_RE,
            "<IP>",
        ),
        PHONE_RE,
        "<PHONE>",
    )
    return documents.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(F.col("text"), F.lit(PHONE_RE)).alias("n_phones"),
        F.regexp_count(F.col("text"), F.lit(IPV4_RE)).alias("n_ips"),
        hex64(redacted).alias("redacted_hash"),
    )


def sample_corpus_mix(
    documents: DataFrame,
    weights: dict[str, float] | None = None,
    budget_frac: float = 0.6,
    stratum_col: str = "lang",
) -> DataFrame:
    """Deterministic corpus mixing: sample each stratum (language by
    default) so the kept corpus approaches the target mixture
    ``weights`` at total size ``budget_frac``·N, without replacement
    and without RNG state.

    Per stratum s: rate_s = min(1, w_s·(budget_frac·N) / n_s); a doc is
    kept iff hex64(doc_id ∥ salt) mod 1e6 < floor(rate_s·1e6). A
    stratum smaller than its target keeps everything (rate capped at 1
    — mixing can down-sample only; upweighting is an epochs/repetition
    decision downstream). Unknown strata get weight 0 (dropped).

    Returns the kept (doc_id, stratum, source) relation — the actual
    sample, not just its summary, so correctness checks pin every kept
    row. Determinism: the keep decision is a pure function of doc_id,
    so re-runs, retries, and stragglers agree — the property that makes
    a 1000-executor sampling job idempotent.

    Plan shape: one groupBy on the stratum column (tiny result: one row
    per stratum), broadcast back onto the corpus, filter. The corpus is
    scanned once; the only shuffle moves |strata| rows.
    """
    weights = DEFAULT_MIX_WEIGHTS if weights is None else weights
    strat = F.col(stratum_col)
    counts = (
        documents.groupBy(strat.alias("stratum"))
        .agg(F.count(F.lit(1)).alias("n_s"))
        .crossJoin(
            F.broadcast(documents.agg(F.count(F.lit(1)).alias("n_total")))
        )
    )
    w_expr = F.lit(0.0)
    for lang in sorted(weights, reverse=True):
        w_expr = F.when(F.col("stratum") == lang, F.lit(weights[lang])).otherwise(
            w_expr
        )
    # rate in [0,1] as an integer threshold of MIX_RESOLUTION; the
    # expression tree (w * (budget_frac * N)) / n_s is written
    # identically in the oracle so IEEE doubles agree bit-for-bit.
    rates = counts.select(
        "stratum",
        F.floor(
            F.least(
                (w_expr * (F.lit(budget_frac) * F.col("n_total"))) / F.col("n_s"),
                F.lit(1.0),
            )
            * MIX_RESOLUTION
        ).alias("keep_below"),
    )
    # hex64 is a 60-bit non-negative value, so the modulo is already in
    # [0, MIX_RESOLUTION) — no sign normalization needed.
    keyed = documents.select(
        "doc_id",
        strat.alias("stratum"),
        "source",
        (
            hex64(F.concat(F.col("doc_id").cast("string"), F.lit(MIX_SALT)))
            % MIX_RESOLUTION
        ).alias("slot"),
    )
    return (
        keyed.join(F.broadcast(rates), "stratum")
        .where(F.col("slot") < F.col("keep_below"))
        .select("doc_id", "stratum", "source")
    )


def dedup_chunks(documents: DataFrame, window: int = 64, stride: int = 48) -> DataFrame:
    """Chunk-granularity exact dedup: chunk the corpus
    (``chunk_documents``) and keep ONE copy of every distinct chunk
    text — the (doc_id, chunk_id)-lexicographic-min survivor. Dedup at
    chunk rather than document level catches boilerplate repeated
    ACROSS distinct documents (headers, licenses, templates), the bulk
    of web-corpus duplication that document-level hashing misses.

    Plan: chunking's map-only pass, then ONE partial-agged
    groupBy(chunk_hash) min — shuffle rows are (hash, id-pair, size),
    ~28 bytes, never chunk text, and the chunking pass runs once (every
    output column is derivable from the aggregate: (doc_id, chunk_id)
    is unique, so n_tokens rides the min-struct without affecting the
    tie-break). Returns (doc_id, chunk_id, n_tokens, chunk_hash) for
    surviving chunks."""
    chunks = chunk_documents(documents, window, stride)
    return (
        chunks.groupBy("chunk_hash")
        .agg(F.min(F.struct("doc_id", "chunk_id", "n_tokens")).alias("k"))
        .select(
            F.col("k.doc_id").alias("doc_id"),
            F.col("k.chunk_id").alias("chunk_id"),
            F.col("k.n_tokens").alias("n_tokens"),
            "chunk_hash",
        )
    )


DECONTAM_NGRAM = 8


def bench_gram_set(benchmark: DataFrame, n: int = DECONTAM_NGRAM) -> DataFrame:
    """Distinct ``n``-gram relation of an eval set — the broadcast probe
    side shared by batch ``decontaminate`` and
    ``streaming.prep.streaming_decontaminate``. One distinct shuffle
    (gram-only; the per-doc identity is irrelevant for a set probe)."""
    from .dedup import _shingles

    return _shingles(benchmark, n, distinct=False).select("shingle").distinct()


def decontaminate(
    documents: DataFrame, benchmark: DataFrame, n: int = DECONTAM_NGRAM
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    word ``n``-gram with a held-out evaluation set — the standard
    pre-training hygiene step that keeps eval answers out of the
    training corpus. Both sides run through the engine tokenizer, so
    'same n-gram' means same normalized token window.

    Returns one row per training document: (doc_id, n_hit_grams,
    contaminated) where n_hit_grams counts the DISTINCT n-grams shared
    with the benchmark. Callers keep ``~contaminated`` (or apply a
    threshold for a softer policy).

    Scale shape: the benchmark is tiny relative to a 100 TB corpus
    (eval sets are thousands of docs), so its distinct-gram set is
    BROADCAST — the corpus-side gram stream is probed map-side and
    never shuffles; the only shuffles move (doc_id, gram-hit) rows
    (rare) and the per-doc counts (≤1 row/doc). A benchmark too big to
    broadcast degrades gracefully to a shuffled semi-join on the gram
    key — same semantics, still no n² anything."""
    from .dedup import _shingles

    bench_grams = bench_gram_set(benchmark, n)
    # Probe BEFORE deduplicating: the corpus gram stream meets the
    # broadcast gram set map-side with distinct=False, so the distinct
    # (needed to count each shared gram once) shuffles only HIT rows —
    # never the full corpus gram relation.
    hits = (
        _shingles(documents, n, distinct=False)
        .join(F.broadcast(bench_grams), "shingle")
        .select("doc_id", "shingle")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit_grams"))
    )
    return (
        documents.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hit_grams"), F.lit(0).cast("bigint")).alias(
                "n_hit_grams"
            ),
            (F.coalesce(F.col("n_hit_grams"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


SHUFFLE_SALT = "|shuf"


def deterministic_shuffle(
    documents: DataFrame, key_col: str = "doc_id", salt: str = SHUFFLE_SALT
) -> DataFrame:
    """Global corpus shuffle, deterministically: append ``shuffle_key``
    (portable hash of key∥salt) and range-sort by it — the 'randomize
    document order before packing' step, reproducible across runs,
    retries, and cluster sizes (unlike ``orderBy(rand())``, whose seed
    is per-task). Vary ``salt`` per training run for a fresh permutation.

    Plan: one projection + a range-partitioned sort on the hash — the
    shuffle every global sort costs, but keyed on a 16-byte column and
    perfectly uniform (hash keys ⇒ no range skew). Downstream
    ``pack_sequences(..., key='shuffle_key')``-style consumers read the
    permuted order without any further shuffle."""
    # key_col tie-breaks hash collisions (expected past ~2^30 rows) so
    # the permutation stays well-defined at any corpus size.
    return (
        documents.withColumn(
            "shuffle_key",
            hex64(F.concat(F.col(key_col).cast("string"), F.lit(salt))),
        )
        .orderBy("shuffle_key", key_col)
    )


UPSAMPLE_SALT = "|ups"


def upsample_strata(
    documents: DataFrame,
    repeats: dict[str, float],
    stratum_col: str = "lang",
) -> DataFrame:
    """Epoch-style upsampling: the other half of corpus mixing.
    ``sample_corpus_mix`` can only down-sample toward a target mixture;
    strata that need MORE weight get repeated epochs. ``repeats[s]`` is
    a (possibly fractional) epoch count: 2.4 means every doc of stratum
    s appears twice, plus a deterministic 40% of them a third time.
    Unlisted strata default to 1.0 (kept once).

    Returns (doc_id, stratum, epoch) — epoch numbers each replica
    (0-based) so downstream packing/shuffling can interleave replicas
    instead of emitting byte-identical neighbors.

    Plan shape: pure projection + one explode (``sequence`` of epoch
    ids, filtered by the fractional-part hash threshold) — map-only,
    zero shuffles, and deterministic per (doc_id, epoch): the same
    replica set on every run/retry, like the mixing sampler.
    """
    bad = {s: r for s, r in repeats.items() if float(r) < 0}
    if bad:
        raise ValueError(f"repeats must be >= 0 (epoch counts), got {bad}")
    strat = F.col(stratum_col)
    r_expr = F.lit(1.0)
    for s in sorted(repeats, reverse=True):
        r_expr = F.when(strat == s, F.lit(float(repeats[s]))).otherwise(r_expr)
    n_full = F.floor(r_expr).cast("int")
    frac_below = F.floor((r_expr - n_full) * MIX_RESOLUTION)
    epoch = F.col("epoch")
    slot = hex64(
        F.concat(
            F.col("doc_id").cast("string"),
            F.lit(UPSAMPLE_SALT),
            epoch.cast("string"),
        )
    ) % MIX_RESOLUTION
    return (
        documents.select(
            "doc_id",
            strat.alias("stratum"),
            n_full.alias("n_full"),
            frac_below.alias("frac_below"),
        )
        .select(
            "doc_id",
            "stratum",
            "n_full",
            "frac_below",
            F.explode(F.sequence(F.lit(0), F.col("n_full"))).alias("epoch"),
        )
        .where((epoch < F.col("n_full")) | (slot < F.col("frac_below")))
        .select("doc_id", "stratum", "epoch")
    )


def pack_sequences(
    documents: DataFrame,
    seq_len: int = 2048,
    n_blocks: int = 32,
    order_col: str = "doc_id",
) -> DataFrame:
    """Sequence packing: concatenate the corpus token stream in
    ``order_col`` order (doc_id by default; pass ``shuffle_key`` to
    pack a ``deterministic_shuffle``d corpus) and split it into fixed
    ``seq_len``-token training sequences (the standard pretraining
    'concat-and-chunk' packing). Returns, per non-empty document, its
    place in the packed stream: (doc_id, n_tokens, global_offset,
    first_bin, last_bin) where bin b covers packed tokens
    [b·seq_len, (b+1)·seq_len).

    The global token offset is a prefix sum over a total order — the
    one primitive Spark has no scalable built-in for (a bare
    ``Window.orderBy`` collapses to ONE partition: the whole corpus
    through a single task). This implements the textbook two-phase
    distributed prefix sum instead:

      1. slice the key order into ``n_blocks`` contiguous ranges
         (block = (key − min) // width off broadcast min/max — no
         sampling, so the split is deterministic and oracle-replayable;
         hash keys like ``shuffle_key`` are uniform, so ranges balance);
      2. per-block token totals → driver (``n_blocks`` rows) → running
         prefix per block, joined back as a broadcast;
      3. within-block cumsum via a window PARTITIONed by block (shuffle
         width = n_blocks, each task sees one block);
      global_offset = block_prefix + within_block_cumsum − n_tokens.

    At 100 TB: two scans of the (doc_id, key, n_tokens) projection —
    ~24 bytes/row — one |n_blocks|-row collect, one bounded window.
    Nothing global ever sits in one task. The result is
    block-count-invariant (the prefix telescopes), which the
    partition-invariance test pins. Production note: with extremely
    skewed key spaces, swap step 1's arithmetic blocks for
    ``repartitionByRange`` + a ``localCheckpoint`` (sampled boundaries
    must be frozen before being read twice); the arithmetic split keeps
    this deterministic for the oracle.
    """
    from pyspark.sql import Window

    spark = documents.sparkSession
    # Materialize (doc_id, key, n_tokens) once: the three passes below
    # (min/max key, block totals, final assembly) then read the
    # materialized blocks instead of re-tokenizing the corpus 3×.
    # localCheckpoint (not persist) so the ContextCleaner reclaims the
    # blocks when the caller drops the result.
    key_cols = ["doc_id"] if order_col == "doc_id" else ["doc_id", order_col]
    lens = (
        documents.select(
            *key_cols, F.size(tokens_array(F.col("text"))).alias("n_tokens")
        )
        .where(F.col("n_tokens") > 0)
        .localCheckpoint()
    )
    bounds = lens.agg(
        F.min(order_col).alias("mn"), F.max(order_col).alias("mx")
    ).first()
    if bounds["mx"] is None:
        return spark.createDataFrame(
            [],
            "doc_id bigint, n_tokens int, global_offset bigint, "
            "first_bin bigint, last_bin bigint",
        )
    mn, mx = int(bounds["mn"]), int(bounds["mx"])
    block_size = max(1, (mx - mn + n_blocks) // n_blocks)
    blocked = lens.withColumn(
        "block", ((F.col(order_col) - mn) / block_size).cast("int")
    )
    totals = sorted(
        blocked.groupBy("block").agg(F.sum("n_tokens").alias("t")).collect(),
        key=lambda r: r["block"],
    )
    running = 0
    prefix_rows = []
    for r in totals:
        prefix_rows.append((r["block"], running))
        running += r["t"]
    prefix = spark.createDataFrame(prefix_rows, "block int, block_prefix bigint")
    w = (
        Window.partitionBy("block")
        .orderBy(order_col, "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    off = F.col("block_prefix") + F.sum("n_tokens").over(w) - F.col("n_tokens")
    return (
        blocked.join(F.broadcast(prefix), "block")
        .select(
            "doc_id",
            "n_tokens",
            off.alias("global_offset"),
            # bigint bins: a 100 TB corpus exceeds 2^31 sequences
            F.floor(off / seq_len).alias("first_bin"),
            F.floor((off + F.col("n_tokens") - 1) / seq_len).alias("last_bin"),
        )
    )


SPAN_NGRAM = 8


def duplicate_spans(
    documents: DataFrame, n: int = SPAN_NGRAM, min_count: int = 2
) -> DataFrame:
    """Substring-level duplicate detection: find the maximal token spans
    whose every length-``n`` gram occurs ≥ ``min_count`` times in the
    corpus (counting repeats within one document too). This is the
    span-granularity dedup of Lee et al., "Deduplicating Training Data
    Makes Language Models Better" (exact duplicated substrings, not
    whole near-dup documents) — the operator that catches a license
    header pasted into a million files, or a paragraph repeated inside
    one page, where document- and chunk-level hashing both miss or
    over-cut.

    Returns (doc_id, span_start, span_end, n_grams): token-index spans
    [span_start, span_end) in the engine-tokenized stream, maximal (two
    flagged grams whose windows touch or overlap merge into one span),
    with n_grams the count of flagged grams inside.

    Plan shape, corpus-scale reasoning:
      1. gram stream (doc_id, pos, gram_hash) — tokenize + one
         posexplode, map-only, ~24 B/row;
      2. duplicated-gram set via groupBy(gram_hash) count — ONE shuffle
         with partial aggregation (massive duplication compresses
         map-side); the surviving set holds only grams seen ≥
         min_count times;
      3. flag positions via a LEFT SEMI join of the gram stream against
         that set — on a clean corpus the dup set is small, so AQE
         broadcasts it and the gram stream never shuffles (the same
         shape as ``decontaminate``'s probe); on a filthy corpus it
         degrades to a hash join with AQE skew splitting — never a
         sorted window over a hot gram key;
      4. merge flagged positions into maximal spans: one window
         partitioned by doc_id (running max of span ends → island ids
         → min/max per island). Only FLAGGED rows reach the window.
    """
    return _merged_spans(_flagged_positions(documents, n, min_count), n).select(
        "doc_id", "span_start", "span_end", "n_grams"
    )


def _flagged_positions(documents: DataFrame, n: int, min_count: int) -> DataFrame:
    """(doc_id, pos, gram_hash) for every gram position whose gram
    occurs ≥ min_count times corpus-wide (steps 1–3 of
    ``duplicate_spans``'s plan)."""
    gram = gram_array(F.col("toks"), n)
    grams = (
        documents.select("doc_id", tokens_array(F.col("text")).alias("toks"))
        .select("doc_id", F.posexplode(gram).alias("pos", "g"))
        .select("doc_id", "pos", hex64(F.col("g")).alias("gram_hash"))
    )
    dup_grams = (
        grams.groupBy("gram_hash")
        .agg(F.count(F.lit(1)).alias("mult"))
        .where(F.col("mult") >= min_count)
        .select("gram_hash")
    )
    return grams.join(dup_grams, "gram_hash", "left_semi")


def _merged_spans(flagged: DataFrame, n: int) -> DataFrame:
    """Merge flagged gram positions into maximal spans (step 4):
    (doc_id, span_start, span_end, n_grams, span_hash). span_hash is
    the portable hash of the span's gram-hash sequence in position
    order — equal span text ⇔ equal sequence — so span identity never
    needs a second look at the corpus text."""
    from pyspark.sql import Window

    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + n).over(
        w_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        flagged.withColumn(
            "new_island",
            F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0),
        )
        .withColumn("island", F.sum("new_island").over(w_doc))
        .groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + n).alias("span_end"),
            F.count(F.lit(1)).alias("n_grams"),
            hex64(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "gram_hash"))),
                        lambda s: s["gram_hash"].cast("string"),
                    ),
                    " ",
                )
            ).alias("span_hash"),
        )
    )


def strike_duplicate_spans(
    documents: DataFrame, n: int = SPAN_NGRAM, min_count: int = 2
) -> DataFrame:
    """Apply ``duplicate_spans`` as a cleaning policy: remove every
    duplicated span from the corpus EXCEPT one canonical copy, and
    return the surviving (normalized) text. The canonical copy of a
    span is its (doc_id, span_start)-minimal occurrence; occurrences
    are matched by span identity = hash of the span's gram-hash
    sequence (equal span text ⇔ equal sequence), so the one kept copy
    never needs the corpus re-joined to recover span bytes.

    Returns (doc_id, clean_text, n_tokens, n_tokens_struck) — one row
    per input document; ``clean_text`` is the engine-normalized token
    stream with struck spans removed (single-space joined: span
    positions are token indices, so the rebuilt text is normalized text
    by construction), empty documents and fully-struck documents yield
    ''.

    Caveat (documented semantics, not a bug): two occurrences of the
    same boilerplate that were merged into DIFFERENT maximal spans
    (e.g. one abuts another duplicated region, the other doesn't) get
    different span identities, so both survive as their own canonical
    copies — span-level keep-one is exact only for exact maximal-span
    matches. That is the usual practical policy; whole-doc near-dup
    belongs to ``near_dedup``/``simhash_near_dedup``.

    Plan shape: ``duplicate_spans``'s passes, plus — on the (small)
    span relation only — one groupBy(span_hash) min-struct for the
    canonical choice, one join back, one collect_list per doc, and a
    final doc_id join onto the corpus (cut sets are rare ⇒ AQE
    broadcast). The corpus text itself is scanned twice (gram pass,
    rebuild pass) and shuffled never.
    """
    spans = _merged_spans(_flagged_positions(documents, n, min_count), n)
    canonical = spans.groupBy("span_hash").agg(
        F.min(F.struct("doc_id", "span_start")).alias("keep")
    )
    struck = (
        spans.join(canonical, "span_hash")
        .where(
            ~(
                (F.col("doc_id") == F.col("keep.doc_id"))
                & (F.col("span_start") == F.col("keep.span_start"))
            )
        )
        .select("doc_id", "span_start", "span_end")
    )
    cuts = struck.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("cuts")
    )
    with_cuts = (
        documents.select("doc_id", tokens_array(F.col("text")).alias("toks"))
        .join(cuts, "doc_id", "left")
        .withColumn(
            "cuts",
            F.coalesce(
                F.col("cuts"),
                F.array().cast(
                    "array<struct<span_start:int,span_end:int>>"
                ),
            ),
        )
    )
    kept = F.filter(
        F.col("toks"),
        lambda x, i: ~F.exists(
            F.col("cuts"),
            lambda c: (i >= c["span_start"]) & (i < c["span_end"]),
        ),
    )
    return with_cuts.select(
        "doc_id",
        F.array_join(kept, " ").alias("clean_text"),
        F.size("toks").alias("n_tokens"),
        (F.size("toks") - F.size(kept)).alias("n_tokens_struck"),
    )


def decontaminate_clean(
    documents: DataFrame, benchmark: DataFrame, n: int = DECONTAM_NGRAM
) -> DataFrame:
    """The corpus with contaminated documents REMOVED — the policy most
    pipelines actually apply over ``decontaminate``'s flags. The hit-id
    set is computed directly (gram probe → distinct doc ids) and
    anti-joined — NOT by filtering ``decontaminate``'s output, which
    would pay that function's corpus-wide flags join only to discard
    every clean row. One corpus gram pass + one anti-join; AQE
    broadcasts the (rare) hit set from runtime stats."""
    from .dedup import _shingles

    hits = (
        _shingles(documents, n, distinct=False)
        .join(F.broadcast(bench_gram_set(benchmark, n)), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return documents.join(hits, "doc_id", "left_anti")


SPLIT_SALT = "|split"


def assign_splits(
    documents: DataFrame,
    fractions: dict[str, float] | None = None,
    salt: str = SPLIT_SALT,
) -> DataFrame:
    """Deterministic train/val/test assignment: each document lands in
    exactly one split, decided by where hex64(doc_id ∥ salt) mod 1e6
    falls in the cumulative fraction ladder — disjoint and exhaustive
    by construction, reproducible across runs/retries/engines (the
    same property as ``sample_corpus_mix``), and stable under corpus
    growth: adding documents never moves an existing document's split
    (the decision depends only on its own id — the reason hash
    splitting, not random permutation, is the production standard).

    ``fractions`` must sum to 1 (e.g. {"train": .98, "val": .01,
    "test": .01}). Returns documents + a ``split`` column — map-only,
    zero shuffles; filter on it to materialize a split.
    """
    fractions = (
        {"train": 0.98, "val": 0.01, "test": 0.01}
        if fractions is None
        else fractions
    )
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {fractions}")
    resolution = 1_000_000
    bucket = F.pmod(
        hex64(F.concat(F.col("doc_id").cast("string"), F.lit(salt))),
        F.lit(resolution),
    )
    expr = None
    cum = 0.0
    items = list(fractions.items())
    for name, frac in items[:-1]:
        cum += frac
        cond = bucket < int(round(cum * resolution))
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return documents.withColumn("split", expr)


# Row cap for strip_boilerplate_lines' driver-resolved verified set
# (r13): a verified common-segment relation that collects over this
# bound falls back to the fully lazy distributed plan (tests patch it
# to 0 to drive the fallback on small fixtures).
BOILERPLATE_VERIFIED_CAP = 100_000


def strip_boilerplate_lines(
    documents: DataFrame,
    min_df: int | None = None,
    max_df_frac: float = 0.02,
    sep: str = "\n",
    min_chars: int = 1,
) -> DataFrame:
    """CCNet/RefinedWeb-style CROSS-CORPUS boilerplate removal: drop
    every line (``sep``-delimited segment) whose trimmed form appears
    in at least ``min_df`` distinct documents — the cookie banner /
    nav bar / license line pasted across a crawl, which per-document
    signals (``text_features.dup_line_frac``) and gram-span striking
    (``strike_duplicate_spans``) are the wrong altitude for: the first
    sees only within-doc repeats, the second strikes substrings rather
    than whole structural units.

    Rules, stated exactly: segments are ``split(text, sep)`` with
    positions; a segment is COUNTABLE if its trimmed form has at least
    ``min_chars`` characters (whitespace-only separators never count
    and are never removed — document structure survives); document
    frequency is over DISTINCT documents; a countable segment is
    removed where ``df >= min_df`` (default: ``ceil(max_df_frac ·
    n_docs)``, floored at 2 — resolved INSIDE the plan as a one-row
    count aggregate cross-joined into the threshold predicate, so
    constructing this operator runs no job and the count runs with,
    not before, the strip). Survivors rejoin with ``sep`` in original
    order, so a document with nothing removed round-trips
    byte-identically. Returns (doc_id, text, n_removed) plus any other
    input columns. NULL-text documents drop out of the result (the
    explode yields no segments — same contract in the DuckDB twin,
    fuzz-pinned); filter or coalesce upstream if they must survive.

    Removal is NEVER on hash equality alone: the 60-bit hash nominates
    candidates, then the nominated (hash, trimmed-text) rows — a tiny
    relation — re-count document frequency on the EXACT text, so a
    rare line colliding with a boilerplate line's hash is kept (the
    same collide-then-verify discipline as the LSH dedup family).

    Scale shape: one explode, ONE narrow shuffle for the df count (the
    (segment-hash, doc) relation — 16-byte rows after the distinct),
    an exact re-count over only the hash-nominated candidate segments,
    one equi-join of the segment stream against the verified
    common-segment relation on the portable 60-bit hash (broadcast
    when small, plain hash join otherwise — the corpus-side segment
    text never enters a join key), and one per-doc reassembly shuffle.
    The corpus text shuffles exactly once (the reassembly); everything
    else moves hashes or the tiny candidate set.

    r13 plan collapse: the verified common-segment relation is BOUNDED
    in practice (boilerplate is, by definition, few distinct lines
    repeated widely), so it is resolved with one bounded job up front —
    ``stats.where(df >= min_df).limit(cap + 1).collect()`` — and
    re-enters the strip as a LocalRelation. That removes the duplicated
    df-aggregation subtrees the lazy formulation paid (the one-pass
    plan evaluated ``stats`` under BOTH the clean and colliding
    branches and re-scanned the corpus for the recount even when no
    hash collided — 26 exchanges at r12 close), keeps the marked join
    an auto-broadcast (a LocalRelation has an exact size estimate,
    which the lazy aggregation never did), and skips the collision
    recount subtree entirely when the collected head shows no
    collision (min == max for every common hash — in practice always).
    A verified set over ``BOILERPLATE_VERIFIED_CAP`` falls back to the
    UNCHANGED lazy plan (the 100 TB safety: an adversarial corpus
    could make 'common segments' corpus-scale). Construction therefore
    runs one bounded Spark job (like ``dedup_clusters``); values are
    identical on every path (oracle row + fallback-parity test)."""
    other_cols = [c for c in documents.columns if c not in ("doc_id", "text")]
    import re as _re

    segs = documents.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), _re.escape(sep))).alias("pos", "seg"),
    ).withColumn("t", F.trim(F.col("seg")))
    keyed = segs.withColumn("k", hex64(F.col("t")))
    # threshold as a 1-row relation: explicit min_df stays a literal;
    # the default is ceil(max_df_frac · count(*)) computed in-plan
    if min_df is not None:
        thr = documents.sparkSession.range(1).select(
            F.lit(int(min_df)).cast("bigint").alias("_min_df")
        )
    else:
        thr = documents.agg(
            F.greatest(
                F.lit(2).cast("bigint"),
                F.ceil(F.lit(max_df_frac) * F.count("*")).cast("bigint"),
            ).alias("_min_df")
        )
    countable = keyed.where(F.length("t") >= min_chars)
    # ONE aggregation computes the per-hash df AND the collision
    # detector: min(t)/max(t) partial-aggregate map-side, so the text
    # cost of verification is ~2 strings per (hash × partition) riding
    # the df shuffle that runs anyway — NOT a second corpus pass (a
    # naive per-(k, t, doc) recount re-shuffled every common segment's
    # text and measured 1.8× on the judged row). min == max ⇒ the hash
    # maps to ONE trimmed text ⇒ the hash-level df IS the exact df —
    # removal on the hash is exact with no recount. Only genuinely
    # colliding hashes (min != max — in practice none) pay the exact
    # per-(hash, text) df recount over just their occurrences.
    stats = (
        countable.groupBy("k")
        .agg(
            F.count_distinct("doc_id").alias("df"),
            F.min("t").alias("_lo"),
            F.max("t").alias("_hi"),
        )
        .crossJoin(F.broadcast(thr))
    )
    def _recount(colliding: DataFrame, min_df_pred) -> DataFrame:
        # a colliding hash's summed df can clear min_df even when no
        # single text does — nominate on df, decide on the exact recount
        return (
            countable.join(F.broadcast(colliding), "k", "left_semi")
            .select("k", "t", "doc_id")
            .distinct()
            .groupBy("k", "t")
            .agg(F.count("*").alias("df_exact"))
            .where(min_df_pred)
            .groupBy("k")
            .agg(F.collect_set("t").alias("_vts"))
        )

    spark = documents.sparkSession
    k_type = keyed.schema["k"].dataType
    common_head = (
        stats.where(F.col("df") >= F.col("_min_df"))
        .limit(BOILERPLATE_VERIFIED_CAP + 1)
        .collect()
    )
    if len(common_head) <= BOILERPLATE_VERIFIED_CAP:
        # bounded fast path (docstring §r13): the verified relation is
        # already in the driver — re-enter it as a LocalRelation (exact
        # size estimate ⇒ the marked join auto-broadcasts) and build
        # the collision-recount subplan ONLY for hashes that actually
        # collided (min != max — in practice none, so the corpus is
        # scanned once, not twice)
        from pyspark.sql.types import ArrayType, StringType, StructField, StructType

        vschema = StructType(
            [
                StructField("k", k_type, False),
                StructField("_vts", ArrayType(StringType()), False),
            ]
        )
        verified = spark.createDataFrame(
            [(r["k"], [r["_lo"]]) for r in common_head if r["_lo"] == r["_hi"]],
            vschema,
        )
        colliding_keys = [r["k"] for r in common_head if r["_lo"] != r["_hi"]]
        if colliding_keys:
            colliding = spark.createDataFrame(
                [(k,) for k in colliding_keys],
                StructType([StructField("k", k_type, False)]),
            )
            # every common_head row carries the resolved threshold —
            # reuse it as a literal instead of re-running thr's count
            min_df_val = common_head[0]["_min_df"]
            verified = verified.unionByName(
                _recount(colliding, F.col("df_exact") >= F.lit(min_df_val))
            )
    else:
        # oversized verified set: the UNCHANGED lazy one-pass plan
        clean = stats.where(
            (F.col("df") >= F.col("_min_df")) & (F.col("_lo") == F.col("_hi"))
        ).select("k", F.array(F.col("_lo")).alias("_vts"))
        colliding = stats.where(
            (F.col("df") >= F.col("_min_df")) & (F.col("_lo") != F.col("_hi"))
        ).select("k")
        recounted = (
            countable.join(F.broadcast(colliding), "k", "left_semi")
            .select("k", "t", "doc_id")
            .distinct()
            .groupBy("k", "t")
            .agg(F.count("*").alias("df_exact"))
            .crossJoin(F.broadcast(thr))
            .where(F.col("df_exact") >= F.col("_min_df"))
            .groupBy("k")
            .agg(F.collect_set("t").alias("_vts"))
        )
        verified = clean.unionByName(recounted)
    marked = keyed.join(verified, "k", "left").withColumn(
        "rm",
        (F.length("t") >= min_chars)
        & F.coalesce(F.array_contains(F.col("_vts"), F.col("t")), F.lit(False)),
    )
    rebuilt = (
        marked.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(~F.col("rm"), F.struct("pos", "seg")).otherwise(
                                F.lit(None)
                            )
                        )
                    ),
                    lambda s: s["seg"],
                ),
                sep,
            ).alias("text"),
            F.sum(F.col("rm").cast("bigint")).alias("n_removed"),
        )
    )
    if other_cols:
        rebuilt = rebuilt.join(
            documents.select("doc_id", *other_cols), "doc_id"
        )
    return rebuilt.select("doc_id", "text", "n_removed", *other_cols)
