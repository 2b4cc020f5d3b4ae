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
from ..functions.text import tokens_array

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
