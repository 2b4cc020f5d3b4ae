"""Composed training-data pipelines — the operators of this engine
chained the way a production corpus-preparation job chains them
(quality-filter → exact-dedup → language-tag → token accounting).

Each stage is one of the already-verified operators; the composition
itself is the product: one declarative plan, so Catalyst fuses the
shared token scan and the whole pipeline runs without materializing
intermediates. At 100 TB this is the difference between one pass over
the corpus and four.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .dedup import exact_dedup
from .text_analysis import text_features, unigram_logprob


def prepare_training_corpus(
    documents: DataFrame,
    min_quality: float = 0.5,
    min_avg_logprob: float | None = None,
) -> DataFrame:
    """Filter + dedup + tag: the canonical pre-training data prep.

    1. exact dedup on content hash (min doc_id survives)
    2. quality gate (composite score ≥ min_quality)
    3. language tag (stopword-hit heuristic)
    4. per-doc token accounting for downstream budgeting

    Returns (doc_id, lang_guess, quality, n_tokens, n_distinct).

    Plan shape: exact_dedup's two narrow shuffles of (hash, id) rows,
    then ONE map-only featurization pass (``text_features`` — array
    expressions, value-identical to the explode+groupBy operators).
    The whole pipeline costs one corpus scan plus the dedup's 16-byte
    key traffic; the earlier formulation joined three separate
    explode+groupBy aggregations (three wide shuffles of the exploded
    token stream) to reach the same numbers.
    """
    survivors = exact_dedup(documents)
    out = (
        text_features(survivors)
        .where(F.col("quality") >= min_quality)
        .select("doc_id", "lang_guess", "quality", "n_tokens", "n_distinct")
    )
    if min_avg_logprob is not None:
        # Optional LM gate (perplexity filter): the unigram model is
        # estimated from the dedup SURVIVORS (duplicates would bias the
        # token distribution toward whatever was repeated).
        lm = unigram_logprob(survivors).select("doc_id", "avg_logprob")
        out = (
            out.join(lm, "doc_id")
            .where(F.col("avg_logprob") >= min_avg_logprob)
            .drop("avg_logprob")
        )
    return out


def quality_model_pipeline(
    documents: DataFrame,
    labeled_ids: DataFrame | None = None,
    l2: float = 1e-3,
    threshold: float | None = None,
) -> tuple[DataFrame, list[float]]:
    """FineWeb-Edu-style learned quality filter, end to end:

    1. featurize every document — ONE map-only pass (``text_features``)
       joined with the repetition signals (one gram-level shuffle);
    2. train a ridge head on the labeled subset (``labeled_ids``:
       (doc_id, label double) — e.g. LLM-judged educational-value
       scores for a few thousand docs; defaults to supervising on the
       heuristic composite so the pipeline is runnable stand-alone);
    3. score the WHOLE corpus map-only with the learned weights
       (plan literals — no join against a model table);
    4. optionally gate at ``threshold``.

    Returns (scored corpus, weights). Cost at 100 TB: the featurize
    scan (+ repetition's one gram shuffle), ONE normal-equation
    aggregation over the labeled rows, one map-only scoring pass. No
    MLlib iteration, no per-epoch corpus scans — the shape that makes
    a learned filter as cheap as a heuristic one.
    """
    from .ml import fit_ridge, predict_col
    from .text_analysis import repetition_flags

    FEATS = [
        "n_tokens",
        "n_distinct",
        "avg_token_len",
        "stopword_ratio",
        "digit_ratio",
        "dup_line_frac",
        "dup_line_char_frac",
        "top_gram_char_frac",
        "dup_gram_char_frac",
    ]
    feats = text_features(documents).join(
        repetition_flags(documents).drop("top_gram", "n_lines"), "doc_id"
    )
    vec = F.array(*[F.col(c).cast("double") for c in FEATS]).alias("_x")
    featurized = feats.select("doc_id", "quality", vec)
    if labeled_ids is None:
        train = featurized.select(
            "doc_id", "_x", F.col("quality").alias("label")
        )
    else:
        train = featurized.join(labeled_ids, "doc_id").select(
            "doc_id", "_x", F.col("label").cast("double").alias("label")
        )
    w = fit_ridge(train, "_x", "label", dim=len(FEATS), l2=l2)
    scored = featurized.select(
        "doc_id",
        F.round(predict_col("_x", w), 6).alias("model_score"),
    )
    if threshold is not None:
        scored = scored.where(F.col("model_score") >= threshold)
    return scored, w
