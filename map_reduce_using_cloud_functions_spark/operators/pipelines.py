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
