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
from .text_analysis import language_guess, quality_score, text_stats


def prepare_training_corpus(
    documents: DataFrame, min_quality: float = 0.5
) -> DataFrame:
    """Filter + dedup + tag: the canonical pre-training data prep.

    1. quality gate (composite score ≥ min_quality)
    2. exact dedup on content hash (min doc_id survives)
    3. language tag (stopword-hit heuristic)
    4. per-doc token accounting for downstream budgeting

    Returns (doc_id, lang_guess, quality, n_tokens, n_distinct).
    """
    quality = quality_score(documents)
    stats = text_stats(documents).select("doc_id", "n_tokens", "n_distinct")
    lang = language_guess(documents).select("doc_id", "lang_guess")

    # Same min-doc_id-survives semantics as before, through the shared
    # exact_dedup operator (groupBy-min + semi-join — two narrow
    # shuffles of (hash, id) rows instead of a window's full
    # shuffle-SORT of text-carrying corpus rows).
    deduped = exact_dedup(documents).select("doc_id")

    return (
        deduped.join(quality, "doc_id")
        .where(F.col("quality") >= min_quality)
        .join(lang, "doc_id")
        .join(stats, "doc_id")
        .select("doc_id", "lang_guess", "quality", "n_tokens", "n_distinct")
    )
