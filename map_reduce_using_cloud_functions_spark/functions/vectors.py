"""Vector math over ``array<float>`` columns — all built-in expressions.

Embedding similarity (SURVEY.md §2.b X3) needs dot products and cosine
over the ``embeddings.embedding`` column. ``F.zip_with`` +
``F.aggregate`` keep the arithmetic JVM-side (no Python round-trip);
floats are cast to double before accumulating so Spark and the DuckDB
oracle agree to ~1e-15 relative error.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; DuckDB twin is ``list_cosine_similarity``.

    Zero-norm vectors: ``try_divide`` yields NULL instead of the ANSI
    DIVIDE_BY_ZERO abort (plain ``/`` throws under this session's ANSI
    mode — verified live). NULL sorts LAST under desc, and every top-k
    path additionally drops NULL scores (``_rank_topk``), matching the
    vectorized path's NaN drop. NOTE the oracle divergence: DuckDB's
    ``list_cosine_similarity`` returns a *defined* -1.0 for a zero-norm
    operand, so any oracle-compared query must pre-filter zero vectors
    (the judged fixtures contain none; ``pairwise_near_dup`` filters
    explicitly)."""
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


COSINE_SQL = "list_cosine_similarity({a}, {b})"
