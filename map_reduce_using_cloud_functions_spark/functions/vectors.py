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
    """Cosine similarity; DuckDB twin is ``list_cosine_similarity``."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


COSINE_SQL = "list_cosine_similarity({a}, {b})"
