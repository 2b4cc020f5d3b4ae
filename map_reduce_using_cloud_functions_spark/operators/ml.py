"""One-pass distributed linear-model training (normal equations).

The LLM-pipeline use case: fit a linear/ridge quality model over
per-document features (``text_analysis.text_features`` output, or any
``array<double>`` column) at corpus scale, then score the corpus
map-only. Production corpus filters (CCNet, RefinedWeb, FineWeb-Edu
classifiers) are exactly this shape: featurize → train a small linear
head → threshold.

Spark-first design — NOT iterative gradient descent: for d features the
Gram matrix ``G = Σ xᵢxᵢᵀ`` (d×d) and moment vector ``b = Σ yᵢxᵢ`` are
computed in ONE pass as d²+d ordinary ``sum`` aggregates (pure
whole-stage codegen, partial-agged map-side, a single 1-row shuffle),
the d×d ridge solve ``(G + λI)w = b`` happens on the driver with NumPy
(microseconds for d ≤ 100), and scoring is a map-only dot-product
expression with the weights folded in as plan literals. Total cost at
100 TB: one scan for training, one scan for scoring — no MLlib
iteration, no per-step job barrier, nothing driver-side but a d×d
solve.

Bias/intercept is handled by appending a constant-1 feature inside the
aggregation (callers never pre-pad).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def fit_ridge(
    df: DataFrame,
    features_col: str,
    label_col: str,
    dim: int,
    l2: float = 0.0,
    fit_intercept: bool = True,
) -> list[float]:
    """Closed-form ridge fit → weight list (last entry = intercept when
    ``fit_intercept``). ``dim`` is the feature-array length (static —
    the aggregate column list is part of the plan).

    Rows with null features/label, wrong-length arrays, or null ELEMENTS
    inside the feature array are dropped (a row with one null element
    would otherwise contribute to some Gram sums but not others —
    F.sum skips nulls per-aggregate — silently skewing the solve)."""
    import numpy as np

    x = F.col(features_col)
    y = F.col(label_col).cast("double")
    clean = df.where(
        x.isNotNull()
        & y.isNotNull()
        & (F.size(x) == F.lit(dim))
        & F.forall(x, lambda e: e.isNotNull())
    )
    d = dim + (1 if fit_intercept else 0)

    def feat(i: int) -> Column:
        if i == dim:  # intercept slot
            return F.lit(1.0)
        return F.element_at(x, i + 1).cast("double")

    aggs = []
    for i in range(d):
        for j in range(i, d):  # symmetric: upper triangle only
            aggs.append(F.sum(feat(i) * feat(j)).alias(f"g_{i}_{j}"))
    for i in range(d):
        aggs.append(F.sum(feat(i) * y).alias(f"b_{i}"))
    aggs.append(F.count(F.lit(1)).alias("n"))
    row = clean.agg(*aggs).collect()[0]
    if row["n"] == 0:
        raise ValueError("fit_ridge: no valid rows after cleaning")

    G = np.zeros((d, d))
    for i in range(d):
        for j in range(i, d):
            G[i, j] = G[j, i] = row[f"g_{i}_{j}"]
    b = np.array([row[f"b_{i}"] for i in range(d)])
    reg = l2 * np.eye(d)
    if fit_intercept:
        reg[d - 1, d - 1] = 0.0  # never penalize the intercept
    w = np.linalg.solve(G + reg, b)
    return [float(v) for v in w]


def predict_col(features_col: str, weights: list[float], fit_intercept: bool = True) -> Column:
    """Map-only scoring expression: dot(features, w) (+ intercept).
    Weights are plan literals — no join, no broadcast, no UDF.

    ``try_element_at``, not ``element_at``: this runs over the RAW
    corpus (the fit cleans its own rows, scoring can't), and under the
    session's default ANSI mode one short feature array would otherwise
    throw INVALID_ARRAY_INDEX_IN_ELEMENT_AT and kill the whole scan.
    A short/malformed row scores NULL instead — filterable, never fatal."""
    x = F.col(features_col)
    n_feat = len(weights) - (1 if fit_intercept else 0)
    acc = F.lit(weights[-1]) if fit_intercept else F.lit(0.0)
    for i in range(n_feat):
        acc = acc + F.lit(weights[i]) * F.try_element_at(x, F.lit(i + 1)).cast("double")
    return acc


def score_documents(
    df: DataFrame, features_col: str, weights: list[float], out_col: str = "model_score"
) -> DataFrame:
    """Attach the linear score as a column — one map-only projection."""
    return df.withColumn(out_col, predict_col(features_col, weights))
