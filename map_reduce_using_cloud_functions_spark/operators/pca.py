"""One-pass distributed PCA over embedding columns.

The embedding-side twin of ``ml.fit_ridge``'s normal-equation trick:
everything a PCA needs — mean vector and second-moment (Gram) matrix —
is a SUM, so one Arrow-batched pass computes per-batch partials
(``n``, ``Σx`` (d), ``ΣxxᵀT`` flattened (d²) as ONE row per batch via
BLAS ``X.T @ X``), a tiny posexplode+sum folds the partials
(shuffle ≤ (d + d²) rows per partition — for d=64 that's 4 160 rows
regardless of corpus size), and the d×d eigendecomposition runs on the
driver in microseconds. Projection back onto the top-k components is a
second Arrow matmul pass with the components broadcast.

Why PCA in an LLM data engine: whitening/compressing embeddings before
ANN (a k=16 projection cuts the ``dedup_embedding_pairs`` verify and
every top-k scan's width 4×) and as the spectral diagnostics step of
embedding-quality audits.

No iterative SVD, no MLlib: at 100 TB this is two corpus scans total,
both Arrow/BLAS-batched, with driver state bounded by d².
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def fit_pca(
    embeddings: DataFrame, vec_col: str = "embedding", k: int = 8
) -> dict:
    """One-pass fit → ``{"mean": [d], "components": [k][d],
    "explained_var": [k], "n": int}``.

    Components are rows of the returned matrix, ordered by explained
    variance (descending); each row's sign is fixed so its
    largest-magnitude coordinate is positive (eigenvectors are
    sign-ambiguous — pinning the sign makes results reproducible across
    partitionings and BLAS builds)."""
    import numpy as np

    # Clean-row contract (mirrors fit_ridge): the fit's dimensionality
    # comes from the FIRST non-empty vector, and every summed row must
    # match it — a mixed-dimension corpus would otherwise produce
    # partials of different lengths whose posexplode positions overlap
    # (one batch's Gram entry summing into another's mean entry), with
    # the 1+d+d² consistency assert still passing on the garbage total.
    # Null elements are excluded too (NaN poisons the Gram sums).
    first = embeddings.where(F.size(F.col(vec_col)) > 0).select(
        F.size(F.col(vec_col)).alias("d")
    ).first()
    if first is None:
        raise ValueError("fit_pca: no non-empty vectors")
    dim = int(first["d"])
    v = F.col(vec_col)
    nonempty = embeddings.where(
        (F.size(v) == dim) & F.forall(v, lambda e: e.isNotNull())
    ).select(v.alias("v"))

    def partials(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf["v"]), dtype=np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(X)],
                    "s": [X.sum(axis=0).tolist()],
                    "g": [(X.T @ X).ravel().tolist()],
                }
            )

    part = nonempty.mapInPandas(
        partials, schema="n bigint, s array<double>, g array<double>"
    )
    # fold the partials: posexplode + sum keeps every shuffle row a
    # (pos, value) pair — 1 + d + d² rows per upstream partition (the
    # batch count rides as position 0 so the whole fit stays ONE scan),
    # no driver involvement until the final (1+d+d²)-row collect
    folded = (
        part.select(
            F.posexplode(
                F.concat(
                    F.array(F.col("n").cast("double")), F.col("s"), F.col("g")
                )
            )
        )
        .groupBy("pos")
        .agg(F.sum("col").alias("v"))
        .collect()
    )
    if not folded:
        raise ValueError("fit_pca: no non-empty vectors")
    total = len(folded)  # 1 + d + d²
    d = int((-1 + (1 + 4 * (total - 1)) ** 0.5) / 2)
    assert 1 + d + d * d == total, "inconsistent partial lengths"
    vals = np.zeros(total)
    for r in folded:
        vals[r["pos"]] = r["v"]
    n = int(vals[0])
    s = vals[1 : d + 1]
    G = vals[d + 1 :].reshape(d, d)
    mean = s / n
    cov = G / n - np.outer(mean, mean)
    eigval, eigvec = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigval)[::-1][:k]
    comps = eigvec[:, order].T  # k x d
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {
        "mean": mean.tolist(),
        "components": comps.tolist(),
        "explained_var": eigval[order].tolist(),
        "n": n,
    }


def project_pca(
    embeddings: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Map-only projection onto the fitted components: one Arrow matmul
    per batch ((X−mean) @ Wᵀ), components broadcast. Keeps every input
    column; empty/null/wrong-length vectors project to an empty array."""
    import numpy as np

    sess = embeddings.sparkSession
    bc = sess.sparkContext.broadcast(
        (np.array(model["mean"]), np.array(model["components"]))
    )
    in_cols = embeddings.columns
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in embeddings.schema.fields
    )

    def proj(batches):
        mean, W = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = pdf[vec_col]
            lens = vecs.map(lambda v: 0 if v is None else len(v))
            out = [[] for _ in range(len(pdf))]
            full = lens == len(mean)
            if full.any():
                X = np.array(list(vecs[full]), dtype=np.float64)
                P = (X - mean) @ W.T
                for row_i, p in zip(np.nonzero(full.to_numpy())[0], P):
                    out[row_i] = p.tolist()
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf

    return embeddings.mapInPandas(
        proj, schema=f"{out_fields}, {out_col} array<double>"
    )
