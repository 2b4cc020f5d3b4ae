"""Sketch-based corpus statistics: distinct-count estimation in one
map-side-combinable pass.

Why a sketch when ``count(DISTINCT x)`` exists: exact distinct on a
high-cardinality column (the corpus vocabulary, user/customer keys,
URL hosts) shuffles every distinct value — at 100 TB the distinct set
itself is the data. The estimator here keeps **k rows of state per
group** (one minimum per hash bucket), so the whole computation is a
``groupBy().agg(min(...))``: partial-aggregated map-side, merged with
a k-row shuffle, no sort, no window, no collected array. That plan
shape survives any corpus size; its error is the estimator's
~1/sqrt(k), chosen by the caller.

Method — stochastic-averaging minimum-value estimation (the KMV /
MinCount family: Bar-Yossef et al. 2002 "Counting distinct elements in
a data stream"; Lumbroso 2010 "An optimal cardinality estimation
algorithm based on order statistics"; the bucketing discipline is
Flajolet–Martin's stochastic averaging, reused by HyperLogLog):

- hash each value with the engine-portable 60-bit ``hex64`` (the same
  md5-derived hash the MinHash/SimHash family surfaces — statistically
  uniform, reproducible bit-for-bit in the DuckDB oracle);
- route the hash to ``bucket = h mod k`` and keep the bucket MINIMUM —
  the minimum of a multiset equals the minimum of its support, so
  duplicates need no dedup pass at all;
- a bucket that saw ``n_i`` distinct values has its minimum distributed
  like the min of ``n_i`` uniforms on [0, 2^60): E[min] ≈ 2^60/(n_i+1).
  Summing the k minima and inverting gives the MinCount estimator
    est = k·(k−1)·2^60 / Σ min_i                      (all buckets hit)
  with relative error ≈ 1/sqrt(k);
- when buckets are empty the count is small and occupancy itself is the
  better signal — linear counting (Whang et al. 1990):
    est = k·ln(k / empty).

Determinism across engines (the oracle contract): the bucket minima and
their sum are INTEGER arithmetic (the sum in decimal — exact and
order-independent, so Spark's partial-agg merge order cannot perturb
it); the only floating-point steps are one cast and one division at the
very end, which IEEE 754 rounds identically everywhere. Results are
rounded to 4 decimals, matching the repo's cross-engine float rule.

Parity anchor: the reference's only corpus statistic is the exact
per-word count (``mapper/main.py``/``reducer/main.py``); this module is
part of the mandated training-data-pipeline extension surface
(SURVEY.md §2.b — corpus profiling at scale).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.hashing import HEX64_SQL, hex64
from ..functions.text import tokens_array

TWO_60 = float(1 << 60)


def distinct_sketch(
    df: DataFrame,
    col: str,
    k: int = 256,
    by: list[str] | None = None,
    alias: str = "est_distinct",
) -> DataFrame:
    """Estimated number of distinct ``col`` values, optionally per
    ``by`` group. One row per group (one row total when ``by`` is
    empty) with the ``by`` columns and ``alias`` (double, 4 decimals).

    ``k`` buckets ⇒ ~1/sqrt(k) relative error and exactly ``k`` rows of
    aggregation state per group. Non-string columns are hashed through
    their canonical string form (identical in Spark and DuckDB for
    integral types)."""
    if k < 2:
        raise ValueError(f"k must be >= 2 (got {k}): the estimator "
                         "inverts a sum over k bucket minima")
    by = list(by or [])
    h = hex64(F.col(col).cast("string"))
    minima = (
        df.where(F.col(col).isNotNull())
        .groupBy(*by, (h % F.lit(k)).alias("_bucket"))
        .agg(F.min(h).alias("_mn"))
    )
    occ = F.count(F.lit(1))
    # exact, order-independent integer sum (k·2^60 can exceed int64)
    total = F.sum(F.col("_mn").cast("decimal(38,0)"))
    est = F.when(
        occ < F.lit(k),
        F.lit(float(k)) * F.log(F.lit(float(k)) / (F.lit(k) - occ).cast("double")),
    ).otherwise(
        F.lit(float(k * (k - 1)) * TWO_60) / total.cast("double")
    )
    return minima.groupBy(*by).agg(F.round(est, 4).alias(alias))


def distinct_sketch_sql(
    table: str,
    col_sql: str,
    k: int = 256,
    by: list[str] | None = None,
    alias: str = "est_distinct",
) -> str:
    """The DuckDB twin of ``distinct_sketch`` — same hash, same integer
    sum, same final double division; the oracle gate runs it against
    the Spark plan. ``col_sql`` must already be a VARCHAR expression."""
    by = list(by or [])
    bycols = ", ".join(by)
    by_prefix = f"{bycols}, " if by else ""
    h = HEX64_SQL.format(col=col_sql)
    return f"""
WITH _h AS (
  SELECT {by_prefix}{h} AS h FROM {table} WHERE ({col_sql}) IS NOT NULL
),
_b AS (
  SELECT {by_prefix}h % {k} AS _bucket, min(h) AS mn
  FROM _h GROUP BY {by_prefix}_bucket
)
SELECT {by_prefix}round(
  CASE WHEN count(*) < {k}
       THEN {float(k)} * ln({float(k)} / CAST({k} - count(*) AS DOUBLE))
       ELSE {float(k * (k - 1)) * TWO_60} / CAST(sum(mn) AS DOUBLE)
  END, 4) AS {alias}
FROM _b{(" GROUP BY " + bycols) if by else ""}
"""


def vocab_sketch(
    documents: DataFrame,
    k: int = 256,
    by: list[str] | None = None,
) -> DataFrame:
    """Estimated vocabulary size (distinct tokens) of a corpus,
    optionally per ``by`` group (e.g. per ``lang``) — the profile a
    mixture-planning pass wants without materializing the vocabulary.
    Tokenization is the engine's reference-parity tokenizer, so the
    estimate refers to the same token universe as the word index."""
    by = list(by or [])
    toks = documents.select(
        *by, F.explode(tokens_array(F.col("text"))).alias("word")
    )
    return distinct_sketch(toks, "word", k=k, by=by, alias="est_vocab")


def hash_sample(df: DataFrame, key: str, frac: float) -> DataFrame:
    """Deterministic row sample: keep rows whose portable 60-bit key
    hash falls under ``frac`` of the hash space. Reproducible across
    engines, runs, and partitionings (no RNG, no seed plumbing), and
    composable — the same (key, frac) always selects the same rows, so
    two tables sampled on a shared key stay JOINABLE (the correlated-
    sampling property ``df.sample()`` cannot give). Map-only: the
    filter rides the scan. Use integral or string keys — they have one
    canonical string form in every engine; float keys' formatting is
    engine-dependent and would break cross-engine reproducibility."""
    if not (0.0 < frac <= 1.0):
        raise ValueError(f"frac must be in (0, 1], got {frac}")
    threshold = int(frac * TWO_60)
    return df.where(hex64(F.col(key).cast("string")) < F.lit(threshold))


def sampled_percentiles(
    df: DataFrame,
    col: str,
    key: str,
    frac: float = 0.1,
    by: list[str] | None = None,
    percentiles: tuple[float, ...] = (0.5, 0.9),
) -> DataFrame:
    """Percentiles estimated from a deterministic hash sample — the
    100 TB answer to exact quantiles, whose full-column sort is the
    cost this avoids. The sample is exact-percentiled (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``, the engine-alignment the
    exact row already pins), so the only error is sampling error: by
    DKW, the RANK error of an m-row sample is ≤ sqrt(ln(2/δ)/(2m)) with
    probability 1−δ — the caller buys accuracy with ``frac``.

    ``key`` must identify rows (not values): sampling on the measured
    column itself would weight values by their distinct-ness, not their
    frequency, and bias every quantile.

    Scale discipline for ``frac``: the exact quantile buffers the
    per-group sample, so choose ``frac ≈ m / n`` for a target sample of
    m ≈ 10^5–10^6 rows per group — DKW puts the rank error at ~0.2%
    for m = 10^5, and more sample buys nothing a tighter m wouldn't;
    a fixed fraction of a growing corpus is the anti-pattern."""
    by = list(by or [])
    sample = hash_sample(df, key, frac)
    aggs = [
        # round, not int(): 0.35 * 100 is 34.999... in floats and
        # int() would mislabel the column p34
        F.round(F.expr(f"percentile({col}, {p})"), 4).alias(
            f"p{round(p * 100)}"
        )
        for p in percentiles
    ]
    return sample.groupBy(*by).agg(*aggs)


def sampled_percentiles_sql(
    table: str,
    col_sql: str,
    key_sql: str,
    frac: float = 0.1,
    by: list[str] | None = None,
    percentiles: tuple[float, ...] = (0.5, 0.9),
) -> str:
    """DuckDB twin of ``sampled_percentiles`` — same hash threshold
    (ONE int conversion shared with ``hash_sample``), same exact
    quantile over the identical sampled rows."""
    by = list(by or [])
    threshold = int(frac * TWO_60)
    h = HEX64_SQL.format(col=key_sql)
    cols = ", ".join(
        f"round(quantile_cont({col_sql}, {p}), 4) AS p{round(p * 100)}"
        for p in percentiles
    )
    bycols = ", ".join(by)
    by_prefix = f"{bycols}, " if by else ""
    return (
        f"SELECT {by_prefix}{cols} FROM {table} WHERE {h} < {threshold}"
        + (f" GROUP BY {bycols}" if by else "")
    )
