"""Bloom-filter membership prefilters built from DataFrame primitives.

Spark's own ``BloomFilterAggregate`` exists only as an internal
expression (used by runtime row-level filtering; not in the public
function registry), so this module builds the same structure out of
plain relational ops — which also makes the build distributed and the
probe whole-stage-codegen:

- **build** (``bloom_bitmap``): keys → k double-hashed bit positions
  (Kirsch–Mitzenmacher: ``h_i = h1 + i·h2 mod m``) → ``groupBy(word)``
  + ``bit_or`` folds bits into exactly m/64 ``(word_idx, bits)`` rows
  (partial-agged map-side, so the shuffle carries at most m/64 rows per
  partition regardless of key count) → one dense ``array<bigint>`` row.
- **probe** (``might_contain_col``): the one-row bitmap is
  broadcast-crossed into the probe side; each of the k checks is an
  O(1) ``element_at(array) & mask`` — map-only, no shuffle of the
  probed relation, no UDF.

Why it matters at 100 TB: a semi/anti join against a key set too large
to broadcast forces a sort-merge join — the ENTIRE big side shuffles
on the join key. With a bloom prefilter the big side stays map-only
except for true members plus an ``fpp`` sliver of false positives —
those alone enter the exact confirming join, which restores exact
semantics (bloom has no false negatives, so nothing is lost).
``bloom_semi_join`` / ``bloom_anti_join`` package that pattern; both
are value-identical to the plain joins. When the key set DOES fit the
broadcast threshold, use the plain join — Spark's broadcast hash join
probes cheaper than k hash evaluations per row (measured; the win
starts where broadcast stops). The anti join scans the big side twice
(both map-only): pass-through of definite misses + confirm of hits —
at scale two map passes beat one full shuffle by the shuffle's IO.

The driver holds one bitmap row (m bits ≈ 1.44·n·log2(1/fpp); 120 MB
for 1e8 keys at 1 % — for key sets beyond that, raise fpp and let the
exact join absorb more false positives, or shard the bitmap by key
range; the build stays a single pass either way).

Reference parity note: the reference engine has no bloom machinery —
this is part of the beyond-reference scale toolbox (training-data
pipelines: blocklist lookups, seen-before dedup probes, decontamination
against very large gram sets).

Versus Spark's built-in runtime bloom filter (benchmarked r5,
BASELINE.md bloom section): ``spark.sql.optimizer.runtime.bloomFilter``
injects the same idea inside the optimizer, but only for INNER/SEMI
joins (never ANTI — an injected filter would discard probe rows an
anti join must keep), only when the creation side carries a selective
predicate and fits ``creationSideThreshold`` (10 MB default), and only
when the application-side scan exceeds
``applicationSideScanSizeThreshold`` (10 GB default — i.e. it is tuned
to engage precisely in the network-bound regime, and measuring it
locally requires forcing the thresholds). Use the built-in where its
conditions hold; this module remains the tool for (a) anti-join
pruning — the decontamination/blocklist case the optimizer never
covers, (b) a bitmap built ONCE and reused across many queries or
corpus shards (the built-in rebuilds per query), and (c) plan shapes
without a selective creation-side predicate. Single-node wall both
lose to a memory-speed SMJ shuffle — measured honestly for both.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def bloom_params(expected_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Standard sizing: m bits and k hashes for a target false-positive
    rate. m is rounded up to a multiple of 64 (whole bitmap words)."""
    if expected_items <= 0:
        return 64, 1
    m = math.ceil(-expected_items * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / expected_items * math.log(2)))
    return m, k


def _h1(key: Column, m: int) -> Column:
    # reduced mod m immediately: the k-position combine below must not
    # overflow BIGINT (ANSI mode aborts on overflow)
    return F.pmod(F.xxhash64(key), F.lit(m))


def _h2(key: Column, m: int) -> Column:
    # independent second hash as the double-hashing stride; +1 keeps it
    # nonzero so the k probes never collapse to one position
    return F.pmod(F.xxhash64(key, F.lit("bloom-h2")), F.lit(m - 1)) + 1


def bloom_bitmap(
    keys: DataFrame, key_col: str, expected_items: int | None = None, fpp: float = 0.01
) -> tuple[DataFrame, int, int]:
    """Distributed bloom build → (one-row DataFrame ``[bitmap:
    array<bigint>]`` of exactly m/64 words, m, k). ``expected_items``
    defaults to a cheap count of ``keys`` (one extra action; pass it
    when known).

    Plan: the two base hashes are projected JVM-side (``xxhash64`` —
    they MUST match the probe expression bit-for-bit), then each
    partition bit-packs its keys into a full m-bit NumPy bitmap and
    emits ONE ``array<bigint>`` row; a ``zip_with``-OR fold merges the
    per-partition bitmaps. No explode, no giant groupBy: the first cut
    exploded k positions per key into a 750k-group ``bit_or``
    aggregation and took 17 s for 5M keys — this build takes ~3 s.
    Shuffled volume is partitions × m/8 bytes (coalesce a huge key
    relation before building if partitions × bitmap ≫ memory).

    Dense array — not a map — because the probe does k ``element_at``
    lookups per row and Spark's MapType ``element_at`` is a LINEAR
    SCAN of the map (a 2 M-row probe that runs in seconds against the
    array did not finish in minutes against a 15k-entry map). Array
    ``element_at`` is O(1)."""
    import numpy as np

    if expected_items is None:
        expected_items = keys.select(key_col).distinct().count()
    m, k = bloom_params(expected_items, fpp)
    n_words = m // 64
    key = F.col(key_col)
    hashed = keys.select(_h1(key, m).alias("h1"), _h2(key, m).alias("h2"))

    def pack(batches):
        import pandas as pd

        hs = [
            (pdf["h1"].to_numpy(dtype=np.int64), pdf["h2"].to_numpy(dtype=np.int64))
            for pdf in batches
            if len(pdf)
        ]
        bm = np.zeros(n_words, dtype=np.uint64)
        if hs:
            h1 = np.concatenate([a for a, _ in hs])
            h2 = np.concatenate([b for _, b in hs])
            # all k positions at once; h1,h2 < m ⇒ no int64 overflow
            pos = (h1[None, :] + np.arange(k)[:, None] * h2[None, :]) % m
            pos = pos.ravel()
            words = pos // 64
            bits = np.uint64(1) << (pos % 64).astype(np.uint64)
            # group-OR via one sort + reduceat (ufunc.at measured ~10×
            # slower than this on 35M entries)
            order = np.argsort(words, kind="stable")
            w = words[order]
            b = bits[order]
            starts = np.concatenate(([0], np.nonzero(np.diff(w))[0] + 1))
            bm[w[starts]] = np.bitwise_or.reduceat(b, starts)
        yield pd.DataFrame({"bm": [bm.view(np.int64).tolist()]})

    # ≤ one small row per partition; checkpoint so the key-set pass
    # isn't re-run by the fold's own evaluation
    parts = hashed.mapInPandas(pack, schema="bm array<bigint>").localCheckpoint()
    zero = F.expr(f"array_repeat(CAST(0 AS BIGINT), {n_words})")
    bitmap = parts.agg(
        F.aggregate(
            F.collect_list("bm"),
            zero,
            lambda acc, x: F.zip_with(acc, x, lambda a, b: a.bitwiseOR(b)),
        ).alias("bitmap")
    )
    # one tiny row, but referenced from BOTH branches of the anti-join
    # union — checkpoint so the build (a full key-set pass) runs once
    return bitmap.localCheckpoint(), m, k


# 64 single-bit masks as a plain array literal (index b+1 ⇔ bit b set;
# bit 63 wraps to the negative long). Lets the probe pick its mask with
# element_at instead of a non-literal shiftleft (the Python API only
# accepts literal shift counts). Built lazily — Column literals need an
# active session, so this can't run at import time.
def _bit_masks() -> Column:
    return F.array(
        *[F.lit((1 << b) if b < 63 else -(1 << 63)).cast("long") for b in range(64)]
    )


def _checks_from_hashes(h1: Column, h2: Column, m: int, k: int) -> Column:
    """The k word-lookup/bit-test conjunction given per-row h1/h2."""
    out = None
    for i in range(k):
        pos = F.pmod(h1 + i * h2, F.lit(m))
        # dense array: word w lives at index w+1 (1-based element_at)
        word = F.element_at(F.col("bitmap"), (pos / 64).cast("int") + 1)
        mask = F.element_at(_bit_masks(), F.pmod(pos, 64).cast("int") + 1)
        c = word.bitwiseAND(mask) != 0
        out = c if out is None else out & c
    return out


def might_contain_col(key: Column, m: int, k: int) -> Column:
    """Boolean probe expression against a broadcast ``bitmap`` column
    (attach the bitmap first: ``df.crossJoin(F.broadcast(bitmap_df))``).
    k word lookups + bit tests, all codegen — absent words mean 0.

    Self-contained (recomputes the two hashes inside each check); the
    join wrappers below project h1/h2 once per row instead — 2 hash
    evaluations instead of 2k, measured ~3× probe speedup at k=7."""
    return _checks_from_hashes(_h1(key, m), _h2(key, m), m, k)


def _probed(big: DataFrame, bitmap: DataFrame, on: str, m: int, k: int) -> DataFrame:
    """big + boolean ``_bloom_hit``, with h1/h2 projected once per row."""
    return (
        big.crossJoin(F.broadcast(bitmap))
        .withColumn("_h1", _h1(F.col(on), m))
        .withColumn("_h2", _h2(F.col(on), m))
        .withColumn(
            "_bloom_hit", _checks_from_hashes(F.col("_h1"), F.col("_h2"), m, k)
        )
        .drop("_h1", "_h2", "bitmap")
    )


def bloom_semi_join(
    big: DataFrame,
    keys: DataFrame,
    on: str,
    fpp: float = 0.01,
    expected_items: int | None = None,
) -> DataFrame:
    """Exact ``big SEMI JOIN keys ON on`` where only bloom-positive rows
    (true members + ~fpp of the rest) reach the shuffle join.
    ``expected_items`` forwards to the bitmap sizing — pass it when
    known to skip the sizing pass's distinct-count over ``keys``.
    The confirm join takes ``keys`` as-is: semi/anti semantics are
    unaffected by duplicate build-side keys, so a pre-``distinct``
    would be a wasted full shuffle."""
    bitmap, m, k = bloom_bitmap(keys, on, expected_items=expected_items, fpp=fpp)
    pref = _probed(big, bitmap, on, m, k).where(F.col("_bloom_hit")).drop("_bloom_hit")
    return pref.join(keys.select(on), on, "left_semi")


def bloom_anti_join(
    big: DataFrame,
    keys: DataFrame,
    on: str,
    fpp: float = 0.01,
    expected_items: int | None = None,
) -> DataFrame:
    """Exact ``big ANTI JOIN keys ON on``: bloom-negative rows are
    definite non-members and pass through MAP-ONLY; only the bloom-
    positive sliver enters the exact anti join to weed out false
    positives. Union restores the full result. ``expected_items`` and
    the undeduplicated confirm join: same rationale as
    ``bloom_semi_join``."""
    bitmap, m, k = bloom_bitmap(keys, on, expected_items=expected_items, fpp=fpp)
    probed = _probed(big, bitmap, on, m, k)
    definite_out = probed.where(~F.col("_bloom_hit")).drop("_bloom_hit")
    maybe = probed.where(F.col("_bloom_hit")).drop("_bloom_hit")
    confirmed_out = maybe.join(keys.select(on), on, "left_anti")
    return definite_out.unionByName(confirmed_out)
