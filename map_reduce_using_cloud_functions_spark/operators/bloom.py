"""Bloom-filter membership prefilters built from DataFrame primitives.

Spark's own ``BloomFilterAggregate`` exists only as an internal
expression (used by runtime row-level filtering; not in the public
function registry), so this module builds the same structure out of
plain relational ops — which also makes the build distributed and the
probe whole-stage-codegen:

- **build** (``bloom_bitmap``): keys → k double-hashed bit positions
  (Kirsch–Mitzenmacher: ``h_i = h1 + i·h2 mod m``) → ``groupBy(word)``
  + ``bit_or`` folds bits into ≤ m/64 ``(word_idx, bits)`` rows
  (partial-agged map-side, so the shuffle carries at most m/64 rows per
  partition regardless of key count) → one ``map_from_entries`` row.
- **probe** (``might_contain_col``): the one-row bitmap is
  broadcast-crossed into the probe side; each of the k checks is
  ``element_at(map) & mask`` — map-only, no shuffle of the probed
  relation, no UDF.

Why it matters at 100 TB: a semi/anti join against a large key set
normally shuffles the ENTIRE big side on the join key. With a bloom
prefilter the big side stays map-only except for true members plus an
``fpp`` sliver of false positives — those alone enter the exact
confirming join, which restores exact semantics (bloom has no false
negatives, so nothing is lost). ``bloom_semi_join`` / ``bloom_anti_join``
package that pattern; both are value-identical to the plain joins.

The driver holds one bitmap row (m bits ≈ 1.44·n·log2(1/fpp); 120 MB
for 1e8 keys at 1 % — for key sets beyond that, raise fpp and let the
exact join absorb more false positives, or shard the bitmap by key
range; the build stays a single pass either way).

Reference parity note: the reference engine has no bloom machinery —
this is part of the beyond-reference scale toolbox (training-data
pipelines: blocklist lookups, seen-before dedup probes, decontamination
against very large gram sets).
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
    map<int,bigint>]``, m, k). ``expected_items`` defaults to a cheap
    count of ``keys`` (one extra action; pass it when known).

    Plan: project k positions per key (array, no row blowup until the
    explode), explode, fold into words via partial-agged ``bit_or``,
    then a single-row ``map_from_entries``. Nothing but word rows ever
    shuffles."""
    if expected_items is None:
        expected_items = keys.select(key_col).distinct().count()
    m, k = bloom_params(expected_items, fpp)
    key = F.col(key_col)
    positions = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.pmod(_h1(key, m) + i * _h2(key, m), F.lit(m)),
    )
    words = (
        keys.select(F.explode(positions).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("int").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("bits"))
    )
    bitmap = words.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("word_idx"), F.col("bits")))
        ).alias("bitmap")
    )
    return bitmap, m, k


# 64 single-bit masks as a plain array literal (index b+1 ⇔ bit b set;
# bit 63 wraps to the negative long). Lets the probe pick its mask with
# element_at instead of a non-literal shiftleft (the Python API only
# accepts literal shift counts). Built lazily — Column literals need an
# active session, so this can't run at import time.
def _bit_masks() -> Column:
    return F.array(
        *[F.lit((1 << b) if b < 63 else -(1 << 63)).cast("long") for b in range(64)]
    )


def might_contain_col(key: Column, m: int, k: int) -> Column:
    """Boolean probe expression against a broadcast ``bitmap`` column
    (attach the bitmap first: ``df.crossJoin(F.broadcast(bitmap_df))``).
    k word lookups + bit tests, all codegen — absent words mean 0."""
    checks = []
    for i in range(k):
        pos = F.pmod(_h1(key, m) + i * _h2(key, m), F.lit(m))
        word = F.coalesce(
            F.element_at(F.col("bitmap"), (pos / 64).cast("int")), F.lit(0)
        )
        mask = F.element_at(_bit_masks(), (pos % 64).cast("int") + 1)
        checks.append(word.bitwiseAND(mask) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def bloom_semi_join(
    big: DataFrame, keys: DataFrame, on: str, fpp: float = 0.01
) -> DataFrame:
    """Exact ``big SEMI JOIN keys ON on`` where only bloom-positive rows
    (true members + ~fpp of the rest) reach the shuffle join."""
    bitmap, m, k = bloom_bitmap(keys, on, fpp=fpp)
    pref = big.crossJoin(F.broadcast(bitmap)).where(
        might_contain_col(F.col(on), m, k)
    ).drop("bitmap")
    return pref.join(keys.select(on).distinct(), on, "left_semi")


def bloom_anti_join(
    big: DataFrame, keys: DataFrame, on: str, fpp: float = 0.01
) -> DataFrame:
    """Exact ``big ANTI JOIN keys ON on``: bloom-negative rows are
    definite non-members and pass through MAP-ONLY; only the bloom-
    positive sliver enters the exact anti join to weed out false
    positives. Union restores the full result."""
    bitmap, m, k = bloom_bitmap(keys, on, fpp=fpp)
    probed = big.crossJoin(F.broadcast(bitmap)).withColumn(
        "_bloom_hit", might_contain_col(F.col(on), m, k)
    )
    definite_out = probed.where(~F.col("_bloom_hit")).drop("_bloom_hit", "bitmap")
    maybe = probed.where(F.col("_bloom_hit")).drop("_bloom_hit", "bitmap")
    confirmed_out = maybe.join(keys.select(on).distinct(), on, "left_anti")
    return definite_out.unionByName(confirmed_out)
