"""Skew-resistant join utilities — the 100 TB design point for joins on
keys with pathological hot values (the situation AQE's skew-join split
handles for sort-merge joins; salting is the explicit-plan variant and
works for any join type, including when the skewed side must aggregate
first).

Salting: the skewed (probe) side gets a deterministic salt in [0, S);
the build side is replicated S× with every salt value; the join key
becomes (key, salt), splitting each hot key's rows across S tasks.
Result is row-identical to the unsalted join (verified by property
test) — only the partitioning changes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
    salt_source: Column | None = None,
) -> DataFrame:
    """Join ``skewed ⋈ other`` on ``key`` with the hot-key rows of
    ``skewed`` spread over ``salt_buckets`` partitions.

    ``salt_source`` picks the salt deterministically (defaults to a
    hash of the skewed side's whole row via monotonically varying
    ``spark_partition_id``+offset-free expression: crc32 of all cols) —
    determinism keeps retries/speculative tasks consistent.

    Supported ``how``: left-preserving joins only (inner/left/semi/anti).
    Right/full-preserving joins would emit every unmatched right row
    once per salt replica (``salt_buckets``× duplication), so they are
    rejected rather than silently wrong.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
               "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports left-preserving joins only {sorted(allowed)}; "
            f"got how={how!r} (unmatched right rows would duplicate per salt)"
        )
    if salt_source is None:
        salt_source = F.crc32(F.concat_ws("\x1f", *skewed.columns))
    salted_left = skewed.withColumn("__salt", (salt_source % salt_buckets).cast("int"))
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(salt_buckets - 1))
    ).alias("__salt")
    replicated_right = other.select("*", salts)
    out = salted_left.join(replicated_right, [key, "__salt"], how)
    return out.drop("__salt")
