"""Engine-portable 64-bit hashing.

The reference routes words to reducers with ``SHA-256(word) mod R``
(``groupby/main.py:16-21``); inside Spark that role is played by the
built-in shuffle hash partitioner and never surfaces in results. But the
dedup family (MinHash, SimHash, fingerprinting) *does* surface hash
values in results, and those must be reproducible in the DuckDB oracle.
Spark's ``xxhash64``/``hash`` have no DuckDB twin, so we derive a 60-bit
integer from ``md5`` hex — identical bytes in any engine:

    Spark :  CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)
    DuckDB:  ('0x' || substr(md5(x), 1, 15))::BIGINT

15 hex digits = 60 bits, comfortably inside a signed 64-bit range; md5
is cryptographically broken but statistically uniform, which is all a
sketch needs. At 100 TB this stays JVM-side whole-stage codegen (md5 and
conv are both built-in expressions).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def hex64(col: Column | str) -> Column:
    """Portable 60-bit hash of a string column (see module doc)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def portable_hash64(col: Column | str, seed: int) -> Column:
    """Seeded variant: hash of ``'{seed}|' || x`` — the seeded family used
    for MinHash signatures (k independent-ish hash functions)."""
    c = F.col(col) if isinstance(col, str) else col
    return hex64(F.concat(F.lit(f"{seed}|"), c))


# DuckDB twins ({col} is substituted by the caller).
HEX64_SQL = "(('0x' || substr(md5({col}), 1, 15))::BIGINT)"


def hex64_sql(col_sql: str) -> str:
    return HEX64_SQL.format(col=col_sql)


def portable_hash64_sql(col_sql: str, seed: int) -> str:
    return HEX64_SQL.format(col=f"('{seed}|' || {col_sql})")
