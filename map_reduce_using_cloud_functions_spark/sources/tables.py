"""Fixture-table readers (parquet scans).

Scans are plain ``spark.read.parquet`` so Catalyst owns pushdown: filters
and column pruning reach the parquet reader (check ``PushedFilters`` /
``ReadSchema`` in ``.explain``). Nothing is cached or collected here —
at 100 TB a table is a plan node, not data.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..schemas import ALL_FIXTURE_TABLES

# Timestamp normalization at the scan edge: every plan downstream sees
# exactly one type for these columns — session-tz TIMESTAMP (LTZ).
# The fixtures have shipped ts as three different physical encodings
# across driver versions, so the loader handles all three:
#   * TIMESTAMP_MICROS isAdjustedToUTC=0 → Spark reads TIMESTAMP_NTZ,
#     which cannot cast to BIGINT and breaks epoch arithmetic; cast to
#     session-tz timestamp (session tz is UTC, so wall-clock == epoch
#     semantics and the DuckDB oracle's epoch(ts) agrees).
#   * INT64 TIMESTAMP(NANOS) → legacy nanosAsLong reads raw longs;
#     convert ns → µs (lossless: fixture timestamps are µs-aligned).
#   * TIMESTAMP_MICROS isAdjustedToUTC=1 → already LTZ; no-op.
# All branches are pushdown-friendly projections, not UDFs.
_TS_NORMALIZE_COLUMNS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
}


def _has_nanos_column(path: str, cols: tuple[str, ...]) -> bool:
    """Footer-only peek: does any of ``cols`` carry TIMESTAMP(NANOS)?
    Keeps the session-wide ``nanosAsLong`` flag OFF unless the fixture
    actually ships nanos — the flag cannot be scoped to one read (it is
    consulted at scan time, lazily), and leaving it on session-wide
    silently changes the schema of any LATER user parquet read with
    nanos columns. Conservative on errors (assume nanos) so an
    unreadable footer degrades to the old always-on behavior."""
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
        for c in cols:
            if c in schema.names:
                t = schema.field(c).type
                # Type API, not str(): a tz-aware nanos column prints as
                # 'timestamp[ns, tz=...]' and a string match would
                # silently miss it, leaving nanosAsLong unset and
                # failing the subsequent Spark read.
                if pa.types.is_timestamp(t) and t.unit == "ns":
                    return True
        return False
    except Exception:
        return True


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table (lazy; no IO until an action runs)."""
    if name in _TS_NORMALIZE_COLUMNS and _has_nanos_column(
        os.path.join(sf_dir, f"{name}.parquet"), _TS_NORMALIZE_COLUMNS[name]
    ):
        # Conf must be in place before this table's schema inference.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in _TS_NORMALIZE_COLUMNS.get(name, ()):
        if c not in df.columns:
            continue
        dtype = dict(df.dtypes)[c]
        if dtype == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} DIV 1000")))
        elif dtype.startswith("timestamp_ntz"):
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Scan every fixture table present under ``sf_dir`` (each through
    load_table so nanos handling is order-independent)."""
    out: dict[str, DataFrame] = {}
    for name in ALL_FIXTURE_TABLES:
        if os.path.exists(os.path.join(sf_dir, f"{name}.parquet")):
            out[name] = load_table(spark, sf_dir, name)
    return out


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view for ``spark.sql``."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables


def materialize_zordered(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    cols: list[str],
    path: str,
    bits: int = 6,
    num_files: int | None = None,
    scaling: str = "linear",
) -> DataFrame:
    """Persist a fixture table in the Z-order clustered layout
    (``operators/layout.write_zordered``) and return the re-read — the
    serving-side layout OPTION for the relational fixtures: answers
    never change (pure byte placement), but any selective scan whose
    predicate touches ANY of ``cols`` skips row groups via parquet
    min/max stats instead of reading the table (a single-column sort
    keeps only ITS column's ranges tight; the curve keeps all of
    them). Pay one clustered write, amortize over every filtered read
    — the same economics as ``bucketed.write_bucketed`` for joins."""
    from ..operators.layout import write_zordered

    write_zordered(
        load_table(spark, sf_dir, name),
        path,
        cols,
        bits=bits,
        num_files=num_files,
        scaling=scaling,
    )
    return spark.read.parquet(path)
