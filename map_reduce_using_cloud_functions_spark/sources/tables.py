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

# events.ts is INT64 TIMESTAMP(NANOS) (pyarrow ns default), which Spark
# rejects outright; orders/lineitem timestamps are ms and read natively.
# For nanos columns we read raw longs (legacy nanosAsLong) and convert
# ns → µs at the scan edge — lossless here (all fixture timestamps are
# µs-aligned) and still a pushdown-friendly projection, not a UDF.
_NANO_TS_COLUMNS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table (lazy; no IO until an action runs)."""
    if name in _NANO_TS_COLUMNS:
        # Conf must be in place before this table's schema inference.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in _NANO_TS_COLUMNS.get(name, ()):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} DIV 1000")))
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
