"""Bucketed (pre-partitioned) tables: shuffle-free co-located joins.

The reference routes every word to its reducer with ``SHA-256(word) mod
R`` computed per request (``groupby/main.py:16-21``) — the partitioning
exists only for the duration of one job. Bucketing is the durable form
of the same idea: ``bucketBy(N, key)`` persists the hash-partitioning
INTO the table layout, so every future join or aggregation on the
bucket key reads already-co-located data and skips its Exchange
entirely.

At 100 TB this is the difference between shuffling the fact table on
every join (dominant cost) and never shuffling it: two tables bucketed
by the same key into the same bucket count sort-merge-join with ZERO
Exchange on either side, and a point filter on the bucket key prunes
the scan to 1/N of the files (``SelectedBucketsCount`` in the plan).
The write itself costs one shuffle — paid once, amortized over every
downstream consumer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = 64,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed (and by default
    sorted) by ``keys`` — the once-per-dataset shuffle that makes every
    later equi-join/agg on ``keys`` shuffle-free. ``n_buckets`` bounds
    per-bucket size: size it so one bucket ≈ one comfortable task
    (e.g. 100 TB / 128 MB-ish tasks → tens of thousands of buckets).
    Joining tables must share keys AND bucket count."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket metadata (a bare
    ``spark.read.parquet(path)`` would see plain files and lose the
    co-location guarantee — always read through the catalog)."""
    return spark.table(table)
