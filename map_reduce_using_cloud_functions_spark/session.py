"""SparkSession factory.

One place to encode the engine's execution-model defaults so every entry
point (tests, bench, driver contract, streaming) runs with the same
scale-oriented configuration:

- AQE on (runtime coalescing, skew-join splitting) — replaces the
  reference's hand-rolled greedy LPT file packing and fixed M/R counts
  (reference `master/main.py:33-47`, `filladdtrigger/main.py:21`): on a
  real cluster the same code re-plans itself from runtime statistics.
- Arrow on — every Pandas UDF / ``applyInPandas`` crosses the JVM↔Python
  boundary in columnar batches, not pickled rows.
- UTC session timezone — window/time semantics identical across engines
  (the DuckDB oracle runs in UTC too).
- shuffle partitions sized by env (driver runs local[32]); on a 1000-executor
  cluster these come from cluster conf, not code.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "map-reduce-using-cloud-functions-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Local parallelism comes from ``SPARK_GRAFT_CPUS`` (driver contract);
    on a real cluster the master URL comes from spark-submit and this
    factory only contributes the semantic/optimizer settings.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Bound single-task input at scale: 128 MB splits keep 100 TB scans
        # at ~800k tasks instead of one task per (possibly huge) file.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Dynamic partition overwrite: the incremental index upsert
        # (operators/index.py) rewrites only touched partitions.
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
