"""Synthesize an sf1 tree (10× sf0.1) for scale benching — r9 task 6.

Replication recipe (the r8 correctness sweep's, extended so BENCH rows
stay meaningful):

- every table except region/nation replicates 10×, with +r·1e9 added to
  its keys AND the foreign keys that point at replicated tables
  (c_nationkey / s_nationkey / n_regionkey reference the UNREPLICATED
  dimensions and keep their values);
- ``documents.text`` is token-salted per replica (every token gets an
  ``r<k>`` suffix for k ≥ 1): plain key-offset replication would ship
  10 byte-identical copies of every document, and the near-dup/minhash
  rows would then measure a DATA artifact — each duplicate cluster 10×
  wider, pair volume 100× — instead of plan scaling. Salting makes the
  replicas ten disjoint-vocabulary corpora: text volume 10×, pair
  volume ~10×, which is the scaling question bench actually asks;
- ``embeddings.embedding`` is circularly rotated per replica (by
  r·6+1 positions): rotation preserves the norm and, for these random
  vectors, decorrelates the direction — identical-vector replication
  would plant 10-way exact-duplicate floods into every ANN/SemDeDup row
  (quadratic pair blowup by construction, the same artifact as
  unsalted text).

Usage: python tools/make_sf1.py [SRC] [DST]   (defaults below)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from map_reduce_using_cloud_functions_spark.session import get_spark

REPS = 10
OFF = 1_000_000_000

# table -> columns that get the +r*OFF offset (keys + FKs to replicated
# tables); region/nation are dimension tables and do not replicate.
OFFSET_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def replicate(df, table: str, r: int):
    out = df
    for col in OFFSET_COLS[table]:
        out = out.withColumn(col, (F.col(col) + F.lit(r * OFF)).cast("bigint"))
    if table == "documents" and r > 0:
        # salt every token: disjoint vocab per replica (see module doc)
        out = out.withColumn(
            "text",
            F.regexp_replace(F.col("text"), r"(\S+)", f"$1r{r}"),
        ).withColumn("n_chars", F.length("text").cast("bigint"))
    if table == "embeddings" and r > 0:
        shift = (r * 6 + 1) % 64
        out = out.withColumn(
            "embedding",
            F.concat(
                F.slice("embedding", shift + 1, 64 - shift),
                F.slice("embedding", 1, shift),
            ),
        )
    return out


def main(src: str, dst: str) -> None:
    spark = get_spark("make_sf1")
    os.makedirs(dst, exist_ok=True)
    for table in ["region", "nation"]:
        spark.read.parquet(f"{src}/{table}.parquet").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{dst}/{table}.parquet")
        print(f"{table}: copied")
    for table in OFFSET_COLS:
        base = spark.read.parquet(f"{src}/{table}.parquet")
        parts = [replicate(base, table, r) for r in range(REPS)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{dst}/{table}.parquet")
        n = spark.read.parquet(f"{dst}/{table}.parquet").count()
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    main(src, dst)
