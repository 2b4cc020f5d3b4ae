"""100x soak of the REFERENCE's own workload (r5 verdict task 6).

The r4/r5 soaks covered the dedup/ANN extension families; the
reference's entire job — build an inverted index, persist it, serve
point lookups (``main/app.py:104-124``) — and the heaviest streaming
batch twin (sessionize) had no 100x row. This replicates the sf0.1
fixtures with DISTINCT identity spaces per replica (new doc ids / new
user populations — scaling the shuffle keys, not just row counts) and
measures:

  1. ``index_build``   — the one-shuffle build at 100x corpus
  2. ``write_index``   — the real partitioned table on disk (file
                         counts as a reader would see them)
  3. lookup-after-write — ``lookup_persisted`` (first-letter partition
                         pruning, the serving path) vs the same probe
                         through the unpruned ``read_index`` view: the
                         measured cost of losing the partition column
                         before the filter
  4. ``sessionize``    — gaps-and-islands over 100x events with 100x
                         the user (= window partition) population

Usage: python tools/soak_reference_workload.py [REP] [SF_DIR] [MAX_RECS]
(defaults: 100 /root/testdata/sf0.1 0). MAX_RECS > 0 caps
``maxRecordsPerFile`` on the index write to simulate real-cluster file
counts (one box compacts 11.6M postings into ~19 files, where a
1000-executor write produces thousands — the regime where partition
pruning vs full listing actually separates; measured 240-file rows in
BASELINE.md r6). Writes the index under a temp dir it removes at
exit; prints one human-readable block for BASELINE.md.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

import pyspark.sql.functions as F

sys.path.insert(0, ".")

from map_reduce_using_cloud_functions_spark.operators import index as ix  # noqa: E402
from map_reduce_using_cloud_functions_spark.plans.events import sessionize  # noqa: E402
from map_reduce_using_cloud_functions_spark.session import get_spark  # noqa: E402
from map_reduce_using_cloud_functions_spark.sources import load_table  # noqa: E402
from map_reduce_using_cloud_functions_spark.sources.text_corpus import (  # noqa: E402
    documents_as_corpus,
)


def _replicas(spark, rep: int):
    return F.broadcast(spark.range(rep).select(F.col("id").alias("rep")))


def wall(df_action, n: int = 3) -> float:
    """Min-of-n wall for an action — the host-noise protocol's
    per-measurement primitive (BASELINE.md)."""
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        df_action()
        best = min(best, time.time() - t0)
    return best


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    max_recs = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    spark = get_spark("soak_reference")
    tmp = tempfile.mkdtemp(prefix="soak_ref_")
    try:
        # --- corpus at REPx: distinct doc id space per replica --------
        docs = load_table(spark, sf_dir, "documents")
        corpus = (
            docs.crossJoin(_replicas(spark, rep))
            .select(
                F.concat_ws(
                    "#", F.col("doc_id").cast("string"), F.col("rep").cast("string")
                ).alias("document"),
                "text",
            )
        )
        n_docs = docs.count() * rep

        built = ix.build_index(corpus)
        t_build = wall(lambda: noop(built), n=2)
        n_postings = built.count()
        print(
            f"index_build {rep}x: {n_docs:,} docs -> {n_postings:,} postings, "
            f"wall {t_build:.1f} s (min-of-2, noop sink)"
        )

        # --- persist: real file counts ------------------------------
        path = f"{tmp}/idx"
        t0 = time.time()
        if max_recs > 0:
            (
                built.withColumn("first", F.substring("word", 1, 1))
                .hint("rebalance", "first")
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "static")
                .option("maxRecordsPerFile", max_recs)
                .partitionBy("first")
                .parquet(path)
            )
            ix._write_docmap_full(built, path)
        else:
            ix.write_index(built, path)
        t_write = time.time() - t0
        import os

        files = [
            f
            for root, _, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet") and "_docmap" not in root
        ]
        dirs = {
            d for d in os.listdir(path) if d.startswith("first=")
        }
        print(
            f"write_index: {t_write:.1f} s -> {len(dirs)} letter partitions, "
            f"{len(files)} parquet files"
        )

        # --- lookup-after-write: pruned serving path vs unpruned view
        # hot probe via count() (collect of a 100x-replicated hot word's
        # postings is driver-transfer-bound and measures py4j, not the
        # scan); absent probe via collect (pure listing/footer cost)
        for word, action in (("the", "count"), ("zzzabsent", "collect")):
            t_pruned = wall(
                lambda w=word: getattr(ix.lookup_persisted(spark, path, w), action)()
            )
            t_full = wall(
                lambda w=word: getattr(
                    ix.lookup(ix.read_index(spark, path), w), action
                )()
            )
            n = ix.lookup_persisted(spark, path, word).count()
            print(
                f"lookup '{word}' ({n:,} docs, {action}): pruned "
                f"{t_pruned:.2f} s vs unpruned-view {t_full:.2f} s (min-of-3)"
            )

        # --- sessionize at REPx: distinct users per replica ----------
        events = load_table(spark, sf_dir, "events")
        n_users = events.select("user_id").distinct().count()
        ev = (
            events.crossJoin(_replicas(spark, rep))
            .select(
                (F.col("event_id") + F.col("rep") * F.lit(10**10)).alias("event_id"),
                "ts",
                (F.col("user_id") + F.col("rep") * F.lit(10**7)).alias("user_id"),
                "event_type",
                "value",
            )
        )
        t_sess = wall(lambda: noop(sessionize(ev)), n=2)
        n_sess = sessionize(ev).count()
        print(
            f"sessionize {rep}x: {events.count() * rep:,} events / "
            f"{n_users * rep:,} users -> {n_sess:,} sessions, "
            f"wall {t_sess:.1f} s (min-of-2, noop sink)"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
