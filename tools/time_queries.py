"""Time individual named queries with the bench methodology (force via
full-row hash, min of N reps) — the r12 optimization round's inner
measurement loop. Same session factory and sf_dir contract as bench.py;
prints one line per query. NOT a replacement for bench.py: the official
artifact stays the full run."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from bench import force
from map_reduce_using_cloud_functions_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(entrymod.queries())
    from tools.extra_queries import extra_queries

    qs.update(extra_queries())
    force(qs["text_quality"](spark, sf_dir))  # session warmup
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    for name in names:  # codegen warmup at the smallest fixture
        if os.path.isdir(warm_dir):
            try:
                force(qs[name](spark, warm_dir))
            except Exception:
                pass
    for name in names:
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            force(qs[name](spark, sf_dir))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{best:8.3f}  {name}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
