"""Dump explain("formatted") for a named list of queries into
plans/r13/<name>_<tag>.txt — the r13 optimization round's before/after
plan evidence."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from map_reduce_using_cloud_functions_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]  # "before" | "after"
    names = sys.argv[2:]
    sf_dir = "/root/testdata/sf0.01"
    spark = get_spark("dump-r13-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(entrymod.queries())
    from tools.extra_queries import extra_queries

    qs.update(extra_queries())
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok", len(plan.splitlines()), "lines")
    spark.stop()


if __name__ == "__main__":
    main()
