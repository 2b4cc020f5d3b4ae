"""Local mirror of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry and its ``oracle_sql()`` twin on the
same sf dir, canonicalize (column-name sort, row sort, floats to 9
significant digits, timestamps to UTC ISO), and diff.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import datetime
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from map_reduce_using_cloud_functions_spark.session import get_spark
from map_reduce_using_cloud_functions_spark.schemas import ALL_FIXTURE_TABLES


def canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0"
        return f"{v:.9g}"
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%dT%H:%M:%S")
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in ALL_FIXTURE_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name == "events_approx_distinct":
            # No cross-engine oracle for HLL sketches, but the exact
            # companion column rides along: bound the estimate instead of
            # leaving a blind spot. approx_count_distinct's default rsd
            # is 0.05; 4 sigma ≈ 20% relative error bound.
            cols = dict(zip(scols, range(len(scols))))
            bad = [
                r
                for r in srows
                if abs(r[cols["approx_users"]] - r[cols["exact_users"]])
                > max(1, 0.2 * r[cols["exact_users"]])
            ]
            if bad:
                print(f"FAIL {name}: HLL estimate outside 20% of exact: {bad[:3]}")
                n_fail += 1
            else:
                print(f"PASS {name}: {len(srows)} rows (HLL within 20% of exact)")
                n_pass += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only) — {len(srows)} rows")
            continue
        try:
            res = con.sql(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sc, sr = canon_rows(scols, srows)
        dc, dr = canon_rows(dcols, drows)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
            n_fail += 1
            continue
        if sr == dr:
            print(f"PASS {name}: {len(sr)} rows")
            n_pass += 1
        else:
            n_fail += 1
            sset, dset = set(sr), set(dr)
            print(
                f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}; "
                f"spark-only={list(sset - dset)[:3]} duck-only={list(dset - sset)[:3]}"
            )
    print(f"\n{n_pass} passed, {n_fail} failed")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
