"""Local mirror of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry and its ``oracle_sql()`` twin on the
same sf dir, canonicalize (column-name sort, row sort, floats to 9
significant digits, timestamps to UTC ISO), and diff.

Usage: python tools/check_oracle.py [--with-retired] [--json OUT]
           [sf_dir] [query_name ...]

``--with-retired`` also verifies the queries retired from the driver's
50-row gate (tools/retired_queries.py) so every implemented query gets
a current-round oracle verdict. ``--json OUT`` writes the per-query
results as a CORRECTNESS-style JSON artifact.
"""

from __future__ import annotations

import datetime
import json
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
        # full microseconds: second-resolution formatting would let a
        # sub-second drift between engines canonicalize identically and
        # report a false PASS; normalize any tz-aware value to UTC first
        # (strftime would silently IGNORE tzinfo)
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.strftime("%Y-%m-%dT%H:%M:%S.%f")
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main() -> int:
    argv = sys.argv[1:]
    with_retired = "--with-retired" in argv
    if with_retired:
        argv.remove("--with-retired")
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print("error: --json requires an output path", file=sys.stderr)
            return 2
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    # Spark collects TimestampType via the PYTHON PROCESS timezone while
    # DuckDB returns UTC naive datetimes — pin the process to UTC so the
    # canonicalization comparison doesn't depend on the host TZ.
    os.environ["TZ"] = "UTC"
    try:
        import time as _time

        _time.tzset()
    except AttributeError:
        pass  # tzset is POSIX-only
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in ALL_FIXTURE_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            # Spark-written table (e.g. tools/make_sf1.py output): a
            # DIRECTORY of part files — DuckDB needs the glob form
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = dict(entrymod.queries())
    oracles = dict(entrymod.oracle_sql())
    if with_retired:
        from tools.extra_queries import extra_oracle_sql, extra_queries
        from tools.retired_queries import retired_oracle_sql, retired_queries

        for name, fn in {**retired_queries(), **extra_queries()}.items():
            assert name not in qs, f"registry name collides with gate: {name}"
            qs[name] = fn
        oracles.update(retired_oracle_sql())
        oracles.update(extra_oracle_sql())
    # Per-query records use the SAME shape as the driver's
    # CORRECTNESS_r{N}.json rows — {rows_match, schema_match, hash_match,
    # spark_rows, oracle_rows, err} — so both artifacts parse uniformly.
    def record(
        rows_match=None,
        schema_match=None,
        hash_match=None,
        spark_rows=None,
        oracle_rows=None,
        err=None,
    ) -> dict:
        return {
            "rows_match": rows_match,
            "schema_match": schema_match,
            "hash_match": hash_match,
            "spark_rows": spark_rows,
            "oracle_rows": oracle_rows,
            "err": err,
        }

    # A typo'd (or not-yet---with-retired) name must not produce a
    # green-looking '0 passed, 0 failed' with exit code 0.
    unknown = only - set(qs)
    if unknown:
        print(
            f"error: unknown query name(s) {sorted(unknown)} "
            f"(hint: retired/extras need --with-retired)",
            file=sys.stderr,
        )
        return 2
    n_pass = n_fail = 0
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            results[name] = record(err=f"spark error: {e}"[:300])
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only) — {len(srows)} rows")
            results[name] = record(spark_rows=len(srows), err="no_oracle")
            continue
        try:
            res = con.sql(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            results[name] = record(
                spark_rows=len(srows), err=f"duckdb error: {e}"[:300]
            )
            n_fail += 1
            continue
        sc, sr = canon_rows(scols, srows)
        dc, dr = canon_rows(dcols, drows)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
            results[name] = record(
                rows_match=(len(sr) == len(dr)),
                schema_match=False,
                hash_match=False,
                spark_rows=len(sr),
                oracle_rows=len(dr),
            )
            n_fail += 1
            continue
        if sr == dr:
            print(f"PASS {name}: {len(sr)} rows")
            results[name] = record(
                rows_match=True,
                schema_match=True,
                hash_match=True,
                spark_rows=len(sr),
                oracle_rows=len(dr),
            )
            n_pass += 1
        else:
            n_fail += 1
            sset, dset = set(sr), set(dr)
            print(
                f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}; "
                f"spark-only={list(sset - dset)[:3]} duck-only={list(dset - sset)[:3]}"
            )
            results[name] = record(
                rows_match=(len(sr) == len(dr)),
                schema_match=True,
                hash_match=False,
                spark_rows=len(sr),
                oracle_rows=len(dr),
            )
    print(f"\n{n_pass} passed, {n_fail} failed")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "with_retired": with_retired, "queries": results},
                f,
                indent=1,
            )
        print(f"wrote {json_out}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
