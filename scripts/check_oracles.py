#!/usr/bin/env python
"""Local mirror of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf0.01, compare row count, column names, and values (order-insensitive,
columns sorted by name).  Usage: check_oracles.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
# oracles that bake data-derived constants (IVF centroids, LSH planes'
# dim) read SPARK_GRAFT_ORACLE_SF_DIR — keep it in lockstep with the
# directory this script evaluates at, or the baked constants would
# come from a different scale factor than the Spark queries
os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bool):
        return str(bool(v)).lower()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def main() -> int:
    import duckdb

    import __spark_entry__ as e
    from indigent_defense_stats_spark.session import get_spark

    only = set(sys.argv[1:])
    qs, osql = e.queries(), e.oracle_sql()
    spark = get_spark(app_name="oracle-check", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failures = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failures.append(name)
            continue
        sql = osql.get(name)
        if sql is None:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            failures.append(name)
            continue
        status = []
        if len(srows) != len(drows):
            status.append(f"rowcount {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            status.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        if not status:
            a, b = canon(srows, scols), canon(drows, dcols)
            if a != b:
                diff = next(
                    (i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y
                ) if len(a) == len(b) else ("len", len(a), len(b))
                status.append(f"values differ, first diff: {diff}")
        if status:
            print(f"FAIL {name}: {'; '.join(status)}")
            failures.append(name)
        else:
            print(f"PASS {name} ({len(srows)} rows) [{time.time()-t0:.1f}s]")
    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILED: {failures}")
        return 1
    print("\nall queries match their oracles")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
