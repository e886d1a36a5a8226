"""Mimic the driver's correctness gate: run every __spark_entry__.queries()
entry and its oracle_sql() on the same sf dir, compare row count, column
names, and order-insensitive values.

Usage: python tools/check_contract.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import importlib.util
import math
import sys
import time

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spec = importlib.util.spec_from_file_location("entrymod", "__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    sys.path.insert(0, ".")
    from arachne_spark.session import build_session

    spark = build_session(
        "contract_check", extra={"spark.ui.showConsoleProgress": "false"}
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, osql = m.queries(), m.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            cols = sdf.columns
            srows = sdf.collect()
            sset = sorted(tuple(norm(v) for v in r) for r in srows)
        except Exception as e:
            print(f"FAIL {name}: spark error {str(e).splitlines()[0][:150]}")
            failures += 1
            continue
        if name not in osql:
            print(f"SKIP-ORACLE {name}: rows={len(srows)} ({time.time()-t0:.1f}s)")
            continue
        try:
            cur = con.execute(osql[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
            dset = sorted(tuple(norm(v) for v in r) for r in drows)
        except Exception as e:
            print(f"FAIL {name}: oracle error {str(e).splitlines()[0][:150]}")
            failures += 1
            continue
        ok_cols = [c.lower() for c in cols] == [c.lower() for c in dcols]
        ok_vals = sset == dset
        if ok_cols and ok_vals:
            print(f"OK   {name}: rows={len(srows)} ({time.time()-t0:.1f}s)")
        else:
            failures += 1
            print(
                f"FAIL {name}: cols {cols} vs {dcols} | "
                f"rows {len(sset)} vs {dset and len(dset)}"
            )
            if not ok_vals:
                s_only = [x for x in sset if x not in set(dset)][:3]
                d_only = [x for x in dset if x not in set(sset)][:3]
                print(f"     spark-only: {s_only}")
                print(f"     duck-only:  {d_only}")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
