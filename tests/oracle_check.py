"""Local replica of the driver's DuckDB oracle comparison.

Runs every ``queries()`` entry on Spark and, where an ``oracle_sql()``
entry exists, the SQL on DuckDB over the same parquet, then compares
row count, column names, and order-insensitive values.

Usage: python tests/oracle_check.py [sf0.001|sf0.01] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from jschon_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.10g}"
    if isinstance(v, int):
        return str(v)
    if v is None:
        return "\0NULL"
    return str(v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in idx) for r in rows]
    out.sort()
    return sorted(cols), out


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.001"
    only = set(sys.argv[2:])
    # an absolute path selects a synthesized scale (e.g. the sf1 build
    # from scripts/make_sf1.py); bare names resolve under /root/testdata
    sf_dir = sf if sf.startswith("/") else f"/root/testdata/{sf}"

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark = get_spark(cores=8)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    import time

    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            t0 = time.time()
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            t_spark = time.time() - t0
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok*   {name}: rows-only ({len(srows)} rows) "
                  f"[spark {t_spark:.2f}s]")
            continue
        try:
            t0 = time.time()
            res = con.sql(oracles[name])
            ocols = [c for c in res.columns]
            orows = res.fetchall()
            t_duck = time.time() - t0
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sc, sr = norm_rows(scols, srows)
        oc, orr = norm_rows(ocols, orows)
        if sc != oc:
            print(f"FAIL  {name}: columns spark={sc} duckdb={oc}")
            n_fail += 1
            continue
        if len(sr) != len(orr):
            print(f"FAIL  {name}: rowcount spark={len(sr)} duckdb={len(orr)}")
            n_fail += 1
            continue
        if sr != orr:
            diffs = [(a, b) for a, b in zip(sr, orr) if a != b][:5]
            print(f"FAIL  {name}: values differ; first diffs: {diffs}")
            n_fail += 1
            continue
        print(f"OK    {name}: {len(sr)} rows "
              f"[spark {t_spark:.2f}s, duckdb {t_duck:.2f}s]")
    print(f"\n{n_fail} failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
