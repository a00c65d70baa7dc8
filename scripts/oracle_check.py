"""Local twin-runner: run every __spark_entry__ query on Spark AND its DuckDB
oracle on the same parquet, compare row count / sorted-column schema / values.

Mimics the driver's correctness gate so regressions surface before commit.

Usage: python scripts/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from openapc_olap_spark.session import get_spark

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(rows, cols):
    """Sort columns by name, rows by stringified tuple (order-insensitive)."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = f"{v:.9g}"
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in idx], out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf_dir)
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={len(srows)} (no oracle — rows-only check)")
            if not srows:
                print(f"WARN {name}: zero rows")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        sc, sn = normalize(srows, scols)
        dc, dn = normalize(drows, dcols)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
            failures += 1
            continue
        if len(sn) != len(dn):
            print(f"FAIL {name}: rowcount spark={len(sn)} duck={len(dn)}")
            failures += 1
            continue
        if sn != dn:
            diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs: {diffs}")
            failures += 1
            continue
        print(f"ok   {name}: rows={len(sn)} cols={len(sc)} MATCH")
    spark.stop()
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
