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


_SPARK_KIND = {
    "byte": "i", "short": "i", "int": "i", "bigint": "i",
    "float": "f", "double": "f",
}


def _spark_kinds(sdf) -> dict:
    """Column -> numeric kind ('i'/'f') from the Spark schema, without
    re-executing the query. Decimals map to 'f' (pandas-side float)."""
    out = {}
    for c, t in sdf.dtypes:
        if t.startswith("decimal"):
            out[c] = "f"
        elif t in _SPARK_KIND:
            out[c] = _SPARK_KIND[t]
    return out


def _duck_kinds(df) -> dict:
    """Column -> numpy dtype.kind from DuckDB's pandas conversion.

    The driver's hasher compares values AFTER pandas/Arrow conversion, so an
    int64 on one side vs float64 on the other (e.g. DuckDB SUM(INTEGER) ->
    HUGEINT -> float64) hash-mismatches even when values are numerically
    equal. String-normalized compares mask that; dtype kinds catch it.
    """
    return {c: df[c].dtype.kind for c in df.columns}


def compare_one(spark, con, sf_dir: str, name: str, fn, sql: str | None):
    """Run one declared query on Spark (and its oracle on DuckDB when given)
    and compare. Returns (ok: bool, message: str)."""
    try:
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        skinds = _spark_kinds(sdf)
    except Exception as e:
        return False, f"{name}: spark error: {e}"
    if sql is None:
        return True, f"{name}: rows={len(srows)} (no oracle — rows-only check)"
    try:
        res = con.execute(sql)
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        dkinds = _duck_kinds(con.execute(sql).df())
    except Exception as e:
        return False, f"{name}: duckdb error: {e}"
    # Dtype-kind parity mirrors the driver's pandas-level hash: flag any
    # int-vs-float divergence (nulls legitimately float-pad BOTH sides, and
    # decimals float on both sides, so only a one-sided drift trips this).
    for c in set(skinds) & set(dkinds):
        a, b = skinds[c], dkinds[c]
        if {a, b} == {"i", "f"}:
            return False, (f"{name}: dtype kind mismatch on '{c}': "
                           f"spark={a} duck={b} (driver hash would differ)")
    sc, sn = normalize(srows, scols)
    dc, dn = normalize(drows, dcols)
    if sc != dc:
        return False, f"{name}: columns differ spark={sc} duck={dc}"
    if len(sn) != len(dn):
        return False, f"{name}: rowcount spark={len(sn)} duck={len(dn)}"
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
        return False, f"{name}: values differ; first diffs: {diffs}"
    return True, f"{name}: rows={len(sn)} cols={len(sc)} MATCH"


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
        ok, msg = compare_one(spark, con, sf_dir, name, fn,
                              oracles.get(name))
        if ok:
            print(f"ok   {msg}")
        else:
            print(f"FAIL {msg}")
            failures += 1
    spark.stop()
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
