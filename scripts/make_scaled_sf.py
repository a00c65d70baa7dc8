"""Derive a K-fold scaled dataset from a driver testdata dir (default:
sf0.1 x10 -> an sf1.0-equivalent) for scaling measurements (VERDICT r04
item 6). The driver's testdata is read-only and tops out at sf0.1; this
replicates it with key offsets so joins, windows, and dedup families keep
their per-copy semantics while total volume grows 10x:

- fact/dim keys are offset by copy * 10^8 per key space, so referential
  integrity holds within each copy and key spaces never collide;
- region/nation stay single-copy (fixed dims, TPC-H style);
- events: ids/users offset, timestamps unchanged -> same windows, 10x
  heavier; per-user session structure replicates exactly;
- documents: every token gets a per-copy suffix (regexp on whitespace), so
  within-copy shingle/near-dup structure is IDENTICAL to the base corpus
  while cross-copy Jaccard collapses to ~0 — without this, 10 identical
  corpora would manufacture quadratic cross-copy duplicate pairs and no
  scaling claim would be meaningful;
- embeddings: per-copy circular dimension shift — an orthogonal transform,
  so within-copy pairwise cosines are exactly preserved while cross-copy
  vectors decorrelate.

Timestamps pass through DuckDB as microseconds; the source's
TIMESTAMP(NANOS) columns are µs-truncated identically to what both query
engines already see, so twin comparisons on the derived dir stay exact.

Usage: python scripts/make_scaled_sf.py [base_dir] [out_dir] [copies]
"""

from __future__ import annotations

import os
import sys

import duckdb

STRIDE = 10 ** 8


def build(base: str, out: str, copies: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def emit(name: str, per_copy_sql: str | None) -> None:
        src = f"'{base}/{name}.parquet'"
        dst = f"{out}/{name}.parquet"
        if per_copy_sql is None:                     # fixed dims: one copy
            con.execute(f"COPY (SELECT * FROM {src}) TO '{dst}' "
                        f"(FORMAT PARQUET)")
        else:
            union = " UNION ALL ".join(
                per_copy_sql.format(i=i, off=i * STRIDE, src=src)
                for i in range(copies))
            con.execute(f"COPY ({union}) TO '{dst}' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"{name}: {n} rows")

    emit("region", None)
    emit("nation", None)
    emit("customer", """
        SELECT c_custkey + {off} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM {src}""")
    emit("supplier", """
        SELECT s_suppkey + {off} AS s_suppkey, s_name, s_nationkey,
               s_acctbal
        FROM {src}""")
    emit("part", """
        SELECT p_partkey + {off} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice
        FROM {src}""")
    emit("orders", """
        SELECT o_orderkey + {off} AS o_orderkey,
               o_custkey + {off} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src}""")
    emit("lineitem", """
        SELECT l_orderkey + {off} AS l_orderkey,
               l_partkey + {off} AS l_partkey,
               l_suppkey + {off} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {src}""")
    emit("events", """
        SELECT event_id + {off} AS event_id, ts,
               user_id + {off} AS user_id, event_type, value, props
        FROM {src}""")
    # copy 0 keeps the base text verbatim; copies >0 suffix every token
    emit("documents", r"""
        SELECT doc_id + {off} AS doc_id,
               CASE WHEN {i} = 0 THEN text
                    ELSE regexp_replace(text, '(\s+)', '~c{i}\1', 'g')
                         || '~c{i}' END AS text,
               lang, source,
               length(CASE WHEN {i} = 0 THEN text
                      ELSE regexp_replace(text, '(\s+)', '~c{i}\1', 'g')
                           || '~c{i}' END) AS n_chars
        FROM {src}""")
    dim = con.execute(
        f"SELECT len(embedding) FROM '{base}/embeddings.parquet' LIMIT 1"
    ).fetchone()[0]
    emit("embeddings", f"""
        SELECT vec_id + {{off}} AS vec_id,
               (CASE WHEN {{i}} = 0 THEN embedding
                     ELSE list_concat(embedding[({{i}} % {dim}) + 1:],
                                      embedding[1:({{i}} % {dim})])
                END)::FLOAT[] AS embedding,
               label
        FROM {{src}}""")


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale/sf1"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    build(base, out, copies)
    print(f"wrote {out} ({copies}x of {base})")


if __name__ == "__main__":
    main()
