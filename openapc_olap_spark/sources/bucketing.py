"""Bucketed-table layout for co-located joins/aggregations (SURVEY.md §4).

At 100 TB the fact-fact join (e.g. orders x lineitem on orderkey) is the
single most expensive shuffle in the pipeline. Bucketing pre-shuffles ONCE
at write time: both tables hash-partitioned into the same number of buckets
on the join key, so every subsequent join or groupBy on that key reads
bucket i against bucket i with NO exchange — the cost moves from every
query to one write.

Usage:

    write_bucketed(orders,   "orders_b",   ["o_orderkey"], 64, path=p1)
    write_bucketed(lineitem, "lineitem_b", ["l_orderkey"], 64, path=p2)
    spark.table("orders_b").join(spark.table("lineitem_b"),
                                 F.col("o_orderkey") == F.col("l_orderkey"))
    # plan: two bucketed scans -> SortMergeJoin, zero Exchange

Rules that make it work (asserted by tests/test_plans.py):
- both sides bucketed on the join key with the SAME bucket count
  (different counts: Spark re-shuffles the smaller side only);
- ``spark.sql.sources.bucketing.enabled`` on (default);
- sortBy on the bucket key additionally removes the per-bucket Sort from
  the merge join.

Bucket count sizing: target ~128-256 MB of post-compression data per bucket
per partition at the final scale — for 100 TB of lineitem, thousands of
buckets; for local tests, 4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, keys: list[str],
                   num_buckets: int, path: str | None = None,
                   sort: bool = True, mode: str = "overwrite",
                   fmt: str = "parquet") -> None:
    """Write ``df`` as a bucketed table registered in the session catalog.

    ``path`` makes it an external table (data at path, metadata in
    catalog) — pass one in tests to keep data out of spark-warehouse.
    ``sort`` co-sorts each bucket by the bucket keys so merge joins skip
    the per-bucket sort.
    """
    w = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucket_spec(spark: SparkSession, table: str) -> tuple[list[str], int] | None:
    """(bucket columns, bucket count) of a catalog table, or None if the
    table isn't bucketed. Lets planners check join co-location up front."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    cols: list[str] | None = None
    n: int | None = None
    for r in rows:
        if r["col_name"] == "Num Buckets":
            n = int(r["data_type"])
        elif r["col_name"] == "Bucket Columns":
            cols = [c.strip(" `") for c in
                    r["data_type"].strip("[]").split(",")]
    if cols is None or n is None:
        return None
    return cols, n


def colocated(spark: SparkSession, left: str, right: str,
              left_key: str, right_key: str) -> bool:
    """True if a join of ``left.left_key == right.right_key`` will be
    shuffle-free: both bucketed on exactly those keys with equal counts."""
    ls, rs = bucket_spec(spark, left), bucket_spec(spark, right)
    return (ls is not None and rs is not None
            and ls[0] == [left_key] and rs[0] == [right_key]
            and ls[1] == rs[1])
