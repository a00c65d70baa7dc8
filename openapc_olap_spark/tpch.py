"""Driver-testdata (TPC-H-ish) cube bindings for the engine.

The driver's correctness gate runs queries against the synthetic tables in
``/root/testdata/sf*/`` (TESTDATA.md). This module registers those tables as
engine cubes so the gate exercises the real query layer (cuts -> QuerySpec ->
compiler), exactly the way the OpenAPC cubes are served (SURVEY.md §2.2).

Timestamps: the raw parquet carries nanosecond timestamps; derived ``*_v``
views expose ISO-8601 string forms (``o_orderdate_s``, date-only) so query
results hash identically across Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from openapc_olap_spark.model import Aggregate, Cube, CubeRegistry, standard_money_aggregates
from openapc_olap_spark.query import QueryEngine
from openapc_olap_spark.session import load_tables


def build_registry() -> CubeRegistry:
    reg = CubeRegistry()
    reg.register(Cube(
        name="lineitem", table="lineitem_v",
        dimensions=("l_returnflag", "l_linestatus", "l_orderkey", "l_partkey",
                    "l_suppkey", "l_shipdate_s"),
        measures=("l_extendedprice", "l_quantity", "l_discount"),
        aggregates=standard_money_aggregates("l_extendedprice", "price")
        + (Aggregate("qty_sum", "l_quantity", "sum"),
           Aggregate("parts_distinct", "l_partkey", "count_distinct")),
    ))
    reg.register(Cube(
        name="orders", table="orders_v",
        dimensions=("o_orderstatus", "o_orderpriority", "o_custkey",
                    "o_orderkey", "o_orderdate_s"),
        measures=("o_totalprice",),
        aggregates=standard_money_aggregates("o_totalprice", "order"),
        fact_id="o_orderkey",
    ))
    reg.register(Cube(
        name="customer", table="customer",
        dimensions=("c_mktsegment", "c_nationkey", "c_custkey"),
        measures=("c_acctbal",),
        aggregates=standard_money_aggregates("c_acctbal", "bal"),
        fact_id="c_custkey",
    ))
    reg.register(Cube(
        name="part", table="part",
        dimensions=("p_brand", "p_type", "p_size", "p_partkey"),
        measures=("p_retailprice",),
        aggregates=(Aggregate("retail_sum", "p_retailprice", "sum"),
                    Aggregate("num_items", "p_retailprice", "count"),
                    Aggregate("retail_avg", "p_retailprice", "avg")),
        fact_id="p_partkey",
    ))
    return reg


# Single-slot memo: the driver/bench call prepare() once per query; re-listing
# and re-registering 10 parquet tables added ~0.6s to EVERY query. Keyed by
# (session, sf_dir) and invalidated on change because views are session-global.
_CACHE: dict = {}


def prepare(spark: SparkSession, sf_dir: str) -> QueryEngine:
    """Load the driver tables, create the string-dated views, return an
    engine. Memoized per (session, sf_dir)."""
    key = (id(spark), sf_dir)
    if _CACHE.get("key") == key:
        return _CACHE["engine"]
    engine = _prepare(spark, sf_dir)
    _CACHE["key"] = key
    _CACHE["engine"] = engine
    return engine


def _prepare(spark: SparkSession, sf_dir: str) -> QueryEngine:
    tables = load_tables(spark, sf_dir)
    if "orders" in tables:
        tables["orders"].withColumn(
            "o_orderdate_s", F.date_format("o_orderdate", "yyyy-MM-dd")
        ).drop("o_orderdate").createOrReplaceTempView("orders_v")
    if "lineitem" in tables:
        tables["lineitem"].withColumn(
            "l_shipdate_s", F.date_format("l_shipdate", "yyyy-MM-dd")
        ).drop("l_shipdate").createOrReplaceTempView("lineitem_v")
    return QueryEngine(spark, build_registry())
