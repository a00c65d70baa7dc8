"""Driver-contract query pack for the §2.4–2.6 ETL dataflow operators.

The reference's ETL (assets_generator.py:251-585) runs on OpenAPC CSVs the
driver does not ship, so these gate queries drive the SAME operator
implementations (``openapc_olap_spark.etl.openapc``) over the driver's
TPC-H-ish parquet: columns are renamed/synthesized deterministically from
key columns, the ETL function is applied verbatim, and the DuckDB oracle
replicates the derivation in SQL. This puts E1-E11, E14, E16-E17 and T1-T9 under
the driver's hash-match gate instead of pytest-goldens only.

Float discipline: aggregated doubles rounded to 2dp on both sides; the E8
halving itself is exact decimal half-even on both sides (Spark ``bround`` on
DECIMAL ≡ DuckDB ``round_even`` on DECIMAL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openapc_olap_spark.etl.openapc import (
    halve_2019_euro,
    melt_additional_costs,
    publication_key,
    strip_ror_prefix,
)
from openapc_olap_spark.session import load_tables


# ---------------------------------------------------------------------------
# e01: E1 lookup build + E2 broadcast enrichment join + E3 ROR strip
# ---------------------------------------------------------------------------

def _e01_enrich_ror(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1/E2/E3 (assets_generator.py:704-721,350-353,710-712): build a small
    institution lookup, broadcast-join facts to it, strip the ROR prefix."""
    t = load_tables(spark, sf_dir, ["customer", "nation"])
    inst = t["nation"].select(
        "n_nationkey",
        F.when(F.col("n_nationkey") % 3 == 0,
               F.concat(F.lit("ror:"), F.col("n_name")))
         .otherwise(F.concat(F.lit("https://ror.org/0"), F.col("n_name")))
         .alias("ror_raw"))
    inst = inst.withColumn("ror_id", strip_ror_prefix("ror_raw"))
    enriched = t["customer"].join(
        F.broadcast(inst),
        t["customer"]["c_nationkey"] == inst["n_nationkey"])
    return (enriched.groupBy("ror_id")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.round(F.sum("c_acctbal"), 2).alias("acctbal_sum"))
            .orderBy("ror_id"))


_E01_SQL = """
    WITH inst AS (
      SELECT n_nationkey,
             CASE WHEN n_nationkey % 3 = 0 THEN 'ror:' || n_name
                  ELSE 'https://ror.org/0' || n_name END AS ror_raw
      FROM nation),
    stripped AS (
      SELECT n_nationkey,
             CASE WHEN starts_with(ror_raw, 'https://ror.org/')
                  THEN substring(ror_raw, 17)
                  ELSE 'NA' END AS ror_id
      FROM inst)
    SELECT ror_id, count(*) AS n_customers,
           round(sum(c_acctbal), 2) AS acctbal_sum
    FROM customer JOIN stripped ON c_nationkey = n_nationkey
    GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# e02: E5 publication_key derivation + E6 constant columns
# ---------------------------------------------------------------------------

def _e02_publication_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5/E6 (assets_generator.py:50,534-535,605-614): doi-else-url-else-NULL
    key with scheme strip, plus constant cost_type column."""
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    src = orders.select(
        F.when(F.col("o_orderkey") % 5 == 0, F.lit("NA"))
         .otherwise(F.concat(F.lit("10.1000/"), F.col("o_orderkey")))
         .alias("doi"),
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("NA"))
         .otherwise(F.concat(F.lit("https://example.org/rec/"),
                             F.col("o_orderkey")))
         .alias("url"))
    keyed = src.select(publication_key().alias("publication_key"),
                       F.lit("apc").alias("cost_type"))
    kind = (F.when(F.col("publication_key").isNull(), "missing")
             .when(F.col("publication_key").startswith("10."), "doi")
             .otherwise("url"))
    return (keyed.groupBy(kind.alias("key_kind"), "cost_type")
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .orderBy("key_kind"))


_E02_SQL = """
    WITH src AS (
      SELECT CASE WHEN o_orderkey % 5 = 0 THEN 'NA'
                  ELSE '10.1000/' || o_orderkey END AS doi,
             CASE WHEN o_orderkey % 7 = 0 THEN 'NA'
                  ELSE 'https://example.org/rec/' || o_orderkey END AS url
      FROM orders),
    keyed AS (
      SELECT CASE WHEN doi IS NOT NULL AND doi <> '' AND doi <> 'NA' THEN doi
                  WHEN url IS NOT NULL AND url <> '' AND url <> 'NA'
                    THEN regexp_replace(url, '^https?://', '')
                  ELSE NULL END AS publication_key,
             'apc' AS cost_type
      FROM src)
    SELECT CASE WHEN publication_key IS NULL THEN 'missing'
                WHEN starts_with(publication_key, '10.') THEN 'doi'
                ELSE 'url' END AS key_kind,
           cost_type, count(*) AS n_rows
    FROM keyed GROUP BY 1, 2 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# e03: E8 2019 halving (decimal half-even) + E9 eligibility predicate
# ---------------------------------------------------------------------------

def _e03_deal_halving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E8/E9 (assets_generator.py:42-43,395-398,548-549): conditional 2019
    cost halving with exact decimal banker's rounding, then the strict
    period > start_year eligibility filter."""
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    df = orders.select(
        (F.year("o_orderdate") + F.lit(24)).cast("string").alias("period"),
        F.col("o_totalprice").alias("euro"),
        "o_orderstatus")
    df = halve_2019_euro(df)
    elig = df.filter((F.col("period").cast("int") > 2017)
                     & (F.col("o_orderstatus") == "O"))
    return (elig.groupBy("period")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.round(F.sum("euro"), 2).alias("euro_sum"))
            .orderBy("period"))


_E03_SQL = """
    WITH src AS (
      SELECT CAST(year(o_orderdate) + 24 AS VARCHAR) AS period,
             o_totalprice AS euro, o_orderstatus
      FROM orders),
    halved AS (
      SELECT period, o_orderstatus,
             CASE WHEN period = '2019'
                  THEN CAST(round_even(CAST(euro AS DECIMAL(18,2)) / 2, 2)
                            AS DOUBLE)
                  ELSE euro END AS euro
      FROM src)
    SELECT period, count(*) AS n_items, round(sum(euro), 2) AS euro_sum
    FROM halved
    WHERE CAST(period AS INT) > 2017 AND o_orderstatus = 'O'
    GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# e04: T1 union-by-name + E11 cost-bearing filter
# ---------------------------------------------------------------------------

def _e04_union_combined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1/E11 (assets_generator.py:445-446,529): combined = apc rows ∪ TA
    rows with a non-'NA' string euro, aligned by name with missing columns
    null-filled."""
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    apc = t["orders"].select(
        F.lit("apc").alias("source"),
        F.col("o_totalprice").alias("euro"),
        F.col("o_orderstatus").alias("status"))
    ta = t["lineitem"].select(
        F.lit("ta").alias("source"),
        F.when(F.col("l_linenumber") % 2 == 0, F.lit("NA"))
         .otherwise(F.col("l_extendedprice").cast("string"))
         .alias("euro_s"))
    ta_cost = (ta.filter(F.col("euro_s") != "NA")
               .select("source", F.col("euro_s").cast("double").alias("euro")))
    combined = apc.unionByName(ta_cost, allowMissingColumns=True)
    return (combined.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.round(F.sum("euro"), 2).alias("euro_sum"),
                 F.count("status").alias("n_status"))
            .orderBy("source"))


_E04_SQL = """
    WITH apc AS (
      SELECT 'apc' AS source, o_totalprice AS euro, o_orderstatus AS status
      FROM orders),
    ta AS (
      SELECT 'ta' AS source,
             CASE WHEN l_linenumber % 2 = 0 THEN 'NA'
                  ELSE CAST(l_extendedprice AS VARCHAR) END AS euro_s
      FROM lineitem),
    ta_cost AS (
      SELECT source, CAST(euro_s AS DOUBLE) AS euro, NULL AS status
      FROM ta WHERE euro_s <> 'NA'),
    combined AS (
      SELECT * FROM apc UNION ALL SELECT * FROM ta_cost)
    SELECT source, count(*) AS n_rows, round(sum(euro), 2) AS euro_sum,
           count(status) AS n_status
    FROM combined GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# e05: T3 group-count + T5 left join + zero-fill
# ---------------------------------------------------------------------------

def _e05_coverage_zerofill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3/T5 (assets_generator.py:481-486,493-509): per-key article counts
    left-joined onto the catalog, missing counts zero-filled."""
    t = load_tables(spark, sf_dir, ["part", "lineitem"])
    counts = (t["lineitem"].groupBy("l_partkey")
              .agg(F.count(F.lit(1)).alias("n_articles")))
    coverage = (t["part"].join(
        counts, t["part"]["p_partkey"] == counts["l_partkey"], "left")
        .withColumn("n_articles", F.coalesce("n_articles", F.lit(0))))
    return (coverage.groupBy("p_brand")
            .agg(F.sum("n_articles").alias("articles_sum"),
                 F.count(F.lit(1)).alias("n_journals"),
                 F.sum(F.when(F.col("n_articles") == 0, 1).otherwise(0))
                  .alias("n_zero_fill"))
            .orderBy("p_brand"))


_E05_SQL = """
    WITH counts AS (
      SELECT l_partkey, count(*) AS n_articles FROM lineitem GROUP BY 1),
    coverage AS (
      SELECT p_brand, coalesce(n_articles, 0) AS n_articles
      FROM part LEFT JOIN counts ON p_partkey = l_partkey)
    SELECT p_brand, sum(n_articles)::BIGINT AS articles_sum,
           count(*) AS n_journals,
           sum(CASE WHEN n_articles = 0 THEN 1 ELSE 0 END)::BIGINT AS n_zero_fill
    FROM coverage GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# e06: T7/T8 existence-based prune via semi-join
# ---------------------------------------------------------------------------

def _e06_prune_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7/T8 (assets_generator.py:644-662): keep a group only if it has at
    least one qualifying row (the reference's for/else prune), as a
    left-semi join."""
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    has_open = (t["orders"].filter(F.col("o_orderstatus") != "F")
                .select("o_custkey"))
    kept = t["customer"].join(
        has_open, t["customer"]["c_custkey"] == has_open["o_custkey"],
        "left_semi")
    return (kept.groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_kept"))
            .orderBy("c_mktsegment"))


_E06_SQL = """
    SELECT c_mktsegment, count(*) AS n_kept
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus <> 'F')
    GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# e07: T9 fixed-order priority assignment
# ---------------------------------------------------------------------------

_PRIORITY_ORDER = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                   "5-LOW"]


def _e07_priority_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9 (assets_generator.py:40,697-702): rank each group's available
    types by a fixed priority list (array_position), keep the best."""
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    rank = F.array_position(
        F.array(*[F.lit(p) for p in _PRIORITY_ORDER]), F.col("o_orderpriority"))
    best = (orders.groupBy("o_custkey")
            .agg(F.min(rank).alias("best_priority")))
    return (best.groupBy("best_priority")
            .agg(F.count(F.lit(1)).alias("n_customers"))
            .orderBy("best_priority"))


_E07_SQL = """
    WITH ranked AS (
      SELECT o_custkey,
             min(CASE o_orderpriority
                   WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
                   WHEN '3-MEDIUM' THEN 3 WHEN '4-NOT SPECIFIED' THEN 4
                   WHEN '5-LOW' THEN 5 ELSE 0 END) AS best_priority
      FROM orders GROUP BY 1)
    SELECT best_priority, count(*) AS n_customers
    FROM ranked GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# e08: E16 wide→long melt + E17 per-key cost explode + union
# ---------------------------------------------------------------------------

def _e08_melt_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E16/E17 (assets_generator.py:322-339,538-546): unpivot wide cost
    columns (non-numeric cells dropped per-cell), join the long costs back
    to the fact rows (1:N explode), union with the originals."""
    t = load_tables(spark, sf_dir, ["part", "orders"])
    wide = t["part"].select(
        F.col("p_partkey").cast("string").alias("doi"),
        F.col("p_size").cast("string").alias("colocation"),
        F.col("p_retailprice").cast("string").alias("page"),
        F.col("p_type").alias("submission"))  # never numeric -> dropped
    costs = melt_additional_costs(wide)
    apc = t["orders"].select(
        F.col("o_orderkey").cast("string").alias("doi"),
        F.lit("apc").alias("cost_type"),
        F.col("o_totalprice").alias("euro"))
    exploded = (apc.select("doi").join(costs, "doi")
                .select("doi", "cost_type", "euro"))
    ac = apc.unionByName(exploded)
    return (ac.groupBy("cost_type")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.round(F.sum("euro"), 2).alias("euro_sum"))
            .orderBy("cost_type"))


_E08_SQL = """
    WITH wide AS (
      SELECT CAST(p_partkey AS VARCHAR) AS doi,
             CAST(p_size AS VARCHAR) AS colocation,
             CAST(p_retailprice AS VARCHAR) AS page,
             p_type AS submission
      FROM part),
    long AS (
      SELECT doi, cost_type, TRY_CAST(cost_value AS DOUBLE) AS euro
      FROM wide
      UNPIVOT (cost_value FOR cost_type IN (colocation, page, submission))),
    costs AS (SELECT * FROM long WHERE euro IS NOT NULL),
    apc AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS doi, 'apc' AS cost_type,
             o_totalprice AS euro
      FROM orders),
    exploded AS (
      SELECT a.doi, c.cost_type, c.euro
      FROM (SELECT doi FROM apc) a JOIN costs c ON a.doi = c.doi),
    ac AS (SELECT * FROM apc UNION ALL SELECT * FROM exploded)
    SELECT cost_type, count(*) AS n_rows, round(sum(euro), 2) AS euro_sum
    FROM ac GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# e09: E14 DOI→journal-id prefix dispatch + ISSN-cache fallback (T4-adjacent)
# ---------------------------------------------------------------------------

def _e09_journal_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E14 (springer_compact_coverage.py:295-339): regular-prefix slice
    extraction (doi[9:14] zero-stripped), hardcoded irregular ids, and the
    cache-only families resolved through the ISSN-keyed broadcast join —
    driven over DOIs synthesized across all four dispatch families."""
    from openapc_olap_spark.etl.coverage import with_journal_id
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    k = F.col("o_orderkey")
    doi = (F.when(k % 5 == 0,
                  F.concat(F.lit("10.1007/s"),
                           F.lpad((k % 97).cast("string"), 5, "0"),
                           F.lit(".x")))
           .when(k % 5 == 1,
                 F.concat(F.lit("10.1038/s"),
                          F.lpad((k % 89).cast("string"), 5, "0")))
           .when(k % 5 == 2, F.concat(F.lit("10.14283/j."), k.cast("string")))
           .when(k % 5 == 3, F.concat(F.lit("10.1140/epjc."), k.cast("string")))
           .otherwise(F.concat(F.lit("10.9999/other."), k.cast("string"))))
    src = orders.select(
        doi.alias("doi"),
        F.concat(F.lit("issn-"), (k % 7).cast("string")).alias("issn"))
    cache = spark.createDataFrame(
        [(f"issn-{i}", str(40000 + i)) for i in range(5)],
        "issn string, journal_id string")
    out = with_journal_id(src, cache)
    return (out.groupBy("journal_id")
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .orderBy("journal_id"))


_E09_SQL = """
    WITH src AS (
      SELECT CASE
               WHEN o_orderkey % 5 = 0 THEN
                 '10.1007/s' || lpad((o_orderkey % 97)::VARCHAR, 5, '0') || '.x'
               WHEN o_orderkey % 5 = 1 THEN
                 '10.1038/s' || lpad((o_orderkey % 89)::VARCHAR, 5, '0')
               WHEN o_orderkey % 5 = 2 THEN '10.14283/j.' || o_orderkey::VARCHAR
               WHEN o_orderkey % 5 = 3 THEN '10.1140/epjc.' || o_orderkey::VARCHAR
               ELSE '10.9999/other.' || o_orderkey::VARCHAR
             END AS doi,
             'issn-' || (o_orderkey % 7)::VARCHAR AS issn
      FROM orders),
    cache(issn, journal_id) AS (
      VALUES ('issn-0', '40000'), ('issn-1', '40001'), ('issn-2', '40002'),
             ('issn-3', '40003'), ('issn-4', '40004')),
    loc AS (
      SELECT issn,
             CASE
               WHEN starts_with(doi, '10.1007/s') OR starts_with(doi, '10.3758/s')
                 OR starts_with(doi, '10.1245/s') OR starts_with(doi, '10.1617/s')
                 OR starts_with(doi, '10.1186/s') OR starts_with(doi, '10.1208/s')
                 OR starts_with(doi, '10.1365/s') OR starts_with(doi, '10.1038/s')
                 OR starts_with(doi, '10.1057/s') OR starts_with(doi, '10.2478/s')
                 OR starts_with(doi, '10.1557/s')
                 THEN regexp_replace(substring(doi, 10, 5), '^0+', '')
               WHEN starts_with(doi, '10.14283') THEN '42415'
               WHEN starts_with(doi, '10.1631') THEN '11582'
               WHEN starts_with(doi, '10.3938/jkps') THEN '40042'
               ELSE NULL
             END AS jid
      FROM src),
    j AS (
      SELECT coalesce(l.jid, c.journal_id) AS journal_id
      FROM loc l LEFT JOIN cache c ON l.issn = c.issn)
    SELECT journal_id, count(*) AS n_rows FROM j GROUP BY 1 ORDER BY 1
"""


QUERIES = {
    "e01_enrich_ror": _e01_enrich_ror,
    "e02_publication_key": _e02_publication_key,
    "e03_deal_halving": _e03_deal_halving,
    "e04_union_combined": _e04_union_combined,
    "e05_coverage_zerofill": _e05_coverage_zerofill,
    "e06_prune_semi": _e06_prune_semi,
    "e07_priority_rank": _e07_priority_rank,
    "e08_melt_explode": _e08_melt_explode,
    "e09_journal_id": _e09_journal_id,
}

ORACLES = {
    "e01_enrich_ror": _E01_SQL,
    "e02_publication_key": _E02_SQL,
    "e03_deal_halving": _E03_SQL,
    "e04_union_combined": _E04_SQL,
    "e05_coverage_zerofill": _E05_SQL,
    "e06_prune_semi": _E06_SQL,
    "e07_priority_rank": _E07_SQL,
    "e08_melt_explode": _E08_SQL,
    "e09_journal_id": _E09_SQL,
}
