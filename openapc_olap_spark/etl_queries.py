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

import os

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


# ---------------------------------------------------------------------------
# e10: E4 colon scrub (title columns lose ':' so cut URLs stay parseable)
# ---------------------------------------------------------------------------

def _e10_colon_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 (assets_generator.py:347,429-431,518-520): strip colons from a
    title column — driven through ``scrub_colons`` verbatim."""
    from openapc_olap_spark.etl.openapc import scrub_colons
    part = load_tables(spark, sf_dir, ["part"])["part"]
    src = (part.filter(F.col("p_partkey") % 41 == 0)
           .select(F.col("p_partkey").alias("rec_id"),
                   F.concat(F.lit("Journal: "), F.col("p_name"),
                            F.lit(": "), F.col("p_brand"))
                   .alias("journal_full_title")))
    return scrub_colons(src, "journal_full_title").orderBy("rec_id")


_E10_SQL = """
    SELECT p_partkey AS rec_id,
           replace('Journal: ' || p_name || ': ' || p_brand, ':', '')
             AS journal_full_title
    FROM part WHERE p_partkey % 41 = 0 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# e11: E13 doi_lookup projection (drop NA DOIs, facts-URL concat, union)
# ---------------------------------------------------------------------------

def _e11_doi_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E13 (assets_generator.py:263-271,593-603): the DOI->record index
    projection — driven through ``doi_lookup_select`` over two synthesized
    enriched sources, unioned exactly like ``doi_lookup_cube``."""
    from openapc_olap_spark.etl.openapc import doi_lookup_select
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    ck = F.col("c_custkey")
    apc_like = (t["customer"].filter(ck % 29 == 0)
                .select(
                    F.concat(F.lit("inst-"), F.col("c_nationkey"))
                     .alias("institution"),
                    F.concat(F.lit("ror"), F.col("c_nationkey"))
                     .alias("_ror_id"),
                    F.concat(F.lit("Institution "), F.col("c_nationkey"))
                     .alias("_full_name"),
                    F.concat((ck % 3000).cast("string"), F.lit(".50"))
                     .alias("euro"),
                    (ck % 6 + 2015).cast("string").alias("period"),
                    F.when(ck % 6 == 0, F.lit("NA"))
                     .otherwise(F.concat(F.lit("10.1002/apc."),
                                         ck.cast("string"))).alias("doi")))
    ok = F.col("o_orderkey")
    bpc_like = (t["orders"].filter(ok % 127 == 0)
                .select(
                    F.concat(F.lit("inst-"), (ok % 25)).alias("institution"),
                    F.concat(F.lit("ror"), (ok % 25)).alias("_ror_id"),
                    F.concat(F.lit("Institution "), (ok % 25))
                     .alias("_full_name"),
                    F.concat((ok % 4000).cast("string"), F.lit(".00"))
                     .alias("euro"),
                    (ok % 5 + 2016).cast("string").alias("period"),
                    F.when(ok % 9 == 0, F.lit("NA"))
                     .otherwise(F.concat(F.lit("10.1002/bpc."),
                                         ok.cast("string"))).alias("doi")))
    out = (doi_lookup_select(apc_like, "openapc")
           .unionByName(doi_lookup_select(bpc_like, "bpc")))
    return out.orderBy("url")


_E11_SQL = """
    WITH apc_like AS (
      SELECT 'inst-' || c_nationkey AS institution,
             'ror' || c_nationkey AS institution_ror,
             'Institution ' || c_nationkey AS institution_full_name,
             (c_custkey % 3000)::VARCHAR || '.50' AS euro,
             (c_custkey % 6 + 2015)::VARCHAR AS period,
             CASE WHEN c_custkey % 6 = 0 THEN 'NA'
                  ELSE '10.1002/apc.' || c_custkey::VARCHAR END AS doi
      FROM customer WHERE c_custkey % 29 = 0),
    bpc_like AS (
      SELECT 'inst-' || (o_orderkey % 25) AS institution,
             'ror' || (o_orderkey % 25) AS institution_ror,
             'Institution ' || (o_orderkey % 25) AS institution_full_name,
             (o_orderkey % 4000)::VARCHAR || '.00' AS euro,
             (o_orderkey % 5 + 2016)::VARCHAR AS period,
             CASE WHEN o_orderkey % 9 = 0 THEN 'NA'
                  ELSE '10.1002/bpc.' || o_orderkey::VARCHAR END AS doi
      FROM orders WHERE o_orderkey % 127 = 0),
    u AS (
      SELECT institution, institution_ror, institution_full_name, euro,
             period, doi,
             'https://olap.openapc.net/cube/openapc/facts?cut=doi:' || doi
               AS url
      FROM apc_like WHERE doi <> 'NA'
      UNION ALL
      SELECT institution, institution_ror, institution_full_name, euro,
             period, doi,
             'https://olap.openapc.net/cube/bpc/facts?cut=doi:' || doi AS url
      FROM bpc_like WHERE doi <> 'NA')
    SELECT * FROM u ORDER BY url
"""


# ---------------------------------------------------------------------------
# e12: T10 distinct-institution report (sorted collect_set per cube type)
# ---------------------------------------------------------------------------

def _e12_institution_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T10 (assets_generator.py:664-676): sorted distinct institutions per
    cube type — driven through ``institutions_report``; the array is
    emitted '|'-joined so both engines hash a plain string."""
    from openapc_olap_spark.etl.openapc import institutions_report
    cust = load_tables(spark, sf_dir, ["customer"])["customer"]
    inst = F.concat(F.lit("inst-"), F.col("c_nationkey")).alias("institution")
    frames = {
        "apc_ac": cust.filter(F.col("c_mktsegment") == "BUILDING")
                      .select(inst),
        "bpc": cust.filter(F.col("c_mktsegment") == "MACHINERY")
                   .select(inst),
        "ta": cust.filter(F.col("c_mktsegment") == "AUTOMOBILE")
                  .filter(F.col("c_nationkey") % 2 == 0).select(inst),
    }
    out = institutions_report(frames)
    return (out.select("cube_type",
                       F.concat_ws("|", "institutions")
                        .alias("institutions_list"),
                       F.size("institutions").alias("n_institutions"))
            .orderBy("cube_type"))


_E12_SQL = """
    WITH u AS (
      SELECT 'apc_ac' AS cube_type, 'inst-' || c_nationkey AS institution
      FROM customer WHERE c_mktsegment = 'BUILDING'
      UNION ALL
      SELECT 'bpc', 'inst-' || c_nationkey
      FROM customer WHERE c_mktsegment = 'MACHINERY'
      UNION ALL
      SELECT 'ta', 'inst-' || c_nationkey
      FROM customer WHERE c_mktsegment = 'AUTOMOBILE' AND c_nationkey % 2 = 0)
    SELECT cube_type,
           array_to_string(list_sort(list(DISTINCT institution)), '|')
             AS institutions_list,
           len(list(DISTINCT institution)) AS n_institutions
    FROM u GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# e13: T11 additional-cost institutions (broadcast left-semi join)
# ---------------------------------------------------------------------------

def _e13_ac_institutions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T11 (assets_generator.py:723-736): institutions whose facts carry a
    DOI present in the additional-costs table — driven through
    ``institutions_with_additional_costs`` (broadcast semi-join)."""
    from openapc_olap_spark.etl.openapc import (
        institutions_with_additional_costs,
    )
    t = load_tables(spark, sf_dir, ["customer", "part"])
    facts = t["customer"].select(
        F.concat(F.lit("inst-"), F.col("c_nationkey")).alias("institution"),
        F.concat(F.lit("10.1002/"), (F.col("c_custkey") % 500)
                 .cast("string")).alias("doi"))
    costs = t["part"].filter(F.col("p_partkey") % 11 == 0).select(
        F.concat(F.lit("10.1002/"), (F.col("p_partkey") % 120)
                 .cast("string")).alias("doi"),
        F.lit("colorpage").alias("cost_type"),
        F.lit(10.0).alias("euro"))
    return (institutions_with_additional_costs(facts, costs)
            .orderBy("institution"))


_E13_SQL = """
    WITH facts AS (
      SELECT 'inst-' || c_nationkey AS institution,
             '10.1002/' || (c_custkey % 500)::VARCHAR AS doi
      FROM customer),
    costs AS (
      SELECT DISTINCT '10.1002/' || (p_partkey % 120)::VARCHAR AS doi
      FROM part WHERE p_partkey % 11 = 0)
    SELECT DISTINCT institution FROM facts
    WHERE doi IN (SELECT doi FROM costs)
    ORDER BY 1
"""


# ---------------------------------------------------------------------------
# e14: T12+T13 annual CSV exports -> last-wins pubdates map (S1/S7 in-gate:
# the CSVs are written by the Spark CSV sink and read back by the multi-file
# CSV scan before the map is built)
# ---------------------------------------------------------------------------

def _e14_annual_pubdates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T12/T13 (springer_compact_coverage.py:247-293): three per-year
    SpringerLink CSV exports are written (S7 sink), re-read as one frame
    (T12 multi-file scan), and reduced to the DOI->year map with
    deterministic last-wins on the explicit export sequence (T13,
    ``build_pubdates_map`` with ``seq_col`` — the 100 TB-safe contract;
    "file order" is not something a distributed scan preserves)."""
    import shutil

    from openapc_olap_spark.etl.coverage import (
        build_pubdates_map, read_annual_csvs,
    )
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    k = F.col("o_orderkey")
    export = orders.select(
        F.concat(F.lit("10.1007/s"), (k % 300).cast("string"))
         .alias("Item DOI"),
        (2015 + k % 8).cast("string").alias("Publication Year"),
        k.alias("export_seq"),
        (k % 3).alias("__file"))
    import tempfile
    base = f"{tempfile.gettempdir()}/openapc_gate_tmp/e14_annual"
    shutil.rmtree(base, ignore_errors=True)
    paths = []
    for part_no in range(3):
        p = f"{base}/export_{part_no}"
        (export.filter(F.col("__file") == part_no).drop("__file")
         .write.mode("overwrite").option("header", True).csv(p))
        paths.append(p)
    annual = read_annual_csvs(spark, paths)
    annual = annual.withColumn("export_seq",
                               F.col("export_seq").cast("long"))
    return (build_pubdates_map(annual, seq_col="export_seq")
            .orderBy("doi"))


_E14_SQL = """
    WITH export AS (
      SELECT '10.1007/s' || (o_orderkey % 300)::VARCHAR AS doi,
             (2015 + o_orderkey % 8)::VARCHAR AS year,
             o_orderkey AS seq
      FROM orders)
    SELECT doi, arg_max(year, seq) AS cached_pub_year
    FROM export GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# e15: T14 hybrid-journal catalog filter
# ---------------------------------------------------------------------------

def _e15_hybrid_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T14 (springer_compact_coverage.py:85-99): keep Open-Choice hybrid
    journals from a Springer catalog export — driven through
    ``hybrid_journals``."""
    from openapc_olap_spark.etl.coverage import hybrid_journals
    part = load_tables(spark, sf_dir, ["part"])["part"]
    catalog = part.select(
        F.col("p_name").alias("Title"),
        F.col("p_brand").alias("imprint"),
        F.when(F.col("p_partkey") % 3 == 0, F.lit("Hybrid (Open Choice)"))
         .when(F.col("p_partkey") % 3 == 1, F.lit("Fully Open Access"))
         .otherwise(F.lit("Subscription")).alias("Open Access Option"))
    return (hybrid_journals(catalog)
            .groupBy("imprint")
            .agg(F.count(F.lit(1)).alias("n_hybrid"))
            .orderBy("imprint"))


_E15_SQL = """
    SELECT p_brand AS imprint, count(*) AS n_hybrid
    FROM part
    WHERE p_partkey % 3 = 0
    GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# e16: springer_compact_coverage end-to-end (E12 filter + E14 extraction +
# T4 pub-year coalesce + T3 counts + T5 zero-filled coverage join)
# ---------------------------------------------------------------------------

def _e16_springer_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full coverage-cube build (springer_compact_coverage.py:150-239 /
    assets_generator.py:471-509) driven through
    ``springer_compact_coverage_cube`` with synthesized TA facts, coverage
    stats, and pubdate cache; output aggregated per period to stay under
    the row cap (the per-cell arithmetic is gated by e05)."""
    from openapc_olap_spark.etl.coverage import springer_compact_coverage_cube
    t = load_tables(spark, sf_dir, ["orders", "part"])
    k = F.col("o_orderkey")
    jid = (k % 120 + 1).cast("string")
    ta = t["orders"].select(
        F.when(k % 3 == 0, F.lit("Springer Nature"))
         .otherwise(F.lit("Wiley-Blackwell")).alias("publisher"),
        F.concat(F.lit("10.1007/s"), F.lpad(jid, 5, "0"), F.lit(".x"))
         .alias("doi"),
        (2016 + k % 4).cast("string").alias("period"),
        F.lit("issn-x").alias("issn"))
    pubdates = (t["orders"].filter(k % 7 == 0)
                .select(jid.alias("journal_id"),
                        F.concat(F.lit("10.1007/s"), F.lpad(jid, 5, "0"),
                                 F.lit(".x")).alias("doi"),
                        (2014 + k % 3).cast("string")
                        .alias("cached_pub_year"))
                .distinct())
    pk = F.col("p_partkey")
    coverage = (t["part"].filter(pk % 13 == 0)
                .select((pk % 150 + 1).cast("string").alias("journal_id"),
                        (2014 + pk % 6).cast("string").alias("period"))
                .distinct()
                .withColumn("journal_full_title",
                            F.concat(F.lit("Journal "), F.col("journal_id")))
                .withColumn("num_journal_total_articles",
                            (F.col("journal_id").cast("int") % 50 + 10)
                            .cast("double"))
                .withColumn("num_journal_oa_articles",
                            (F.col("journal_id").cast("int") % 10)
                            .cast("double"))
                .select("journal_id", "journal_full_title", "period",
                        "num_journal_total_articles",
                        "num_journal_oa_articles"))
    cube = springer_compact_coverage_cube(ta, coverage, pubdates)
    return (cube.groupBy("period")
            .agg(F.count(F.lit(1)).alias("n_journal_years"),
                 F.round(F.sum("num_springer_compact_articles"), 2)
                  .alias("compact_sum"),
                 F.round(F.sum("num_journal_total_articles"), 2)
                  .alias("total_sum"),
                 F.round(F.sum("num_journal_oa_articles"), 2)
                  .alias("oa_sum"))
            .orderBy("period"))


_E16_SQL = """
    WITH ta AS (
      SELECT CASE WHEN o_orderkey % 3 = 0 THEN 'Springer Nature'
                  ELSE 'Wiley-Blackwell' END AS publisher,
             (o_orderkey % 120 + 1)::VARCHAR AS jid,
             '10.1007/s' || lpad((o_orderkey % 120 + 1)::VARCHAR, 5, '0')
               || '.x' AS doi,
             (2016 + o_orderkey % 4)::VARCHAR AS period
      FROM orders),
    pubdates AS (
      SELECT DISTINCT (o_orderkey % 120 + 1)::VARCHAR AS journal_id,
             '10.1007/s' || lpad((o_orderkey % 120 + 1)::VARCHAR, 5, '0')
               || '.x' AS doi,
             (2014 + o_orderkey % 3)::VARCHAR AS cached_pub_year
      FROM orders WHERE o_orderkey % 7 = 0),
    coverage AS (
      SELECT journal_id, 'Journal ' || journal_id AS journal_full_title,
             period,
             (journal_id::INT % 50 + 10)::DOUBLE
               AS num_journal_total_articles,
             (journal_id::INT % 10)::DOUBLE AS num_journal_oa_articles
      FROM (SELECT DISTINCT (p_partkey % 150 + 1)::VARCHAR AS journal_id,
                   (2014 + p_partkey % 6)::VARCHAR AS period
            FROM part WHERE p_partkey % 13 = 0)),
    springer AS (
      SELECT regexp_replace(substring(doi, 10, 5), '^0+', '') AS journal_id,
             doi, period
      FROM ta WHERE publisher = 'Springer Nature'),
    resolved AS (
      SELECT s.journal_id,
             coalesce(p.cached_pub_year, s.period) AS pub_year
      FROM springer s
      LEFT JOIN pubdates p
        ON s.journal_id = p.journal_id AND s.doi = p.doi),
    counts AS (
      SELECT journal_id, pub_year AS period,
             count(*)::DOUBLE AS num_springer_compact_articles
      FROM resolved GROUP BY 1, 2),
    cube AS (
      SELECT c.period,
             coalesce(n.num_springer_compact_articles, 0.0)
               AS num_springer_compact_articles,
             c.num_journal_total_articles, c.num_journal_oa_articles
      FROM coverage c
      LEFT JOIN counts n
        ON c.journal_id = n.journal_id AND c.period = n.period)
    SELECT period, count(*) AS n_journal_years,
           round(sum(num_springer_compact_articles), 2) AS compact_sum,
           round(sum(num_journal_total_articles), 2) AS total_sum,
           round(sum(num_journal_oa_articles), 2) AS oa_sum
    FROM cube GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# e17: T15 incremental cache upsert (per-key last-wins merge)
# ---------------------------------------------------------------------------

def _e17_cache_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T15 (springer_compact_coverage.py:52-66 full-rewrite cache, here the
    scale shape): merge an update batch into a stored cache table with
    per-key last-wins on the explicit sequence — driven END TO END through
    the transactional store (sources/txn.py, VERDICT r09 #5): the existing
    cache is snapshot v0 of a fp-bucketed TxnTable, the update batch lands
    as a partition-overwrite upsert (only touched buckets rewritten,
    manifest-swap commit), and the returned frame is the table's
    post-upsert READ — storage round-trip, merge semantics, and commit
    protocol all sit under the oracle hash. Seq values are unique per key
    by construction so the oracle's arg_max is deterministic."""
    import shutil
    import tempfile

    from openapc_olap_spark.sources import txn
    t = load_tables(spark, sf_dir, ["part", "orders"])
    existing = t["part"].select(
        F.concat(F.lit("10.1/"), (F.col("p_partkey") % 200).cast("string"))
         .alias("doi"),
        F.col("p_partkey").alias("seq"),
        (2010 + F.col("p_partkey") % 6).cast("string").alias("year"))
    updates = (t["orders"].filter(F.col("o_orderkey") % 9 == 0)
               .select(
                   F.concat(F.lit("10.1/"),
                            (F.col("o_orderkey") % 250).cast("string"))
                    .alias("doi"),
                   (F.lit(100000) + F.col("o_orderkey")).alias("seq"),
                   (2016 + F.col("o_orderkey") % 5).cast("string")
                    .alias("year")))
    base = (f"{tempfile.gettempdir()}/openapc_gate_tmp/"
            f"e17_txn_{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(base, ignore_errors=True)
    table = txn.TxnTable.create(
        spark, base, txn.add_bucket(existing, ["doi"], 8), "bucket",
        meta={"n_buckets": 8})
    table.upsert(txn.add_bucket(updates, ["doi"], 8), ["doi"], "seq")
    return table.read().drop("bucket").orderBy("doi")


_E17_MEMO: dict = {}


def _e17_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-path bench twin of e17 (the VERDICT r09 #1 split): a
    cache refresh's RECURRING cost is one partition-overwrite upsert +
    snapshot read against an EXISTING store. The v0 bulk load is setup —
    created once per session/sf and reused across bench runs (last-wins
    re-application of the same batch is value-idempotent; only the
    version advances). Returns the identical frame to the certifying
    gate."""
    import shutil
    import tempfile

    from openapc_olap_spark.operators._memo import memoized
    from openapc_olap_spark.sources import txn

    def build():
        t = load_tables(spark, sf_dir, ["part", "orders"])
        existing = t["part"].select(
            F.concat(F.lit("10.1/"),
                     (F.col("p_partkey") % 200).cast("string"))
             .alias("doi"),
            F.col("p_partkey").alias("seq"),
            (2010 + F.col("p_partkey") % 6).cast("string").alias("year"))
        updates = (t["orders"].filter(F.col("o_orderkey") % 9 == 0)
                   .select(
                       F.concat(F.lit("10.1/"),
                                (F.col("o_orderkey") % 250).cast("string"))
                        .alias("doi"),
                       (F.lit(100000) + F.col("o_orderkey")).alias("seq"),
                       (2016 + F.col("o_orderkey") % 5).cast("string")
                        .alias("year")))
        base = (f"{tempfile.gettempdir()}/openapc_gate_tmp/"
                f"e17_twin_{os.path.basename(sf_dir.rstrip('/'))}")
        shutil.rmtree(base, ignore_errors=True)
        table = txn.TxnTable.create(
            spark, base, txn.add_bucket(existing, ["doi"], 8), "bucket",
            meta={"n_buckets": 8})
        return table, txn.add_bucket(updates, ["doi"], 8)

    table, up = memoized(_E17_MEMO, ("e17_store", sf_dir), build)
    table.upsert(up, ["doi"], "seq")
    return table.read().drop("bucket").orderBy("doi")


_E17_SQL = """
    WITH existing AS (
      SELECT '10.1/' || (p_partkey % 200)::VARCHAR AS doi,
             p_partkey AS seq, (2010 + p_partkey % 6)::VARCHAR AS year
      FROM part),
    updates AS (
      SELECT '10.1/' || (o_orderkey % 250)::VARCHAR AS doi,
             100000 + o_orderkey AS seq,
             (2016 + o_orderkey % 5)::VARCHAR AS year
      FROM orders WHERE o_orderkey % 9 = 0),
    u AS (SELECT * FROM existing UNION ALL SELECT * FROM updates)
    SELECT doi, max(seq) AS seq, arg_max(year, seq) AS year
    FROM u GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# e18: S5 partitioned store + institutional where-cube serving path, with
# dynamic partition pruning doing the per-institution access
# ---------------------------------------------------------------------------

def _e18_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's core serving pattern (assets_generator.py:678-702):
    per-institution cubes are ``where institution = ...`` slices over ONE
    ``partitionBy('institution')`` Parquet store (SURVEY.md §4). The gate
    writes a cube derived from customer, registers a sliced institutional
    cube through the real catalog/query machinery, and drilldowns one
    institution — the slice predicate lands as a PartitionFilter (asserted
    in tests/test_plans.py on this exact shape), so the scan touches 1 of
    25 partition directories, the same access pattern that serves one
    institution out of 100 TB."""
    import tempfile

    from openapc_olap_spark.model import Aggregate, Cube, CubeRegistry
    from openapc_olap_spark.query import QueryEngine, QuerySpec

    cust = load_tables(spark, sf_dir, ["customer"])["customer"]
    facts = cust.select(
        F.concat(F.lit("inst-"), F.col("c_nationkey")).alias("institution"),
        (F.col("c_custkey") % 10 + 2015).cast("string").alias("period"),
        F.col("c_acctbal").cast("double").alias("euro"))
    base = (f"{tempfile.gettempdir()}/openapc_gate_tmp/"
            f"e18_cube_{os.path.basename(sf_dir.rstrip('/'))}")
    facts.write.mode("overwrite").partitionBy("institution").parquet(base)
    spark.read.parquet(base).createOrReplaceTempView("e18_openapc")
    reg = CubeRegistry()
    reg.register(Cube(
        name="inst5_apc", table="e18_openapc",
        dimensions=("institution", "period"), measures=("euro",),
        aggregates=(Aggregate("euro_sum", "euro", "sum"),
                    Aggregate("n_items", "euro", "count"),
                    Aggregate("euro_avg", "euro", "avg")),
        where="institution = 'inst-5'"))
    df = QueryEngine(spark, reg).cells(
        QuerySpec.from_params("inst5_apc", drilldown="period"))
    return (df.select("period",
                      F.round("euro_sum", 2).alias("euro_sum"),
                      "n_items",
                      F.round("euro_avg", 4).alias("euro_avg"))
            .orderBy("period"))


_E18_SQL = """
    SELECT (c_custkey % 10 + 2015)::VARCHAR AS period,
           round(sum(c_acctbal), 2) AS euro_sum,
           count(*) AS n_items,
           round(avg(c_acctbal), 4) AS euro_avg
    FROM customer WHERE c_nationkey = 5
    GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# e19: S6 manifest sink round-trip -> catalog institutional-cube construction
# ---------------------------------------------------------------------------

def _e19_manifest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 + catalog (assets_generator.py:39,678-702): manifest rows derived
    from nation are written through the pipeline's sink shape (single-file
    CSV with header, the institutional_cubes.csv contract), read back via
    ``catalog.load_manifest``, and ``build_openapc_registry`` registers one
    where-sliced institutional cube per row. The gate emits each cube's
    binding — physical table, slice predicate, dimension/aggregate arity —
    so a drift in the catalog templates or the CSV round-trip breaks the
    hash. Driver-side assembly is manifest-bounded (~10^3 rows at full
    scale), the same inherently-driver-side shape as the reference's
    generate_yamls."""
    import tempfile

    from openapc_olap_spark.catalog import build_openapc_registry, load_manifest

    nation = load_tables(spark, sf_dir, ["nation"])["nation"]
    types = F.array(*[F.lit(t) for t in ("apc", "apc_ac", "bpc", "ta", "deal")])
    ctype = F.element_at(types, (F.col("n_nationkey") % 5 + 1).cast("int"))
    manifest = nation.select(
        F.col("n_name").alias("institution"),
        F.concat(F.lit("c"), F.col("n_nationkey").cast("string"),
                 F.lit("_"), ctype).alias("cube_name"),
        F.concat(F.lit("Institution "), F.col("n_name")).alias("full_name"),
        ctype.alias("cube_type"),
        (F.col("n_nationkey") % 3).alias("priority"))
    base = (f"{tempfile.gettempdir()}/openapc_gate_tmp/"
            f"e19_manifest_{os.path.basename(sf_dir.rstrip('/'))}")
    (manifest.coalesce(1).write.mode("overwrite")
     .option("header", True).csv(f"{base}/institutional_cubes"))
    rows = load_manifest(spark, base)
    reg = build_openapc_registry(rows)
    static = {"openapc", "openapc_ac", "bpc", "transformative_agreements",
              "deal", "combined", "doi_lookup", "springer_compact_coverage"}
    data = [(c.name, c.table, c.where, len(c.dimensions), len(c.aggregates),
             c.label)
            for c in (reg.get(n) for n in reg.names() if n not in static)]
    df = spark.createDataFrame(
        data, "cube_name string, table_name string, where_clause string, "
              "n_dims int, n_aggs int, label string")
    return df.orderBy("cube_name")


_E19_SQL = """
    WITH m AS (
      SELECT n_name AS institution, n_nationkey,
             ['apc','apc_ac','bpc','ta','deal'][(n_nationkey % 5 + 1)::INT]
               AS cube_type
      FROM nation)
    SELECT 'c' || n_nationkey || '_' || cube_type AS cube_name,
           CASE cube_type WHEN 'apc' THEN 'openapc'
                WHEN 'apc_ac' THEN 'openapc_ac' WHEN 'bpc' THEN 'bpc'
                WHEN 'ta' THEN 'transformative_agreements'
                ELSE 'deal' END AS table_name,
           'institution = ''' || institution || '''' AS where_clause,
           CASE cube_type WHEN 'apc' THEN 9 WHEN 'apc_ac' THEN 12
                WHEN 'bpc' THEN 8 WHEN 'ta' THEN 9 ELSE 9 END AS n_dims,
           CASE cube_type WHEN 'apc' THEN 4 WHEN 'apc_ac' THEN 5
                WHEN 'bpc' THEN 4 WHEN 'ta' THEN 1 ELSE 4 END AS n_aggs,
           'Institution ' || institution AS label
    FROM m ORDER BY 1
"""


# ---------------------------------------------------------------------------
# e20: S2 JSON cache scan — nested coverage_stats.json -> journal-year rows
# ---------------------------------------------------------------------------

def _e20_json_cache(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 (assets_generator.py:495-509 / coverage_stats.json shape): the
    whole-file nested JSON cache {journal: {title, years: {year: stats}}}
    flattened to one row per journal-year by ``load_coverage_stats``. The
    fixture doc is generated arithmetically (journal j carries j%3+1
    years), so the oracle rebuilds the same rows from generate_series and
    any drift in row multiplicity, numeric coercion, or column naming
    breaks the hash. Driver-side by design: the reference's caches are
    whole-file JSON bounded by the Springer journal universe (~10^4)."""
    import json as _json
    import tempfile

    from openapc_olap_spark.etl.coverage import load_coverage_stats

    doc = {
        f"J{j}": {
            "title": f"Journal {j}",
            "years": {
                str(2015 + y): {
                    "num_journal_total_articles": float(10 + (j * 7 + y * 3) % 50),
                    "num_journal_oa_articles": float((j * 5 + y) % 10),
                } for y in range(j % 3 + 1)
            },
        } for j in range(120)
    }
    base = f"{tempfile.gettempdir()}/openapc_gate_tmp"
    os.makedirs(base, exist_ok=True)
    path = f"{base}/e20_coverage_stats.json"
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        _json.dump(doc, f)
    os.replace(tmp, path)           # atomic: concurrent gate runs can't
    # observe a half-written cache
    df = load_coverage_stats(spark, path)
    return (df.groupBy("period")
            .agg(F.count(F.lit(1)).alias("n_cells"),
                 F.round(F.sum("num_journal_total_articles"), 1)
                  .alias("total_articles"),
                 F.round(F.sum("num_journal_oa_articles"), 1)
                  .alias("oa_articles"))
            .orderBy("period"))


_E20_SQL = """
    WITH j AS (SELECT unnest(generate_series(0, 119)) AS j),
    y AS (SELECT j, unnest(generate_series(0, j % 3)) AS y FROM j)
    SELECT (2015 + y)::VARCHAR AS period,
           count(*) AS n_cells,
           round(sum((10 + (j * 7 + y * 3) % 50)::DOUBLE), 1) AS total_articles,
           round(sum(((j * 5 + y) % 10)::DOUBLE), 1) AS oa_articles
    FROM y GROUP BY 1 ORDER BY 1
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
    "e10_colon_scrub": _e10_colon_scrub,
    "e11_doi_lookup": _e11_doi_lookup,
    "e12_institution_report": _e12_institution_report,
    "e13_ac_institutions": _e13_ac_institutions,
    "e14_annual_pubdates": _e14_annual_pubdates,
    "e15_hybrid_catalog": _e15_hybrid_catalog,
    "e16_springer_coverage": _e16_springer_coverage,
    "e17_cache_upsert": _e17_cache_upsert,
    "e18_partition_prune": _e18_partition_prune,
    "e19_manifest_roundtrip": _e19_manifest_roundtrip,
    "e20_json_cache": _e20_json_cache,
}

# production bench twins (VERDICT r09 #1 split — see
# contrib_queries.BENCH_TWINS; bench.py unions both dicts)
BENCH_TWINS = {
    "e17_cache_upsert": _e17_production,
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
    "e10_colon_scrub": _E10_SQL,
    "e11_doi_lookup": _E11_SQL,
    "e12_institution_report": _E12_SQL,
    "e13_ac_institutions": _E13_SQL,
    "e14_annual_pubdates": _E14_SQL,
    "e15_hybrid_catalog": _E15_SQL,
    "e16_springer_coverage": _E16_SQL,
    "e17_cache_upsert": _E17_SQL,
    "e18_partition_prune": _E18_SQL,
    "e19_manifest_roundtrip": _E19_SQL,
    "e20_json_cache": _E20_SQL,
}
