"""Physical-plan audits (SURVEY.md §4): the properties that make these
queries survive a 100x scale-up, asserted on the executed plan so a
regression in plan shape fails CI, not a cluster bill.

- cuts reach the Parquet scan (PushedFilters)
- aggregation reads only referenced columns (ReadSchema pruning)
- aggregates are partial+final (map-side combine) over ONE scan
- dimension enrichment joins broadcast (no fact-side shuffle)
- brute-force top-k is TakeOrderedAndProject (no global sort/shuffle)

Audit predicates live in openapc_olap_spark.plans so they are usable
outside the test suite too.
"""

import pytest
from pyspark.sql import functions as F

from openapc_olap_spark import plans
from openapc_olap_spark.operators import similarity
from openapc_olap_spark.query import QuerySpec
from openapc_olap_spark.session import load_tables
from openapc_olap_spark.tpch import prepare


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    return prepare(spark, sf_dir)


def test_point_cut_pushes_down_to_scan(engine):
    df = engine.facts(QuerySpec.from_params(
        "customer", cut="c_mktsegment:BUILDING"))
    assert plans.filters_pushed(df, "IsNotNull(c_mktsegment)",
                                "EqualTo(c_mktsegment,BUILDING)")


def test_range_cut_pushes_down(engine):
    df = engine.facts(QuerySpec.from_params("part", cut="p_size:10~20"))
    assert plans.filters_pushed(df, "GreaterThanOrEqual(p_size,10)",
                                "LessThanOrEqual(p_size,20)")


def test_aggregate_prunes_columns_single_scan(engine):
    df = engine.cells(QuerySpec.from_params("part", drilldown="p_brand"))
    assert plans.single_scan(df)
    scan_line = plans.scan_lines(df)[0]
    assert "p_brand" in scan_line and "p_retailprice" in scan_line
    assert "p_type" not in scan_line and "p_name" not in scan_line   # pruned
    # partial (map-side) + final aggregation around one exchange
    assert plans.has_partial_aggregate(df)
    assert plans.exchange_count(df) >= 1


def test_small_dim_join_broadcasts(spark, sf_dir):
    tables = load_tables(spark, sf_dir, ["orders", "customer"])
    joined = tables["orders"].join(
        F.broadcast(tables["customer"]),
        tables["orders"].o_custkey == tables["customer"].c_custkey)
    assert plans.has_broadcast_join(joined)
    assert not plans.has_sort_merge_join(joined)


def test_brute_force_topk_has_no_global_sort(spark, sf_dir):
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    q = [float(x) for x in emb.first()["embedding"]]
    df = similarity.brute_force_top_k(emb, q, k=10)
    assert plans.is_top_k(df)


def test_bucketed_join_has_no_exchange(spark, tmp_path, sf_dir):
    """Two tables bucketed on the join key with equal counts join with ZERO
    shuffles (the 100 TB fact-fact join strategy: shuffle once at write
    time, never at query time). sortBy additionally kills the per-bucket
    Sort."""
    from openapc_olap_spark.sources import bucketing
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    bucketing.write_bucketed(t["orders"], "orders_b", ["o_orderkey"], 4,
                             path=str(tmp_path / "ob"))
    bucketing.write_bucketed(t["lineitem"], "lineitem_b", ["l_orderkey"], 4,
                             path=str(tmp_path / "lb"))
    # at test sf the small side would broadcast (the right call there);
    # model the 100 TB case where neither fact table fits in memory
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert bucketing.colocated(spark, "orders_b", "lineitem_b",
                                   "o_orderkey", "l_orderkey")
        joined = (spark.table("orders_b")
                  .join(spark.table("lineitem_b"),
                        F.col("o_orderkey") == F.col("l_orderkey"))
                  .select("o_orderkey", "l_extendedprice"))
        assert plans.shuffle_exchange_count(joined) == 0
        assert plans.has_sort_merge_join(joined)
        # bucketed groupBy on the bucket key: aggregates with no exchange
        agg = (spark.table("lineitem_b").groupBy("l_orderkey")
               .agg(F.sum("l_quantity").alias("q")))
        assert plans.shuffle_exchange_count(agg) == 0
        # non-bucketed baseline DOES shuffle both sides
        base = (t["orders"].join(
            t["lineitem"],
            t["orders"].o_orderkey == t["lineitem"].l_orderkey)
            .select("o_orderkey", "l_extendedprice"))
        assert plans.shuffle_exchange_count(base) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_institutional_slice_filter_is_in_scan(spark, tmp_path):
    """A Cube.where institution slice must land in the scan's filters (on a
    partitioned table this becomes partition pruning)."""
    from openapc_olap_spark.model import Aggregate, Cube, CubeRegistry
    from openapc_olap_spark.query import QueryEngine
    p = str(tmp_path / "t")
    spark.createDataFrame(
        [("A", 1.0), ("B", 2.0)], ["institution", "euro"]
    ).write.partitionBy("institution").parquet(p)
    spark.read.parquet(p).createOrReplaceTempView("slice_t")
    reg = CubeRegistry()
    reg.register(Cube(name="inst_a", table="slice_t",
                      dimensions=("institution",), measures=("euro",),
                      aggregates=(Aggregate("s", "euro", "sum"),),
                      where="institution = 'A'"))
    df = QueryEngine(spark, reg).facts(QuerySpec.from_params("inst_a"))
    assert "institution#" in plans.partition_filters(df)


def test_profile_is_one_pass(spark, sf_dir):
    """x31 posture: profiling N columns is ONE scan + ONE aggregate (no
    per-column jobs), map-side combined, reading only the profiled
    columns."""
    from openapc_olap_spark.operators.profile import profile
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    df = profile(li, ["l_quantity", "l_extendedprice"])
    assert plans.single_scan(df)
    assert plans.has_partial_aggregate(df)
    scan = plans.scan_lines(df)[0]
    assert "l_quantity" in scan and "l_comment" not in scan


def test_audio_header_parsers_single_scan_no_shuffle(spark, sf_dir):
    """x23/x24 posture: WAV/FLAC/MP3 header parsing is pure binary
    expressions — a petabyte audio-metadata pass is one scan, zero
    shuffles, no Python boundary."""
    from openapc_olap_spark.operators.multimodal import (
        with_flac_metadata, with_mp3_metadata, with_wav_metadata,
    )
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    media = docs.select(F.col("doc_id").alias("media_id"),
                        F.encode("text", "utf-8").alias("payload"))
    df = with_mp3_metadata(with_flac_metadata(with_wav_metadata(media)))
    assert plans.single_scan(df)
    assert plans.shuffle_exchange_count(df) == 0
    assert "Python" not in plans.plan_of(df)      # no UDF eval nodes


def test_winnow_fingerprints_single_scan_no_shuffle(spark, sf_dir):
    """x27 posture: winnowing is per-row higher-order expressions — a
    petabyte fingerprint pass must be one scan with zero shuffles, reading
    only the needed columns."""
    from openapc_olap_spark.operators.text import with_winnow_fingerprints
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    df = with_winnow_fingerprints(
        docs.select("doc_id", "text")).select("doc_id", "fingerprints")
    assert plans.single_scan(df)
    assert plans.shuffle_exchange_count(df) == 0
    assert "title" not in plans.scan_lines(df)[0]          # pruned


def test_kgram_hashes_binds_lowered_text_once(spark, sf_dir):
    """VERDICT r14 #1 pinned: kgram_hashes must LOWER the text once —
    bound as a lambda variable by an outer single-element transform —
    and never inside the per-position gram lambda, where interpreted
    HOF evaluation re-lowercases the whole document at every position
    (O(len^2)). The analyzed expression therefore contains exactly ONE
    lower(...) call; the inner lambda reads only lambda variables."""
    from openapc_olap_spark.operators.text import kgram_hashes
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    df = docs.select(kgram_hashes("text").alias("h"))
    expr = df._jdf.queryExecution().analyzed().toString()
    assert expr.lower().count("lower(") == 1, expr
    # same guarantee for langid's column form (normalization bound once)
    from openapc_olap_spark.operators.langid import char_ngram_buckets
    df2 = docs.select(char_ngram_buckets("text").alias("b"))
    expr2 = df2._jdf.queryExecution().analyzed().toString()
    assert expr2.lower().count("lower(") == 1, expr2


def test_curation_funnel_one_window_one_agg(spark, sf_dir):
    """x28 posture: the composed funnel is exactly two shuffles over one
    scan — the fingerprint window (dedup ranking) and the final aggregate —
    with map-side partial aggregation."""
    from openapc_olap_spark.operators.curation import curation_funnel
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    df = curation_funnel(docs)
    assert plans.single_scan(df)
    assert plans.shuffle_exchange_count(df) <= 2
    assert plans.has_partial_aggregate(df)


def test_e18_institution_drilldown_partition_pruned(spark, sf_dir):
    """The e18 gate's exact shape end-to-end: partitionBy store -> catalog
    where-cube -> drilldown; the institution slice must be a PartitionFilter
    (1 of 25 directories scanned) and the aggregate map-side combined."""
    from openapc_olap_spark.etl_queries import _e18_partition_prune
    df = _e18_partition_prune(spark, sf_dir)
    pf = plans.partition_filters(df)
    assert "institution#" in pf and "inst-5" in pf
    assert plans.has_partial_aggregate(df)


def test_pii_redaction_is_single_scan_no_shuffle(spark, sf_dir):
    """x20 posture: redaction + counts are pure expressions — a petabyte
    hygiene pass is ONE scan with zero exchanges."""
    from openapc_olap_spark.operators import text
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    counts = text.pii_counts("text")
    df = docs.select("doc_id", text.redact_pii("text").alias("red"),
                     counts["email"].alias("e"))
    assert plans.single_scan(df)
    assert plans.shuffle_exchange_count(df) == 0


def test_vocab_build_shuffle_budget(spark, sf_dir):
    """x22 posture: explode -> groupBy(token) with map-side combine.
    Exact document counts cost 2 shuffles (pre-agg on (token, doc));
    the approx (HLL) path is the single-shuffle 100 TB default."""
    from openapc_olap_spark.operators import text
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    exact = text.token_frequencies(docs, "text", "doc_id")
    assert plans.single_scan(exact)
    assert plans.has_partial_aggregate(exact)
    assert plans.shuffle_exchange_count(exact) == 2
    approx = text.token_frequencies(docs, "text", "doc_id",
                                    exact_docs=False)
    assert plans.shuffle_exchange_count(approx) == 1


def test_ac_institutions_semi_join_broadcasts(spark, sf_dir):
    """e13/T11 posture: the additional-cost DOI set broadcasts; the fact
    side never shuffles for the membership probe."""
    from pyspark.sql import functions as F2
    from openapc_olap_spark.etl.openapc import (
        institutions_with_additional_costs,
    )
    t = load_tables(spark, sf_dir, ["customer", "part"])
    facts = t["customer"].select(
        F2.concat(F2.lit("i"), F2.col("c_nationkey")).alias("institution"),
        F2.col("c_custkey").cast("string").alias("doi"))
    costs = t["part"].select(
        F2.col("p_partkey").cast("string").alias("doi"))
    df = institutions_with_additional_costs(facts, costs)
    assert plans.has_broadcast_join(df)
    assert not plans.has_sort_merge_join(df)


def test_image_dims_single_scan_no_shuffle(spark, sf_dir):
    """x19 posture: the header parse (PNG fixed offsets + JPEG marker walk)
    is one pruned scan, no exchanges, fully JVM-side."""
    from pyspark.sql import functions as F2
    from openapc_olap_spark.operators import multimodal
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    media = docs.select(F2.col("doc_id").alias("media_id"),
                        F2.encode("text", "utf-8").alias("payload"))
    df = multimodal.with_image_dims(media).select("media_id", "width")
    assert plans.single_scan(df)
    assert plans.shuffle_exchange_count(df) == 0


def test_text_quality_pipeline_prunes_to_text_column(spark, sf_dir):
    """x16 posture: the quality composite is pure codegen over ONE pruned
    scan — at 100 TB the documents table is read once, text column only."""
    from openapc_olap_spark.operators import text
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    df = (docs.select(text.quality_score("text").alias("q"))
          .groupBy((F.floor(F.col("q") * 10)).alias("d"))
          .agg(F.count(F.lit(1)).alias("n")))
    assert plans.single_scan(df)
    scan_line = plans.scan_lines(df)[0]
    assert "text" in scan_line
    assert "doc_id" not in scan_line and "lang" not in scan_line   # pruned
    assert plans.has_partial_aggregate(df)


def test_ivf_index_probe_is_partition_pruned(spark, tmp_path, sf_dir):
    """x36 serving shape: a written IVF index is probed via a list_id
    PartitionFilter (storage-level pruning — only nprobe of k directories
    are read), and the probed result equals the compute-path ivf_top_k
    over the same centroids."""
    from openapc_olap_spark.operators import similarity
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = [[float(x) for x in r["embedding"]]
             for r in emb.orderBy("vec_id").limit(8).collect()]
    q = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    path = str(tmp_path / "ivf")
    similarity.write_ivf_index(emb, path, cents)
    probed = similarity.ivf_index_top_k(spark, path, cents, q, k=10,
                                        nprobe=3)
    assert "list_id#" in plans.partition_filters(probed)
    direct = similarity.ivf_top_k(emb, cents, q, k=10, nprobe=3)
    as_pairs = lambda df: [(r["vec_id"], round(r["sim"], 9))
                           for r in df.collect()]
    assert as_pairs(probed) == as_pairs(direct)


def test_asof_join_single_shuffle_no_explosion(spark, sf_dir):
    """x37 posture: the as-of join is ONE window exchange over the
    unioned sides — no join node at all, so no range-join row explosion
    is even possible in the plan."""
    from datetime import datetime as dt

    from openapc_olap_spark.operators.temporal import asof_join
    left = spark.createDataFrame(
        [(1, dt(2024, 1, 1), 1.0)], "uid long, ts timestamp, v double")
    right = spark.createDataFrame(
        [(1, dt(2024, 1, 1), "a")], "uid long, vts timestamp, tier string")
    df = asof_join(left, right, on="uid", right_ts="vts")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan          # union+window, not a join


def test_interval_join_is_equi_join_not_nested_loop(spark):
    """x38 posture: the bucketized interval join must plan as a hash/
    sort-merge EQUI join on (key, bucket) — never BroadcastNestedLoopJoin
    (what a naive inequality join degenerates to)."""
    from datetime import datetime as dt

    from openapc_olap_spark.operators.temporal import interval_join
    pts = spark.createDataFrame(
        [(1, dt(2024, 1, 1), 1.0)], "uid long, ts timestamp, v double")
    ivs = spark.createDataFrame(
        [(1, dt(2024, 1, 1), dt(2024, 1, 2), "a")],
        "uid long, s timestamp, e timestamp, tag string")
    df = interval_join(pts, ivs, point_ts="ts", start_ts="s", end_ts="e",
                       on="uid")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan or "BroadcastHashJoin" in plan
            or "ShuffledHashJoin" in plan)


def test_decontaminate_broadcasts_eval_single_shuffle(spark, sf_dir):
    from openapc_olap_spark.operators import decontam
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    ev = decontam.eval_ngram_set(docs.filter(F.col("doc_id") % 13 == 0), n=3)
    out = decontam.ngram_overlap(docs.filter(F.col("doc_id") % 13 != 0),
                                 ev, n=3)
    # the 100 TB contract: eval grams broadcast (the train side never
    # shuffles its text), and the only shuffle is the per-doc count agg
    assert plans.has_broadcast_join(out)
    assert plans.has_partial_aggregate(out)


def test_bloom_prefilter_is_pure_scan_expression(spark, sf_dir):
    from openapc_olap_spark.operators import bloom
    t = load_tables(spark, sf_dir, ["lineitem", "supplier"])
    keys = t["supplier"].filter(F.col("s_nationkey") == 7) \
                        .select("s_suppkey")
    pre = bloom.bloom_semi_join(t["lineitem"], keys, "l_suppkey",
                                "s_suppkey", num_bits=1 << 14, exact=False)
    # the prefilter stage is a join-free, shuffle-free codegen'd filter on
    # the fact scan — the whole point of the runtime-filter pattern
    assert plans.single_scan(pre)
    assert plans.shuffle_exchange_count(pre) == 0
    assert not plans.has_sort_merge_join(pre)
    assert not plans.has_broadcast_join(pre)


def test_top_k_salted_bounds_reducer_sort(spark, sf_dir):
    from openapc_olap_spark.operators import ranking
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    plain = ranking.top_k_per_group(docs, ["lang"], "n_chars", 3, "doc_id")
    salted = ranking.top_k_per_group(docs, ["lang"], "n_chars", 3,
                                     "doc_id", salt_parts=4)
    # plain: one shuffle on the group key; salted: one extra (tiny) shuffle
    # that spreads a hot group over salt_parts reducers before the final
    assert plans.shuffle_exchange_count(plain) == 1
    assert plans.shuffle_exchange_count(salted) == 2


def test_deterministic_shuffle_no_global_sort(spark, sf_dir):
    from openapc_olap_spark.operators import packing
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    out = packing.deterministic_shuffle(docs, seed="s", n_shards=8)
    # shard-parallel: one hash partition + in-shard sort, never a global
    # range-exchange sort
    assert plans.shuffle_exchange_count(out) == 1
    assert not plans.has_global_sort(out)


def test_cms_build_is_one_combined_aggregation(spark, sf_dir):
    from openapc_olap_spark.operators import sketches, text
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    toks = docs.select(F.explode(text.tokens("text")).alias("t"))
    grid = sketches.cms_build(toks, "t", width=512, depth=4)
    # fixed-size sketch: one map-side-combined shuffle, single scan
    assert plans.single_scan(grid)
    assert plans.has_partial_aggregate(grid)
    assert plans.shuffle_exchange_count(grid) == 1


def test_chunking_single_scan_no_shuffle(spark, sf_dir):
    from openapc_olap_spark.operators import chunking
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    out = chunking.chunk_documents(docs, chunk_tokens=32, overlap=8)
    # tokenize + explode + slice: all in one scan stage, nothing moves
    assert plans.single_scan(out)
    assert plans.shuffle_exchange_count(out) == 0


def test_rebalance_filter_is_scan_predicate(spark, sf_dir):
    from openapc_olap_spark.operators import packing
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    out = packing.rebalance_mixture(
        docs, "lang", {"en": 0.5, "de": 0.3, "fr": 0.2})
    # after the (stratum-sized) rate computation, application is a pure
    # codegen'd filter on the scan — no shuffle, no join
    assert plans.single_scan(out)
    assert plans.shuffle_exchange_count(out) == 0
    assert not plans.has_broadcast_join(out)


def test_incremental_dedup_bloom_negative_branch_is_join_free(spark, sf_dir):
    from openapc_olap_spark.operators import bloom, dedup
    from openapc_olap_spark.operators.text import fingerprint
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    seen = (docs.filter(F.col("doc_id") % 3 == 0)
            .select(fingerprint("text").alias("__fp")))
    sketch = bloom.bloom_build(seen, "__fp", num_bits=1 << 14)
    new = docs.filter(F.col("doc_id") % 3 != 0).withColumn(
        "__fp", fingerprint("text"))
    negative = new.filter(
        ~bloom.bloom_might_contain(F.col("__fp"), sketch))
    # the provably-novel branch never joins or shuffles — the whole point
    assert plans.single_scan(negative)
    assert plans.shuffle_exchange_count(negative) == 0
    assert not plans.has_broadcast_join(negative)
    assert not plans.has_sort_merge_join(negative)


def test_quantize_is_pure_scan_expression(spark, sf_dir):
    from openapc_olap_spark.operators import quantize
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    out = quantize.quantize_embeddings(emb)
    assert plans.single_scan(out)
    assert plans.shuffle_exchange_count(out) == 0


def test_tfidf_shuffle_budget(spark, sf_dir):
    from openapc_olap_spark.operators import tfidf
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    out = tfidf.tfidf_top_terms(docs, k=3)
    # tf feeds the score join AND the df aggregation from ONE materialized
    # frame: both consumers must read the cache (2 InMemoryTableScans),
    # so the corpus explode+agg runs once at runtime. The only other
    # corpus touch is the N count() — a rowcount scan reading no columns.
    assert plans.plan_of(out).count("InMemoryTableScan") == 2
    assert any("FileScan parquet []" in l for l in plans.scan_lines(out))
    assert plans.has_partial_aggregate(out)
    assert plans.has_broadcast_join(out)          # the one-row N frame
    assert not plans.has_sort_merge_join(out)


def test_semantic_dedup_is_equi_join_on_cluster(spark, sf_dir):
    """x53's pair join must be a hash equi-join on list_id (never a
    nested-loop/cartesian), the anti-join must broadcast the drop set,
    and centroid assignment must not add a shuffle of its own."""
    from openapc_olap_spark.operators import semdedup

    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    cents = [[float(x) for x in r["embedding"]]
             for r in emb.orderBy("vec_id").limit(4).collect()]
    pairs = semdedup.semantic_candidate_pairs(emb, cents, threshold=0.35,
                                              materialize=False)
    p = plans.plan_of(pairs)
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p
    kept = semdedup.semantic_dedup(emb, cents, threshold=0.35,
                                   materialize=False)
    kp = plans.plan_of(kept)
    assert "CartesianProduct" not in kp
    assert plans.has_broadcast_join(kept)          # drop-set anti-join


def test_unigram_scoring_broadcasts_model(spark, sf_dir):
    """x54: the (token -> count) model side of the scoring join must
    broadcast — the per-doc side never shuffles for the join — and both
    aggregations are map-side combined."""
    from openapc_olap_spark.operators import lm

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    out = lm.doc_mean_logprob(docs)
    assert plans.has_broadcast_join(out)
    assert not plans.has_sort_merge_join(out)
    assert plans.has_partial_aggregate(out)


def test_bpe_pair_counts_partial_agg_single_scan(spark, sf_dir):
    """x55: one merge iteration's pair count is a single vocab scan with
    map-side combine; apply_merge adds no shuffle beyond the vocab agg."""
    from openapc_olap_spark.operators import bpe

    # earlier tests may have persisted a matching plan fragment, which
    # would serve this scan from cache and zero the FileScan count the
    # single-scan audit looks for
    spark.catalog.clearCache()
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    vocab = bpe.with_initial_symbols(bpe.word_counts(docs))
    pc = bpe.pair_counts(vocab)
    assert plans.has_partial_aggregate(pc)
    assert plans.single_scan(pc)
    # re-segmentation is expression-only: same shuffle count as the
    # vocabulary build itself
    merged = bpe.apply_merge(vocab, "a", "b")
    assert plans.shuffle_exchange_count(merged) == \
        plans.shuffle_exchange_count(vocab)


def test_domain_stats_single_scan_partial_agg(spark, sf_dir):
    """x56: URL parse + quality scoring + domain rollup is ONE scan with
    map-side combine — no join, no second pass."""
    from openapc_olap_spark.operators import web

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    df = docs.withColumn(
        "url", F.concat(F.lit("https://www."), F.col("source"),
                        F.lit(".com/d/"), F.col("doc_id").cast("string")))
    out = web.domain_stats(df)
    assert plans.single_scan(out)
    assert plans.has_partial_aggregate(out)
    assert plans.exchange_count(out) <= 2   # partial->final + nothing else


def test_bpe_encode_vocab_hint_modes(spark, sf_dir):
    """x61 / VERDICT r05 item 2: the word->symbols join is no longer
    force-broadcast. Default (no hint) still broadcasts a small trained
    vocabulary — the materialized frame's statistics drive the choice —
    while broadcast_vocab=False degrades to a shuffle hash join, the
    web-scale-vocabulary shape that cannot OOM the driver."""
    from openapc_olap_spark.operators import bpe

    docs = load_tables(spark, sf_dir, ["documents"])["documents"] \
        .limit(50)
    _, vocab = bpe.bpe_train(docs, 2)
    auto = bpe.bpe_encode(docs, vocab)
    assert plans.has_broadcast_join(auto)
    sharded = bpe.bpe_encode(docs, vocab, broadcast_vocab=False)
    assert "ShuffledHashJoin" in plans.plan_of(sharded)
    assert not plans.has_broadcast_join(sharded)
    # the two modes agree bit-for-bit
    key = lambda df: sorted((r["doc_id"], tuple(r["bpe_tokens"]))
                            for r in df.collect())
    assert key(auto) == key(sharded)


def test_canonical_url_dedup_single_agg_no_udf(spark, sf_dir):
    """x65: canonicalization is a pure expression chain feeding ONE
    map-side-combined aggregation — no UDF, no second scan."""
    from openapc_olap_spark.operators import urlnorm

    spark.catalog.clearCache()
    docs = load_tables(spark, sf_dir, ["documents"])["documents"] \
        .withColumn("url", F.concat(F.lit("https://www."), F.col("source"),
                                    F.lit(".example.com/p?a=1")))
    out = urlnorm.url_duplicates(docs)
    p = plans.plan_of(out)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert plans.has_partial_aggregate(out)
    assert plans.single_scan(out)
    assert plans.shuffle_exchange_count(out) == 1


def test_line_dedup_shuffle_budget(spark, sf_dir):
    """x66: two corpus-sized exchanges only — the line-frequency
    aggregate and the per-doc reassembly groupBy; the hot-line join must
    NOT add a sort-merge shuffle (broadcast or AQE-converted)."""
    from openapc_olap_spark.operators import linededup

    spark.catalog.clearCache()
    docs = load_tables(spark, sf_dir, ["documents"])["documents"] \
        .select("doc_id", "text")
    out = linededup.remove_boilerplate_lines(docs, max_docs=50, sep=" ")
    assert plans.has_partial_aggregate(out)
    # budget: line-frequency agg (2: partial+final counted once as one
    # hashpartitioning) + doc regroup + final doc-attribute join; allow
    # the join pair but no more
    assert plans.shuffle_exchange_count(out) <= 4


def test_char_entropy_partial_agg(spark, sf_dir):
    """x67: the (doc, char) count pre-aggregates map-side, so the
    exchange carries per-doc char counts, not exploded characters."""
    from openapc_olap_spark.operators import stats

    spark.catalog.clearCache()
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    out = stats.char_entropy(docs)
    assert plans.has_partial_aggregate(out)
    assert plans.single_scan(out)


def test_percentile_filter_is_scan_predicate(spark, sf_dir):
    """x69: after the two-scalar quantile job, the trim is a pushed-down
    scan predicate — no join, no exchange; on the integral n_chars the
    ceil/floor-tightened bounds reach the parquet reader."""
    from openapc_olap_spark.operators import stats

    spark.catalog.clearCache()
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    out = stats.filter_by_percentile(docs, "n_chars", 0.1, 0.9)
    p = plans.plan_of(out)
    assert "Join" not in p
    assert plans.shuffle_exchange_count(out) == 0
    assert plans.filters_pushed(out, "GreaterThanOrEqual(n_chars",
                                "LessThanOrEqual(n_chars")


def test_rolling_features_one_window_exchange(spark, sf_dir):
    """x70: all three features share one window spec — exactly one hash
    exchange on the entity key, one Window operator."""
    from openapc_olap_spark.operators import rolling

    spark.catalog.clearCache()
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    out = rolling.rolling_features(ev, k=3)
    p = plans.plan_of(out)
    assert plans.shuffle_exchange_count(out) == 1
    # Catalyst may split the lag frames into several Window operators,
    # but they share the partitioning and ONE in-partition sort — the
    # costs that matter
    assert p.count("+- Sort") == 1
    assert "SortMergeJoin" not in p


def test_assign_shards_offsets_broadcast(spark, sf_dir):
    """x71: the partition-offset table joins via broadcast (it is
    partition-count-sized); the interior window partitions by __pid, so
    no single-task global sort appears."""
    from openapc_olap_spark.operators import sharding

    spark.catalog.clearCache()
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    out = sharding.assign_shards(docs, target=5000)
    p = plans.plan_of(out)
    assert "BroadcastHashJoin" in p
    out.unpersist()


def test_bm25_topk_prunes_columns_no_global_sort(spark, sf_dir):
    """x79: the scoring scan reads only (doc_id, text); the final top-k
    is TakeOrderedAndProject, never a global sort; the |q|-row stats
    join broadcasts."""
    from openapc_olap_spark.operators import bm25

    spark.catalog.clearCache()
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    out = bm25.bm25_top_k(docs, ["hash", "merge"], k=10)
    assert plans.is_top_k(out)
    assert not plans.has_global_sort(out)
    assert plans.has_broadcast_join(out)
    cols = plans.columns_read(out)
    assert "text" in cols and "lang" not in cols and "source" not in cols


def test_zorder_cluster_is_one_range_exchange(spark, sf_dir):
    """x83: z-clustering adds exactly one exchange (range on the
    z-value) plus the in-partition sort — the layout-rewrite budget."""
    from openapc_olap_spark.operators import zorder

    spark.catalog.clearCache()
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    out = zorder.cluster_by_zorder(li, ["l_partkey", "l_suppkey"], bits=8,
                                   num_partitions=8)
    p = plans.plan_of(out)
    # the range exchange IS the clustering (intended, unlike a top-k's
    # accidental global sort); the sort stays in-partition (one Sort,
    # global=false)
    assert p.count("Exchange rangepartitioning") == 1
    assert plans.shuffle_exchange_count(out) == 1
    assert p.count("+- Sort") == 1 and "SortMergeJoin" not in p


def test_cooc_pair_join_no_cartesian(spark, sf_dir):
    """x81: pair enumeration is an equi-join on (doc, pos) — never a
    BroadcastNestedLoop/cartesian — and pre-aggregates map-side."""
    from openapc_olap_spark.operators import cooc

    spark.catalog.clearCache()
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    out = cooc.cooccurrence_counts(docs.limit(50), window=2)
    p = plans.plan_of(out)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert plans.has_partial_aggregate(out)


def test_knn_arrow_never_materializes_pair_set(spark, sf_dir):
    """x87: the arrow path is scan -> prefilter -> MapInPandas emitting
    top-k rows directly — no join, no window, no exchange of an n^2
    pair set anywhere in the plan."""
    from openapc_olap_spark.operators import knn

    spark.catalog.clearCache()
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    out = knn.knn_graph(emb, dim=64, k=5, method="arrow")
    p = plans.plan_of(out)
    assert "MapInPandas" in p
    assert "Join" not in p and "Window" not in p
    assert "CartesianProduct" not in p


def test_knn_ivf_blocks_on_equi_join(spark, sf_dir):
    """x87 scale path: candidates come from an equi-join on list_id —
    never a cartesian/nested-loop — and the top-k is one window over
    the blocked candidates only."""
    from openapc_olap_spark.operators import knn

    spark.catalog.clearCache()
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    cents = [[1.0] + [0.0] * 63, [0.0, 1.0] + [0.0] * 62,
             [0.0, 0.0, 1.0] + [0.0] * 61]
    out = knn.knn_graph_ivf(emb, dim=64, k=5, n_probe=2, centroids=cents)
    p = plans.plan_of(out)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "list_id" in p and "Window" in p


def test_unigram_pivot_broadcasts_piece_table(spark, sf_dir):
    """x88 (r10 shape): the model reaches the word table as a 1-row
    BROADCAST map frame and every slot prob is a zero-shuffle
    element_at projection — no equi-join + pivot re-aggregation of the
    word table, no sort-merge, no cartesian (the crossJoin of a
    broadcast 1-row frame plans as BroadcastNestedLoopJoin), and the
    word frame never exchanges again past its vocab groupBy."""
    from openapc_olap_spark.operators import unigram

    spark.catalog.clearCache()
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    words = unigram.word_vocab(docs, max_words=50)
    pieces = unigram.seed_pieces(words, seed_size=20)
    piv = unigram._attach_slot_probs(words, pieces, 8, 3)
    p = plans.plan_of(piv)
    assert "BroadcastNestedLoopJoin" in p       # the 1-row model frame
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p
    # no pivot groupBy: the only aggregates are word_vocab's own
    assert p.count("HashAggregate") == plans.plan_of(words).count(
        "HashAggregate")
    # x90: the encoder maps the (broadcast) word->segmentation table
    # back onto the token stream — no sort-merge, no UDF, no cartesian
    enc = unigram.unigram_encode(docs.limit(50), pieces)
    pe = plans.plan_of(enc)
    assert plans.has_broadcast_join(enc)
    assert "CartesianProduct" not in pe and "SortMergeJoin" not in pe
    assert "BatchEvalPython" not in pe and "MapInPandas" not in pe


def test_ivf_pq_plan_shapes(spark, sf_dir):
    """x91: PQ encode is a zero-shuffle projection (expr path) or one
    MapInPandas (arrow path) — no exchange, no join; the arrow
    candidate stage is a cogroup kernel; nothing in the pipeline plans
    a cartesian product."""
    from pyspark.sql import functions as F

    from openapc_olap_spark.operators import pq

    spark.catalog.clearCache()
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    qv = F.transform(F.col("embedding").cast("array<double>"),
                     lambda x: F.floor(x * 1000 + F.lit(0.5))
                     .cast("double"))
    dq = emb.select("vec_id", qv.alias("embedding"))
    corpus = pq._clean(dq, 64, "vec_id", "embedding")
    coarse = pq.first_n_vectors(corpus, 8)
    cents = pq.train_pq_cents(pq.first_n_vectors(corpus, 16), coarse, 8)
    for enc in ("expr", "arrow"):
        p = plans.plan_of(pq.pq_codes(corpus, coarse, cents, method=enc))
        assert "Exchange" not in p, enc          # encode never shuffles
        assert "Join" not in p, enc
        if enc == "arrow":
            assert "MapInPandas" in p
    out = pq.ivf_pq_topk(dq, 64, k=5, m=8, n_probe=2, coarse=coarse,
                         pq_cents=cents, method="arrow",
                         encode_method="arrow")
    p = plans.plan_of(out)
    assert "FlatMapCoGroupsInPandas" in p        # per-list LUT kernel
    assert "CartesianProduct" not in p
    p2 = plans.plan_of(pq.ivf_pq_topk(dq, 64, k=5, m=8, n_probe=2,
                                      coarse=coarse, pq_cents=cents))
    assert "CartesianProduct" not in p2


def test_total_percentage_no_single_partition_exchange(engine):
    """A6 (VERDICT r10 #3): the grand total joins back as a broadcast of
    a 1-row aggregate — no empty-partition window funneling the whole
    cells frame through one task (``Exchange SinglePartition`` feeding a
    Window operator). The only SinglePartition exchange allowed is the
    one inside the 1-row total aggregation itself (upstream of the
    broadcast, over already-aggregated group rows)."""
    df = engine.with_total_percentage(
        QuerySpec.from_params("lineitem", drilldown="l_returnflag"),
        "price_amount_sum")
    p = plans.plan_of(df)
    assert "Window" not in p
    # keyless 1-row cross join plans as BroadcastNestedLoopJoin — the
    # broadcast side is the single total row, so "nested loop" is O(cells)
    assert "BroadcastNestedLoopJoin" in p and "BroadcastExchange" in p


def test_pq_txn_serving_reads_only_probed_lists(spark, sf_dir, tmp_path):
    """x94 serving (VERDICT r10 #6 'plan-asserted partition-scoped'):
    pq_txn_topk's codes scan opens EXACTLY the probed lists' manifest
    files — the FileScan's InMemoryFileIndex path count equals the
    probed lists' file count, not the table's."""
    import os

    from openapc_olap_spark.operators import pq
    from openapc_olap_spark.sources.txn import TxnTable

    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    qv = F.transform(F.col("embedding").cast("array<double>"),
                     lambda x: F.floor(x * 1000 + F.lit(0.5))
                     .cast("double"))
    dq = emb.select("vec_id", qv.alias("embedding"))
    corpus = pq._clean(dq, 64, "vec_id", "embedding")
    coarse = pq.first_n_vectors(corpus, 8)
    cents = pq.train_pq_cents(pq.first_n_vectors(corpus, 16), coarse, 8)
    path = str(tmp_path / "pqplan")
    pq.create_pq_txn_index(spark, path, dq, coarse, cents)
    ct = TxnTable(spark, f"{path}/codes", "list_id")
    snap = ct.snapshot()
    n_all = len(snap["files"])
    qvec = [float(x) for x in corpus.filter(F.col("id") == 1)
            .first()["v"]]
    from openapc_olap_spark.operators.similarity import _ivf_probe_ids
    probes = _ivf_probe_ids(coarse, qvec, 2)
    n_probed = len([f for f in snap["files"]
                    if f["partition"] in {str(p) for p in probes}])
    assert 0 < n_probed < n_all
    top = pq.pq_txn_topk(spark, path, qvec, k=5, n_probe=2, rerank=15,
                         exclude_id=1)
    p = plans.plan_of(top)
    import re
    counts = [int(x) for x in
              re.findall(r"InMemoryFileIndex\((\d+) paths?\)", p)]
    assert counts, "expected FileScan InMemoryFileIndex nodes"
    # both scans (codes + vectors) are pruned to the probed lists
    assert all(c <= n_probed for c in counts), (counts, n_probed, n_all)
    assert top.count() == 5


def test_wordpiece_encode_plan_shapes(spark, sf_dir):
    """x99/x100: segment_words is ZERO-shuffle — the vocab reaches the
    distinct-word frame as a 1-row broadcast map (BroadcastNestedLoop,
    never cartesian/sort-merge) and the greedy fold is a pure
    projection (no Python); wordpiece_encode adds exactly the
    broadcast word->pieces join plus the per-doc reassembly aggregate,
    still with no sort-merge and no UDF anywhere."""
    from openapc_olap_spark import plans as p_
    from openapc_olap_spark.operators import wordpiece as wp

    spark.catalog.clearCache()
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    words = (docs.select(F.explode(
        wp.text.tokens("text")).alias("word")).distinct())
    seg = wp.segment_words(words, ["a", "##b", "ab"], word_cap=6,
                           max_piece=4)
    ps = p_.plan_of(seg)
    assert "BroadcastNestedLoopJoin" in ps      # the 1-row vocab map
    assert "CartesianProduct" not in ps and "SortMergeJoin" not in ps
    assert "BatchEvalPython" not in ps and "MapInPandas" not in ps
    # beyond the word-distinct's own shuffle, segmentation adds none
    # (the vocab map's BroadcastExchange is not a shuffle)
    assert (p_.plan_of(seg).count("Exchange hashpartitioning")
            == p_.plan_of(words).count("Exchange hashpartitioning"))
    enc = wp.wordpiece_encode(docs, ["a", "##b", "ab"], word_cap=6,
                              max_piece=4, broadcast_vocab=True)
    pe = p_.plan_of(enc)
    assert p_.has_broadcast_join(enc)           # word -> pieces join
    assert "CartesianProduct" not in pe and "SortMergeJoin" not in pe
    assert "BatchEvalPython" not in pe and "MapInPandas" not in pe
    # VERDICT r11 #1: the default carries NO forced hint — the
    # distinct-word frame is Heaps'-law vocabulary-sized at 100 TB and
    # a forced broadcast would OOM the driver. False degrades to a
    # shuffle hash join; all three modes agree bit-for-bit.
    auto = wp.wordpiece_encode(docs, ["a", "##b", "ab"], word_cap=6,
                               max_piece=4)
    hints = lambda df: (df._jdf.queryExecution().analyzed().toString()
                        .count("ResolvedHint"))
    # default = exactly the 1-row __vmap hint; True adds the seg hint
    assert hints(auto) == hints(enc) - 1
    sharded = wp.wordpiece_encode(docs, ["a", "##b", "ab"], word_cap=6,
                                  max_piece=4, broadcast_vocab=False)
    psh = p_.plan_of(sharded)
    assert "ShuffledHashJoin" in psh
    key = lambda df: sorted((r["doc_id"], tuple(r["wp_tokens"]))
                            for r in df.collect())
    want = key(enc)
    assert key(auto) == want and key(sharded) == want


def test_txn_between_read_opens_only_matching_files(spark, tmp_path):
    """x97: the zone-map read's scan relation holds EXACTLY the files
    whose footer stats can intersect the bound — data skipping happens
    at the manifest, before Spark ever lists a file."""
    from openapc_olap_spark.sources.txn import TxnTable

    rows = [(f"p{i // 10}", i) for i in range(50)]
    df = spark.createDataFrame(rows, "part string, seqno int")
    t = TxnTable.create(spark, str(tmp_path / "t"), df, "part")
    bounded = t.read(between={"seqno": (13, 27)})
    files = bounded.inputFiles()
    want = {e["path"].split("/")[-1] for e in t.snapshot()["files"]
            if e["stats"]["seqno"]["max"] >= 13
            and e["stats"]["seqno"]["min"] <= 27}
    assert {f.split("/")[-1] for f in files} == want and len(want) == 2
