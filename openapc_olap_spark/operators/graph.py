"""Link-graph analysis: PageRank over an edge frame (SURVEY.md §2.9
extension — the web-curation quality prior: harvest pipelines weight
domains/URLs by link authority (Common Crawl's harmonic-centrality
ranks, OPIC crawl ordering), and the same iteration ranks any derived
graph — citation, user-item, domain-domain. Reference has no
equivalent; driver-mandated LLM-pipeline surface).

The fully-specified power iteration (so any engine replays it):

    r_0(v)   = 1 / N
    r_i+1(v) = (1 - d) / N  +  d * ( sum_{(u,v) in E} r_i(u) / outdeg(u)
                                     + dangling_i / N )

where dangling_i = sum of r_i over nodes with no out-edges — the
standard mass-conserving treatment, so sum(r) == 1 every iteration (a
test invariant). Duplicate (src, dst) edges are parallel edges: each
contributes (multigraph semantics).

100 TB posture:
- per iteration: one join of the rank frame with the edge frame on src
  (edges pre-partitioned by src would reuse the exchange every round)
  and one map-side-combined aggregation on dst. Nothing corpus-sized
  reaches the driver — the dangling mass is a one-row aggregate scalar
  per round (model-grain, the kmeans/bpe rule).
- the rank frame is localCheckpoint-ed each round, so the plan stays
  constant-size across iterations instead of growing a join-tree per
  round (the x35 connected-components discipline).
- ``deterministic=True`` folds each node's in-contributions sorted by
  source id so double additions associate identically across
  partitionings and engines (the x54/x58 discipline) — the oracle-replay
  mode; the default map-side sum is the at-scale mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def out_degrees(edges: DataFrame, src_col: str = "src") -> DataFrame:
    """(src, outdeg) — parallel edges each count."""
    return (edges.groupBy(F.col(src_col).alias("__node"))
            .agg(F.count(F.lit(1)).alias("__outdeg")))


def graph_nodes(edges: DataFrame, src_col: str = "src",
                dst_col: str = "dst") -> DataFrame:
    """Distinct nodes on either edge end -> (__node)."""
    return (edges.select(F.col(src_col).alias("__node"))
            .unionByName(edges.select(F.col(dst_col).alias("__node")))
            .distinct())


def pagerank(edges: DataFrame, n_iter: int = 10, damping: float = 0.85,
             src_col: str = "src", dst_col: str = "dst",
             deterministic: bool = False,
             round_to: int | None = None) -> DataFrame:
    """(node, rank) after ``n_iter`` fixed power iterations (no
    convergence early-exit — replayability over adaptivity, the
    logreg/kmeans discipline). See the module docstring for the exact
    update rule."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if not 0.0 <= damping <= 1.0:
        raise ValueError(f"damping must be in [0, 1], got {damping}")
    from openapc_olap_spark.operators.dedup import _materialized

    e = _materialized(edges.select(F.col(src_col).alias("__src"),
                                   F.col(dst_col).alias("__dst")))
    deg = out_degrees(e, "__src")
    nodes = _materialized(
        graph_nodes(e, "__src", "__dst")
        .join(deg, ["__node"], "left")
        .select("__node",
                F.coalesce("__outdeg", F.lit(0)).alias("__outdeg")))
    n = nodes.count()
    if n == 0:
        return edges.sparkSession.createDataFrame([], "node string, rank double")
    base = (1.0 - damping) / n

    ranks = nodes.select("__node", "__outdeg",
                         F.lit(1.0 / n).alias("__rank"))
    for _ in range(n_iter):
        # the dangling mass rides the round's own plan as a broadcast
        # 1-row aggregate instead of a per-round driver collect (r14,
        # guide §5 — fewer driver round-trips): the same SUM over the
        # same checkpointed rank frame, divided by the same exact n, so
        # the per-node update evaluates bitwise-identical doubles
        dang = (ranks.filter(F.col("__outdeg") == 0)
                .agg((F.sum("__rank") / F.lit(float(n)))
                     .alias("__dpn")))
        contribs = (e.join(ranks, e["__src"] == ranks["__node"])
                    .select(F.col("__dst").alias("__node"),
                            F.col("__src").alias("__from"),
                            (F.col("__rank") / F.col("__outdeg"))
                            .alias("__c")))
        if deterministic:
            ordered = F.transform(
                F.array_sort(F.collect_list(F.struct("__from", "__c"))),
                lambda s: s["__c"])
            inflow = (contribs.groupBy("__node")
                      .agg(F.aggregate(ordered, F.lit(0.0),
                                       lambda acc, x: acc + x)
                           .alias("__in")))
        else:
            inflow = (contribs.groupBy("__node")
                      .agg(F.sum("__c").alias("__in")))
        ranks = (nodes.join(inflow, ["__node"], "left")
                 .crossJoin(F.broadcast(dang))
                 .select("__node", "__outdeg",
                         (F.lit(base) + F.lit(damping)
                          * (F.coalesce(F.col("__in"), F.lit(0.0))
                             + F.coalesce(F.col("__dpn"), F.lit(0.0))))
                         .alias("__rank"))
                 ).localCheckpoint(eager=True)

    rank = F.col("__rank")
    if round_to is not None:
        rank = F.round(rank, round_to)
    return ranks.select(F.col("__node").alias("node"),
                        rank.alias("rank"))
