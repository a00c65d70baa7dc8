"""Physical-plan audit utilities (SURVEY.md §4).

At 100 TB the difference between a good and a bad plan is the cluster bill,
so plan shape is a first-class, testable property here: these helpers read
the executed SparkPlan string and assert the characteristics that make a
query survive a 1000-executor scale-up — filters pushed into the parquet
scan, columns pruned at the source, map-side partial aggregation, broadcast
joins for dimension enrichment, top-k without a global sort, and partition
pruning for institution slices.

Used by tests/test_plans.py as a CI gate; also importable interactively:

    from openapc_olap_spark import plans
    print(plans.plan_of(df))
    assert plans.filters_pushed(df, "EqualTo(c_mktsegment,BUILDING)")
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = [
    "plan_of",
    "scan_lines",
    "filters_pushed",
    "columns_read",
    "single_scan",
    "has_partial_aggregate",
    "has_broadcast_join",
    "has_sort_merge_join",
    "has_global_sort",
    "is_top_k",
    "partition_filters",
    "exchange_count",
    "shuffle_exchange_count",
]


def plan_of(df: DataFrame) -> str:
    """Executed physical plan as text (post-AQE when collected)."""
    return df._jdf.queryExecution().executedPlan().toString()


def scan_lines(df: DataFrame) -> list[str]:
    """The FileScan lines of the plan (one per source scan)."""
    return [ln for ln in plan_of(df).splitlines() if "FileScan" in ln]


def filters_pushed(df: DataFrame, *fragments: str) -> bool:
    """True if every fragment appears in the plan's PushedFilters clauses
    (e.g. ``"EqualTo(c_mktsegment,BUILDING)"``)."""
    plan = plan_of(df)
    if "PushedFilters" not in plan:
        return False
    pushed = "".join(seg.split("]")[0]
                     for seg in plan.split("PushedFilters:")[1:])
    return all(f in pushed for f in fragments)


def columns_read(df: DataFrame) -> str:
    """Concatenated ReadSchema clauses — what actually leaves the source.
    A column name absent here was pruned before the scan."""
    plan = plan_of(df)
    return "".join(seg.split(">")[0]
                   for seg in plan.split("ReadSchema:")[1:])


def single_scan(df: DataFrame) -> bool:
    """True if the plan reads its source exactly once (no accidental
    double-scan from an unpersisted self-join or re-used branch)."""
    return plan_of(df).count("FileScan") == 1


def has_partial_aggregate(df: DataFrame) -> bool:
    """True if aggregation is split partial (map-side) + final, i.e. the
    shuffle moves pre-combined state, not raw rows."""
    plan = plan_of(df)
    return "partial_" in plan


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_of(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in plan_of(df)


def has_global_sort(df: DataFrame) -> bool:
    """A range-partitioned exchange = full-data global sort. Top-k queries
    must NOT have one."""
    return "Exchange rangepartitioning" in plan_of(df)


def is_top_k(df: DataFrame) -> bool:
    """True if ORDER BY + LIMIT fused into per-partition heaps
    (TakeOrderedAndProject) instead of a global sort."""
    return "TakeOrderedAndProject" in plan_of(df) and not has_global_sort(df)


def partition_filters(df: DataFrame) -> str:
    """The PartitionFilters clause of the scan ('' if none) — non-empty
    means partition pruning happened at planning time."""
    plan = plan_of(df)
    if "PartitionFilters" not in plan:
        return ""
    return plan.split("PartitionFilters:")[1].split("]")[0]


def exchange_count(df: DataFrame) -> int:
    """Number of exchanges of any kind (shuffle + broadcast) in the plan."""
    return plan_of(df).count("Exchange")


def shuffle_exchange_count(df: DataFrame) -> int:
    """Number of SHUFFLE exchanges (hash/range repartitioning) — the unit
    of cost at 100 TB. Broadcast exchanges are excluded: they move only the
    small side and are usually the cheap, desired strategy."""
    plan = plan_of(df)
    return (plan.count("Exchange hashpartitioning")
            + plan.count("Exchange rangepartitioning")
            + plan.count("Exchange SinglePartition"))
