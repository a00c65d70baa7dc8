"""Ordered event-funnel analysis (SURVEY.md §2.9 X6 family — the classic
event-analytics progression query: how many users did click → signup →
purchase, in that order; reference has no equivalent, driver-mandated
surface).

Semantics: a user advances to step k at the EARLIEST event of step k's
type that is strictly later than their step k-1 time (greedy first
match, the standard funnel definition). Strict ordering means identical
timestamps never advance two steps — deterministic under ties by
construction, no within-tie ordering dependence.

One shuffle: per-user events collect into a sorted array and a single
left-to-right fold computes the progression — no per-step join chain
(the naive formulation is K sequential aggregate+join rounds, i.e. K
shuffles). Per-user state is the user's event list; for multi-year
retention funnels at 100 TB, pre-filter to the funnel's event types
(done here) and time range before the collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_progress(df: DataFrame, steps: list[str],
                    user_col: str = "user_id",
                    type_col: str = "event_type",
                    ts_col: str = "ts",
                    max_events_per_type: int | None = None) -> DataFrame:
    """(user_col, step_reached, step_ts): deepest funnel step each user
    reached (0 = none) and the timestamp of that advancement (NULL at
    step 0). Users with no events of any funnel type emit step 0 only if
    present in the filtered input — pre-join a user dimension for
    zero-fill semantics.

    NULL-timestamp events are dropped before the fold: a NULL ts can
    neither start nor advance the funnel (the min-after-min formulation
    never selects NULL; without the filter a NULL-ts event would match
    the step-0 sentinel and corrupt the progression).

    ``max_events_per_type`` is the skew guard for adversarial users (a
    bot with 10M click events would otherwise materialize a 10M-element
    array in one aggregation buffer): keep only the EARLIEST N events
    per (user, step-type) via a window rank — the window's sort-based
    processing spills to disk instead of buffering, and the collected
    array is then bounded by N x len(steps). Exact whenever every
    (user, type) count is <= N (the greedy fold only ever selects
    earliest-after-threshold events); for users beyond the cap it is a
    documented approximation that considers only their earliest N
    events of each type."""
    if not steps:
        raise ValueError("steps must be non-empty")
    steps_arr = F.array(*[F.lit(s) for s in steps])
    ev = (df.filter(F.col(type_col).isin(steps)
                    & F.col(ts_col).isNotNull())
          .select(F.col(user_col),
                  F.struct(F.col(ts_col).alias("ts"),
                           F.col(type_col).alias("et")).alias("e")))
    if max_events_per_type is not None:
        from pyspark.sql import Window
        w = (Window.partitionBy(user_col, F.col("e.et"))
             .orderBy(F.col("e.ts").asc()))
        ev = (ev.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") <= max_events_per_type)
              .drop("__rn"))
    # NULL start, not an epoch sentinel: a sentinel floor would silently
    # exclude placeholder/pre-epoch timestamps from ever starting the
    # funnel, diverging from the min-after-min formulation
    zero = F.struct(F.lit(0).alias("step"),
                    F.lit(None).cast("timestamp").alias("last"))
    fold = F.aggregate(
        F.array_sort(F.collect_list("e")), zero,
        lambda acc, e: F.when(
            (acc["step"] < F.lit(len(steps)))
            & (e["et"] == F.element_at(steps_arr, acc["step"] + 1))
            & (acc["last"].isNull() | (e["ts"] > acc["last"])),
            F.struct((acc["step"] + 1).alias("step"),
                     e["ts"].alias("last"))
        ).otherwise(acc))
    out = (ev.groupBy(user_col).agg(fold.alias("__f"))
           .select(F.col(user_col),
                   F.col("__f.step").alias("step_reached"),
                   F.when(F.col("__f.step") > 0, F.col("__f.last"))
                   .alias("step_ts")))
    return out


def funnel_report(df: DataFrame, steps: list[str],
                  user_col: str = "user_id",
                  type_col: str = "event_type",
                  ts_col: str = "ts",
                  max_events_per_type: int | None = None) -> DataFrame:
    """Per-depth rollup: (step_reached, n_users) plus the conversion
    denominator is step 1's count — one extra tiny aggregation over the
    user-grain progression frame."""
    prog = funnel_progress(df, steps, user_col, type_col, ts_col,
                           max_events_per_type)
    return (prog.groupBy("step_reached")
            .agg(F.count(F.lit(1)).alias("n_users")))
