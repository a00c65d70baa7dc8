"""Cohort retention analysis (SURVEY.md §2.9 X6 family — the classic
event-analytics companion to the funnel: group users by first-seen
period, count how many are still active k periods later; reference has
no equivalent, driver-mandated surface).

Shape: two aggregations and one user-keyed join —
1. first-seen: min event time per user (user-cardinality output);
2. activity: distinct (user, period) pairs;
3. retention: join activity to first-seen on the user key, derive the
   period offset, count distinct users per (cohort, offset).

The first-seen side is USER-cardinality — billions of rows at web
scale — so it must NOT carry a broadcast hint (a forced hint overrides
``autoBroadcastJoinThreshold`` and would collect the whole user table
to the driver). The join is left to Catalyst/AQE: it broadcasts when
the user table is genuinely small and degrades to a shuffle join
otherwise; both sides are already keyed on ``u``, and the activity
frame arrives pre-shuffled on ``u`` from its distinct, so the shuffle
path reuses that partitioning for one side.

Periods are epoch-relative day buckets (``period_days``) — a pure
arithmetic floor both engines compute identically, with no calendar
dependency (ISO weeks differ across engines; day arithmetic does not).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _period(ts: Column, period_days: int) -> Column:
    """Epoch-relative period index: floor(unix_days / period_days)."""
    return F.floor(F.unix_timestamp(ts)
                   / F.lit(86400 * period_days)).cast("long")


def cohort_retention(df: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts",
                     period_days: int = 7) -> DataFrame:
    """(cohort_period, period_offset, n_users): users first seen in
    cohort_period who were active period_offset periods later (offset 0
    is the cohort size itself, since the first event is activity).

    100 TB posture: activity dedup is one (user, period) distinct —
    map-side combined, output bounded by users x active periods; the
    first-seen frame is user-cardinality, so its join carries NO
    broadcast hint (see module docstring) — AQE picks broadcast only
    when the user table actually fits; the final count_distinct
    shuffles at (cohort, offset) grain.
    """
    p = _period(F.col(ts_col), period_days)
    activity = (df.select(F.col(user_col).alias("u"), p.alias("pd"))
                .distinct())
    first_seen = (activity.groupBy("u")
                  .agg(F.min("pd").alias("cohort_pd")))
    return (activity.join(first_seen, ["u"])
            .groupBy(F.col("cohort_pd").alias("cohort_period"),
                     (F.col("pd") - F.col("cohort_pd"))
                     .alias("period_offset"))
            .agg(F.countDistinct("u").alias("n_users")))


def retention_rates(ret: DataFrame) -> DataFrame:
    """Attach the retention rate: each (cohort, offset) count divided by
    the cohort's offset-0 size. The divisor frame is cohort-cardinality
    (tiny) and broadcasts."""
    base = (ret.filter(F.col("period_offset") == 0)
            .select("cohort_period", F.col("n_users").alias("__size")))
    return (ret.join(F.broadcast(base), ["cohort_period"])
            .withColumn("retention",
                        F.col("n_users").cast("double") / F.col("__size"))
            .drop("__size"))
