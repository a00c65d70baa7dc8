"""Event-window analytics over the events table (SURVEY.md §2.9 X6), batch
form. The streaming twins (readStream + watermark) live in
openapc_olap_spark.streaming — same expressions, so batch results are the
oracle for the streaming path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling(df: DataFrame, ts_col: str = "ts", duration: str = "1 hour",
             group_cols: list[str] | None = None) -> DataFrame:
    """Tumbling window aggregate: count + value sum per (window, groups).
    window_start is emitted as an ISO string so results hash identically
    across engines."""
    groups = group_cols or []
    return (df.groupBy(F.window(ts_col, duration).alias("w"), *groups)
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 4).alias("value_sum"))
            .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                    .alias("window_start"), *groups, "n_events", "value_sum"))


def sliding(df: DataFrame, ts_col: str = "ts", duration: str = "1 hour",
            slide: str = "30 minutes",
            group_cols: list[str] | None = None) -> DataFrame:
    """Sliding window aggregate — each event lands in duration/slide
    windows."""
    groups = group_cols or []
    return (df.groupBy(F.window(ts_col, duration, slide).alias("w"), *groups)
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 4).alias("value_sum"))
            .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                    .alias("window_start"), *groups, "n_events", "value_sum"))


def sessionize(df: DataFrame, ts_col: str = "ts", user_col: str = "user_id",
               gap: str = "10 minutes") -> DataFrame:
    """Session windows per user with an inactivity gap: one row per session
    (user, session_start, session_end_s(exclusive = last event + gap),
    n_events, value_sum).

    Uses the built-in ``session_window`` (merging intervals inside a single
    shuffle-by-user aggregation) — the same operator Structured Streaming
    uses for stateful session aggregation, so batch == streaming semantics.
    """
    return (df.groupBy(F.session_window(ts_col, gap).alias("w"),
                       F.col(user_col))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 4).alias("value_sum"))
            .select(F.col(user_col),
                    F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                    .alias("session_start"),
                    "n_events", "value_sum"))


def session_stats(df: DataFrame, ts_col: str = "ts",
                  user_col: str = "user_id",
                  gap: str = "10 minutes") -> DataFrame:
    """Per-user session summary: number of sessions + events."""
    return (sessionize(df, ts_col, user_col, gap)
            .groupBy(user_col)
            .agg(F.count(F.lit(1)).alias("n_sessions"),
                 F.sum("n_events").alias("n_events")))
