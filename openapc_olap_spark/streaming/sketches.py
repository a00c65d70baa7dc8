"""Streaming mergeable sketches: count-min over an event stream, windowed
(SURVEY.md §2.9 X6/X19 composition).

The batch CMS (operators/sketches.py) is mergeable by counter addition;
this module exploits that under Structured Streaming: each watermark-
bounded tumbling window emits its own fixed-size counter grid, and any
span of windows rolls up to the exact sketch of that span — the standard
"sketch per window, merge at query time" pattern for streaming frequency
monitoring.

100 TB posture: streaming state per window is bounded by depth*width
counters regardless of key cardinality or event rate — the whole point of
sketching the stream instead of counting it; late data folds into the
right window until the watermark closes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the shared engine-portable md5 position scheme — the streaming grid must
# be bit-compatible with batch-built sketches for cross-source merges
from openapc_olap_spark.operators.sketches import _cms_pos


def windowed_cms(events: DataFrame, key_col: str = "event_type",
                 duration: str = "1 day", width: int = 256,
                 depth: int = 4,
                 watermark: str | None = "30 minutes") -> DataFrame:
    """Per-window count-min grid over ``key_col`` -> (w, row, pos, cnt),
    only touched counters materialized. Works identically on a batch or
    streaming frame; with a streaming source the groupBy is a stateful
    windowed aggregation whose state is the bounded grid."""
    if watermark:
        events = events.withWatermark("ts", watermark)
    key = F.col(key_col)
    cells = F.explode(F.array(*[
        F.struct(F.lit(r).alias("row"),
                 _cms_pos(key, r, width).alias("pos"))
        for r in range(depth)])).alias("c")
    return (events.select(F.window("ts", duration).alias("w"), cells)
            .groupBy("w", F.col("c.row").alias("row"),
                     F.col("c.pos").alias("pos"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def finalize_cms_windows(df: DataFrame) -> DataFrame:
    """Project the window struct to its string form for sinks/oracles."""
    return df.select(
        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
        .alias("window_start"), "row", "pos", "cnt")
