"""Structured Streaming twins of the batch event-window operators
(SURVEY.md §2.9 X6; batch forms in operators.windows).

Design: the *same* groupBy/agg expressions serve batch and streaming — batch
results are the oracle for the streaming path (tested in
tests/test_streaming.py). Streaming adds only the streaming concerns:

- source: ``readStream`` over a directory of parquet/json files with an
  explicit schema (streaming sources cannot infer), ns->us timestamp repair
  matching session.load_tables;
- watermarks for late-data bounds and state eviction — without one, a
  windowed aggregation's state grows forever at 100 TB/day;
- sinks: memory (tests), parquet+checkpoint (production shape).

``trigger(availableNow=True)`` turns any of these into an incremental batch
job — the scale-friendly way to run periodic rollups with exactly-once sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Event-table schema (TESTDATA.md). The parquet stores ts as
# TIMESTAMP(NANOS); current Spark reads that natively as TIMESTAMP_NTZ
# (µs precision, truncating) in both batch and streaming readers, so the
# stream declares NTZ and matches session.load_tables bit-for-bit. (The
# legacy nanosAsLong long-read path is inert on this Spark; load_tables
# keeps a dtype-conditional repair for sessions where it still applies.)
EVENTS_RAW_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampNTZType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def read_event_stream(spark: SparkSession, path: str,
                      fmt: str = "parquet",
                      max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source event stream (explicit schema — streaming sources cannot
    infer one).

    ``maxFilesPerTrigger`` bounds per-microbatch input — the knob that keeps
    a backlogged 100 TB directory from becoming one giant first batch.
    """
    reader = spark.readStream.schema(EVENTS_RAW_SCHEMA).format(fmt)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.load(path)
    # watermarks demand TIMESTAMP (not NTZ); the session timezone is pinned
    # UTC (session._DEFAULT_CONFS) so the cast is value-preserving and the
    # windows land identically to the batch twins
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def windowed_aggregate(events: DataFrame, duration: str = "1 hour",
                       slide: str | None = None,
                       watermark: str | None = "30 minutes",
                       group_cols: list[str] | None = None) -> DataFrame:
    """Tumbling (or sliding when ``slide`` given) window counts + value sum.

    Same expressions as operators.windows.tumbling/sliding; emits the raw
    window struct (streaming sinks need it for append-mode semantics).
    """
    groups = group_cols or []
    if watermark:
        events = events.withWatermark("ts", watermark)
    win = F.window("ts", duration, slide) if slide else F.window("ts", duration)
    return (events.groupBy(win.alias("w"), *groups)
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 4).alias("value_sum")))


def sessionized(events: DataFrame, gap: str = "10 minutes",
                user_col: str = "user_id",
                watermark: str | None = "30 minutes") -> DataFrame:
    """Streaming session windows — the genuinely stateful operator: state is
    one open session per user, merged/evicted by watermark."""
    if watermark:
        events = events.withWatermark("ts", watermark)
    return (events.groupBy(F.session_window("ts", gap).alias("w"),
                           F.col(user_col))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 4).alias("value_sum")))


def deduplicated(events: DataFrame, keys: list[str] | None = None,
                 watermark: str = "30 minutes",
                 within_watermark: bool = True) -> DataFrame:
    """Streaming exact dedup — the ingest guard of a training-data pipeline
    (at-least-once sources like Kafka redeliver; downstream wants each
    event once).

    ``within_watermark`` uses ``dropDuplicatesWithinWatermark``: duplicates
    are dropped when they arrive within the watermark delay of the first
    occurrence, and state is EVICTED afterwards — bounded state, the only
    viable shape at 100 TB/day (plain dropDuplicates keeps every key seen
    forever). The contract, matching the guarantee Spark documents: exact
    dedup among events whose duplicates arrive within the delay; a
    duplicate arriving later than the delay may reappear — size the
    watermark to the source's redelivery horizon.
    """
    keys = keys or ["event_id"]
    events = events.withWatermark("ts", watermark)
    if within_watermark:
        return events.dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys + ["ts"])


def finalize_windows(df: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Project the window struct to the string form the batch operators emit,
    so streaming output compares 1:1 with the batch oracle."""
    groups = group_cols or []
    return df.select(
        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        *groups, "n_events", "value_sum")


def run_to_memory(stream_df: DataFrame, name: str,
                  output_mode: str = "complete"):
    """Drain the stream's available input into an in-memory table
    (test/debug sink); returns after the availableNow run finishes."""
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode(output_mode).trigger(availableNow=True).start())
    q.awaitTermination()
    return q


def write_stream_parquet(stream_df: DataFrame, path: str, checkpoint: str,
                         output_mode: str = "append"):
    """Production sink shape: parquet + checkpoint = exactly-once restartable.
    Append mode requires a watermark upstream (Spark enforces it)."""
    return (stream_df.writeStream.format("parquet")
            .option("path", path)
            .option("checkpointLocation", checkpoint)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start())
