"""Watermarked stream-stream interval join (SURVEY.md §2.9 X6 family —
the canonical Structured Streaming correlation: attribute one event
stream to another within a time bound, e.g. purchases to the click that
preceded them; batch twin is operators.temporal.interval_join / x38's
inequality join).

Stream-stream joins are the most state-hungry streaming op: each side
must buffer rows until the watermark proves no matching row can still
arrive. The state bound REQUIRES both ingredients Spark's engine uses to
prune: a watermark on BOTH inputs, and a time-range join condition that
relates the two event times — this module's API makes both mandatory
rather than optional, because omitting either is a 100 TB/day unbounded
state leak that works fine in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(left: DataFrame, right: DataFrame,
                          keys: list[str], within: str,
                          watermark: str,
                          left_ts: str = "ts", right_ts: str = "ts",
                          suffix: str = "_r",
                          how: str = "inner") -> DataFrame:
    """Join two streams on ``keys`` where the right event lands in
    [left_ts, left_ts + within]. Both streams get ``watermark``; state
    held per side is bounded by watermark + within (the engine evicts a
    buffered left row once no right row within the interval can still
    arrive, and vice versa).

    ``how='left_outer'`` additionally emits unmatched left rows (right
    payload NULL) once the watermark proves no match can arrive — the
    attribution-with-nulls shape ("clicks that never converted"). Outer
    NULLs are inherently watermark-delayed: a left row's NULL is emitted
    only after the watermark passes its interval, so rows inside the
    FINAL watermark+within horizon of a bounded run are still buffered
    when the query stops and their NULLs are never flushed (matched
    pairs are complete; only tail-horizon non-matches are withheld —
    the documented engine semantics, asserted in tests).

    Right-side non-key columns are renamed with ``suffix`` so the joined
    row keeps both event payloads without ambiguity. Works identically on
    batch frames (no watermark applied) — the batch result is the oracle
    for the streaming path (x60).
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported join type: {how!r}")
    streaming = left.isStreaming or right.isStreaming
    if streaming:
        left = left.withWatermark(left_ts, watermark)
        right = right.withWatermark(right_ts, watermark)
    renames = {c: c + suffix for c in right.columns if c not in keys}
    r = right
    for old, new in renames.items():
        r = r.withColumnRenamed(old, new)
    rts = right_ts + suffix if right_ts not in keys else right_ts
    l, r = left.alias("l"), r.alias("r")
    cond = None
    for k in keys:
        eq = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = eq if cond is None else (cond & eq)
    cond = (cond
            & (F.col(f"r.{rts}") >= F.col(f"l.{left_ts}"))
            & (F.col(f"r.{rts}") <= F.col(f"l.{left_ts}")
               + F.expr(f"INTERVAL {within}")))
    joined = l.join(r, cond, how)
    # drop the duplicated key columns from the right side
    return joined.select(
        *[F.col(f"l.{c}") for c in left.columns],
        *[F.col(f"r.{c}") for c in r.columns if c not in keys])


def drain_sentinel(spark, path: str,
                   events: list[tuple[str, str]],
                   user_id: int = -1,
                   fmt: str = "parquet") -> None:
    """Flush a bounded left-outer run's withheld NULLs: append a
    watermark-advancing sentinel batch to the file source at ``path``.

    A left-outer stream-stream join emits an unmatched left row's NULL
    only once the watermark passes its interval; in a bounded
    (availableNow) run the rows inside the final watermark+within
    horizon are still buffered when input ends, so their NULLs never
    appear. Writing sentinel events with event time beyond
    ``max_event_ts + within + watermark`` and re-running the query
    advances the watermark past every real row and flushes them
    (incrementally under a checkpoint; from scratch otherwise).

    ``events`` is ``[(event_type, ts_string), ...]`` — one sentinel per
    event type each side's filter keeps, because the watermark node sits
    AFTER those filters: a sentinel of a filtered-out type never reaches
    it. Choose timestamps so no sentinel lands inside a join window:
    put right-stream types EARLIER than left-stream types by more than
    ``within`` (the join requires right_ts >= left_ts, so a right
    sentinel preceding the left one can only match real left rows, which
    the beyond-horizon placement already rules out). Sentinels carry a
    reserved ``user_id`` (default -1) and negative event_ids — filter
    ``user_id != -1`` downstream; the left-type sentinel's own NULL row
    sits at the new horizon and stays withheld.
    """
    from openapc_olap_spark import streaming as _s

    rows = [(-(1000 + i), ts, user_id, et, 0.0, None)
            for i, (et, ts) in enumerate(events)]
    df = (spark.createDataFrame(
        [(eid, ts, uid, et, val, props)
         for eid, ts, uid, et, val, props in rows],
        schema="event_id long, ts string, user_id long, "
               "event_type string, value double, props string")
        .withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        .select(*[f.name for f in _s.EVENTS_RAW_SCHEMA.fields]))
    df.coalesce(1).write.mode("append").format(fmt).save(path)
