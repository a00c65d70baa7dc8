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
