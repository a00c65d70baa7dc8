"""Temporal joins (SURVEY.md §2.9 X9): as-of join — the brief's canonical
"operator Spark lacks", re-expressed as a composition of built-in
DataFrame ops rather than an inequality join.

``asof_join`` matches every left row to the LATEST right row with the
same key and ``right_ts <= left_ts`` (inclusive) — the
event-to-slowly-changing-dimension lookup every training pipeline needs
(user profile versions, model configs, price snapshots).

Spark-first shape: a naive implementation is a range join
(``l.key = r.key AND r.ts <= l.ts`` + a per-row max), which Spark executes
as an exploding inner join + aggregation — O(|l| x versions) rows. This
implementation instead UNIONS the two sides, tagged, and takes a
``last(value, ignorenulls=True)`` over a (key, ts, side)-ordered window:

- one shuffle total (the window partition on key), no row multiplication;
- ties (right version exactly at the event ts) resolve inclusively
  because right rows sort before left rows at equal ts;
- at 100 TB this is the same cost as any per-key window — skewed keys
  salt the same way, and AQE handles stragglers.

Precondition: right must have at most one version per (key, ts) — the
defining property of a version/SCD table; with duplicates the winner at
an exact tie of (key, ts) is unspecified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              value_cols: list[str] | None = None,
              tolerance: str | None = None) -> DataFrame:
    """As-of (backward, inclusive) join: every row of ``left`` gains the
    ``value_cols`` of the latest ``right`` row with the same ``on`` key
    and ``right_ts <= left_ts``, plus ``__asof_ts`` (the matched version
    time; NULL when no version exists yet).

    ``tolerance`` (an INTERVAL string, e.g. ``"3 days"``): matches older
    than ``left_ts - tolerance`` are nulled — the staleness bound that
    keeps a 100 TB backfill from silently joining year-old versions.
    """
    vals = value_cols or [c for c in right.columns
                          if c not in (on, right_ts)]
    overlap = set(vals) & set(left.columns)
    if overlap:
        raise ValueError(f"value columns collide with left columns: "
                         f"{sorted(overlap)}; rename or pass value_cols")
    lrow = F.struct(*[F.col(c) for c in left.columns])
    l_tag = left.select(
        F.col(on).alias("__k"), F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_l"), lrow.alias("__lrow"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__asof_ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c)
          for c in vals])
    r_tag = right.select(
        F.col(on).alias("__k"), F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_l"),
        F.lit(None).cast(l_tag.schema["__lrow"].dataType).alias("__lrow"),
        F.col(right_ts).alias("__asof_ts"),
        *[F.col(c) for c in vals])
    # right rows sort before left rows at equal ts -> inclusive match
    w = (Window.partitionBy("__k").orderBy(F.col("__t").asc(),
                                           F.col("__is_l").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = [F.last(c, ignorenulls=True).over(w).alias(c)
              for c in ["__asof_ts", *vals]]
    joined = (l_tag.unionByName(r_tag)
              .select("__is_l", "__lrow", *filled)
              .filter(F.col("__is_l") == 1))
    if tolerance is not None:
        fresh = (F.col("__asof_ts").isNotNull()
                 & (F.col("__asof_ts")
                    >= F.col("__lrow").getField(left_ts)
                    - F.expr(f"INTERVAL {tolerance}")))
        joined = joined.select(
            "__lrow",
            F.when(fresh, F.col("__asof_ts")).alias("__asof_ts"),
            *[F.when(fresh, F.col(c)).alias(c) for c in vals])
    return joined.select(
        *[F.col("__lrow").getField(c).alias(c) for c in left.columns],
        "__asof_ts", *vals)


def _interval_seconds(spec: str) -> int:
    amount, unit = spec.split()
    per = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
           "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}[unit]
    return int(amount) * per


def interval_join(points: DataFrame, intervals: DataFrame,
                  point_ts: str = "ts", start_ts: str = "start",
                  end_ts: str = "end", on: str | None = None,
                  bucket: str = "1 day",
                  value_cols: list[str] | None = None) -> DataFrame:
    """Range (interval-containment) join: every point row joins the
    interval rows with ``start_ts <= point_ts < end_ts`` (half-open) and,
    when ``on`` is given, the same key — the event-in-campaign /
    event-in-session lookup.

    Spark-first shape: the naive inequality join is a broadcast-nested-
    loop or exploding range join. Instead both sides are mapped to
    fixed-width time buckets — each interval EXPLODES to the buckets it
    overlaps, each point to exactly one — and the join is an equi-join on
    (key, bucket) + the exact containment filter. Expansion is bounded by
    interval_length / bucket width, and a point matches each covering
    interval exactly once (its bucket hits one exploded row per
    interval), so no distinct pass is needed.

    Size ``bucket`` near the TYPICAL interval length: too small explodes
    long intervals (cost ~len/bucket rows per interval); too large makes
    buckets collide like a cross join. At 100 TB both sides shuffle once
    on (key, bucket) and AQE handles residual skew.
    """
    secs = _interval_seconds(bucket)
    vals = value_cols or [c for c in intervals.columns
                          if c not in (start_ts, end_ts, on or "")]
    overlap = set(vals) & set(points.columns)
    if overlap:
        raise ValueError(f"interval columns collide with point columns: "
                         f"{sorted(overlap)}; rename or pass value_cols")
    key = [on] if on else []
    p = points.withColumn(
        "__b", F.floor(F.unix_timestamp(F.col(point_ts)) / secs))
    # the end-boundary bucket may be one past the half-open range; the
    # exact containment filter below discards those rows
    iv = intervals.select(
        *key, F.col(start_ts).alias("__s"), F.col(end_ts).alias("__e"),
        *vals).withColumn(
        "__b", F.explode(F.sequence(
            F.floor(F.unix_timestamp(F.col("__s")) / secs),
            F.floor(F.unix_timestamp(F.col("__e")) / secs))))
    cond = [p["__b"] == iv["__b"]] + \
        ([p[on] == iv[on]] if on else [])
    joined = p.join(iv, cond[0] if len(cond) == 1 else
                    cond[0] & cond[1], "inner")
    contained = ((p[point_ts] >= iv["__s"]) & (p[point_ts] < iv["__e"]))
    return (joined.filter(contained)
            .select(*[p[c] for c in points.columns],
                    iv["__s"].alias("__interval_start"),
                    iv["__e"].alias("__interval_end"),
                    *[iv[c] for c in vals]))
