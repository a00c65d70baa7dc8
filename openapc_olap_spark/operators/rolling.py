"""Per-entity rolling features over ordered events (SURVEY.md §2.9 X6
family — the feature-engineering companion to the window rollups: each
event annotated with its user's trailing k-event mean, delta to the
previous event, and running event index. Reference has no equivalent;
driver-mandated surface).

Implementation note: the trailing mean is built from explicit ``lag``
terms rather than a ``rowsBetween`` frame aggregate — for small fixed k
that is the same one window sort, but the addition order becomes an
explicit left-to-right expression identical in any engine (sliding
frame aggregates may subtract-on-slide or tree-combine, which is
numerically legal but not bit-reproducible across engines — the same
reason lm.py folds sorted lists). One shuffle total: the window
partition by entity; ordering includes the event id as a tiebreaker so
equal timestamps rank deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_features(df: DataFrame, k: int = 3,
                     user_col: str = "user_id",
                     ts_col: str = "ts",
                     id_col: str = "event_id",
                     value_col: str = "value",
                     round_to: int | None = None) -> DataFrame:
    """Attach per-``user_col`` ordered features to every event:

    - ``event_idx``: 1-based running index (row_number);
    - ``value_delta``: value minus the previous event's value (NULL on
      each user's first event);
    - ``rolling_mean_k``: mean of the trailing ``k`` values INCLUDING
      the current one, over however many exist (partial windows use the
      true count).

    100 TB posture: one hash shuffle on the entity key + one in-
    partition sort serves all features (every expression shares the
    same window spec, so Catalyst plans a single Window operator);
    state per entity is k lag slots, not the event history.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(),
                                            F.col(id_col).asc())
    v = F.col(value_col).cast("double")
    lags = [v] + [F.lag(v, i).over(w) for i in range(1, k)]
    # left-to-right fold over present lags: ((v + l1) + l2) ...
    total = lags[0]
    for term in lags[1:]:
        total = F.when(term.isNotNull(), total + term).otherwise(total)
    cnt = sum(F.when(t.isNotNull(), 1).otherwise(0) for t in lags)
    mean = total / cnt
    delta = v - F.lag(v, 1).over(w)
    if round_to is not None:
        mean = F.round(mean, round_to)
        delta = F.round(delta, round_to)
    return (df.withColumn("event_idx", F.row_number().over(w))
            .withColumn("value_delta", delta)
            .withColumn("rolling_mean_k", mean))
