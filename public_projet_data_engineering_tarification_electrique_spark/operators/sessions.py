"""Gap-based sessionization over an event stream (extension surface).

The reference has no session concept (its incremental unit is a whole
day, reference:airflow/dags/insert_conso_jour_region_in_bq.py:44-61);
this is the standard analytic operator a training-data / clickstream
pipeline needs.

Scale design: one window shuffle on the entity key, then everything is
per-partition — lag for the gap test, a running sum of boundary flags
for the session index, and a single hash agg for the per-session
rollup. Both shuffles share the same key (user), so AQE coalesces them
into one exchange. Skewed users (bots) are bounded by the gap rule:
state per user is one row, not one session map — this is the batch
twin of Structured Streaming's session window
(F.session_window(ts, gap)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_sessions(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts_s",
    id_col: str = "event_id",
) -> DataFrame:
    """Attach the gap-rule ``session_id`` column (1..k per user in time
    order) — the session-ASSIGNMENT step shared by the rollup
    (``sessionize``) and downstream per-session analyses (the funnel):
    one user-key window shuffle, (ts, id)-ordered for a total order."""
    w = Window.partitionBy(user_col).orderBy(F.asc(ts_col), F.asc(id_col))
    boundary = (
        F.when(
            F.lag(ts_col).over(w).isNull()
            | ((F.col(ts_col) - F.lag(ts_col).over(w)) > gap_seconds),
            1,
        )
        .otherwise(0)
        .cast("long")
    )
    return events.withColumn(
        "session_id",
        F.sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts_s",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Assign gap-based sessions and roll them up.

    A new session starts when the time since the user's previous event
    exceeds ``gap_seconds`` (or there is no previous event). ``ts_col``
    is epoch seconds (long) — callers convert from their native
    timestamp type so the operator is precision-agnostic.

    Output: (user_id, session_id, n_events, start_s, end_s, sum_value)
    with session_id numbered 1..k per user in time order.
    """
    with_session = assign_sessions(
        events,
        gap_seconds=gap_seconds,
        user_col=user_col,
        ts_col=ts_col,
        id_col=id_col,
    )
    # Exact-grid sum: round each value onto the 1e-4 integer grid and sum
    # longs, so per-session totals are independent of float summation
    # order (Spark vs DuckDB vs incremental streaming all agree exactly).
    # round(x*1e4, 0) at scale 0 is engine-portable: decimal HALF_UP and
    # binary round-half-away coincide for doubles below 2**51.
    grid = F.round(F.col(value_col) * F.lit(1e4), 0).cast("long")
    return with_session.groupBy(user_col, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("start_s"),
        F.max(ts_col).alias("end_s"),
        (F.sum(grid) / F.lit(1e4)).alias("sum_value"),
    )
