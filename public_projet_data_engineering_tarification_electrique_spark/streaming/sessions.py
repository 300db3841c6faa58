"""Stateful streaming sessionization — the custom-stateful-operator
pattern (applyInPandasWithState) the batch ``operators.sessions``
twin cannot express incrementally.

Semantics: per user, events accumulate into an open session; a session
CLOSES when a later event arrives more than ``gap_seconds`` after its
end (emitted immediately) or when the event-time watermark passes
``end + gap`` (emitted via state timeout — this is how the stream
declares "no earlier event can still arrive", so results equal the
batch operator on the closed prefix).

Scale design: state per key is ONE fixed-width row (open-session
aggregate + next session number), not buffered events — memory is
O(active users), and the shuffle is the same single user-key exchange
the batch twin pays. Arrow batches move groups into pandas; at 100 TB
the per-batch group iteration stays columnar.
"""

from __future__ import annotations

import tempfile
import uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..session import configure
from .daily import events_stream, stage_landing, stream_shuffle_partitions

OUTPUT_SCHEMA = (
    "user_id long, session_id long, n_events long, "
    "start_s long, end_s long, sum_value double"
)
#: (next_session_id, open?, start_s, end_s, n_events, sum_v4)
#: sum_v4 is the running session sum on the 1e-4 integer grid (long), so
#: the accumulated total is order-independent and bit-identical to the
#: batch twin's exact-grid sum regardless of micro-batch boundaries.
STATE_SCHEMA = (
    "next_sid long, open boolean, start_s long, end_s long, "
    "n_events long, sum_v4 long"
)


def _grid4(x: float) -> int:
    """value -> 1e-4 integer grid, rounding half away from zero on the
    binary double — matches Spark ``round(x*1e4, 0)`` and DuckDB
    ``round(x*1e4)`` exactly. The comparison uses the EXACT fractional
    part (``a - floor(a)`` is exact for doubles: floor shares the
    exponent for a >= 1, and equals 0 below 1), never ``a + 0.5`` —
    adding 0.5 rounds UP for doubles one ulp below a half boundary
    (e.g. a = 0.49999999999999994 -> a+0.5 == 1.0) where both engines
    correctly round DOWN."""
    import math

    g = x * 1e4
    a = abs(g)
    f = math.floor(a)
    r = f + 1 if (a - f) >= 0.5 else f
    return int(r) if g >= 0 else -int(r)


def _make_sessionizer(gap_seconds: int):
    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            next_sid, is_open, start_s, end_s, n_events, sum_v4 = state.get
        else:
            next_sid, is_open, start_s, end_s, n_events, sum_v4 = (
                1, False, 0, 0, 0, 0,
            )
        closed: list[tuple[int, int, int, int, int, int]] = []

        if state.hasTimedOut:
            # watermark passed end+gap: the open session can no longer
            # grow — emit it and drop the state row
            if is_open:
                closed.append(
                    (user_id, next_sid, n_events, start_s, end_s, sum_v4)
                )
            state.remove()
        else:
            frames = [p for p in pdfs if len(p)]
            rows = (
                pd.concat(frames, ignore_index=True).sort_values(
                    ["ts_s", "event_id"], kind="mergesort"
                )
                if frames
                else pd.DataFrame(columns=["ts_s", "event_id", "value"])
            )
            for ts_s, value in zip(rows["ts_s"], rows["value"]):
                ts_s = int(ts_s)
                if is_open and ts_s - end_s > gap_seconds:
                    closed.append(
                        (user_id, next_sid, n_events, start_s, end_s, sum_v4)
                    )
                    next_sid += 1
                    is_open = False
                if is_open:
                    end_s = max(end_s, ts_s)
                    n_events += 1
                    sum_v4 += _grid4(float(value))
                else:
                    is_open = True
                    start_s = end_s = ts_s
                    n_events = 1
                    sum_v4 = _grid4(float(value))
            state.update(
                (next_sid, is_open, start_s, end_s, n_events, sum_v4)
            )
            if is_open:
                # timeout is event-time: fires once watermark > end+gap
                state.setTimeoutTimestamp((end_s + gap_seconds) * 1000)

        if closed:
            out = pd.DataFrame(
                closed,
                columns=[
                    "user_id", "session_id", "n_events",
                    "start_s", "end_s", "sum_value",
                ],
            )
            # off the integer grid exactly once, at emission
            out["sum_value"] = out["sum_value"].astype("float64") / 1e4
            yield out

    return update


def stream_sessionize(
    spark: SparkSession,
    events_path: str,
    gap_seconds: int = 1800,
    watermark: str = "0 seconds",
    checkpoint_dir: str | None = None,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Run gap-sessionization as an availableNow stateful stream over a
    parquet landing path; returns the emitted (closed) sessions.

    With ``availableNow`` the final watermark is the max event time
    minus ``watermark``, so sessions still open at end-of-input stay in
    state (they would resume on the next incremental run) — callers
    comparing against the batch twin should compare the closed prefix.
    """
    configure(spark)
    checkpoint = checkpoint_dir or tempfile.mkdtemp(prefix="ckpt_sess_")
    table = f"sessions_{uuid.uuid4().hex[:8]}"
    src = (
        events_stream(spark, stage_landing(events_path, "landing_sess_"))
        .select(
            "event_id",
            "user_id",
            "value",
            F.expr("unix_micros(ts) DIV 1000000").alias("ts_s"),
            F.col("ts").alias("_et"),
        )
        .withWatermark("_et", watermark)
    )
    sessions = src.groupBy("user_id").applyInPandasWithState(
        _make_sessionizer(gap_seconds),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
    with stream_shuffle_partitions(spark, state_partitions):
        (
            sessions.writeStream.outputMode("append")
            .format("memory")
            .queryName(table)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    return spark.table(table)
