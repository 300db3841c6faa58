"""Semantic unit tests for change compaction and gap-fill/forward-fill:
small literal inputs with hand-computed expected outputs (first-row
keep, quantization boundary, leading-gap NULL, per-key grid spans)."""

from __future__ import annotations

import datetime

from public_projet_data_engineering_tarification_electrique_spark.operators.timeseries import (
    change_compaction,
    gap_fill_daily,
)

EV_SCHEMA = "event_id long, user_id long, ts long, value double"


def test_change_compaction_quantized_runs(spark):
    rows = [
        (1, 1, 100, 3.2),  # first reading → kept, v=3
        (2, 1, 200, 3.9),  # floor still 3 → dropped
        (3, 1, 300, 4.0),  # 3→4 → kept
        (4, 1, 400, 3.99),  # 4→3 → kept (change back counts)
        (5, 2, 100, 3.2),  # other key: its own first reading → kept
    ]
    out = change_compaction(spark.createDataFrame(rows, EV_SCHEMA)).collect()
    got = {(r.user_id, r.ts): r.v for r in out}
    assert got == {(1, 100): 3, (1, 300): 4, (1, 400): 3, (2, 100): 3}


def test_gap_fill_daily_forward_fill_and_spans(spark):
    def ts(day, hour=0):
        return datetime.datetime(2024, 1, day, hour)

    rows = [
        # user 1: days 1 and 4 observed → days 2,3 filled with day-1 mean
        (1, 1, ts(1, 0), 2.0),
        (2, 1, ts(1, 12), 4.0),  # day-1 mean = 3.0
        (3, 1, ts(4), 7.0),
        # user 2: single day → 1-row grid, no gaps
        (4, 2, ts(9), 5.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    out = {
        (r.user_id, r.day): (r.v, r.was_gap)
        for r in gap_fill_daily(df).collect()
    }
    assert out == {
        (1, "2024-01-01"): (3.0, False),
        (1, "2024-01-02"): (3.0, True),
        (1, "2024-01-03"): (3.0, True),
        (1, "2024-01-04"): (7.0, False),
        (2, "2024-01-09"): (5.0, False),
    }
