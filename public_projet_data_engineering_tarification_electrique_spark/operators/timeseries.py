"""Time-series compaction and resampling (extension surface).

The reference's only time-series treatment is the daily mean downsample
(reference:airflow/dags/insert_conso_jour_region_in_bq.py:80-82); a real
metering/telemetry warehouse also needs the two ops here:

- change compaction (report-by-exception): store a reading only when the
  quantized signal changes — the standard compression for meter feeds,
  where consecutive readings repeat the same quantized value.
- gap fill + forward fill: regularize an irregular series onto a daily
  grid, carrying the last observation forward — what every downstream
  window/forecast operator assumes ("one row per key per day").

Scale design: both ops are one window shuffle on the series key and
nothing else. Compaction is lag + filter (no state beyond one row per
partition slot); gap-fill generates the day grid from each key's own
(min, max) span — `sequence()` per key, not a cross join against a
global calendar dimension, so a key with a 3-day history costs 3 rows
no matter how long the calendar is. Forward fill is `last(ignorenulls)`
over an unbounded-preceding frame — a running value, not a self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def change_compaction(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Keep only rows where the quantized signal differs from the key's
    previous reading (first reading always kept).

    The signal is ``floor(value)`` — floor, not round, because floor is
    identical across engines (round's half-way rule differs between
    dialects). ``ts_col`` passes through unchanged, so callers choose
    the precision-safe representation (epoch long or timestamp).
    """
    v = F.floor(value_col).cast("int")
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    quantized = events.select(
        key_col, ts_col, tiebreak_col, v.alias("v")
    ).withColumn("prev_v", F.lag("v").over(w))
    # tiebreak_col rides along so downstream windows (e.g. the SCD2
    # interval lead) can order by (ts, tiebreak) — a TOTAL order even if
    # two surviving changes share a timestamp.
    return quantized.filter(
        F.col("prev_v").isNull() | (F.col("v") != F.col("prev_v"))
    ).select(key_col, ts_col, tiebreak_col, "v")


def gap_fill_daily(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Daily-mean downsample, then fill each key's missing days by
    carrying the last observed daily mean forward.

    The grid spans each key's own [min day, max day]; emitted rows are
    (key, day string, v, was_gap) where ``was_gap`` marks days with no
    observation. Daily means are rounded to 4 dp (after the repo's
    standard +1e-9 half-way nudge) before the fill so the carried value
    is bit-stable across engines and summation orders.
    """
    daily = events.groupBy(
        key_col, F.to_date(ts_col).alias("day")
    ).agg(F.round(F.avg(value_col) + 1e-9, 4).alias("obs"))
    spans = daily.groupBy(key_col).agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    grid = spans.select(
        key_col, F.explode(F.sequence("lo", "hi")).alias("day")
    )
    joined = grid.join(daily, [key_col, "day"], "left")
    fill = Window.partitionBy(key_col).orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return joined.select(
        key_col,
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.last("obs", ignorenulls=True).over(fill).alias("v"),
        F.col("obs").isNull().alias("was_gap"),
    )


def inter_event_gap_histogram(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Log2-binned inter-event gap distribution per user stream — the
    table a session gap parameter is READ FROM (the bimodal valley
    between within-session and between-session gaps is where the
    1800 s of ``sessionize`` comes from; shipping a gap rule without
    this table is guessing).

    Bucket = length(bin(gap_s + 1)) — the integer ⌊log2⌋+1 on both
    engines (gap 0 lands in bucket 1); no float log boundary.

    Plan shape: one user-key window (lag over (ts, order) total order)
    — the same single full-events shuffle every per-user operator here
    pays — then one tiny hash agg on ≤ 64 buckets. Output:
    (gap_bucket, n_gaps, min_gap_s, max_gap_s).
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(key_col).orderBy(
        F.col("_us").asc(), F.col(order_col).asc()
    )
    gaps = (
        events.select(
            F.col(key_col),
            us.alias("_us"),
            F.col(order_col),
        )
        .withColumn("_prev", F.lag("_us").over(w))
        .filter(F.col("_prev").isNotNull())
        .select(
            F.expr("(_us - _prev) div 1000000").alias("_gap_s")
        )
    )
    bucket = F.length(F.bin(F.col("_gap_s") + 1)).cast("int")
    return gaps.groupBy(bucket.alias("gap_bucket")).agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.min("_gap_s").cast("long").alias("min_gap_s"),
        F.max("_gap_s").cast("long").alias("max_gap_s"),
    )
