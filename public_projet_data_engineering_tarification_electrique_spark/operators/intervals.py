"""Interval algebra over per-key time spans (extension surface).

The reference's data model is point-in-time readings (daily regional
consumption, reference:airflow/dags/insert_conso_jour_region_in_bq.py:80);
a real logistics/metering warehouse also reasons about SPANS — "how many
distinct days did this supplier have at least one shipment in transit?",
"what was the peak number of concurrent shipments?". Neither is a plain
aggregate: spans overlap, so summing durations double-counts and a naive
DISTINCT-day explode materializes one row per covered day (a 50-day span
costs 50 rows — the classic blow-up this module avoids).

Two classic constructions, both one hash-partition shuffle on the key:

- **interval union (gaps-and-islands sweep)**: order each key's spans by
  (start, end), carry the running max of span ends over PRECEDING rows;
  a span whose start exceeds that carry opens a new island. Coverage is
  then the sum of per-island extents — exact, no per-day explode.
- **peak concurrency (boundary counting)**: unpivot each span into a
  +1 event at start and a −1 event at end, running-sum per key in
  (boundary, delta) order — half-open [start, end) spans mean a span
  ending exactly where another starts does NOT overlap it, which the
  (boundary, delta) sort order encodes by applying −1 before +1.

Scale design: every window here is partitioned by the interval key
(suppliers/users — high cardinality), so no single-task wall; the
boundary table is exactly 2 rows per span. All outputs are exact
integers (day numbers via datediff) — no float drift between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interval_coverage(
    spans: DataFrame,
    key_col: str = "key",
    start_col: str = "start_day",
    end_col: str = "end_day",
) -> DataFrame:
    """Per-key union length, island count, and peak concurrency of
    half-open integer intervals ``[start, end)``.

    Input: one row per span with integer ``start_col`` < ``end_col``
    (callers convert dates with ``datediff`` first). Output: one row
    per key — ``n_spans``, ``covered`` (union length), ``n_islands``
    (maximal connected overlap groups), ``peak_concurrency`` (max
    simultaneously-open spans). All columns exact integers.

    Spans with NULL start or end are dropped (an unbounded span has no
    finite coverage; callers clamp first if they mean "open-ended"),
    and so are EMPTY or inverted spans (hi <= lo) — under half-open
    semantics they cover nothing, and letting one through would
    corrupt the sweep's running-max carry.
    """
    s, e = F.col(start_col), F.col(end_col)
    base = spans.select(
        F.col(key_col).alias("key"),
        s.cast("long").alias("lo"),
        e.cast("long").alias("hi"),
    ).filter(s.isNotNull() & e.isNotNull() & (e > s))

    # --- islands sweep: one window pair on the key partition ---------
    order = Window.partitionBy("key").orderBy("lo", "hi")
    carry = (
        Window.partitionBy("key")
        .orderBy("lo", "hi")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = base.withColumn("prev_max_hi", F.max("hi").over(carry)).withColumn(
        "new_island",
        # [lo, hi) touching the carry end-to-end (lo == prev_max_hi) is
        # NOT an overlap under half-open semantics -> new island.
        (F.col("prev_max_hi").isNull() | (F.col("lo") >= F.col("prev_max_hi"))).cast(
            "int"
        ),
    )
    islands = flagged.withColumn(
        "island", F.sum("new_island").over(order.rowsBetween(Window.unboundedPreceding, 0))
    )
    per_island = islands.groupBy("key", "island").agg(
        F.min("lo").alias("island_lo"),
        F.max("hi").alias("island_hi"),
        F.count("*").alias("n_spans"),
    )
    cover = per_island.groupBy("key").agg(
        F.sum("n_spans").cast("long").alias("n_spans"),
        F.sum(F.col("island_hi") - F.col("island_lo")).cast("long").alias("covered"),
        F.count("*").cast("long").alias("n_islands"),
    )

    # --- peak concurrency: boundary counting on the same key ---------
    # 2 rows per span; delta -1 sorts before +1 at the same boundary so
    # a span closing where another opens never counts as concurrent.
    bounds = base.select(
        "key",
        F.explode(
            F.array(
                F.struct(F.col("lo").alias("b"), F.lit(1).alias("delta")),
                F.struct(F.col("hi").alias("b"), F.lit(-1).alias("delta")),
            )
        ).alias("ev"),
    ).select("key", F.col("ev.b").alias("b"), F.col("ev.delta").alias("delta"))
    running = Window.partitionBy("key").orderBy("b", "delta").rowsBetween(
        Window.unboundedPreceding, 0
    )
    # Ties within (b, delta) are order-ambiguous between engines, but a
    # running sum over equal deltas is permutation-invariant at every
    # prefix ENDING on the tie group's last row, and the max over the
    # group is reached at a group-internal prefix whose value does not
    # depend on which equal-delta row came first (all +1s, any order,
    # same running values as a multiset).
    peak = (
        bounds.withColumn("open", F.sum("delta").over(running))
        .groupBy("key")
        .agg(F.max("open").cast("long").alias("peak_concurrency"))
    )

    return cover.join(peak, "key")
