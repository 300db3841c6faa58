"""As-of (nearest-timestamp) join — a standard time-series operator the
reference lacks (SURVEY.md §2.3 "absent: … as-of"), provided as part of
the extension surface.

Scale design — union + window, not a join: tag both inputs, union them,
and take ``last(right_payload, ignorenulls)`` over a window partitioned
by the join keys and ordered by time. This is ONE shuffle of
|L| + |R| rows with no candidate-pair blow-up; the classic
join-then-rank formulation shuffles the same data AND materializes
every (left, right) pair that passes the range predicate before
pruning to rank 1. Equal timestamps match inclusively (right sorts
before left via the side tag). Skew note: partitioning is by entity
key, identical to what any per-entity time-series operator needs; AQE
skew-split applies.

KEYLESS calls (``on=()`` — level-table interval lookups, global event
alignment) cannot partition by key; instead of one single-partition
window they take a two-phase running-last (range exchange + P-row
carry collect + partition-local window), P-way parallel — see
``_keyless_running_last``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType


def _keyless_running_last(
    u: DataFrame, ts_order, descending: bool
) -> DataFrame:
    """Attach ``_m`` = the last non-null ``_asof`` payload in
    (ts_order, _side) order, without a single-partition window.

    The per-partition "last" is a ``max_by`` over a sort-faithful
    integer key (``_ats`` negated for descending order, then
    ``_side``); NULL keys — rows with no payload — are ignored by
    max_by, so the collect carries exactly each partition's last-known
    payload. The driver fold keeps the LATEST non-null across prior
    partitions (range partitions are emitted in sort order). Bounded
    driver data: one payload struct per partition.
    """
    spark = u.sparkSession
    try:
        p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except ValueError:
        p = spark.sparkContext.defaultParallelism
    ranged = (
        u.repartitionByRange(max(p, 1), ts_order, F.asc("_side"))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)  # the collect below materializes
    )
    sign = -1 if descending else 1
    ordkey = F.when(
        F.col("_asof").isNotNull(),
        F.struct(
            (F.col("_ats") * sign).alias("k1"), F.col("_side").alias("k2")
        ),
    )
    rows = (
        ranged.groupBy("_pid")
        .agg(F.max_by("_asof", ordkey).alias("_t"))
        .collect()
    )
    totals = {r["_pid"]: r["_t"] for r in rows}
    carry_rows = []
    acc = None
    for pid in sorted(totals):
        carry_rows.append((pid, acc))
        if totals[pid] is not None:
            acc = totals[pid]
    payload_type = ranged.schema["_asof"].dataType
    offsets_df = F.broadcast(
        spark.createDataFrame(
            carry_rows or [(0, None)],
            StructType(
                [
                    StructField("_pid", IntegerType()),
                    StructField("_carry", payload_type),
                ]
            ),
        )
    )
    local_w = (
        Window.partitionBy("_pid")
        .orderBy(ts_order, F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ranged.join(offsets_df, on="_pid", how="left")
        .withColumn(
            "_m",
            F.coalesce(
                F.last("_asof", ignorenulls=True).over(local_w),
                F.col("_carry"),
            ),
        )
        .drop("_pid", "_carry")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    direction: str = "backward",
    tolerance: int | None = None,
    right_prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the nearest right row per key.

    ``direction="backward"`` takes the latest right row with
    ``right_ts <= left_ts``; ``"forward"`` the earliest with
    ``right_ts >= left_ts``. Timestamps are integer-comparable (epoch
    seconds/nanos). ``tolerance`` (same unit) nulls out matches farther
    than the bound. Output: all left columns + ``right_prefix<c>`` for
    each requested right column (null when no match).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction}")
    on = list(on)
    payload = F.struct(
        F.col(right_ts).cast("long").alias("_rts"),
        *[F.col(c) for c in right_cols],
    )
    l = left.select(
        F.lit(1).alias("_side"),
        F.col(left_ts).cast("long").alias("_ats"),
        *[F.col(c) for c in left.columns],
    )
    # A NULL-timestamp right row would sort before every real row
    # (asc = nulls first) and its non-null payload struct would become
    # a spurious universal backward match — it can never legitimately
    # be "nearest", so drop it.
    r = right.filter(F.col(right_ts).isNotNull()).select(
        F.lit(0).alias("_side"),
        F.col(right_ts).cast("long").alias("_ats"),
        *[F.col(c) for c in on],
        payload.alias("_asof"),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    ts_order = F.asc("_ats") if direction == "backward" else F.desc("_ats")
    if on:
        w = (
            Window.partitionBy(*on)
            .orderBy(ts_order, F.asc("_side"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        matched = u.withColumn(
            "_m", F.last("_asof", ignorenulls=True).over(w)
        ).filter(F.col("_side") == 1)
    else:
        # KEYLESS as-of (level-table interval lookups, global event
        # alignment): a window with no partition key would funnel
        # |L|+|R| rows into one task — data-shaped, the q227-class
        # wall. Two-phase instead: range-partition on the time order,
        # compute each partition's LAST non-null payload (one P-row
        # driver collect), fold driver-side into per-partition
        # carry-ins, and merge a partition-LOCAL running last with the
        # carry — exact, P-way parallel.
        matched = _keyless_running_last(
            u, ts_order, descending=(direction == "forward")
        ).filter(F.col("_side") == 1)
    # a NULL-timestamp LEFT row has no defined "as of" point; whatever
    # the window happened to accumulate before it is not a match
    matched = matched.withColumn(
        "_m", F.when(F.col("_ats").isNotNull(), F.col("_m"))
    )
    if tolerance is not None:
        gap = F.abs(F.col("_ats") - F.col("_m._rts"))
        matched = matched.withColumn(
            "_m", F.when(gap <= tolerance, F.col("_m"))
        )
    return matched.select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"_m.{c}").alias(f"{right_prefix}{c}") for c in right_cols],
    )


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    max_delta: int,
    right_cols: Sequence[str],
    right_prefix: str = "r_",
) -> DataFrame:
    """Range (interval) join: pair rows within ``±max_delta`` time units
    per key — WITHOUT the quadratic per-key blow-up of a naive
    inequality join.

    Banding: bucket both sides by ``ts DIV max_delta``; a pair within
    max_delta differs by at most one bucket, so the left side probes
    only buckets {b-1, b, b+1} (a 3× fan-out) and the join is a plain
    equi-join on (keys, bucket) — shuffle-friendly, AQE-splittable.
    Each qualifying pair matches exactly one probe bucket, so no dedup
    pass is needed. The exact |Δt| ≤ max_delta filter runs after the
    equi-join.
    """
    on = list(on)
    # INTEGER division (`div`), not `/`: double division silently loses
    # precision above 2^53 — epoch-nanosecond timestamps land in
    # adjacent-but-wrong buckets and in-range pairs vanish. `div`
    # truncates toward zero, exact at any magnitude for the nonnegative
    # epoch domain these operators document.
    b_r = F.expr(f"cast(`{right_ts}` as long) div {max_delta}")
    r = right.select(
        *[F.col(c) for c in on],
        b_r.alias("_bkt"),
        F.col(right_ts).cast("long").alias("_rts"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right_cols],
    )
    b_l = F.expr(f"cast(`{left_ts}` as long) div {max_delta}")
    l = left.withColumn(
        "_bkt",
        F.explode(F.array(b_l - 1, b_l, b_l + 1)),
    )
    return (
        l.join(r, on=on + ["_bkt"])
        .filter(
            F.abs(F.col(left_ts).cast("long") - F.col("_rts")) <= max_delta
        )
        .drop("_bkt", "_rts")
    )
