"""Distributed global ordering: row numbers and size-capped sorted
shards without a single-partition window (extension surface,
BASELINE.json north star — the sorted-export last mile of a training
pipeline).

The naive global rank — ``row_number() OVER (ORDER BY ...)`` with no
PARTITION BY — collapses the whole table into ONE task in Spark (the
window needs a total order, so the exchange is SinglePartition). Fine
at sf0.1, fatal at 100 TB. The scale-correct construction is the
classic two-phase distributed rank:

1. ``repartitionByRange`` on the sort key — partitions are
   range-disjoint and ordered, P-way parallel.
2. Partition-LOCAL ``row_number`` (window partitioned by the physical
   partition id — no further exchange; each task sorts only its
   range).
3. A bounded driver collect of per-partition counts (exactly P rows —
   the only driver-side data, documented here as the bound) turns into
   broadcast prefix offsets; local rank + offset = exact global rank.

The ranged exchange is ``localCheckpoint``'d before step 2: Spark's
range partitioner SAMPLES the data to pick bounds, and a recomputed
exchange may sample differently between the counts job and the final
job — pinning the shuffle output makes the partition→count mapping
stable across both jobs (same reason dedup.py pins its CC iterations).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_by: list[Column],
    rank_col: str = "global_rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global row numbers under a total order, P-way parallel.

    ``order_by`` must be a TOTAL order (include a unique tie-break
    column) — range partitioning only guarantees disjoint key ranges,
    so duplicate full keys could otherwise straddle a boundary and
    make the numbering partition-dependent.

    Cost, honestly: TWO parallel shuffles (the range exchange, then a
    hash exchange on the partition id that the local window demands —
    Catalyst cannot see that the checkpointed data is already
    pid-disjoint). Still the right trade at scale: the naive global
    window is ONE shuffle into ONE task; two P-way-parallel shuffles
    beat one serial sort by ~P. The pid exchange is skew-bounded by
    the range partitioner's equi-depth sampling.
    """
    spark = df.sparkSession
    if num_partitions is None:
        # spark.sql.shuffle.partitions can be non-numeric on some
        # platforms (e.g. "auto" under AQE-advisory configs) — fall
        # back to the cluster's default parallelism rather than crash.
        try:
            p = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except ValueError:
            p = spark.sparkContext.defaultParallelism
    else:
        p = num_partitions
    if p < 1:
        raise ValueError(f"num_partitions must be positive, got {p}")
    ranged = (
        df.repartitionByRange(p, *order_by)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # Bounded driver collect: exactly one row per partition (= p rows,
    # thousands at cluster scale, never data-sized).
    counts = {
        r["_pid"]: r["n"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offsets_df = F.broadcast(
        spark.createDataFrame(
            [(pid, off) for pid, off in offsets.items()] or [(0, 0)],
            "_pid INT, _offset LONG",
        )
    )
    local_w = Window.partitionBy("_pid").orderBy(*order_by)
    return (
        ranged.join(offsets_df, on="_pid", how="left")
        .withColumn(
            rank_col,
            (F.row_number().over(local_w) + F.coalesce("_offset", F.lit(0))).cast(
                "long"
            ),
        )
        .drop("_pid", "_offset")
    )


def sorted_shards(
    df: DataFrame,
    order_by: list[Column],
    docs_per_shard: int,
    shard_col: str = "shard_id",
    rank_col: str = "global_rn",
) -> DataFrame:
    """Assign each row to a size-capped shard of the globally sorted
    order: shard i holds ranks [i*cap+1, (i+1)*cap] — the sorted-JSONL
    export layout (curriculum order, resumable by shard, every shard
    but the last exactly full)."""
    if docs_per_shard <= 0:
        raise ValueError(f"docs_per_shard must be positive, got {docs_per_shard}")
    ranked = global_row_number(df, order_by, rank_col=rank_col)
    # integer `div`, never float division: a double quotient can round
    # across the shard boundary at extreme ranks (> ~2^47·cap) — same
    # exact-integer-grid idiom as sampling.py / asof.py / bloom.py.
    return ranked.withColumn(
        shard_col,
        F.expr(f"cast(({rank_col} - 1) div {int(docs_per_shard)} as int)"),
    )
