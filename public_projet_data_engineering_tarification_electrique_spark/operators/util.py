"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition iff the input has fewer partitions than the session's
    parallelism.

    Compute-heavy operators (shingling, hashing, vector folds, Pandas
    UDFs) must not inherit a single-partition layout from a small file:
    one parquet split would serialize the whole stage on one core. On a
    real cluster large inputs arrive well-split and this is a no-op; the
    round-robin shuffle of a small input costs microseconds.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
