"""End-to-end streaming CDC pipeline: file stream → ledgered keyed
MERGE state → change-data-feed changelog (extension surface — the
composition of the repo's lakehouse pieces the way a production
pipeline wires them: q116's foreachBatch merge + q229/q234's
ledgered merge_write + q235/q237's retraction-complete CDF, running
as ONE stream).

Per micro-batch (one CDC epoch file per trigger):

1. ``merge_changes(state, batch, include_preimages=True)`` computes
   the Delta-CDF row set against the PRE-merge state;
2. the changelog rows append to the feed dir tagged with the epoch id
   (the bounded per-batch feed downstream consumers subscribe to);
3. ``merge_write`` applies the same batch to the bucket-partitioned
   state under the txn ledger (replays skipped — exactly-once even
   for the additive update_set).

Scale shape: both steps are one full-outer join on the key per batch
(AQE broadcasts small epochs), the state rewrite touches only
affected buckets, and the changelog is O(batch) — the feed never
re-reads more than the epoch and its matched keys. Epoch ORDER is
the CDC contract (updates compose, deletes tombstone), so the landing
files get explicit strictly-increasing mtimes — Spark's
FileStreamSource schedules by (modification time, path), making the
batch sequence deterministic.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import merge_changes, merge_write, src
from ..operators.util import hadoop_fs, scratch_dir
from ..session import configure
from .daily import stream_shuffle_partitions

#: per-key CDC digest row: the unit the extractor emits per epoch
DIGEST_SCHEMA = (
    "custkey long, n_orders long, total_cents long, last_date date, "
    "op string"
)
STATE_SCHEMA = "custkey long, n_orders long, total_cents long, last_date date"


def _epoch_digest(orders: DataFrame, lo: str | None, hi: str | None) -> DataFrame:
    """One CDC row per custkey over an order-date epoch [lo, hi):
    additive counts/cents, last order date, delete op for every 50th
    customer (the tombstone clause)."""
    df = orders
    if lo is not None:
        df = df.filter(F.col("o_orderdate") >= F.lit(lo))
    if hi is not None:
        df = df.filter(F.col("o_orderdate") < F.lit(hi))
    return df.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "total_cents"
        ),
        F.max(F.col("o_orderdate").cast("date")).alias("last_date"),
    ).withColumn(
        "op",
        F.when(F.pmod(F.col("custkey"), F.lit(50)) == 0, F.lit("D")).otherwise(
            F.lit("U")
        ),
    )


def stream_cdc_changelog(
    spark: SparkSession,
    orders: DataFrame,
    epoch_cuts: tuple[str, ...] = ("1996-01-01", "1997-06-01"),
    n_buckets: int = 8,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Run the CDC stream to completion (availableNow, one epoch file
    per trigger) and return the changelog summary: one row per
    (epoch, change type) with row counts and value sums — a pure
    function of the data because the epoch slicing is by date and the
    file order is pinned.

    Returns columns: ``batch_id int, _change_type string,
    n_rows long, sum_orders long, total_price_sum double``.
    """
    configure(spark)
    landing = scratch_dir("cdc_landing_")
    bounds = [None, *epoch_cuts, None]
    n_epochs = len(bounds) - 1
    staged = scratch_dir("cdc_stage_")
    base_t = time.time() - 3600
    # ONE staging job for all epochs: tag each digest with its epoch
    # and write partitionBy(_ep) — repartition(_ep) leaves exactly one
    # file per ep= dir (each task writes only its own epoch values),
    # vs one coalesce(1) job per epoch.
    all_eps = None
    for i in range(n_epochs):
        ep = _epoch_digest(orders, bounds[i], bounds[i + 1]).withColumn(
            "_ep", F.lit(i)
        )
        all_eps = ep if all_eps is None else all_eps.unionByName(ep)
    all_eps.repartition(n_epochs, "_ep").write.mode("overwrite").partitionBy(
        "_ep"
    ).parquet(staged)
    for i in range(n_epochs):
        ep_dir = os.path.join(staged, f"_ep={i}")
        part = next(
            f for f in sorted(os.listdir(ep_dir)) if f.endswith(".parquet")
        )
        dst = os.path.join(landing, f"ep{i}.parquet")
        os.replace(os.path.join(ep_dir, part), dst)
        # strictly-increasing mtimes pin the batch order (the CDC
        # contract); FileStreamSource sorts by timestamp then path.
        os.utime(dst, (base_t + 60 * i, base_t + 60 * i))

    state = scratch_dir("cdc_state_")
    changelog = scratch_dir("cdc_changelog_")
    merge_kwargs = dict(
        keys=["custkey"],
        update_set={
            "n_orders": F.col("n_orders") + src("n_orders"),
            "total_cents": F.col("total_cents") + src("total_cents"),
            "last_date": F.greatest(F.col("last_date"), src("last_date")),
        },
        delete_when=src("op") == "D",
        insert_when=src("op") != "D",
    )

    def _apply(batch: DataFrame, bid: int) -> None:
        sess = batch.sparkSession
        fs, hpath = hadoop_fs(sess, state)
        if fs.exists(hpath):
            target = sess.read.schema(STATE_SCHEMA + ", _bucket int").parquet(
                state
            ).drop("_bucket")
        else:
            target = sess.createDataFrame([], STATE_SCHEMA)
        changes = merge_changes(
            target, batch, include_preimages=True, **merge_kwargs
        )
        # changelog FIRST (it reads the pre-merge state files the
        # merge_write below overwrites), tagged with the epoch id
        changes.withColumn("_batch_id", F.lit(int(bid)).cast("int")).write.mode(
            "append"
        ).parquet(changelog)
        merge_write(
            sess,
            state,
            batch,
            state_schema=STATE_SCHEMA,
            n_buckets=n_buckets,
            batch_id=int(bid),
            **merge_kwargs,
        )

    stream = (
        spark.readStream.schema(DIGEST_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    with stream_shuffle_partitions(spark, state_partitions):
        (
            stream.writeStream.foreachBatch(_apply)
            .option("checkpointLocation", scratch_dir("cdc_ckpt_"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    feed = spark.read.schema(
        STATE_SCHEMA + ", _change_type string, _batch_id int"
    ).parquet(changelog)
    return feed.groupBy(
        F.col("_batch_id").alias("batch_id"), "_change_type"
    ).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("n_orders").cast("long").alias("sum_orders"),
        F.round(F.sum("total_cents") / 100.0, 2).alias("total_price_sum"),
    )
