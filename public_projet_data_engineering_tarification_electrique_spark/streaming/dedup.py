"""Streaming deduplication with BOUNDED state.

The batch dedup family (operators.dedup) assumes the corpus is at
rest; an ingest pipeline needs the incremental flavor: drop re-
delivered records as they arrive. ``dropDuplicatesWithinWatermark``
keys the seen-set on the id column but expires entries once the
event-time watermark passes — state is O(ids per watermark window),
not O(all ids ever), which is what makes exactly-once-per-id ingest
survive at 100 TB/day. (Plain streaming ``dropDuplicates`` would grow
state forever — deliberately not used.)
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import configure
from .daily import EVENTS_LANDING_SCHEMA, stream_shuffle_partitions


def stream_dedup_events(
    spark: SparkSession,
    events_path: str,
    watermark: str = "2 days",
    checkpoint_dir: str | None = None,
    state_partitions: int | None = 8,
) -> DataFrame:
    """availableNow stream over the landing path, emitting each event_id
    at most once per watermark window; returns the deduped rows."""
    configure(spark)
    checkpoint = checkpoint_dir or tempfile.mkdtemp(prefix="ckpt_dedup_")
    table = f"dedup_{uuid.uuid4().hex[:8]}"
    if os.path.isfile(events_path):
        landing = tempfile.mkdtemp(prefix="landing_dedup_")
        os.symlink(events_path, os.path.join(landing, os.path.basename(events_path)))
        events_path = landing

    src = (
        spark.readStream.schema(EVENTS_LANDING_SCHEMA)
        .format("parquet")
        .load(events_path)
        .select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            F.expr("cast(ts as timestamp)").alias("_et"),
        )
        .withWatermark("_et", watermark)
    )
    deduped = src.dropDuplicatesWithinWatermark(["event_id"]).drop("_et")
    with stream_shuffle_partitions(spark, state_partitions):
        (
            deduped.writeStream.outputMode("append")
            .format("memory")
            .queryName(table)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    return spark.table(table)
