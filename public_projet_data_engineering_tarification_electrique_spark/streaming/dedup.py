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

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import configure
from .daily import events_stream, stage_landing, stream_shuffle_partitions
from ..operators.util import scratch_dir


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
    checkpoint = checkpoint_dir or scratch_dir("ckpt_dedup_")
    table = f"dedup_{uuid.uuid4().hex[:8]}"
    src = (
        events_stream(spark, stage_landing(events_path, "landing_dedup_"))
        .select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            F.col("ts").alias("_et"),
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
