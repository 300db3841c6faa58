"""Streaming and multimodal plumbing tests."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from public_projet_data_engineering_tarification_electrique_spark.operators.multimodal import (
    attach_binary_payload,
    extract_media_meta,
)
from public_projet_data_engineering_tarification_electrique_spark.sources.tables import (
    load_table,
)
from public_projet_data_engineering_tarification_electrique_spark.sources.writers import (
    overwrite_date_partition,
)
from public_projet_data_engineering_tarification_electrique_spark.streaming.daily import (
    stream_daily_event_avg,
)

SF = "/root/testdata/sf0.001"


def test_streaming_matches_batch(spark):
    """availableNow streaming agg == the equivalent batch plan."""
    streamed = {
        (r["date"], r["event_type"]): r["avg_value"]
        for r in stream_daily_event_avg(spark, f"{SF}/events.parquet").collect()
    }
    batch = {
        (r["date"], r["event_type"]): r["avg_value"]
        for r in load_table(spark, SF, "events")
        .groupBy(F.to_date("ts").alias("date"), "event_type")
        .agg(F.round(F.avg("value"), 4).alias("avg_value"))
        .collect()
    }
    assert streamed == batch


def test_streaming_incremental_checkpoint(spark):
    """availableNow + checkpoint = incremental: a second run over an
    unchanged landing dir fires no batch (nothing reprocessed — the
    streaming analogue of the reference's which-day bookkeeping)."""
    landing = tempfile.mkdtemp(prefix="landing_test_")
    os.symlink(f"{SF}/events.parquet", os.path.join(landing, "events.parquet"))
    ckpt = tempfile.mkdtemp(prefix="ckpt_test_")
    first = stream_daily_event_avg(spark, landing, checkpoint_dir=ckpt).count()
    second = stream_daily_event_avg(spark, landing, checkpoint_dir=ckpt).count()
    assert first > 0
    assert second == 0  # no new files → no batch → nothing re-emitted


def test_multimodal_meta_deterministic(spark):
    docs = load_table(spark, SF, "documents").limit(20)
    meta = extract_media_meta(attach_binary_payload(docs)).collect()
    assert len(meta) == 20
    by_id = {r["doc_id"]: r for r in meta}
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    for doc_id, text in src.items():
        row = by_id[doc_id]
        n = len(text.encode("utf-8"))
        assert row["n_bytes"] == n
        assert row["width"] == 64 + n % 64
        assert row["height"] == 64 + (n // 64) % 64
        assert row["format"] == ("png", "jpg", "webp")[doc_id % 3]


def test_idempotent_partition_overwrite(spark, tmp_path):
    """Re-running a day replaces that day's partition (no dup rows) —
    the fix for the reference's WRITE_APPEND backfill dupes."""
    out = str(tmp_path / "daily")
    df1 = spark.createDataFrame(
        [("84", "2024-01-01", 100.0), ("84", "2024-01-02", 200.0)],
        "region string, date string, conso double",
    )
    overwrite_date_partition(df1, out)
    # re-run day 2 with a corrected value + a new day 3
    df2 = spark.createDataFrame(
        [("84", "2024-01-02", 250.0), ("84", "2024-01-03", 300.0)],
        "region string, date string, conso double",
    )
    overwrite_date_partition(df2, out)
    # partition values are re-inferred on read (string → date)
    rows = {
        (str(r["date"]), r["conso"]) for r in spark.read.parquet(out).collect()
    }
    assert rows == {("2024-01-01", 100.0), ("2024-01-02", 250.0), ("2024-01-03", 300.0)}
