"""Streaming exact dedup via Spark's native stateful ``dropDuplicates``
— the arrival-path twin of the batch dedup family (operators/dedup.py)
and the streaming complement of q165's incremental batch dedup
(extension surface; the LLM-pipeline brief's dedup family).

A crawl pipeline dedups AS DOCUMENTS ARRIVE: the first document
carrying a fingerprint is kept, every later arrival is dropped, no
matter which micro-batch it lands in. Structured Streaming's
``dropDuplicates`` is exactly that operator — the seen-fingerprint set
lives in the state store (hash-partitioned on the key, RocksDB-backed
at production scale), so per-batch cost is O(batch), state is
O(distinct keys), and the kept-set is a pure function of the data,
independent of batch slicing.

The fingerprint here is the 40-char normalized head (lowercase,
whitespace runs collapsed) hashed to md5 — the crawl-style "same doc
head ⇒ same doc" cheap key (cf. the q190 normalization audit); md5
keeps state entries fixed-width. The emitted stream carries ONLY the
fingerprint: WHICH member of a duplicate group arrives first is
batch-order-dependent, the fingerprint set itself is not — so the
output contract stays deterministic and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.util import scratch_dir
from ..session import configure
from .daily import stream_shuffle_partitions

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def normalized_prefix_key(text_col: str = "text", prefix_len: int = 40) -> Column:
    """md5 of the ``prefix_len``-char normalized document head —
    identical expression in DuckDB:
    ``md5(substr(trim(regexp_replace(lower(text),'\\s+',' ','g')),1,N))``."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return F.md5(F.substring(norm, 1, prefix_len))


def stream_prefix_dedup(
    spark: SparkSession,
    documents_path: str,
    prefix_len: int = 40,
    n_files: int = 8,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Run the arrival-order dedup stream to completion (availableNow)
    and return one row (n_docs, n_kept, n_dropped).

    The corpus is staged into ``n_files`` doc_id-ranged landing files
    and streamed one file per trigger, so the dedup state is genuinely
    exercised ACROSS micro-batches (a single-file landing would make
    the stateful operator degenerate to a within-batch distinct).
    n_kept = |distinct fingerprints| exactly, whatever the slicing —
    the oracle is a plain COUNT(DISTINCT …) over the same table.
    """
    if n_files < 1:
        raise ValueError(f"n_files must be >= 1, got {n_files}")
    configure(spark)
    docs = spark.read.schema(DOCS_SCHEMA).parquet(documents_path)

    landing = scratch_dir("dedup_landing_")
    docs.repartitionByRange(n_files, "doc_id").write.mode("overwrite").parquet(
        landing
    )
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    deduped = stream.select(
        normalized_prefix_key("text", prefix_len).alias("fp")
    ).dropDuplicates(["fp"])

    emitted = scratch_dir("dedup_emitted_")
    ckpt = scratch_dir("dedup_ckpt_")
    with stream_shuffle_partitions(spark, state_partitions):
        (
            deduped.writeStream.outputMode("append")
            .format("parquet")
            .option("path", emitted)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    kept = spark.read.schema("fp string").parquet(emitted)
    return (
        kept.agg(F.count("*").cast("long").alias("n_kept"))
        .crossJoin(docs.agg(F.count("*").cast("long").alias("n_docs")))
        .select(
            "n_docs",
            "n_kept",
            (F.col("n_docs") - F.col("n_kept")).cast("long").alias("n_dropped"),
        )
    )
