"""Spark 4 Python DataSource: a partition-parallel paginated-API
source (the distributed counterpart to the driver-side REST fetch in
``sources.rest``).

The reference ingests REST pages on the driver
(reference:0_insert_conso_an_ville_in_bq.py:20-34); that is fine at
metadata scale but serializes ingest on one machine. Spark 4's Python
DataSource API moves the fetch INTO the executors: ``partitions()``
declares one input split per page, and each task pulls its own page —
the shape a 100 TB-era ingest needs (N pages fetched by N tasks, scan
parallelism = pagination parallelism, retries per task instead of per
job).

The page fetcher is injectable and defaults to a deterministic
synthetic generator, so tests and the driver's correctness gate run
hermetically (no network) while the class structure is exactly what a
real HTTP-backed source would use: swap ``_page_rows`` for a GET and
the plan/partitioning semantics are unchanged.

Amounts are exact binary fractions (quarters), so aggregates over
this source are float-order-independent — the oracle recomputes them
exactly.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)


def _page_rows(page: int, page_size: int) -> Iterator[tuple]:
    """Deterministic synthetic page payload: row ids are globally
    dense, categories cycle mod 5, amounts are exact quarters."""
    for i in range(page_size):
        rid = page * page_size + i
        yield (page, rid, f"cat{rid % 5}", (rid % 997) * 0.25)


class PagedApiReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_pages = int(options.get("pages", "8"))
        self.page_size = int(options.get("page_size", "100"))

    def partitions(self) -> list[InputPartition]:
        # one input split per API page — fetch parallelism == pagination
        return [InputPartition(p) for p in range(self.n_pages)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        yield from _page_rows(partition.value, self.page_size)


class PagedApiDataSource(DataSource):
    """``spark.read.format("paged_api").option("pages", N)`` source."""

    @classmethod
    def name(cls) -> str:
        return "paged_api"

    def schema(self) -> str:
        return "page int, row_id long, category string, amount double"

    def reader(self, schema) -> PagedApiReader:
        return PagedApiReader(self.options)


def register_paged_api(spark) -> None:
    """Idempotent per-session registration — re-registering the same
    format name raises, so every consumer goes through this ONE
    guard (session-attribute flag) instead of rolling its own."""
    if not getattr(spark, "_paged_api_registered", False):
        spark.dataSource.register(PagedApiDataSource)
        spark._paged_api_registered = True
