"""Opendatasoft-style REST JSON source (S1/S2) with select/where pushdown.

Reference parity:
- S1 Enedis export fetch (reference:0_insert_conso_an_ville_in_bq.py:20-34)
- S2 éco2mix daily fetch (reference:airflow/dags/insert_conso_jour_region_in_bq.py:54-65)
- S3/S4 source-side projection & predicate pushdown via the API's
  ``select``/``where`` params (reference:0_insert_conso_an_ville_in_bq.py:24-25)

Design: the fetch itself is a driver-side, bounded metadata-scale call
(the reference pulls ≤ a few hundred thousand rows); the distributed
part starts at the returned DataFrame. For genuinely large feeds the
right Spark shape is *land to object storage, then scan* — not a
driver fetch: write the fetched records to a JSONL/parquet landing
path and read it with ``spark.read.json``/``spark.read.parquet``,
which split the landing files across tasks (the streaming ingest in
``streaming.daily`` is exactly that shape).

The HTTP client is injectable (``fetcher``) so tests run hermetically;
the default uses ``urllib`` from the standard library (no extra deps).
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .readers import read_json_records

Fetcher = Callable[[str], list[dict]]


def _default_fetcher(url: str) -> list[dict]:
    with urllib.request.urlopen(url, timeout=60) as resp:  # pragma: no cover
        return json.loads(resp.read().decode("utf-8"))


def build_export_url(
    base_url: str,
    dataset: str,
    select: str | None = None,
    where: str | None = None,
    limit: int = -1,
) -> str:
    """Assemble an opendatasoft ``/exports/json`` URL with pushdown params.

    ``limit=-1`` means unbounded, matching the reference
    (reference:0_insert_conso_an_ville_in_bq.py:23).
    """
    params: dict[str, str] = {"limit": str(limit)}
    if select:
        params["select"] = select
    if where:
        params["where"] = where
    return f"{base_url.rstrip('/')}/{dataset}/exports/json?" + urllib.parse.urlencode(
        params
    )


def read_rest_json(
    spark: SparkSession,
    url: str,
    schema: T.StructType,
    fetcher: Fetcher | None = None,
) -> DataFrame:
    """Fetch a REST JSON export and expose it as a schema-declared DataFrame."""
    records = (fetcher or _default_fetcher)(url)
    # Keep only declared columns — the API may return extras.
    names = set(schema.fieldNames())
    rows = [{k: r.get(k) for k in names} for r in records]
    return read_json_records(spark, rows, schema)
