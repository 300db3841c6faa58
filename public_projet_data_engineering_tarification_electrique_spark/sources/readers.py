"""Schema-declared readers.

Reference parity:
- S5 JSON→relational (reference:0_insert_conso_an_ville_in_bq.py:34-37)
- S7 CSV source with dtype map (reference:0_insert_conso_an_ville_in_bq.py:43-47)

Both readers require an explicit schema — inference is banned (the
reference declares dtypes on every read; at 100 TB inference is also a
full extra pass over the data).
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    mode: str = "FAILFAST",
) -> DataFrame:
    """CSV with declared schema + header, mirroring pandas
    read_csv(dtype=...) — including its failure discipline: a malformed
    cell RAISES (FAILFAST) instead of silently becoming NULL, which is
    what the default PERMISSIVE mode would do. Pass mode="PERMISSIVE"
    to deliberately tolerate corrupt rows."""
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", mode)
        .csv(path)
    )


def read_json_records(
    spark: SparkSession,
    records: Iterable[Mapping] | str,
    schema: T.StructType,
) -> DataFrame:
    """Relational view over JSON payloads (S5).

    ``records`` is either an in-memory list of dicts (REST payload already
    fetched, the reference's ``pd.DataFrame(response.json())`` path) or a
    path/glob for distributed ``spark.read.json`` (the 100 TB path: JSON
    lines on shared storage, one task per split).
    """
    if isinstance(records, str):
        return spark.read.schema(schema).json(records)
    return spark.createDataFrame(list(records), schema=schema)
