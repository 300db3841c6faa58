"""Testdata catalog: load the driver's TPC-H-ish parquet tables with
normalized types and register them as temp views.

The one normalization: ``events.parquet`` stores ``ts`` as parquet
TIMESTAMP(NANOS), which Spark's reader rejects unless
``spark.sql.legacy.parquet.nanosAsLong=true`` (set in
session.RUNTIME_CONFS). We read it as LONG nanoseconds and convert to
``timestamp_ntz`` via integer division (``ts div 1000`` — a double
division would lose precision above 2^53 ns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import configure

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: (applicationId, sf_dir, name, raw) → (session, DataFrame). Plan
#: memoization ONLY — a cached entry is the immutable unresolved scan
#: plan (schema + file listing); every action against it still reads
#: the parquet data in full. ``spark.read.parquet`` costs ~106 ms of
#: footer/schema work per call (measured r12), paid by every query
#: construction; a production engine reads through a catalog whose
#: metadata is cached for exactly this reason (optimization guide §6,
#: file-listing caches). The session object is kept in the value and
#: identity-checked so a new session with a recycled applicationId can
#: never serve a stale plan.
_TABLE_CACHE: dict[tuple[str, str, str, bool], tuple[SparkSession, DataFrame]] = {}


def load_table(
    spark: SparkSession, sf_dir: str, name: str, *, raw: bool = False
) -> DataFrame:
    """Load one testdata table, normalizing types (events.ts → timestamp_ntz).

    ``raw=True`` skips the normalization: events.ts stays LONG epoch
    nanoseconds — the exact integer form time-arithmetic operators
    (sessionize, as-of) want, since TIMESTAMP_NTZ admits no numeric
    cast under ANSI and a double roundtrip loses sub-µs precision.
    """
    configure(spark)
    key = (spark.sparkContext.applicationId, sf_dir, name, raw)
    hit = _TABLE_CACHE.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if raw:
            # Contract: raw events.ts is LONG epoch nanoseconds. Testdata
            # may ship ts as TIMESTAMP(NANOS)->LONG (nanosAsLong) or
            # TIMESTAMP(US); normalize the timestamp flavor back to
            # integer ns (session tz is pinned UTC, so NTZ->TIMESTAMP is
            # an identity relabel).
            if ts_type in ("timestamp", "timestamp_ntz"):
                df = df.withColumn(
                    "ts",
                    F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000),
                )
        elif ts_type == "bigint":
            df = df.withColumn(
                "ts",
                F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"),
            )
        elif ts_type == "timestamp":
            # TIMESTAMP(US) flavor: normalize the tz-aware read to the same
            # timestamp_ntz contract the bigint branch produces (session tz
            # is pinned UTC, so this is an identity relabel) — otherwise
            # unionByName/comparisons against ntz frames break and a
            # non-UTC session would silently shift values.
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    _TABLE_CACHE[key] = (spark, df)
    return df


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> None:
    """Register each table as a temp view for spark.sql() plans."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
