"""Data-quality constraint auditing: evaluate a set of named
violation predicates and return one small report row per rule —
the validation gate a pipeline runs before promoting a batch
(nulls in key columns, out-of-range measures, duplicate keys,
referential orphans).

Each rule is declared as the DataFrame of its VIOLATING rows; the
report is the union of their counts. Every count is an independent
aggregate that Catalyst collapses to a partial+final count over the
rule's own pushed-down scan — rules on the same table share the
parquet footer but prune to only the columns each predicate needs, so
at 100 TB the audit costs one column-pruned pass per rule, no wide
scan, no shuffle beyond the 1-row counts.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def constraint_report(rules: dict[str, DataFrame]) -> DataFrame:
    """(rule, n_violations) for each named violating-rows frame.

    A rule passes when its count is 0; the report keeps zero rows too
    so downstream alerting can distinguish "checked and clean" from
    "not checked".
    """
    if not rules:
        raise ValueError("constraint_report needs at least one rule")
    counts = [
        df.agg(F.count("*").alias("n_violations")).select(
            F.lit(name).alias("rule"), "n_violations"
        )
        for name, df in rules.items()
    ]
    return reduce(lambda a, b: a.unionByName(b), counts)


def column_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column data profile: (col_name, n_nulls, n_distinct,
    min_val, max_val) — the dbt-docs/Deequ-style profiling pass a
    pipeline runs on every new source before trusting it.

    All stats are computed TYPED in one aggregation over one scan
    (min/max on the native type — not on a string rendering, which
    would order numerics lexicographically), then the single result
    row is unpivoted to long form with engine-pinned renderings
    (doubles rounded to 2 dp, timestamps via an explicit format).

    Scale: one pass, partial-aggregatable except the exact
    count_distinct columns, which Catalyst plans as one Expand per
    distinct column — the honest cost of an exact profile (same
    row-multiplication a melt would cost). At 100 TB swap
    count_distinct for approx_count_distinct (the HLL path q29 pins)
    column-by-column without touching the shape.
    """
    from pyspark.sql.types import DoubleType, FloatType, TimestampType

    if cols is None:
        cols = list(df.columns)

    def render(c, name: str):
        dt = df.schema[name].dataType
        if isinstance(dt, (DoubleType, FloatType)):
            return F.round(c, 2).cast("string")
        if isinstance(dt, TimestampType):
            return F.date_format(c, "yyyy-MM-dd HH:mm:ss")
        return c.cast("string")

    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"_nd_{c}"),
            F.min(F.col(c)).alias(f"_mn_{c}"),
            F.max(F.col(c)).alias(f"_mx_{c}"),
        ]
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"_nn_{c}").alias("n_nulls"),
            F.col(f"_nd_{c}").alias("n_distinct"),
            render(F.col(f"_mn_{c}"), c).alias("min_val"),
            render(F.col(f"_mx_{c}"), c).alias("max_val"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*structs)).alias("_p")).select("_p.*")
