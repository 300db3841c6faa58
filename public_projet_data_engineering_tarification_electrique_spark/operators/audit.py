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
