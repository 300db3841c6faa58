"""Vector math over ``array<float>`` embedding columns, as pure Column
expressions (higher-order functions → whole-stage codegen, no Python).

Determinism note: arrays are cast to array<double> BEFORE arithmetic so
products/sums run in double precision; ``F.aggregate`` folds
left-to-right, which matches DuckDB's list fold order — the oracle
comparison is therefore bit-stable, not just close.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot_product(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (JVM-side, no UDF)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b) / (||a||·||b||); NULL on zero-norm inputs."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0.0, dot_product(a, b) / denom)
