"""Vector math over ``array<float>`` embedding columns, as pure Column
expressions (higher-order functions → whole-stage codegen, no Python).

Determinism note: arrays are cast to array<double> BEFORE arithmetic so
products/sums run in double precision; ``F.aggregate`` folds
left-to-right, which matches DuckDB's list fold order — the oracle
comparison is therefore bit-stable, not just close.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


def cosine_similarity_pandas():
    """Arrow-vectorized Pandas UDF twin of ``cosine_similarity``.

    The JVM fold (F.aggregate over zip_with) is the default hot path;
    this variant exists for pipelines that already cross into Python
    (e.g. after a model-inference mapInPandas stage), where one Arrow
    batch transfer amortizes better than returning to the JVM. Batches
    are scored as stacked numpy matrices — one BLAS call per batch, no
    per-row Python.
    """
    from pyspark.sql.functions import pandas_udf

    # pandas/numpy are imported at module scope: pandas_udf resolves the
    # (stringified, PEP 563) type hints against this module's globals.
    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        # Twin contract with the JVM variant: NULL inputs and zero-norm
        # vectors yield NULL — a raw np.stack would crash the whole
        # batch on a null/ragged row, and 0/0 would surface as NaN
        # where the JVM's F.when(denom != 0) returns NULL.
        valid = a.notna() & b.notna()
        out = pd.Series([None] * len(a), dtype="float64")
        if valid.any():
            ma = np.stack(a[valid].to_numpy())
            mb = np.stack(b[valid].to_numpy())
            dots = np.einsum("ij,ij->i", ma, mb)
            norms = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
            vals = np.where(norms != 0.0, dots / np.where(norms == 0, 1, norms), np.nan)
            out[valid] = vals
        return out.where(out.notna(), None)

    return _cos
