"""Entity resolution / record linkage: blocking + edit-distance scoring
+ per-record best-match selection (the dedupe/Splink pattern).

The reference has no ER surface; this is the training-data-pipeline
operator for reconciling dirty records against a master table without
the O(n·m) cross join: candidate pairs come only from shared blocking
keys, scoring is JVM-side ``levenshtein`` inside codegen, and the
argmin is a partial-aggregatable ``min(struct(...))`` — no window, no
driver collect.

Scale shape at 100 TB: the blocking join is a plain equi-join on the
composite key (nation, last-3-of-normalized-name); block populations
are near-uniform (trailing digits distribute evenly), so Σ|block_d|·
|block_m| ≈ n·m / n_blocks and AQE's skew split covers residual hot
blocks. The exchange carries only (key, normalized-name) pairs; the
best-match agg combines map-side, so the second shuffle is one row per
dirty record.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_name(col: Column) -> Column:
    """Canonical matching form: uppercase, letter-O folded to zero.

    O↔0 is the classic OCR/data-entry confusion; folding both sides to
    one form makes the blocking key insensitive to it while the
    Levenshtein score still separates genuinely different names.
    """
    return F.translate(F.upper(col), "O", "0")


def best_matches(
    customer: DataFrame,
    modulus: int = 7,
    residue: int = 3,
    max_distance: int = 2,
) -> DataFrame:
    """Match dirty CRM-style records back to the customer master.

    The dirty side is derived deterministically in-plan (no extra
    table needed, and the DuckDB oracle reproduces it exactly): every
    ``modulus``-th customer record re-entered with the typical
    data-entry damage — '#' separator dropped, zeros read as letter
    'O', lowercased. Matching then runs the real three-stage ER
    pipeline:

    1. **Block**: equi-join dirty × master on
       (nationkey, right(normalized_name, 3)) — candidate pairs only
       within a block, never all-pairs.
    2. **Score**: ``levenshtein`` on the normalized forms (the dropped
       '#' is NOT normalizable away, so the true match scores 1, not
       0 — a genuine fuzzy match, not a key lookup).
    3. **Select**: per dirty record, ``min(struct(distance, custkey))``
       keeps the closest master row with a deterministic custkey
       tie-break, then a ``max_distance`` acceptance threshold.

    Returns (record_id, matched_custkey, lev_distance).
    """
    if modulus <= 1:
        raise ValueError(f"modulus must be > 1, got {modulus}")
    dirty = customer.filter(
        F.col("c_custkey") % modulus == residue
    ).select(
        F.col("c_custkey").alias("record_id"),
        F.col("c_nationkey").alias("nationkey"),
        F.lower(
            F.regexp_replace(F.translate(F.col("c_name"), "0", "O"), "#", "")
        ).alias("raw_name"),
    )
    dn = dirty.select(
        "record_id",
        "nationkey",
        normalize_name(F.col("raw_name")).alias("norm_d"),
    )
    cn = customer.select(
        "c_custkey",
        "c_nationkey",
        normalize_name(F.col("c_name")).alias("norm_c"),
    )
    cand = dn.join(
        cn,
        (F.col("nationkey") == F.col("c_nationkey"))
        & (
            F.substring(F.col("norm_d"), -3, 3)
            == F.substring(F.col("norm_c"), -3, 3)
        ),
    ).select(
        "record_id",
        "c_custkey",
        F.levenshtein(F.col("norm_d"), F.col("norm_c")).alias("dist"),
    )
    return (
        cand.groupBy("record_id")
        .agg(F.min(F.struct("dist", "c_custkey")).alias("_b"))
        .select(
            "record_id",
            F.col("_b.c_custkey").alias("matched_custkey"),
            F.col("_b.dist").alias("lev_distance"),
        )
        .filter(F.col("lev_distance") <= max_distance)
    )
