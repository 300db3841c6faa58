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


def fuzzy_vocab_join(
    vocab: DataFrame,
    word_col: str = "w",
    max_dist: int = 1,
) -> DataFrame:
    """Typo-tolerant vocabulary self-join via DELETION NEIGHBORHOODS
    (the SymSpell construction): two words within edit distance 1
    necessarily share a member of {word} ∪ {word minus one char} —
    substitution at i ⇒ both sides delete i; insert/delete ⇒ the
    longer side's deletion equals the shorter word itself. So the
    candidate join is an EQUI-join on the ≤(len+1)-sized variant set,
    never an all-pairs levenshtein: at a 10 M-word vocabulary that is
    ~60 M variant rows hash-joined on themselves versus 10¹⁴ scored
    pairs — the difference between a typo-clustering pass running and
    not. Completeness for distance ≤ 1 is a theorem, and the oracle
    PROVES it per run: the DuckDB twin scores ALL pairs brute-force,
    so any pair the blocking missed would hash-mismatch the gate.

    Candidates are then verified with JVM-side ``levenshtein`` inside
    codegen (DuckDB's levenshtein is the same integer metric). Output:
    (word_a, word_b, dist), word_a < word_b, dist ≤ max_dist.

    Only max_dist=1 is supported — single deletions are complete for
    distance 1 only; distance 2 needs 2-deletion neighborhoods (same
    construction, |variants| ~ len²/2, still linear in vocab).
    """
    if max_dist != 1:
        raise ValueError(
            f"deletion-neighborhood blocking is complete only for "
            f"max_dist=1, got {max_dist}"
        )
    w = F.col(word_col)
    variants = F.concat(
        F.array(w),
        F.transform(
            F.sequence(F.lit(1), F.length(w)),
            lambda i: F.concat(
                F.substring(w, 1, i - 1),
                w.substr(i + 1, F.length(w)),
            ),
        ),
    )
    v = vocab.select(
        w.alias("_w"), F.explode(F.array_distinct(variants)).alias("_var")
    )
    pairs = (
        v.select(F.col("_w").alias("word_a"), "_var")
        .join(v.select(F.col("_w").alias("word_b"), "_var"), on="_var")
        .filter(F.col("word_a") < F.col("word_b"))
        .select("word_a", "word_b")
        .distinct()
    )
    return pairs.select(
        "word_a",
        "word_b",
        F.levenshtein("word_a", "word_b").cast("int").alias("dist"),
    ).filter(F.col("dist") <= max_dist)
