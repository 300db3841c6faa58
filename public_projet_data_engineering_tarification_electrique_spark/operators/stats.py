"""Distribution-comparison statistics (extension surface): two-sample
Kolmogorov–Smirnov distance and the 2×2 chi-square test — the
go/no-go numbers for "did this corpus slice / experiment arm drift?".

Engine-exact by construction: both statistics are computed from exact
integer counts, with ONE terminal float division each — no running
float sums whose order could differ between engines, no p-value
transcendentals (the caller compares the statistic against a critical
value; erf/gamma tails are libm-unstable across engines and are
deliberately not computed here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ks_distance(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    grid_dp: int = 2,
) -> DataFrame:
    """Two-sample KS distance between the ``value_col`` distributions
    of two groups, computed on a ``grid_dp``-decimal quantized grid.

    D = max_x |F_a(x) − F_b(x)| is kept in EXACT integers until the
    end: with c_a(x), c_b(x) the cumulative counts and n_a, n_b the
    totals, |F_a − F_b| = |c_a·n_b − c_b·n_a| / (n_a·n_b) — the max of
    the integer numerator is found first, then divided once.

    Scale shape: quantizing to a fixed grid FIRST means the ordered
    scan runs over at most |grid| rows (one small hash agg from the
    full data, map-side combined), so the unpartitioned running-sum
    window — normally a red flag — is over a bounded aggregate, the
    repo's "aggregate first, rank the aggregate" pattern (cf. q87).
    The quantization also makes the statistic well-defined across
    engines: it is the exact KS of the ROUNDED distributions.

    Output: one row (n_a, n_b, d_numerator, ks_distance).
    """
    g = F.round(F.col(value_col) + 1e-9, grid_dp)
    cells = (
        df.filter(F.col(group_col).isin(group_a, group_b))
        .groupBy(
            g.alias("_x"),
            (F.col(group_col) == group_a).alias("_is_a"),
        )
        .agg(F.count("*").alias("_c"))
        .groupBy("_x")
        .agg(
            F.sum(F.when(F.col("_is_a"), F.col("_c")).otherwise(0)).alias("_ca"),
            F.sum(F.when(~F.col("_is_a"), F.col("_c")).otherwise(0)).alias("_cb"),
        )
    )
    w = Window.orderBy("_x").rowsBetween(Window.unboundedPreceding, 0)
    cum = cells.select(
        F.sum("_ca").over(w).alias("_cuma"),
        F.sum("_cb").over(w).alias("_cumb"),
    )
    # totals = the final cumulative counts; a 1-row broadcast attach
    totals = cum.agg(
        F.max("_cuma").cast("long").alias("n_a"),
        F.max("_cumb").cast("long").alias("n_b"),
    )
    return (
        cum.crossJoin(F.broadcast(totals))
        .agg(
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.max(
                F.abs(F.col("_cuma") * F.col("n_b") - F.col("_cumb") * F.col("n_a"))
            ).cast("long").alias("d_numerator"),
        )
        .select(
            "n_a",
            "n_b",
            "d_numerator",
            F.round(
                F.col("d_numerator")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
                6,
            ).alias("ks_distance"),
        )
    )


def chi2_2x2(
    df: DataFrame,
    variant_col: str,
    outcome_col: str,
) -> DataFrame:
    """Pearson chi-square statistic (no continuity correction) for a
    2×2 variant × outcome table — the A/B-test decision statistic.

    chi² = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d)), evaluated from the
    four exact cell counts with one float division; the (ad − bc)
    product is computed in DOUBLE (two 10-digit cells would overflow
    int64 when squared). Output also carries the per-variant
    conversion rates and their ratio so the effect size is readable
    next to the significance statistic.

    Output: one row (a, b, c, d, rate_variant, rate_control, chi2).
    a/b = variant converted/not, c/d = control converted/not.
    """
    v = F.col(variant_col)
    o = F.col(outcome_col)
    cells = df.agg(
        F.sum(F.when(v & o, 1).otherwise(0)).cast("long").alias("a"),
        F.sum(F.when(v & ~o, 1).otherwise(0)).cast("long").alias("b"),
        F.sum(F.when(~v & o, 1).otherwise(0)).cast("long").alias("c"),
        F.sum(F.when(~v & ~o, 1).otherwise(0)).cast("long").alias("d"),
    )
    a, b, c, d = (F.col(x).cast("double") for x in "abcd")
    det = a * d - b * c
    denom = (a + b) * (c + d) * (a + c) * (b + d)
    return cells.select(
        "a",
        "b",
        "c",
        "d",
        F.round(a / (a + b), 6).alias("rate_variant"),
        F.round(c / (c + d), 6).alias("rate_control"),
        F.when(
            denom > 0,
            F.round((a + b + c + d) * det * det / denom, 6),
        ).alias("chi2"),
    )
