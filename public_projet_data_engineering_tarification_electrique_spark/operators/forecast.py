"""U1 — per-group linear forecast (the reference's per-commune sklearn
OLS, reference:0_insert_conso_an_ville_in_bq.py:57-89).

Two implementations:

- ``ols_forecast`` (canonical, 100 TB path): closed-form simple linear
  regression as built-in aggregates — slope = covar_pop(x,y)/var_pop(x),
  intercept = avg(y) − slope·avg(x) — then explode the target years and
  project ŷ = intercept + slope·year. One hash aggregation + a
  map-side explode; no Python, no per-group state, arbitrarily many
  groups.

- ``ols_forecast_pandas`` (semantic cross-check): ``applyInPandas``
  grouped-map doing an explicit least-squares fit per group, mirroring
  the reference's sklearn call including its exception→NaN fallback
  (reference:0_insert_conso_an_ville_in_bq.py:67-69). Used in tests to
  pin the closed-form variant's semantics; not the production path.

Degenerate groups (one distinct x): var_pop = 0 → slope/intercept NULL
→ NULL predictions, matching the reference's failure path (sklearn
raises on a 1-point fit only for empty input, but a single year gives a
perfect-fit vertical ambiguity the reference resolves by... succeeding
with slope 0 via sklearn. NOTE: sklearn actually fits a constant on a
single point; we emit NULL instead — the deterministic, documented
choice, see SURVEY.md §7.5.3).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ols_forecast(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
    target_xs: Sequence[int],
    pred_col: str = "prediction",
    round_digits: int = 2,
) -> DataFrame:
    """Per-group OLS fit of y ~ x, predicting at ``target_xs``.

    Output: one row per (group × target_x):
    (*group_cols, x_col, pred_col). NULL prediction when var_pop(x)=0
    or when any y in the group is NULL (matching the pandas twin's
    sklearn-like NaN fallback).
    """
    var_x = F.var_pop(F.col(x_col).cast("double"))
    fitted = df.groupBy(*group_cols).agg(
        F.when(
            var_x != 0.0,
            F.covar_pop(F.col(x_col).cast("double"), F.col(y_col)) / var_x,
        ).alias("_slope"),
        F.avg(y_col).alias("_ybar"),
        F.avg(F.col(x_col).cast("double")).alias("_xbar"),
        # NULL-y rows poison the fit inconsistently (covar_pop/avg(y)
        # skip them, var_pop/avg(x) do not — slope and intercept would
        # come from DIFFERENT row sets). Mirror the pandas twin's
        # sklearn-like contract instead: any NULL y → NULL predictions.
        F.max(F.col(y_col).isNull().cast("int")).alias("_nully"),
    )
    targets = F.explode(
        F.array(*[F.lit(int(t)) for t in target_xs])
    ).alias(x_col)
    # +1e-9 nudge before rounding: predictions are rational combinations of
    # already-rounded inputs and can land exactly on a rounding boundary,
    # where ulp-level float noise would flip the digit; the nudge moves all
    # boundary cases deterministically up (mirrored in the SQL oracles).
    return fitted.select(
        *group_cols, "_slope", "_ybar", "_xbar", "_nully", targets
    ).select(
        *group_cols,
        F.col(x_col),
        F.when(
            F.col("_nully") == 0,
            F.round(
                F.col("_ybar")
                + F.col("_slope") * (F.col(x_col) - F.col("_xbar"))
                + F.lit(1e-9),
                round_digits,
            ),
        ).alias(pred_col),
    )


def ols_forecast_pandas(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
    target_xs: Sequence[int],
    pred_col: str = "prediction",
    round_digits: int = 2,
) -> DataFrame:
    """Grouped-map cross-check of ``ols_forecast`` (Arrow-batched).

    Mirrors the reference's estimate_year: fit per group, predict the
    target years, emit NaN rows when the fit is impossible
    (reference:0_insert_conso_an_ville_in_bq.py:57-79).
    """
    import numpy as np

    keys = list(group_cols)
    schema_parts = df.select(*keys).schema.fields
    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema_parts)
        + f", {x_col} int, {pred_col} double"
    )
    xs = [int(t) for t in target_xs]

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        head = pdf.iloc[0]
        x = pdf[x_col].astype("float64").to_numpy()
        y = pdf[y_col].astype("float64").to_numpy()
        try:
            if len(x) < 2 or np.var(x) == 0.0 or np.isnan(y).any():
                raise ValueError("degenerate group")
            slope = float(np.cov(x, y, bias=True)[0, 1] / np.var(x))
            ybar, xbar = float(np.mean(y)), float(np.mean(x))
            preds = [
                round(ybar + slope * (t - xbar) + 1e-9, round_digits) for t in xs
            ]
        except Exception:
            preds = [float("nan")] * len(xs)  # reference's NaN fallback
        out = {k: [head[k]] * len(xs) for k in keys}
        out[x_col] = xs
        out[pred_col] = preds
        return pd.DataFrame(out)

    return df.groupBy(*keys).applyInPandas(fit, schema=out_schema)


def rolling_origin_backtest(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
    min_train: int = 2,
) -> DataFrame:
    """Rolling-origin (prequential) backtest of the per-group OLS
    forecaster: for every observation, fit y ~ x on that group's
    STRICTLY EARLIER points and score the one-step-ahead prediction —
    the evaluation that decides whether the reference's
    estimate-next-year regression (reference:
    0_insert_conso_an_ville_in_bq.py:57-89) can be trusted, computed
    WITHOUT refitting per fold: all four training sufficient
    statistics (n, Σx, Σy, Σxy, Σx²) are exclusive running sums in ONE
    window pass over the (group, x)-level table, so the whole backtest
    costs one window over data the size of the series table, however
    many folds there are.

    Folds with fewer than ``min_train`` training points or a
    degenerate x-variance are skipped (no fit exists). The absolute
    percentage error lands on an integer 1e-6 grid (with the repo's
    +1e-9 boundary nudge) BEFORE the cross-group mean, so the per-fold
    MAPE is an exact-integer average — no float summation order
    dependence across groups.

    Output: one row per fold x — (x_col, n_series, mape_pct 4 dp),
    where mape_pct averages 100·|pred−y|/|y| over the groups
    evaluable at that fold.
    """
    g = [F.col(c) for c in group_cols]
    w = (
        Window.partitionBy(*g)
        .orderBy(F.asc(x_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    xd = F.col(x_col).cast("double")
    yd = F.col(y_col).cast("double")
    stats = df.select(
        *g,
        F.col(x_col),
        yd.alias("_y"),
        F.count("*").over(w).alias("_n"),
        F.sum(xd).over(w).alias("_sx"),
        F.sum(yd).over(w).alias("_sy"),
        F.sum(xd * yd).over(w).alias("_sxy"),
        F.sum(xd * xd).over(w).alias("_sxx"),
    )
    varn = F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    slope = (
        F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    ) / varn
    intercept = (F.col("_sy") - slope * F.col("_sx")) / F.col("_n")
    pred = intercept + slope * F.col(x_col).cast("double")
    ape_e6 = F.round(
        F.abs(pred - F.col("_y")) / F.abs(F.col("_y")) * 1e6 + F.lit(1e-9),
        0,
    ).cast("long")
    folds = (
        stats.filter(
            (F.col("_n") >= min_train)
            & (varn != 0.0)
            & F.col("_y").isNotNull()
            & (F.col("_y") != 0.0)
        )
        .select(F.col(x_col), ape_e6.alias("_ape_e6"))
        .groupBy(x_col)
        .agg(
            F.count("*").cast("long").alias("n_series"),
            F.round(
                F.sum("_ape_e6") / (F.count("*") * 1e4), 4
            ).alias("mape_pct"),
        )
    )
    return folds


def grouped_ridge(
    df: DataFrame,
    y_col: str,
    x1_col: str,
    x2_col: str,
    group_col: str,
    lam: float = 1000.0,
) -> DataFrame:
    """Per-group closed-form RIDGE regression y ~ β0 + β1·x1 + β2·x2 —
    the multivariate upgrade of ``ols_forecast``'s simple per-group
    line fit (reference:api.py:117-124 fits one slope; a pricing
    stack scoring two drivers needs the 3×3 normal equations).

    Distributed contract: ONE hash agg per group computes the nine
    sufficient statistics (n, Σx1, Σx2, Σx1², Σx1x2, Σx2², Σy, Σx1y,
    Σx2y) with map-side partials — the n×3 design matrix never
    shuffles, only 9 numbers per group do, and month-over-month
    re-fits merge by adding the sums (the moment-sketch property,
    q243). The 3×3 solve is Cramer's rule as a terminal expression.

    Engine-exactness: callers pass INTEGER-VALUED columns (cents,
    counts); every sufficient statistic accumulates as decimal(38,0)
    (exact, order-free — Spark decimal sums match DuckDB HUGEINT),
    and the solve is the same double-op sequence on both engines.
    λ regularizes the x1/x2 diagonal only, never the intercept.

    Output: (group, n, beta0, beta1, beta2), 6-dp rounded.
    """
    # quadratic terms multiply as decimal — an int64 product of two
    # large-magnitude gridded inputs (cents × cents at ~1e10 each)
    # overflows the long BEFORE the decimal(38,0) cast (raises under
    # ANSI, silently wraps otherwise); spearman_rho's operand-cast
    # pattern. The linear sums stay exact either way.
    y = F.col(y_col).cast("decimal(19,0)")
    x1 = F.col(x1_col).cast("decimal(19,0)")
    x2 = F.col(x2_col).cast("decimal(19,0)")

    def s(expr, name):
        return F.sum(expr.cast("decimal(38,0)")).alias(name)

    stats = df.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n"),
        s(x1, "s1"),
        s(x2, "s2"),
        s(x1 * x1, "s11"),
        s(x1 * x2, "s12"),
        s(x2 * x2, "s22"),
        s(y, "sy"),
        s(x1 * y, "s1y"),
        s(x2 * y, "s2y"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    a11, a12, a13 = F.col("n").cast("double"), d("s1"), d("s2")
    a21, a22, a23 = d("s1"), d("s11") + F.lit(lam), d("s12")
    a31, a32, a33 = d("s2"), d("s12"), d("s22") + F.lit(lam)
    b1, b2, b3 = d("sy"), d("s1y"), d("s2y")

    def det3(m11, m12, m13, m21, m22, m23, m31, m32, m33):
        return (
            m11 * (m22 * m33 - m23 * m32)
            - m12 * (m21 * m33 - m23 * m31)
            + m13 * (m21 * m32 - m22 * m31)
        )

    det = det3(a11, a12, a13, a21, a22, a23, a31, a32, a33)
    det0 = det3(b1, a12, a13, b2, a22, a23, b3, a32, a33)
    det1 = det3(a11, b1, a13, a21, b2, a23, a31, b3, a33)
    det2 = det3(a11, a12, b1, a21, a22, b2, a31, a32, b3)
    return stats.select(
        F.col(group_col).alias("grp"),
        "n",
        F.round(det0 / det + 1e-9, 6).alias("beta0"),
        F.round(det1 / det + 1e-9, 6).alias("beta1"),
        F.round(det2 / det + 1e-9, 6).alias("beta2"),
    )


def conformal_interval(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: str,
    y_col: str,
    alpha: float = 0.2,
    min_train: int = 2,
) -> DataFrame:
    """Per-series split-conformal interval calibration on the rolling
    backtest's out-of-sample residuals — the DISTRIBUTION-FREE answer
    to "±how much should we trust q08's forecast?": for miscoverage
    α, the halfwidth is the ⌈(m+1)(1−α)⌉-th smallest |residual| of
    the series' m one-step-ahead backtest errors (finite-sample valid
    with no normality assumption — the guarantee an SLA wants).

    Same distributed contract as ``rolling_origin_backtest``: one
    window pass of exclusive running sufficient statistics over the
    (group, x) level table gives every fold's prediction without
    refitting; |residuals| land on the integer 1e-6 grid; and the
    order statistic folds inside codegen over each series'
    CALENDAR-BOUNDED sorted residual array (never a data-shaped
    window). Series whose m is too small for the requested α (k > m)
    report NULL — the honest "not enough folds" answer.

    Output: (group..., n_folds, q_halfwidth 6-dp), one row per series
    with ≥1 scored fold.
    """
    if not (0.0 < alpha < 1.0):
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    g = [F.col(c) for c in group_cols]
    w = (
        Window.partitionBy(*g)
        .orderBy(F.asc(x_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    xd = F.col(x_col).cast("double")
    yd = F.col(y_col).cast("double")
    stats = df.select(
        *g,
        F.col(x_col),
        yd.alias("_y"),
        F.count("*").over(w).alias("_n"),
        F.sum(xd).over(w).alias("_sx"),
        F.sum(yd).over(w).alias("_sy"),
        F.sum(xd * yd).over(w).alias("_sxy"),
        F.sum(xd * xd).over(w).alias("_sxx"),
    )
    varn = F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    slope = (
        F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    ) / varn
    intercept = (F.col("_sy") - slope * F.col("_sx")) / F.col("_n")
    pred = intercept + slope * F.col(x_col).cast("double")
    abs_e6 = F.round(F.abs(pred - F.col("_y")) * 1e6 + F.lit(1e-9), 0).cast(
        "long"
    )
    resids = stats.filter(
        (F.col("_n") >= min_train)
        & (varn != 0.0)
        & F.col("_y").isNotNull()
    ).select(*g, abs_e6.alias("_r"))
    packed = resids.groupBy(*g).agg(
        F.count("*").cast("long").alias("n_folds"),
        F.sort_array(F.collect_list("_r")).alias("_rs"),
    )
    # k = ceil((m+1)(1−α)); spelled in integers to avoid a float
    # ceiling: k = floor(((m+1)·(1−α)·DEN + DEN − 1) / DEN) with the
    # rational 1−α = num/den pinned from the caller's float exactly
    from fractions import Fraction

    frac = Fraction(1.0 - alpha).limit_denominator(10**6)
    num, den = frac.numerator, frac.denominator
    k = F.expr(f"((n_folds + 1) * {num} + {den} - 1) div {den}")
    q = F.when(
        k <= F.col("n_folds"), F.element_at("_rs", k.cast("int"))
    )
    return packed.select(
        *group_cols,
        "n_folds",
        F.round(q.cast("double") / F.lit(1e6) + 1e-9, 6).alias(
            "q_halfwidth"
        ),
    )
