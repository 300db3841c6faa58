"""The serving read path (V1-V3) as ONE lazy batch-scoring plan.

Reference lifecycle (SURVEY.md §3.1): per request, two sequential
BigQuery round-trips (30-day regional average, reference:api.py:36-61;
city α lookup, reference:api.py:64-92) then Python scalar math
(reference:api.py:111-127). Here the whole path is a single DataFrame
plan over a requests table:

    requests ⋈ (daily → trailing-window filter → avg)          [broadcast]
             ⋈ (annual → lead-over-year → α clamp)             [broadcast]
             → M, conso_foyer, price columns

Deliberate semantic fixes vs the reference (SURVEY.md §4.3):
- α is deterministic lead-over-year (the reference's row-label indexing
  at api.py:89 is result-order-dependent);
- ``run_date`` is an explicit parameter (api.py:36 freezes it at import
  time);
- a request whose city lacks year n/n+1 rows yields NULL price instead
  of an HTTP 500 (api.py:131-132) so batch scoring never aborts.

Scale: both dimension inputs collapse to small aggregates (≤ #regions,
≤ #communes rows) before the join, so Spark broadcasts them; the
requests fact side never shuffles. At 100 TB of requests this plan is
scan → map-side join ×2 → project: zero wide shuffles after the two
(small) dimension aggregations.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.pricing import (
    alpha_clamped,
    annual_price,
    household_consumption_kwh,
    m_factor,
)
from ..schemas import PRICING_REQUEST_REQUIRED


def validate_requests(requests: DataFrame) -> DataFrame:
    """P7 — required-field validation (reference:api.py:24-33,107).

    Rows with any required field NULL are dropped (the batch analogue of
    the 400 response).
    """
    cond = F.lit(True)
    for c in sorted(PRICING_REQUEST_REQUIRED):
        cond = cond & F.col(c).isNotNull()
    return requests.filter(cond)


def region_trailing_avg(
    daily: DataFrame,
    run_date: dt.date | str,
    days: int = 30,
    region_col: str = "libelle_region",
    date_col: str = "date",
    value_col: str = "conso_mwh",
) -> DataFrame:
    """V2 — per-region trailing-``days`` mean (reference:api.py:36-61).

    The reference ships 30 days of rows to the client and means them
    there (`SELECT *` + pandas .mean(), api.py:57-61); here the filter
    (P4: inclusive bounds, P5: region equality via the later join) and
    the avg (A3) fold into the scan. With the daily table partitioned by
    date, P4 becomes partition pruning.

    Returns one row per region: (region, conso30).
    """
    run = F.lit(run_date).cast("date")
    return (
        daily.filter(
            (F.col(date_col) >= F.date_sub(run, days)) & (F.col(date_col) <= run)
        )
        .groupBy(region_col)
        .agg(F.round(F.avg(value_col), 4).alias("conso30"))
    )


def city_alpha(
    annual: DataFrame,
    year_n: int,
    key_cols: tuple[str, str] = ("nom_commune", "code_commune"),
    year_col: str = "annee",
    value_col: str = "conso_moyenne_mwh",
) -> DataFrame:
    """V3 — per-city forecast ratio α = conso(n+1)/conso(n), clamped [1, 1.3].

    Documented semantics (reference:docs/Notice technique.htm:73-74,
    α(407,398)=1.022) implemented as lead-over-year
    (Window.partitionBy(city).orderBy(year)), NOT the reference's
    order-dependent row indexing (api.py:86-90, SURVEY.md §2.6 warning).

    Returns one row per city holding both years: (*key_cols, alpha).
    """
    filtered = annual.filter(F.col(year_col).isin(year_n, year_n + 1))
    # One row per (city, year) BEFORE the lead window: duplicate
    # city-year rows (re-ingestion, multi-sector sources) would make
    # lead() tie-break on physical row order — alpha nondeterministic,
    # the exact order-dependence this operator exists to fix. avg() is
    # the identity on the clean one-row case, so the canonical fixture
    # is unchanged.
    filtered = filtered.groupBy(*key_cols, year_col).agg(
        F.avg(value_col).alias(value_col)
    )
    w = Window.partitionBy(*key_cols).orderBy(year_col)
    return (
        filtered.withColumn("_next_val", F.lead(value_col).over(w))
        .withColumn("_next_year", F.lead(year_col).over(w))
        .filter(
            (F.col(year_col) == year_n)
            & (F.col("_next_year") == year_n + 1)
            & F.col(value_col).isNotNull()
            & (F.col(value_col) != 0)
            & F.col("_next_val").isNotNull()
        )
        .select(
            *key_cols,
            # +1e-9 nudge: year-over-year ratios land on 6-dp half-way
            # boundaries at sf0.1 (PLANS.md 2e rule; oracle matches)
            F.round(
                alpha_clamped(F.col("_next_val") / F.col(value_col)) + 1e-9, 6
            ).alias("alpha"),
        )
    )


#: Serving status taxonomy (reference error envelope: 400 missing-field
#: at api.py:24-33,107; the two 500 lookup failures at api.py:131-132,
#: split by which lookup came back empty).
STATUS_OK = "ok"
STATUS_MISSING_FIELD = "missing_field"
STATUS_UNKNOWN_REGION = "unknown_region"
STATUS_UNKNOWN_CITY = "unknown_city"


def score_requests_with_status(
    requests: DataFrame,
    daily: DataFrame,
    annual: DataFrame,
    run_date: dt.date | str,
    year_n: int,
    region_col: str = "libelle_region",
) -> DataFrame:
    """Batch scoring with the reference's full error envelope.

    Where ``score_requests`` drops invalid rows (validate_requests) and
    NULLs failed lookups, this emits every input row with an explicit
    ``status``: ``missing_field`` (the 400, reference:api.py:24-33,107),
    ``unknown_region`` / ``unknown_city`` (the two 500 lookup failures,
    reference:api.py:131-132, split by which dimension had no row), or
    ``ok``. ``price`` is non-NULL iff ``status = 'ok'``. Check order
    mirrors the reference: field validation precedes lookups.

    Same plan shape as ``score_requests`` — two broadcast dimension
    joins, no extra shuffle for the status column (pure projection).

    Deliberate deviation: a region whose trailing window exists but
    averages NULL (every reading NULL) also reports
    ``unknown_region`` — the reference would compute a NaN mean and
    emit a NaN price with HTTP 200 (api.py:121-129), which downstream
    JSON cannot even represent; treating an undefined lookup as a
    failed lookup is the honest envelope.
    """
    region_avg = F.broadcast(
        region_trailing_avg(daily, run_date, region_col=region_col)
    )
    alpha = F.broadcast(city_alpha(annual, year_n))
    missing = F.lit(False)
    for c in sorted(PRICING_REQUEST_REQUIRED):
        missing = missing | F.col(c).isNull()
    return (
        requests.join(region_avg, on=region_col, how="left")
        .join(alpha, on=["nom_commune", "code_commune"], how="left")
        .withColumn(
            "status",
            F.when(missing, F.lit(STATUS_MISSING_FIELD))
            .when(F.col("conso30").isNull(), F.lit(STATUS_UNKNOWN_REGION))
            .when(F.col("alpha").isNull(), F.lit(STATUS_UNKNOWN_CITY))
            .otherwise(F.lit(STATUS_OK)),
        )
        .withColumn(
            "conso_foyer",
            household_consumption_kwh(F.col("nb_m2"), F.col("nb_personne")),
        )
        .withColumn("m_factor", F.round(m_factor(F.col("conso30")), 6))
        .withColumn(
            "price",
            F.when(
                F.col("status") == STATUS_OK,
                annual_price(
                    F.col("alpha"), F.col("m_factor"), F.col("conso_foyer")
                ),
            ),
        )
    )


def score_one(
    spark,
    request: dict,
    daily: DataFrame,
    annual: DataFrame,
    run_date: dt.date | str,
    year_n: int,
):
    """``GET /price`` twin: score ONE request through the same envelope.

    Returns the single result Row — fields include ``price`` and
    ``status`` (see ``score_requests_with_status``). Absent request keys
    become NULLs, so a missing field yields ``status='missing_field'``
    exactly like the reference's 400 (reference:api.py:95-132).
    """
    from ..schemas import PRICING_REQUEST

    values = tuple(
        request.get(f.name) for f in PRICING_REQUEST.fields
    )
    nullable = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in PRICING_REQUEST.fields]
    )
    one = spark.createDataFrame([values], nullable)
    return score_requests_with_status(
        one, daily, annual, run_date, year_n
    ).head()


def score_requests(
    requests: DataFrame,
    daily: DataFrame,
    annual: DataFrame,
    run_date: dt.date | str,
    year_n: int,
    region_col: str = "libelle_region",
) -> DataFrame:
    """V1 — batch /price scoring: the full serving path as one plan.

    price = round((0.1558 + α·M)·x + 72)  (reference:api.py:99,127)
    with x = 110·m² + 1000·pers + 1100    (reference:api.py:111-115)
         M = min(0.05, 0.01·conso30/4000) (reference:api.py:121)

    LEFT joins keep requests with unknown region/city as NULL-price rows
    (batch-robust replacement for the reference's 500s). Both right
    sides are region-/commune-sized aggregates → broadcast hash joins.

    One plan, two faces: this IS ``score_requests_with_status`` over
    the validated rows, minus the status column — deriving one from the
    other keeps the join keys, rounding rules, and price projection
    from ever diverging between the batch and envelope paths. (For
    status≠ok rows the envelope gates price to NULL; here the same rows
    get NULL via the price formula's NULL propagation — identical
    outcome.)
    """
    return score_requests_with_status(
        validate_requests(requests),
        daily,
        annual,
        run_date,
        year_n,
        region_col=region_col,
    ).drop("status")
