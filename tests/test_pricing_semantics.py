"""Domain-semantics tests pinning the reference's documented constants
and worked examples (reference:docs/Notice technique.htm:54-96):
- α(407, 398) = 1.0226..., clamped to [1, 1.3]
- M(conso30=4800) = 0.012
- 50 m², 2 people, α=1.1, M=0.012 → x=8200 kWh → annual price 1458 €
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from public_projet_data_engineering_tarification_electrique_spark.operators.pricing import (
    city_alpha,
    region_trailing_avg,
    score_requests,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.forecast import (
    ols_forecast,
    ols_forecast_pandas,
)
from public_projet_data_engineering_tarification_electrique_spark.schemas import (
    CONSO_AN_VILLE,
    CONSO_JOUR_REGION,
    PRICING_REQUEST,
)


def _annual(spark, rows):
    return spark.createDataFrame(rows, schema=CONSO_AN_VILLE)


def test_alpha_worked_example(spark):
    # notice: α = 407/398 = 1.0226 (docs/Notice technique.htm:73-74)
    annual = _annual(
        spark,
        [("Brageac", "15024", 398.0, 2024), ("Brageac", "15024", 407.0, 2025)],
    )
    [row] = city_alpha(annual, 2024).collect()
    assert abs(row["alpha"] - 407.0 / 398.0) < 1e-6


def test_alpha_clamped_both_sides(spark):
    annual = _annual(
        spark,
        [
            ("Down", "1", 400.0, 2024),  # ratio 0.5 → clamp to 1.0
            ("Down", "1", 200.0, 2025),
            ("Up", "2", 100.0, 2024),  # ratio 2.0 → clamp to 1.3
            ("Up", "2", 200.0, 2025),
        ],
    )
    out = {r["nom_commune"]: r["alpha"] for r in city_alpha(annual, 2024).collect()}
    assert out == {"Down": 1.0, "Up": 1.3}


def test_alpha_missing_year_dropped(spark):
    # city lacking year n+1 → no α row (batch-robust analogue of the
    # reference's HTTP 500, api.py:131-132)
    annual = _annual(spark, [("OnlyN", "3", 400.0, 2024)])
    assert city_alpha(annual, 2024).count() == 0


def test_trailing_avg_inclusive_bounds(spark):
    rows = [
        ("84", "AURA", dt.date(2024, 1, 1), 100.0),  # outside (31 d before run)
        ("84", "AURA", dt.date(2024, 1, 2), 200.0),  # boundary: run - 30 → in
        ("84", "AURA", dt.date(2024, 2, 1), 400.0),  # boundary: run day → in
    ]
    daily = spark.createDataFrame(rows, schema=CONSO_JOUR_REGION)
    [row] = region_trailing_avg(daily, dt.date(2024, 2, 1), days=30).collect()
    assert row["conso30"] == 300.0  # mean(200, 400); the 1 Jan row excluded


def test_price_worked_example(spark):
    # notice example: 50 m², 2 pers → x = 110*50 + 1000*2 + 1100 = 8700?
    # the notice uses x=8200 with slightly different appliance constants;
    # the canonical api.py math gives (0.1558+1.1*0.012)*x + 72.
    requests = spark.createDataFrame(
        [("AURA", "Brageac", "15024", 2, 50)], schema=PRICING_REQUEST
    )
    # conso30 = 4800 → M = 0.012 (notice:81-83)
    daily = spark.createDataFrame(
        [("84", "AURA", dt.date(2024, 1, 20), 4800.0)], schema=CONSO_JOUR_REGION
    )
    # α = 1.1 exactly: 440/400
    annual = _annual(
        spark,
        [("Brageac", "15024", 400.0, 2024), ("Brageac", "15024", 440.0, 2025)],
    )
    [row] = score_requests(
        requests, daily, annual, run_date=dt.date(2024, 1, 30), year_n=2024
    ).collect()
    x = 110 * 50 + 1000 * 2 + 1100  # 8600
    assert row["conso_foyer"] == float(x)
    assert abs(row["m_factor"] - 0.012) < 1e-9
    assert row["price"] == round((0.1558 + 1.1 * 0.012) * x + 72)


def test_m_factor_cap(spark):
    requests = spark.createDataFrame(
        [("R", "C", "1", 1, 10)], schema=PRICING_REQUEST
    )
    daily = spark.createDataFrame(
        [("01", "R", dt.date(2024, 1, 20), 30000.0)], schema=CONSO_JOUR_REGION
    )
    annual = _annual(spark, [("C", "1", 1.0, 2024), ("C", "1", 1.0, 2025)])
    [row] = score_requests(
        requests, daily, annual, run_date=dt.date(2024, 1, 30), year_n=2024
    ).collect()
    assert row["m_factor"] == 0.05  # capped (api.py:121)


def test_unknown_city_gives_null_price(spark):
    requests = spark.createDataFrame(
        [("R", "Nowhere", "00000", 2, 100)], schema=PRICING_REQUEST
    )
    daily = spark.createDataFrame(
        [("01", "R", dt.date(2024, 1, 20), 4000.0)], schema=CONSO_JOUR_REGION
    )
    annual = _annual(spark, [("C", "1", 1.0, 2024), ("C", "1", 1.0, 2025)])
    [row] = score_requests(
        requests, daily, annual, run_date=dt.date(2024, 1, 30), year_n=2024
    ).collect()
    assert row["price"] is None  # no 500s in batch scoring


def test_ols_closed_form_matches_pandas_grouped_map(spark):
    # the pure-SQL OLS is the production path; the applyInPandas variant
    # pins its semantics (reference:0_insert_conso_an_ville_in_bq.py:57-89)
    rows = [
        ("a", "a", 100.0, 2020),
        ("a", "a", 110.0, 2021),
        ("a", "a", 126.0, 2022),
        ("b", "b", 50.0, 2020),  # degenerate: single year → NULL / NaN
    ]
    df = _annual(spark, rows)
    kw = dict(
        group_cols=("nom_commune", "code_commune"),
        x_col="annee",
        y_col="conso_moyenne_mwh",
        target_xs=(2023, 2024),
        round_digits=4,
    )
    sql_out = {
        (r["nom_commune"], r["annee"]): r["prediction"]
        for r in ols_forecast(df, **kw).collect()
    }
    pd_out = {
        (r["nom_commune"], r["annee"]): r["prediction"]
        for r in ols_forecast_pandas(df, **kw).collect()
    }
    assert set(sql_out) == set(pd_out)
    for k, v in sql_out.items():
        if k[0] == "b":
            import math

            # NaN→NULL via Arrow; both variants agree the group is degenerate
            assert v is None
            assert pd_out[k] is None or math.isnan(pd_out[k])
        else:
            assert abs(v - pd_out[k]) < 1e-9
    # slope of (100, 110, 126) over (2020..2022) is 13; ybar=112 at
    # xbar=2021 → pred(2023) = 112 + 13·2 = 138
    assert abs(sql_out[("a", 2023)] - 138.0) < 1e-6


def test_validate_requests_drops_null_required_fields(spark):
    """P7 — required-field validation (reference:api.py:24-33,107): rows
    missing any required field are dropped (the batch analogue of the
    400 response), complete rows pass through untouched."""
    from public_projet_data_engineering_tarification_electrique_spark.operators.pricing import (
        validate_requests,
    )

    rows = [
        ("R", "C", "1", 2, 100),      # complete
        (None, "C", "1", 2, 100),     # missing region
        ("R", "C", "1", None, 100),   # missing nb_personne
    ]
    df = spark.createDataFrame(
        rows,
        "libelle_region string, nom_commune string, code_commune string, "
        "nb_personne int, nb_m2 int",
    )
    out = validate_requests(df).collect()
    assert len(out) == 1 and out[0].libelle_region == "R"


def test_monthly_price_notice_worked_example(spark):
    """Notice worked example (docs/Notice technique.htm:96):
    (0.1558 + 1.1×0.012)×8200/12 + 6 = 121.5 €/month."""
    from pyspark.sql import functions as F

    from public_projet_data_engineering_tarification_electrique_spark.functions.pricing import (
        monthly_price,
    )

    df = spark.createDataFrame([(1.1, 0.012, 8200.0)], "alpha double, m double, x double")
    [row] = df.select(
        monthly_price(F.col("alpha"), F.col("m"), F.col("x"), rounded=True).alias("p")
    ).collect()
    assert row.p == 121.5


def test_score_one_status_taxonomy(spark):
    """Error envelope (reference:api.py:24-33,107,131-132): one call per
    status — missing field, unknown region, unknown city, ok."""
    from public_projet_data_engineering_tarification_electrique_spark.operators.pricing import (
        score_one,
    )
    from public_projet_data_engineering_tarification_electrique_spark.plans.registry import (
        ALPHA_YEAR,
        RUN_DATE,
        _annual_city,
        _daily_region,
        _requests,
    )

    sf = "/root/testdata/sf0.001"
    daily = _daily_region(spark, sf).cache()
    annual = _annual_city(spark, sf, year_range=(ALPHA_YEAR, ALPHA_YEAR + 1)).cache()
    # a request whose city is guaranteed an alpha row: take one from the
    # annual table holding both years
    good = (
        annual.groupBy("nom_commune", "code_commune")
        .count()
        .filter(F.col("count") >= 2)
        .head()
    )
    region = _daily_region(spark, sf).head().libelle_region
    base = {
        "libelle_region": region,
        "nom_commune": good.nom_commune,
        "code_commune": good.code_commune,
        "nb_personne": 3,
        "nb_m2": 95,
    }
    ok = score_one(spark, base, daily, annual, RUN_DATE, ALPHA_YEAR)
    assert ok.status == "ok" and ok.price is not None and ok.price > 0

    missing = dict(base)
    del missing["nb_m2"]
    r = score_one(spark, missing, daily, annual, RUN_DATE, ALPHA_YEAR)
    assert r.status == "missing_field" and r.price is None

    r = score_one(
        spark, {**base, "libelle_region": "ATLANTIS"}, daily, annual, RUN_DATE, ALPHA_YEAR
    )
    assert r.status == "unknown_region" and r.price is None

    r = score_one(
        spark, {**base, "nom_commune": "NOWHERE-VILLE"}, daily, annual, RUN_DATE, ALPHA_YEAR
    )
    assert r.status == "unknown_city" and r.price is None
    daily.unpersist()
    annual.unpersist()
