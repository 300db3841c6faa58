"""The two ETL pipelines, each as ONE lazy DataFrame plan.

- ``bootstrap_annual_pipeline`` — entry point 2 (SURVEY.md §3.2,
  reference:0_insert_conso_an_ville_in_bq.py): filter residential rows,
  per-(commune, year) mean, per-commune OLS forecast of target years,
  union historical ∪ forecast. The reference's CSV-cache checkpoints
  and XCom-style handoffs collapse into a single plan; at scale the
  only wide exchanges are the two key-compatible groupBys.

- ``daily_downsample`` — the DAG's transform (SURVEY.md §3.3,
  reference:airflow/dags/insert_conso_jour_region_in_bq.py:80-89):
  collapse sub-daily readings to one daily mean per region, round,
  cast the date.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .forecast import ols_forecast


def bootstrap_annual_pipeline(
    raw: DataFrame,
    years: Sequence[int] = (2020, 2021, 2022),
    target_years: Sequence[int] = (2023, 2024, 2025),
    sector: str = "RESIDENTIEL",
) -> DataFrame:
    """Historical mean + linear forecast per commune.

    Mirrors: S4 predicate pushdown (years IN + sector equality,
    reference:0_insert_conso_an_ville_in_bq.py:25), P1 column drop
    (:37), A1 group-by-mean (:50-52), U1 forecast (:57-89), E1 union
    (:101). Output schema = CONSO_AN_VILLE.
    """
    historical = (
        raw.filter(
            F.col("annee").isin(*[int(y) for y in years])
            & (F.col("code_grand_secteur") == sector)
        )
        .drop("code_grand_secteur")
        .groupBy("nom_commune", "code_commune", "annee")
        .agg(F.round(F.avg("conso_moyenne_mwh"), 4).alias("conso_moyenne_mwh"))
    )
    forecast = ols_forecast(
        historical,
        group_cols=("nom_commune", "code_commune"),
        x_col="annee",
        y_col="conso_moyenne_mwh",
        target_xs=target_years,
        pred_col="conso_moyenne_mwh",
        round_digits=4,
    )
    cols = ("nom_commune", "code_commune", "conso_moyenne_mwh", "annee")
    return historical.select(*cols).unionByName(forecast.select(*cols))


def daily_downsample(
    raw: DataFrame,
    region_cols: Sequence[str] = ("code_insee_region", "libelle_region"),
    date_col: str = "date",
    value_col: str = "consommation",
    out_col: str = "conso_mwh",
) -> DataFrame:
    """A2 — sub-daily → daily mean per region, rounded to integer (F1),
    date cast (F2). Output schema = CONSO_JOUR_REGION."""
    return (
        raw.groupBy(*region_cols, date_col)
        .agg(F.round(F.avg(value_col)).alias(out_col))
        .withColumn(date_col, F.to_date(date_col, "yyyy-MM-dd"))
    )


def backfill_daily(
    daily: DataFrame,
    out_path: str,
    start: str,
    end: str,
    date_col: str = "date",
) -> None:
    """T5 — backfill a date range of the daily table, idempotently.

    The reference backfills by re-running the Airflow DAG once per
    historical day (reference:README.md:120-126), each run appending —
    so a re-backfill duplicates rows (SURVEY.md §2.9 note). Here the
    whole range is ONE job: filter the recomputed daily frame to
    [start, end] and dynamically overwrite exactly those date
    partitions. Re-running is a no-op-equivalent rewrite; days outside
    the range are untouched.
    """
    from ..sources.writers import overwrite_date_partition

    window = daily.filter(F.col(date_col).between(start, end))
    overwrite_date_partition(window, out_path, partition_col=date_col)
