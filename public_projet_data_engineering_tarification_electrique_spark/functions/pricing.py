"""Pricing column expressions — the reference's scalar serving math
(F7-F10) as pure JVM-side Column expressions (no Python UDFs).

Canonical semantics (SURVEY.md §2.8 warning): the runnable artifact
``reference:api.py:99,127`` computes an ANNUAL price with C = 6*12 = 72
and no ÷12; the notice's monthly variant is exposed as a derived column.

Constants (reference:docs/Notice technique.htm:54-66 and api.py:111-115):
chauffage 110 kWh/m², eau chaude 800 kWh/pers, cuisson 200 kWh/pers,
électroménager 1100 kWh; base rate 0.1558 €/kWh; α ∈ [1, 1.3]
(api.py:90); M = min(0.05, 0.01·conso30/4000) (api.py:121).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BASE_RATE = 0.1558  # €/kWh (reference:api.py:99)
ANNUAL_SUBSCRIPTION = 72.0  # C = 6 €/month × 12 (reference:api.py:99)
ALPHA_MIN, ALPHA_MAX = 1.0, 1.3  # reference:api.py:90
M_CAP = 0.05  # reference:api.py:121


def clamp(col: Column, lo: float, hi: float) -> Column:
    """Two-sided clamp (F7): ``min(max(col, lo), hi)`` (reference:api.py:90)."""
    return F.least(F.greatest(col, F.lit(float(lo))), F.lit(float(hi)))


def household_consumption_kwh(nb_m2: Column, nb_personne: Column) -> Column:
    """F9 — estimated annual kWh: chauffage + eau chaude + cuisson +
    électroménager = 110·m² + (800+200)·pers + 1100
    (reference:api.py:111-115)."""
    return (
        F.lit(110.0) * nb_m2 + F.lit(1000.0) * nb_personne + F.lit(1100.0)
    )


def m_factor(conso30: Column) -> Column:
    """F8 — regional demand factor M = min(0.05, 0.01·conso30/4000)
    (reference:api.py:121)."""
    return F.least(F.lit(M_CAP), F.lit(0.01) * conso30 / F.lit(4000.0))


def alpha_clamped(ratio: Column) -> Column:
    """F7 — α clamped to [1, 1.3] (reference:api.py:90)."""
    return clamp(ratio, ALPHA_MIN, ALPHA_MAX)


def annual_price(
    alpha: Column, m: Column, conso_foyer_kwh: Column, rounded: bool = True
) -> Column:
    """F10 — Prix = round((0.1558 + α·M)·x + 72) (reference:api.py:99,127)."""
    raw = (
        F.lit(BASE_RATE) + alpha * m
    ) * conso_foyer_kwh + F.lit(ANNUAL_SUBSCRIPTION)
    return F.round(raw) if rounded else raw


def monthly_price(
    alpha: Column, m: Column, conso_foyer_kwh: Column, rounded: bool = False
) -> Column:
    """Notice variant: (0.1558 + α·M)·x/12 + 6 — exactly annual/12
    (reference:docs/Notice technique.htm:22,96)."""
    raw = (F.lit(BASE_RATE) + alpha * m) * conso_foyer_kwh / F.lit(12.0) + F.lit(6.0)
    return F.round(raw, 1) if rounded else raw
