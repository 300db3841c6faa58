"""Shared plan constants (split from registry so the oracle modules
import them without a registry cycle).

RUN_DATE: the reference pipeline's "current date" made EXPLICIT — a
pure-function pin instead of CURRENT_DATE() so every engine and every
round computes the same trailing windows (SURVEY semantic decision;
reference predict_prix.py derives today() at request time).
ALPHA_YEAR: the fixed base year of the deterministic year-over-year
alpha lookup (lead-over-year semantics, SURVEY §2.5).
"""

RUN_DATE = "2024-01-30"
ALPHA_YEAR = 1999
