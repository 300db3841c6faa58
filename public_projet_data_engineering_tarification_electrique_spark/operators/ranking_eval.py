"""Ranking-quality evaluation operators (extension surface): nDCG@k
and rank-biased overlap — the retrieval-eval numbers a search /
RAG-retrieval pipeline reads next to q227's AUC and q282/q283's
recall rows ("is the ranker GOOD?", not just "did the ANN path find
the exact top-k?").

Engine-exact by construction, the module discipline:

- **Integer discount grid.** The DCG discount 1/log2(rank+1) is
  irrational; summing per-rank double terms would make the result
  depend on aggregation ORDER (non-deterministic across engines and
  across Spark retries). Instead the discounts are pre-quantized to
  an INTEGER millionths grid at import time (``_DCG_GAIN_U``) and
  embedded as the same literals in both the Spark plan and the DuckDB
  oracle — DCG accumulates as an exact integer sum (order-free), and
  the single terminal division produces nDCG. The metric is exactly
  "nDCG on a 1e-6-quantized discount grid", stated in the docstring
  rather than hidden in float noise.
- **Rational RBO weights.** For p = p_num/p_den the RBO_min summand
  (overlap_d / d)·p^d is rational; with L = lcm(1..k) every term
  scales to the exact integer overlap_d · (L/d) · p_num^d ·
  p_den^(k−d). The sum is exact int64, the ONE division at the end
  applies ((1−p)/p) / (L·p_den^k).

Scale shape: both metrics aggregate a top-k run table (≤ k rows per
query — bounded by the RANKER, not the corpus), so every join below
is a broadcast and every group-by carries ≤ k·|Q| rows. The expensive
part is producing the run (q13/q15/q27's problem, not this module's).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Discount table for nDCG@10 on the integer millionths grid:
# round(1e6 / log2(rank+1)) for rank = 1..10. Import-time constants —
# the oracle SQL interpolates THESE values, so the two engines cannot
# disagree on the grid.
NDCG_K = 10
_DCG_GAIN_U: tuple[int, ...] = tuple(
    round(1_000_000 / math.log2(d + 1)) for d in range(1, NDCG_K + 1)
)
# Ideal-DCG prefix sums: _IDCG_U[m] = gain of m relevant docs packed
# into the top m ranks (1-indexed; index 0 unused).
_IDCG_U: tuple[int, ...] = tuple(
    sum(_DCG_GAIN_U[:m]) for m in range(NDCG_K + 1)
)

# RBO@10 with p = 9/10: exact integer weights
# W_d = (L/d) · 9^d · 10^(10−d), L = lcm(1..10) = 2520, and the
# terminal divisor (p/(1−p)) · L · 10^10 = 9 · 2520 · 10^10.
RBO_K = 10
_RBO_P_NUM, _RBO_P_DEN = 9, 10
_RBO_L = math.lcm(*range(1, RBO_K + 1))
_RBO_W: tuple[int, ...] = tuple(
    (_RBO_L // d) * _RBO_P_NUM**d * _RBO_P_DEN ** (RBO_K - d)
    for d in range(1, RBO_K + 1)
)
_RBO_DIV = _RBO_P_NUM * _RBO_L * _RBO_P_DEN**RBO_K


def ndcg_binary_at_k(
    run: DataFrame,
    pool: DataFrame,
    query_col: str = "query_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    pool_col: str = "n_rel_pool",
) -> DataFrame:
    """nDCG@10 with binary relevance on the integer millionths
    discount grid (see module docstring).

    ``run``: one row per (query, rank ∈ 1..10) with ``rel_col`` ∈
    {0, 1} — the ranked retrieval run to grade. ``pool``: one row per
    query with ``pool_col`` = how many relevant candidates EXIST in
    the searched pool (the ideal ranking packs min(pool, 10) of them
    into the top ranks). DCG_u = Σ rel·gain_u[rank] is an exact
    integer sum; IDCG_u = prefix_u[min(pool, 10)] is a literal lookup;
    nDCG = DCG_u/IDCG_u is the one terminal division (NULL when the
    pool is empty — the metric is undefined, not zero).

    Output: (query, n_rel_pool, dcg_u, idcg_u, ndcg 6 dp), one row
    per pool query (queries missing from ``run`` grade dcg_u = 0).
    """
    gains = F.array(*[F.lit(g) for g in _DCG_GAIN_U])
    prefix = F.array(*[F.lit(s) for s in _IDCG_U[1:]])
    dcg = (
        run.filter(
            (F.col(rank_col) >= 1) & (F.col(rank_col) <= NDCG_K)
        )
        .groupBy(query_col)
        .agg(
            F.sum(
                F.col(rel_col).cast("long")
                * F.element_at(gains, F.col(rank_col).cast("int"))
            )
            .cast("long")
            .alias("dcg_u")
        )
    )
    capped = F.least(F.col(pool_col), F.lit(NDCG_K)).cast("int")
    out = (
        pool.join(F.broadcast(dcg), query_col, "left")
        .select(
            query_col,
            F.col(pool_col).cast("long").alias("n_rel_pool"),
            F.coalesce(F.col("dcg_u"), F.lit(0)).cast("long").alias(
                "dcg_u"
            ),
            F.when(
                F.col(pool_col) > 0, F.element_at(prefix, capped)
            )
            .cast("long")
            .alias("idcg_u"),
        )
    )
    return out.select(
        query_col,
        "n_rel_pool",
        "dcg_u",
        "idcg_u",
        F.round(
            F.col("dcg_u").cast("double")
            / F.col("idcg_u").cast("double")
            + 1e-9,
            6,
        ).alias("ndcg"),
    )


def rbo_min_overlap(
    run_a: DataFrame,
    run_b: DataFrame,
    query_col: str = "query_id",
    id_col: str = "vec_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Rank-biased overlap (lower bound, truncated lists) between two
    top-10 runs at p = 0.9 — "how much do the two rankers AGREE,
    weighted toward the top?".

    RBO_min = ((1−p)/p) · Σ_{d=1..k} (|A_{1..d} ∩ B_{1..d}| / d)·p^d,
    computed over the TRUNCATED lists (an item appearing in only one
    run contributes to no prefix — Webber et al.'s lower bound; the
    residual mass of unseen tails is deliberately not extrapolated).
    An item at ranks (ra, rb) enters every prefix depth d ≥
    max(ra, rb), so overlap_d = |{items : max(ra, rb) ≤ d}| — the
    run-run inner join on (query, id) followed by a literal depth
    spine. Every term scales to the exact integer
    overlap_d · W_d (see module docstring); one terminal division.

    Output: one row per run_a query — (query, overlap_at_k,
    rbo_min 6 dp); a query with zero common items reports (0, 0.0).
    """
    a = run_a.filter(F.col(rank_col) <= RBO_K).select(
        query_col, id_col, F.col(rank_col).alias("_ra")
    )
    b = run_b.filter(F.col(rank_col) <= RBO_K).select(
        query_col, id_col, F.col(rank_col).alias("_rb")
    )
    common = a.join(b, [query_col, id_col]).select(
        query_col,
        F.greatest(F.col("_ra"), F.col("_rb")).alias("_d0"),
    )
    weights = F.array(*[F.lit(w) for w in _RBO_W])
    spine = F.explode(
        F.array(*[F.lit(d) for d in range(1, RBO_K + 1)])
    ).alias("_d")
    terms = (
        common.select(query_col, "_d0", spine)
        .filter(F.col("_d") >= F.col("_d0"))
        .groupBy(query_col)
        .agg(
            F.sum(F.element_at(weights, F.col("_d").cast("int")))
            .cast("long")
            .alias("_s"),
            F.sum(
                F.when(F.col("_d") == RBO_K, 1).otherwise(0)
            )
            .cast("long")
            .alias("overlap_at_k"),
        )
    )
    qs = run_a.select(query_col).distinct()
    return qs.join(F.broadcast(terms), query_col, "left").select(
        query_col,
        F.coalesce(F.col("overlap_at_k"), F.lit(0))
        .cast("long")
        .alias("overlap_at_k"),
        F.round(
            F.coalesce(F.col("_s"), F.lit(0)).cast("double")
            / F.lit(float(_RBO_DIV))
            + 1e-9,
            6,
        ).alias("rbo_min"),
    )
