"""Hashed-n-gram linear quality classifier (fastText-style inference).

The standard pretraining quality gate (CCNet / fastText / DCLM-style)
is a linear model over hashed unigram+bigram features: hash each
feature into a fixed bucket table, sum the bucket weights, threshold
the score. At 100 TB this is the *shape* that matters — the entire
scorer is a stateless per-row expression (hash + table lookup + sum),
so it runs inside the parquet scan with zero shuffle; the only
exchange in the plan is the final per-group rollup of score
aggregates. No weight broadcast is needed at all when the weight table
is itself a hash function of the bucket id, which is what this module
pins: a real deployment swaps `_feature_weight` for a lookup into a
broadcast weights array (≤ a few MB for 2^20 buckets) without touching
the plan shape.

Cross-engine exactness: feature hash = first 8 hex chars of md5 (the
repo-wide portable hash), bucket = hash % N_BUCKETS, weight =
(bucket · KNUTH) % WEIGHT_MOD − WEIGHT_MOD/2 — all exact BIGINT
arithmetic on non-negative operands, so Spark and DuckDB compute
bit-identical per-document integer scores and the single terminal
division per group is identical. No float accumulates across rows.

Reference parity note: the reference (pandas/Flask pricing service,
reference:api.py) has no ML-scoring surface; this is part of the
LLM-training-data extension surface the brief prescribes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import nonempty_tokens
from .util import ensure_parallelism

#: Feature-space and weight-table constants. Pinned as module literals
#: (they parameterize BOTH the Spark plan and the DuckDB oracle via
#: :func:`hashed_ngram_oracle_sql` — one definition site).
N_BUCKETS = 1024
WEIGHT_MOD = 2048
WEIGHT_BIAS = WEIGHT_MOD // 2  # weights span [-1024, 1023]
KNUTH = 2654435761  # Knuth multiplicative-hash constant


def _feature_weight(feat: Column) -> Column:
    """Integer weight of one hashed feature, in [-1024, 1023].

    bucket and the Knuth product are both non-negative BIGINTs well
    under 2^42, so `%` has identical semantics in Spark and DuckDB
    (no negative-modulo divergence) and nothing overflows.
    """
    bucket = (
        F.conv(F.substring(F.md5(feat), 1, 8), 16, 10).cast("long")
        % N_BUCKETS
    )
    return (bucket * F.lit(KNUTH).cast("long")) % WEIGHT_MOD - WEIGHT_BIAS


def hashed_ngram_doc_scores(
    docs: DataFrame,
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document integer score from the hashed unigram+bigram
    linear model (the row-level primitive `hashed_ngram_scores` rolls
    up): (*keep_cols, n_feat, score) — one codegen expression per row,
    no shuffle at all. This is the column downstream evaluators (AUC,
    threshold sweeps) and filters consume directly."""
    toks = nonempty_tokens(F.lower(F.col(text_col)))
    n = F.size(F.col("_t"))
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(F.col("_t"), 1, n - 1),
            F.slice(F.col("_t"), 2, n - 1),
            lambda a, b: F.concat_ws("_", a, b),
        ),
    ).otherwise(F.expr("cast(array() as array<string>)"))
    feats = F.concat(F.col("_t"), bigrams)
    return (
        ensure_parallelism(docs)
        .select(*keep_cols, toks.alias("_t"))
        .select(
            *keep_cols,
            F.size(feats).alias("n_feat"),
            F.aggregate(
                feats,
                F.lit(0).cast("long"),
                lambda acc, x: acc + _feature_weight(x),
            ).alias("score"),
        )
    )


def hashed_ngram_scores(
    docs: DataFrame,
    by: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group quality-gate report from the hashed linear scorer.

    Features: word unigrams + adjacent bigrams (joined with '_'), the
    fastText default. A document is *kept* when its integer score sum
    is strictly positive. Everything up to the final rollup is a
    higher-order-function column expression (split → filter →
    zip_with → aggregate) — whole-stage codegen, no UDF, no explode:
    the per-row feature loop never materializes feature rows, so the
    scan output is one 8-byte score per document, not |features| rows.

    Output: (group, n_docs, n_kept, keep_rate, mean_feat_score) where
    mean_feat_score = Σ score / (Σ features · WEIGHT_BIAS) ∈ [-1, 1].
    """
    toks = nonempty_tokens(F.lower(F.col(text_col)))
    d = ensure_parallelism(docs).select(
        F.col(by).alias("grp"), toks.alias("t")
    )
    n = F.size(F.col("t"))
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(F.col("t"), 1, n - 1),
            F.slice(F.col("t"), 2, n - 1),
            lambda a, b: F.concat_ws("_", a, b),
        ),
    ).otherwise(F.expr("cast(array() as array<string>)"))
    feats = F.concat(F.col("t"), bigrams)
    scored = d.select(
        "grp",
        F.size(feats).alias("n_feat"),
        F.aggregate(
            feats,
            F.lit(0).cast("long"),
            lambda acc, x: acc + _feature_weight(x),
        ).alias("score"),
    )
    kept = F.sum((F.col("score") > 0).cast("long"))
    return (
        scored.groupBy("grp")
        .agg(
            F.count("*").alias("n_docs"),
            kept.alias("n_kept"),
            F.round(
                kept / F.count("*"), 4
            ).alias("keep_rate"),
            F.round(
                F.sum("score")
                / F.nullif(
                    F.sum("n_feat") * F.lit(float(WEIGHT_BIAS)), F.lit(0.0)
                ),
                6,
            ).alias("mean_feat_score"),
        )
        .withColumnRenamed("grp", by)
    )


def hashed_ngram_oracle_sql(table: str, by: str = "source") -> str:
    """DuckDB twin — identical md5 bucketing, identical integer weight
    table, identical per-doc BIGINT score, identical terminal
    divisions. Bigrams via the two-slice unnest idiom; docs with zero
    features keep score 0 through the left join (same as Spark's
    aggregate over an empty feature array)."""
    w = (
        f"((('0x' || substr(md5(f), 1, 8))::BIGINT % {N_BUCKETS})"
        f" * {KNUTH}) % {WEIGHT_MOD} - {WEIGHT_BIAS}"
    )
    return f"""
        WITH t AS (
          SELECT {by} AS grp, row_number() OVER () AS rid,
                 list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                             x -> x <> '') AS t
          FROM {table}
        ), uni AS (
          SELECT grp, rid, unnest(t) AS f FROM t
        ), bi AS (
          SELECT grp, rid, a || '_' || b AS f
          FROM (SELECT grp, rid, unnest(t[1:-2]) AS a, unnest(t[2:-1]) AS b
                FROM t WHERE len(t) >= 2)
        ), feats AS (
          SELECT * FROM uni UNION ALL SELECT * FROM bi
        ), per_doc AS (
          SELECT t.grp, t.rid,
                 coalesce(s.n_feat, 0) AS n_feat,
                 coalesce(s.score, 0) AS score
          FROM t LEFT JOIN (
            SELECT rid, cast(count(*) AS BIGINT) AS n_feat,
                   cast(sum({w}) AS BIGINT) AS score
            FROM feats GROUP BY rid
          ) s USING (rid)
        )
        SELECT grp AS {by},
               cast(count(*) AS BIGINT) AS n_docs,
               cast(sum(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_kept,
               round(sum(CASE WHEN score > 0 THEN 1 ELSE 0 END) * 1.0
                     / count(*), 4) AS keep_rate,
               round(sum(score)
                     / nullif(sum(n_feat) * {float(WEIGHT_BIAS)!r}, 0.0), 6)
                 AS mean_feat_score
        FROM per_doc GROUP BY 1
    """


def doc_scores_oracle_cte(table: str, extra_col: str) -> str:
    """CTE text producing (rid, {extra_col}, n_feat, score) — the
    DuckDB twin of :func:`hashed_ngram_doc_scores`, shared by every
    oracle that consumes row-level scores (per-source rollup, AUC)."""
    w = (
        f"((('0x' || substr(md5(f), 1, 8))::BIGINT % {N_BUCKETS})"
        f" * {KNUTH}) % {WEIGHT_MOD} - {WEIGHT_BIAS}"
    )
    return f"""
        t AS (
          SELECT {extra_col} AS extra, row_number() OVER () AS rid,
                 list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                             x -> x <> '') AS t
          FROM {table}
        ), uni AS (
          SELECT extra, rid, unnest(t) AS f FROM t
        ), bi AS (
          SELECT extra, rid, a || '_' || b AS f
          FROM (SELECT extra, rid, unnest(t[1:-2]) AS a,
                       unnest(t[2:-1]) AS b
                FROM t WHERE len(t) >= 2)
        ), feats AS (
          SELECT * FROM uni UNION ALL SELECT * FROM bi
        ), per_doc AS (
          SELECT t.extra, t.rid,
                 coalesce(s.n_feat, 0) AS n_feat,
                 coalesce(s.score, 0) AS score
          FROM t LEFT JOIN (
            SELECT rid, cast(count(*) AS BIGINT) AS n_feat,
                   cast(sum({w}) AS BIGINT) AS score
            FROM feats GROUP BY rid
          ) s USING (rid)
        )
    """
