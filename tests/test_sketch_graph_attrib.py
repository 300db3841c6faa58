"""HLL sketch (operators.sketches), triangle counting
(operators.graph), exact stratified split (sampling), kNN graph
(similarity), token-budget selection (packing), and multi-touch
attribution (sessions) — the round-6 extension operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from public_projet_data_engineering_tarification_electrique_spark.operators.graph import (
    triangle_stats,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.packing import (
    token_budget_select,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.sampling import (
    exact_stratified_split,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.sessions import (
    multitouch_attribution,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.sketches import (
    hll_distinct,
)


# ---------------------------------------------------------------- HLL


def test_hll_estimate_within_expected_error(spark):
    # 2000 distinct keys across 2 groups; p=8 HLL standard error is
    # 1.04/sqrt(256) ~ 6.5%; assert a generous 3-sigma band.
    df = spark.range(4000).select(
        (F.col("id") % 2000).alias("k"),
        (F.col("id") % 2).cast("string").alias("g"),
    )
    rows = {r["g"]: r for r in hll_distinct(df, "k", "g").collect()}
    assert set(rows) == {"0", "1"}
    for r in rows.values():
        assert r["exact_distinct"] == 1000
        assert abs(r["est_distinct"] - 1000) / 1000 < 0.20
        assert 0 < r["n_registers"] <= 256


def test_hll_merge_property_registers_are_max(spark):
    # sketch(A ∪ B) must equal element-wise max of sketch(A), sketch(B)
    from public_projet_data_engineering_tarification_electrique_spark.operators.sketches import (
        hll_registers,
    )

    df = spark.range(500).select(
        F.col("id").alias("k"), F.lit("g").alias("g")
    )
    a = df.filter(F.col("k") < 250)
    b = df.filter(F.col("k") >= 250)
    union_regs = {
        (r["reg"]): r["max_rho"]
        for r in hll_registers(df, "k", "g").collect()
    }
    merged: dict[int, int] = {}
    for part in (a, b):
        for r in hll_registers(part, "k", "g").collect():
            merged[r["reg"]] = max(merged.get(r["reg"], 0), r["max_rho"])
    assert merged == union_regs


# ---------------------------------------------------------- triangles


def test_triangle_stats_on_known_graph(spark):
    # K4 (4-clique): 4 triangles, 6 edges, wedges = 4 * C(3,2) = 12,
    # coefficient = 3*4/12 = 1.0
    edges = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b],
        ["src", "dst"],
    )
    row = triangle_stats(edges).collect()[0]
    assert row["n_nodes"] == 4
    assert row["n_edges"] == 6
    assert row["n_triangles"] == 4
    assert row["n_wedges"] == 12
    assert row["clustering_coeff"] == 1.0


def test_triangle_stats_path_graph_has_zero_triangles(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], ["src", "dst"]
    )
    row = triangle_stats(edges).collect()[0]
    assert row["n_triangles"] == 0
    assert row["clustering_coeff"] == 0.0


def test_triangle_stats_tolerates_duplicate_orientations(spark):
    # triangle given with both orientations + a self loop
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 0), (0, 0)], ["src", "dst"]
    )
    row = triangle_stats(edges).collect()[0]
    assert row["n_edges"] == 3
    assert row["n_triangles"] == 1


# ------------------------------------------------------------- splits


def test_exact_stratified_split_proportions_are_floor_exact(spark):
    df = spark.range(137).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("lang"),
        F.lit("s").alias("source"),
    )
    out = exact_stratified_split(df, "doc_id", ["lang", "source"])
    counts = {
        (r["lang"], r["split"]): r["n"]
        for r in out.groupBy("lang", "split").agg(F.count("*").alias("n")).collect()
    }
    # strata sizes: lang 0 -> 46, lang 1 -> 46, lang 2 -> 45
    for lang, n in (("0", 46), ("1", 46), ("2", 45)):
        tr = counts.get((lang, "train"), 0)
        va = counts.get((lang, "val"), 0)
        te = counts.get((lang, "test"), 0)
        assert tr == n * 80 // 100
        assert tr + va == n * 90 // 100
        assert tr + va + te == n


def test_exact_stratified_split_is_deterministic(spark):
    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.lit("en").alias("lang"),
        (F.col("id") % 2).cast("string").alias("source"),
    )
    a = sorted(
        map(
            tuple,
            exact_stratified_split(df, "doc_id", ["lang", "source"]).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            exact_stratified_split(
                df.repartition(13), "doc_id", ["lang", "source"]
            ).collect(),
        )
    )
    assert a == b


def test_exact_stratified_split_rejects_bad_weights(spark):
    df = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    )
    with pytest.raises(ValueError, match="sum to 100"):
        exact_stratified_split(
            df, "doc_id", ["lang"], weights={"train": 70, "val": 10}
        )


# ------------------------------------------------------- token budget


def test_token_budget_greedy_prefix_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "a", "w " * 50),   # 50 tokens, admitted (cum 50)
            (2, "a", "w " * 40),   # cum 90 <= 100, admitted
            (3, "a", "w " * 20),   # cum 110 > 100 -> dropped
            (4, "a", "w " * 5),    # ranked after the overflow -> dropped
            (5, "b", "w " * 200),  # alone over budget -> nothing admitted
        ],
        ["doc_id", "source", "text"],
    )
    rows = {
        r["source"]: r
        for r in token_budget_select(docs, budget_tokens=100).collect()
    }
    assert rows["a"]["n_selected"] == 2
    assert rows["a"]["tokens_used"] == 90
    assert rows["a"]["n_candidates"] == 4
    assert rows["b"]["n_selected"] == 0
    assert rows["b"]["tokens_used"] is None


def test_token_budget_rejects_nonpositive_budget(spark):
    docs = spark.createDataFrame([(1, "a", "x")], ["doc_id", "source", "text"])
    with pytest.raises(ValueError, match="positive"):
        token_budget_select(docs, budget_tokens=0)


# -------------------------------------------------------- attribution


def _events(spark, rows):
    return spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "ts", "props"]
    ).select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp").alias("ts"),
        "props",
    )


def test_attribution_splits_credit_exactly(spark):
    rows = [
        (1, 1, "click", "2024-01-01 10:00:00", '{"k": 0}'),   # ch0
        (2, 1, "view", "2024-01-01 11:00:00", '{"k": 1}'),    # ch1
        (3, 1, "click", "2024-01-01 12:00:00", '{"k": 2}'),   # ch2
        (4, 1, "purchase", "2024-01-01 13:00:00", '{"k": 9}'),
        (5, 2, "purchase", "2024-01-02 13:00:00", '{"k": 9}'),  # no touches
    ]
    out = {r["channel"]: r for r in multitouch_attribution(_events(spark, rows)).collect()}
    # 1000000 // 3 = 333333; remainder 1 goes to the EARLIEST touch (ch0)
    assert out["ch0"]["credit_micro"] == 333334
    assert out["ch1"]["credit_micro"] == 333333
    assert out["ch2"]["credit_micro"] == 333333
    assert out["_total"]["credit_micro"] == 1_000_000
    assert out["_total"]["n_touches"] == 1  # one attributed conversion


def test_attribution_lookback_window_excludes_old_touches(spark):
    rows = [
        (1, 1, "click", "2024-01-01 10:00:00", '{"k": 0}'),
        (2, 1, "purchase", "2024-01-03 13:00:00", '{"k": 9}'),  # > 24h later
    ]
    out = multitouch_attribution(_events(spark, rows)).collect()
    per = [r for r in out if r["channel"] != "_total"]
    assert per == []


def test_attribution_rejects_bad_lookback(spark):
    df = _events(spark, [(1, 1, "click", "2024-01-01 10:00:00", "{}")])
    with pytest.raises(ValueError, match="positive"):
        multitouch_attribution(df, lookback_s=0)
