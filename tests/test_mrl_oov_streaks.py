"""MRL truncation audit + centroid drift (operators.similarity),
vocab OOV (operators.textstats), activity streaks
(operators.sessions)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from public_projet_data_engineering_tarification_electrique_spark.operators.sessions import (
    activity_streaks,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.similarity import (
    centroid_drift,
    mrl_truncation_audit,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.textstats import (
    oov_rate,
)


def test_mrl_full_prefix_is_perfect_agreement(spark):
    # 4-dim vectors; auditing prefix 4 == full dims -> overlap must be
    # perfect (3 per query) and top-1 always matches
    rows = [(i, [float(i % 7 + 1), float(i % 5), float(i % 3), 1.0]) for i in range(20)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r["dims"]: r for r in mrl_truncation_audit(df, prefix_dims=(4,), n_queries=5, k=3).collect()}
    r = out[4]
    assert r["n_queries"] == 5
    assert r["sum_topk_overlap"] == 15
    assert r["n_top1_match"] == 5


def test_mrl_orthogonal_tail_breaks_agreement(spark):
    # dim0 identical everywhere; all discriminative signal lives in
    # dim1 -> prefix-1 ranking ties on sim and falls back to id order,
    # which need not match the full ranking's top-1
    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 100.0]),
        (2, [1.0, -100.0]),
        (3, [1.0, 100.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r["dims"]: r for r in mrl_truncation_audit(df, prefix_dims=(1,), n_queries=1, k=2).collect()}
    assert out[1]["n_queries"] == 1
    # overlap is defined and bounded by k
    assert 0 <= out[1]["sum_topk_overlap"] <= 2


def test_mrl_rejects_bad_dims(spark):
    df = spark.createDataFrame([(0, [1.0])], ["vec_id", "embedding"])
    with pytest.raises(ValueError, match="positive"):
        mrl_truncation_audit(df, prefix_dims=(0,))
    with pytest.raises(ValueError, match="non-empty"):
        mrl_truncation_audit(df, prefix_dims=())


def test_centroid_drift_identical_halves_is_one(spark):
    # even and odd ids carry the SAME two vectors -> centroids equal
    rows = []
    for i in range(8):
        v = [1.0, 2.0, 3.0] if (i // 2) % 2 == 0 else [3.0, 2.0, 1.0]
        rows.append((i, v, 0))
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    r = centroid_drift(df).collect()[0]
    assert r["n_a"] == 4 and r["n_b"] == 4
    assert r["drift_cos"] == 1.0


def test_centroid_drift_opposite_halves_is_minus_one(spark):
    rows = [(0, [1.0, 1.0], 0), (2, [1.0, 1.0], 0),
            (1, [-1.0, -1.0], 0), (3, [-1.0, -1.0], 0)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    r = centroid_drift(df).collect()[0]
    assert r["drift_cos"] == -1.0


def test_oov_rate_vocab_boundary_is_deterministic(spark):
    # vocab_size=2: 'aa' (3), then tie f=2 between 'bb' and 'cc' ->
    # lexicographic tie-break admits 'bb'; 'cc' is OOV
    rows = [
        (1, "en", "aa aa bb"),
        (2, "en", "aa bb cc"),
        (3, "fr", "cc dd"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out = {r["lang"]: r for r in oov_rate(df, vocab_size=2).collect()}
    assert out["en"]["n_tokens"] == 6
    assert out["en"]["n_oov"] == 1  # the single 'cc'
    assert out["fr"]["n_tokens"] == 2
    assert out["fr"]["n_oov"] == 2  # 'cc' and 'dd' both out
    assert out["fr"]["oov_rate"] == 1.0


def test_oov_rejects_bad_vocab_size(spark):
    df = spark.createDataFrame([(1, "en", "x")], ["doc_id", "lang", "text"])
    with pytest.raises(ValueError, match="positive"):
        oov_rate(df, vocab_size=0)


def test_activity_streaks_known_runs(spark):
    # user 1: days 1,2,3 + 7 -> longest 3; user 2: days 5, 9 -> longest 1
    rows = [
        (1, 1, "2024-01-02 10:00:00"),
        (2, 1, "2024-01-03 10:00:00"),
        (3, 1, "2024-01-03 11:00:00"),  # duplicate day collapses
        (4, 1, "2024-01-04 10:00:00"),
        (5, 1, "2024-01-08 10:00:00"),
        (6, 2, "2024-01-06 10:00:00"),
        (7, 2, "2024-01-10 10:00:00"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts"]).select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    out = {r["streak_days"]: r["n_users"] for r in activity_streaks(df).collect()}
    assert out == {3: 1, 1: 1}
