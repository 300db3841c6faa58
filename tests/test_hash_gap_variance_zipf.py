"""Consistent-hash resharding audit (operators.shards), inter-event gap
histogram (operators.timeseries), dim variance ranking
(operators.similarity), Zipf slope (operators.textstats)."""

from __future__ import annotations

import pytest

from public_projet_data_engineering_tarification_electrique_spark.operators.shards import (
    consistent_hash_audit,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.similarity import (
    dim_variance_ranking,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.textstats import (
    zipf_slope,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.timeseries import (
    inter_event_gap_histogram,
)


def test_consistent_hash_ring_moves_fewer_keys(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], ["user_id"])
    out = {r["scheme"]: r for r in
           consistent_hash_audit(df, "user_id", n_shards=8).collect()}
    assert out["mod"]["n_keys"] == out["ring"]["n_keys"] == 200
    # mod placement moves ~8/9 of keys; the ring only what the new
    # shard captures (~1/9). The audit exists to show this gap.
    assert out["ring"]["n_moved"] < out["mod"]["n_moved"]
    assert out["ring"]["moved_frac"] < 0.5 < out["mod"]["moved_frac"]


def test_consistent_hash_rejects_bad_shards(spark):
    df = spark.createDataFrame([(1,)], ["user_id"])
    with pytest.raises(ValueError, match="n_shards"):
        consistent_hash_audit(df, "user_id", n_shards=0)


def test_gap_histogram_buckets(spark):
    # user 1 gaps: 0s and 62s -> buckets len(bin(1))=1, len(bin(63))=6;
    # user 2 has a single event -> contributes no gap
    rows = [
        (1, "2024-01-01 10:00:00", 1),
        (2, "2024-01-01 10:00:00", 1),
        (3, "2024-01-01 10:01:02", 1),
        (4, "2024-01-01 09:00:00", 2),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id"])
    out = {r["gap_bucket"]: r for r in inter_event_gap_histogram(df).collect()}
    assert set(out) == {1, 6}
    assert out[1]["n_gaps"] == 1 and out[1]["max_gap_s"] == 0
    assert out[6]["min_gap_s"] == 62


def test_dim_variance_ranking_orders_by_signal(spark):
    # dim0 varies, dim1 constant -> dim0 rank 1, dim1 variance 0
    rows = [(0, [0.0, 5.0]), (1, [1.0, 5.0]), (2, [2.0, 5.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r["dim"]: r for r in dim_variance_ranking(df).collect()}
    assert out[0]["rank"] == 1
    assert out[1]["variance"] == 0.0
    # var of {0,1,2} = 2/3
    assert out[0]["variance"] == pytest.approx(2 / 3, abs=1e-6)


def test_zipf_slope_perfect_zipf_is_minus_one(spark):
    # construct freq(rank r) = 60/r for r=1..4 -> slope exactly -1
    words = []
    for r, tok in enumerate(["aa", "bb", "cc", "dd"], start=1):
        words += [tok] * (60 // r)
    df = spark.createDataFrame([(0, " ".join(words))], ["doc_id", "text"])
    out = zipf_slope(df, top_k=4).collect()[0]
    assert out["n_terms"] == 4
    assert out["slope"] == pytest.approx(-1.0, abs=0.01)


def test_zipf_slope_rejects_bad_k(spark):
    df = spark.createDataFrame([(0, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="top_k"):
        zipf_slope(df, top_k=1)


def test_session_duration_histogram_buckets(spark):
    from public_projet_data_engineering_tarification_electrique_spark.operators.sessions import (
        session_duration_histogram,
    )

    # user 1: one 62s session (events 0s apart then 62s within gap) and
    # one single-event session (duration 0); 2000s gap splits them
    rows = [
        (1, 1, 0.0, 1000),
        (2, 1, 0.0, 1062),
        (3, 1, 0.0, 5000),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "value", "ts_s"])
    out = {r["duration_bucket"]: r for r in
           session_duration_histogram(df, gap_seconds=1800).collect()}
    # 62s session -> bin(63) len 6; 0s session -> bin(1) len 1
    assert set(out) == {1, 6}
    assert out[6]["max_s"] == 62
    assert out[1]["n_sessions"] == 1
