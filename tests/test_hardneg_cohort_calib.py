"""Hard-negative mining + kNN label agreement (operators.similarity),
cohort retention (operators.sessions), calibration bins
(operators.stats)."""

from __future__ import annotations

import pytest

from public_projet_data_engineering_tarification_electrique_spark.operators.sessions import (
    cohort_retention,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.similarity import (
    hard_negatives,
    knn_label_agreement,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.stats import (
    calibration_bins,
)


def test_hard_negatives_excludes_same_label(spark):
    # anchor 0 (label A) must only ever see label-B neighbors, ranked
    # by cosine: id 2 points the same way as the anchor (sim 1.0), so
    # it outranks id 3 (orthogonal)
    rows = [
        (0, [1.0, 0.0], "A"),
        (1, [1.0, 0.1], "A"),   # same label: never a negative
        (2, [2.0, 0.0], "B"),   # parallel to anchor -> sim 1.0
        (3, [0.0, 1.0], "B"),   # orthogonal -> sim 0.0
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = hard_negatives(df, n_anchors=1, k=2).collect()
    assert [(r["neighbor_id"], r["rank"]) for r in sorted(out, key=lambda r: r["rank"])] == [
        (2, 1),
        (3, 2),
    ]
    assert all(r["neighbor_label"] == "B" for r in out)


def test_hard_negatives_zero_norm_dropped(spark):
    rows = [
        (0, [1.0, 0.0], "A"),
        (1, [0.0, 0.0], "B"),   # zero vector: cosine undefined, dropped
        (2, [1.0, 1.0], "B"),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = hard_negatives(df, n_anchors=1, k=5).collect()
    assert [r["neighbor_id"] for r in out] == [2]


def test_knn_label_agreement_perfect_clusters(spark):
    # two tight, well-separated clusters: every anchor's neighbors all
    # share its label, so agreement is total
    rows = [(i, [10.0 + i * 0.01, 0.0], 0) for i in range(4)] + [
        (10 + i, [0.0, 10.0 + i * 0.01], 1) for i in range(4)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = {r["label"]: r for r in knn_label_agreement(df, n_anchors=4, k=3).collect()}
    assert out[0]["n_anchors"] == 4
    assert out[0]["n_agree"] == 4


def test_cohort_retention_triangle(spark):
    # u1 active weeks 0 and 1 (cohort 0, offsets 0+1); u2 only week 1
    # (cohort 1, offset 0); duplicate events must not double-count
    rows = [
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-02 10:00:00"),  # same week, dedup'd
        (1, "2024-01-08 10:00:00"),
        (2, "2024-01-09 10:00:00"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in cohort_retention(df).collect()
    }
    assert out == {(0, 0): 1, (0, 1): 1, (1, 0): 1}


def test_calibration_bins_boundaries(spark):
    # 0.0 -> bin 0; 0.1 is the exclusive upper edge of bin 0 -> bin 1;
    # 1.0 clamps into the last bin
    rows = [(0.0, True), (0.1, False), (0.95, True), (1.0, True)]
    df = spark.createDataFrame(rows, ["score", "outcome"])
    out = {r["bin"]: r for r in calibration_bins(df, n_bins=10).collect()}
    assert set(out) == {0, 1, 9}
    assert out[9]["n"] == 2
    assert out[9]["pos_rate"] == 1.0
    assert out[0]["pos_rate"] == 1.0
    assert out[1]["pos_rate"] == 0.0
    assert out[9]["mean_score"] == pytest.approx(0.975)


def test_calibration_bins_rejects_bad_bins(spark):
    df = spark.createDataFrame([(0.5, True)], ["score", "outcome"])
    with pytest.raises(ValueError, match="positive"):
        calibration_bins(df, n_bins=0)


def test_calibration_bins_out_of_range_clamps(spark):
    from public_projet_data_engineering_tarification_electrique_spark.operators.stats import (
        calibration_bins,
    )

    rows = [(-0.3, True), (2.5, False)]
    df = spark.createDataFrame(rows, ["score", "outcome"])
    out = {r["bin"]: r for r in calibration_bins(df, n_bins=10).collect()}
    assert set(out) == {0, 9}
    assert out[0]["mean_score"] == 0.0  # clamped to the grid floor
    assert out[9]["mean_score"] == 1.0  # clamped to the grid ceiling
