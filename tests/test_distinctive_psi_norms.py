"""Distinctive terms (operators.textstats), PSI drift (operators.stats),
embedding norm audit (operators.similarity)."""

from __future__ import annotations

import pytest

from public_projet_data_engineering_tarification_electrique_spark.operators.similarity import (
    embedding_norm_audit,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.stats import (
    psi_drift,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.textstats import (
    distinctive_terms,
)


def test_distinctive_terms_finds_slice_signature(spark):
    # "zebra" only ever appears in source A -> it tops A's list;
    # "common" is everywhere -> never distinctive
    rows = [
        (0, "common zebra zebra zebra", "A"),
        (1, "common common filler", "B"),
        (2, "common filler filler", "B"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = distinctive_terms(df, k=1, by="source").collect()
    top_a = next(r for r in out if r["source"] == "A")
    assert top_a["token"] == "zebra"
    assert top_a["n_in_slice"] == 3
    assert top_a["rank"] == 1


def test_psi_identical_distributions_is_near_zero(spark):
    rows = [(i / 10.0, g) for i in range(10) for g in ("a", "b")]
    df = spark.createDataFrame(rows, ["score", "grp"])
    r = psi_drift(df, "score", "grp", "a", "b").collect()[0]
    assert r["n_a"] == r["n_b"] == 10
    assert abs(r["psi"]) < 1e-6


def test_psi_disjoint_distributions_is_large(spark):
    rows = [(0.05, "a")] * 10 + [(0.95, "b")] * 10
    df = spark.createDataFrame(rows, ["score", "grp"])
    r = psi_drift(df, "score", "grp", "a", "b").collect()[0]
    assert r["psi"] > 1.0  # way past the 0.25 act threshold


def test_psi_rejects_bad_bins(spark):
    df = spark.createDataFrame([(0.5, "a")], ["score", "grp"])
    with pytest.raises(ValueError, match="n_bins"):
        psi_drift(df, "score", "grp", "a", "b", n_bins=0)


def test_norm_audit_flags_exploding_vector(spark):
    # 9 unit-norm vectors and one 100x vector -> exactly one outlier
    rows = [(i, [1.0, 0.0]) for i in range(9)] + [(9, [100.0, 0.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = embedding_norm_audit(df, mad_k=5).collect()
    kinds = {}
    for r in out:
        kinds.setdefault(r["kind"], []).append(r)
    assert len(kinds["_summary"]) == 1
    s = kinds["_summary"][0]
    assert s["n"] == 10
    assert s["median_e4"] == 10_000  # unit norm on the 1e-4 grid
    assert [r["vec_id"] for r in kinds["outlier"]] == [9]
    assert kinds["outlier"][0]["norm_e4"] == 1_000_000


def test_norm_audit_uniform_norms_no_outliers(spark):
    rows = [(i, [3.0, 4.0]) for i in range(4)]  # all norm 5
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = embedding_norm_audit(df).collect()
    assert len(out) == 1 and out[0]["kind"] == "_summary"
    assert out[0]["median_e4"] == 50_000 and out[0]["mad_e4"] == 0


def test_psi_out_of_range_scores_clamp(spark):
    # contract-violating scores clamp into the edge bins instead of
    # producing engine-dependent negative bin ids
    rows = [(-0.5, "a"), (1.7, "a"), (0.5, "b")]
    df = spark.createDataFrame(rows, ["score", "grp"])
    r = psi_drift(df, "score", "grp", "a", "b").collect()[0]
    assert r["n_a"] == 2 and r["n_b"] == 1
