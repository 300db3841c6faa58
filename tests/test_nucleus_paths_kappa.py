"""Normalized dedup (operators.dedup), nucleus vocab
(operators.textstats), event prefix paths (operators.sessions),
Cohen's kappa (operators.stats)."""

from __future__ import annotations

import pytest

from public_projet_data_engineering_tarification_electrique_spark.operators.dedup import (
    normalized_dedup_stats,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.sessions import (
    event_prefix_paths,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.stats import (
    cohens_kappa,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.textstats import (
    nucleus_vocab,
)


def test_normalized_dedup_merges_whitespace_case(spark):
    # docs 0/1/2 normalize to the same form ("a b c") with 3 raw
    # variants; doc 3 is alone
    rows = [
        (0, "a b c"),
        (1, "A  B C"),
        (2, " a b\tc "),
        (3, "other"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        (r["group_size"], r["n_raw_variants"]): r["n_groups"]
        for r in normalized_dedup_stats(df).collect()
    }
    assert out == {(3, 3): 1, (1, 1): 1}


def test_nucleus_vocab_head_coverage(spark):
    # slice x: "a" appears 9 times, "b" once -> 90% coverage needs just
    # {a}; slice y: ten distinct tokens -> 90% needs 9 of them
    rows = [(0, " ".join(["a"] * 9 + ["b"]), "x"),
            (1, " ".join(f"t{i}" for i in range(10)), "y")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {r["lang"]: r for r in nucleus_vocab(df, coverage_pct=90).collect()}
    assert out["x"]["total_tokens"] == 10
    assert out["x"]["distinct_tokens"] == 2
    assert out["x"]["nucleus_vocab"] == 1
    assert out["y"]["nucleus_vocab"] == 9


def test_nucleus_vocab_full_coverage_is_distinct(spark):
    df = spark.createDataFrame([(0, "a a b", "x")], ["doc_id", "text", "lang"])
    out = nucleus_vocab(df, coverage_pct=100).collect()[0]
    assert out["nucleus_vocab"] == out["distinct_tokens"] == 2


def test_nucleus_vocab_rejects_bad_pct(spark):
    df = spark.createDataFrame([(0, "a", "x")], ["doc_id", "text", "lang"])
    with pytest.raises(ValueError, match="coverage_pct"):
        nucleus_vocab(df, coverage_pct=0)


def test_prefix_paths_ordered_and_cut(spark):
    # user 1 has 4 events; only the first 3 (by ts, then event_id for
    # the tie at 10:00:02) form the path
    rows = [
        (4, "2024-01-01 10:00:03", 1, "d"),
        (1, "2024-01-01 10:00:00", 1, "a"),
        (3, "2024-01-01 10:00:02", 1, "c"),
        (2, "2024-01-01 10:00:02", 1, "b"),
        (5, "2024-01-01 09:00:00", 2, "a"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = {r["path"]: r["n_users"] for r in event_prefix_paths(df, n_steps=3).collect()}
    assert out == {"a>b>c": 1, "a": 1}


def test_cohens_kappa_perfect_and_chance(spark):
    # perfect agreement -> kappa 1
    rows = [(True, True)] * 3 + [(False, False)] * 3
    df = spark.createDataFrame(rows, ["a", "b"])
    r = cohens_kappa(df).collect()[0]
    assert r["kappa"] == 1.0 and r["n_agree"] == 6
    # rater b constant-True -> pe == po, kappa 0
    rows = [(True, True), (False, True)]
    r = cohens_kappa(spark.createDataFrame(rows, ["a", "b"])).collect()[0]
    assert r["kappa"] == 0.0


def test_cohens_kappa_degenerate_denominator_null(spark):
    # both raters constant -> denominator 0 -> kappa NULL, not a crash
    df = spark.createDataFrame([(True, True), (True, True)], ["a", "b"])
    r = cohens_kappa(df).collect()[0]
    assert r["kappa"] is None
    assert r["n"] == 2
