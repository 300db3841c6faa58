"""Char entropy (operators.textstats), canonical docs (operators.dedup),
degree histogram (operators.graph), bitmap distinct
(operators.sketches)."""

from __future__ import annotations

import math

import pytest

from public_projet_data_engineering_tarification_electrique_spark.operators.dedup import (
    canonical_docs,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.graph import (
    degree_histogram,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.sketches import (
    bitmap_distinct_daily,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.textstats import (
    char_entropy,
)


def test_char_entropy_extremes(spark):
    # all-same chars -> 0 bits; all-distinct (4 chars) -> 2 bits;
    # empty doc absent
    rows = [(0, "aaaa"), (1, "abcd"), (2, "")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in char_entropy(df).collect()}
    assert set(out) == {0, 1}
    assert out[0]["entropy"] == 0.0
    assert out[1]["entropy"] == pytest.approx(2.0)
    assert out[1]["n_chars"] == 4


def test_char_entropy_half_split(spark):
    # "aabb": two symbols at p=1/2 each -> exactly 1 bit
    df = spark.createDataFrame([(0, "aabb")], ["doc_id", "text"])
    assert char_entropy(df).collect()[0]["entropy"] == pytest.approx(1.0)


def test_canonical_docs_picks_highest_quality(spark):
    # docs 0 and 1 are near-identical (same 3-gram shingles) but doc 1
    # has more tokens -> higher length-saturating quality -> kept
    base = "alpha beta gamma delta epsilon zeta"
    rows = [
        (0, base),
        (1, base + " eta theta iota kappa"),
        (2, "completely different text with no overlap at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = canonical_docs(df, k=3, threshold=0.2, max_df=100).collect()
    assert len(out) == 1  # doc 2 has no near-dup, so no cluster row
    r = out[0]
    assert r["kept_doc_id"] == 1
    assert r["cluster_size"] == 2
    assert r["cluster_id"] == 0  # min id in cluster names it


def test_degree_histogram_buckets(spark):
    # star graph: hub 0 joined to 1..4 -> hub degree 4 (bucket 3:
    # [4,8)), leaves degree 1 (bucket 1: [1,2))
    rows = [(0, i) for i in range(1, 5)]
    df = spark.createDataFrame(rows, ["src", "dst"])
    out = {r["degree_bucket"]: r for r in degree_histogram(df).collect()}
    assert out[3]["n_nodes"] == 1
    assert out[3]["min_degree"] == out[3]["max_degree"] == 4
    assert out[1]["n_nodes"] == 4


def test_bitmap_distinct_matches_exact(spark):
    # duplicate users within a day collapse; key ids straddle the
    # 32768-bit bucket boundary so multiple buckets are exercised
    rows = [
        (1, "2024-01-01 01:00:00"),
        (1, "2024-01-01 02:00:00"),
        (2, "2024-01-01 03:00:00"),
        (40000, "2024-01-01 04:00:00"),
        (2, "2024-01-02 01:00:00"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"]).selectExpr(
        "user_id", "cast(ts as timestamp) as ts"
    )
    out = {str(r["date"]): r["n_distinct"] for r in bitmap_distinct_daily(df).collect()}
    assert out == {"2024-01-01": 3, "2024-01-02": 1}
