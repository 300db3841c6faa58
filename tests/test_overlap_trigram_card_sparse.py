"""Cross-source overlap (operators.dedup), char trigram profile
(operators.textstats), join cardinality audit (operators.audit),
sparse cosine pairs (operators.search)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from public_projet_data_engineering_tarification_electrique_spark.operators.audit import (
    join_cardinality_audit,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.dedup import (
    cross_source_overlap,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.search import (
    sparse_cosine_pairs,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.textstats import (
    char_trigram_profile,
)


def test_cross_source_overlap_counts_distinct_texts(spark):
    # "dup" bridges A<->B (and its repeat inside A counts once);
    # "only-a"/"only-b" bridge nothing; C shares nothing
    rows = [
        (0, "dup", "A"),
        (1, "dup", "A"),
        (2, "dup", "B"),
        (3, "only-a", "A"),
        (4, "only-b", "B"),
        (5, "other", "C"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = cross_source_overlap(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["source_a"], r["source_b"], r["n_shared_texts"]) == ("A", "B", 1)


def test_char_trigram_profile_boundaries(spark):
    # "abcd" -> trigrams abc, bcd; a 2-char doc contributes nothing
    rows = [(0, "abcd", "x"), (1, "ab", "x")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {r["trigram"]: r for r in char_trigram_profile(df, k=10).collect()}
    assert set(out) == {"abc", "bcd"}
    assert out["abc"]["rank"] == 1  # tie on n=1 -> lexicographic
    assert out["abc"]["n"] == 1


def test_join_cardinality_exact_from_histograms(spark):
    # key 1: 2x3=6, key 2: 1x1=1 -> actual 7; key 3 on the right only
    left = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 12)], ["k", "row_id"]
    )
    right = spark.createDataFrame([(1,), (1,), (1,), (2,), (3,)], ["k"])
    out = join_cardinality_audit(
        left, right, "k", "k",
        sample_row_expr=F.col("row_id"), sample_pct=100,
    ).collect()[0]
    assert out["actual_rows"] == 7
    # 100% sample -> estimate is exact
    assert out["estimated_rows"] == 7
    assert out["rel_err"] == 0.0


def test_join_cardinality_rejects_bad_pct(spark):
    df = spark.createDataFrame([(1,)], ["k"])
    with pytest.raises(ValueError, match="sample_pct"):
        join_cardinality_audit(df, df, "k", "k", sample_pct=0)


def test_sparse_cosine_identical_docs_is_one(spark):
    rows = [
        (0, "alpha beta gamma"),
        (1, "alpha beta gamma"),
        (2, "delta epsilon zeta"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {(r["id_a"], r["id_b"]): r["cos"] for r in
           sparse_cosine_pairs(df, threshold=0.3, max_df=100).collect()}
    assert out == {(0, 1): 1.0}


def test_sparse_cosine_df_cap_drops_ubiquitous_tokens(spark):
    # "common" is in all 3 docs; with max_df=2 it leaves the space, so
    # docs 0/1 share nothing scoreable
    rows = [
        (0, "common aaa"),
        (1, "common bbb"),
        (2, "common ccc"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    assert sparse_cosine_pairs(df, threshold=0.01, max_df=2).count() == 0
