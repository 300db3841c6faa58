"""KS distance + chi-square (operators.stats), Count-Min sketch
(operators.sketches), zone-map audit (operators.shards), path
trigrams and RFM segmentation (operators.sessions)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from public_projet_data_engineering_tarification_electrique_spark.operators.sessions import (
    path_trigrams,
    rfm_segments,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.shards import (
    zone_map_audit,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.sketches import (
    cms_point_estimates,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.stats import (
    chi2_2x2,
    ks_distance,
)


# ----------------------------------------------------------------- KS


def test_ks_identical_distributions_is_zero(spark):
    # (id // 2) % 10 gives both parity groups the identical value set
    df = spark.range(200).select(
        ((F.col("id") / 2).cast("long") % 10).cast("double").alias("v"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("g"),
    )
    row = ks_distance(df, "v", "g", "a", "b").collect()[0]
    assert row["n_a"] == 100 and row["n_b"] == 100
    assert row["d_numerator"] == 0
    assert row["ks_distance"] == 0.0


def test_ks_disjoint_distributions_is_one(spark):
    df = spark.range(100).select(
        F.when(F.col("id") % 2 == 0, 1.0).otherwise(100.0).alias("v"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("g"),
    )
    row = ks_distance(df, "v", "g", "a", "b").collect()[0]
    assert row["ks_distance"] == 1.0


def test_ks_known_half_shift(spark):
    # a: {0,1}, b: {1,2} uniformly -> max |F_a - F_b| = 0.5 at x=1
    rows = [(0.0, "a"), (1.0, "a"), (1.0, "b"), (2.0, "b")]
    df = spark.createDataFrame(rows, ["v", "g"])
    row = ks_distance(df, "v", "g", "a", "b").collect()[0]
    assert row["ks_distance"] == 0.5


# --------------------------------------------------------------- chi2


def test_chi2_independent_table_is_zero(spark):
    # perfectly proportional cells -> det = ad - bc = 0
    rows = (
        [(True, True)] * 10
        + [(True, False)] * 30
        + [(False, True)] * 20
        + [(False, False)] * 60
    )
    df = spark.createDataFrame(rows, ["variant", "outcome"])
    row = chi2_2x2(df, "variant", "outcome").collect()[0]
    assert (row["a"], row["b"], row["c"], row["d"]) == (10, 30, 20, 60)
    assert row["chi2"] == 0.0


def test_chi2_textbook_value(spark):
    # a=20 b=30 c=10 d=40: chi2 = 100*(800-300)^2/(50*50*30*70)
    rows = (
        [(True, True)] * 20
        + [(True, False)] * 30
        + [(False, True)] * 10
        + [(False, False)] * 40
    )
    df = spark.createDataFrame(rows, ["variant", "outcome"])
    row = chi2_2x2(df, "variant", "outcome").collect()[0]
    expected = 100 * (20 * 40 - 30 * 10) ** 2 / (50 * 50 * 30 * 70)
    assert row["chi2"] == round(expected, 6)
    assert row["rate_variant"] == 0.4
    assert row["rate_control"] == 0.2


# ---------------------------------------------------------------- CMS


def test_cms_never_underestimates_and_is_tight_here(spark):
    # 100 distinct keys over 4x256 cells: few collisions, always >=
    df = spark.range(1000).select((F.col("id") % 100).alias("k"))
    out = cms_point_estimates(df, "k", list(range(5))).collect()
    assert len(out) == 5
    for r in out:
        assert r["exact_count"] == 10
        assert r["est_count"] >= 10
        assert r["overestimate"]


def test_cms_absent_key_estimates_small(spark):
    df = spark.range(100).select(F.col("id").alias("k"))
    out = {r["key"]: r for r in cms_point_estimates(df, "k", [5000]).collect()}
    assert out[5000]["exact_count"] == 0
    assert out[5000]["est_count"] >= 0  # one-sided


def test_cms_rejects_empty_query_keys(spark):
    df = spark.range(10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="non-empty"):
        cms_point_estimates(df, "k", [])


# ------------------------------------------------------------ zonemap


def test_zone_map_sorted_layout_prunes_tightly(spark):
    df = spark.range(100).select(
        F.col("id").alias("pk"),
        F.format_string("k%03d", F.col("id")).alias("key"),
    )
    out = zone_map_audit(
        df, "key", "pk", docs_per_shard=25, pred_lo="k050", pred_hi="k074"
    ).collect()
    zones = {r["shard_id"]: r for r in out}
    assert len(zones) == 4
    # sorted layout: the predicate [k050, k074] hits EXACTLY shard 2
    assert [zones[i]["overlaps_predicate"] for i in range(4)] == [
        False,
        False,
        True,
        False,
    ]
    assert zones[2]["min_key"] == "k050" and zones[2]["max_key"] == "k074"


# ----------------------------------------------------------- trigrams


def test_path_trigrams_counts_consecutive_triples(spark):
    rows = [
        (1, 1, "a", "2024-01-01 10:00:00"),
        (2, 1, "b", "2024-01-01 10:01:00"),
        (3, 1, "c", "2024-01-01 10:02:00"),
        (4, 1, "a", "2024-01-01 10:03:00"),  # (b,c,a)
        (5, 2, "a", "2024-01-01 10:00:00"),
        (6, 2, "b", "2024-01-01 10:01:00"),
        (7, 2, "c", "2024-01-01 10:02:00"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "ts"]
    ).select("event_id", "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts"))
    out = {(r["t1"], r["t2"], r["t3"]): r["n"] for r in path_trigrams(df).collect()}
    assert out[("a", "b", "c")] == 2  # once per user
    assert out[("b", "c", "a")] == 1
    assert len(out) == 2  # no cross-user trigrams


# ---------------------------------------------------------------- RFM


def test_rfm_conserves_users_and_cents(spark):
    rows = [
        (i, i % 7, "purchase", f"2024-01-{(i % 28) + 1:02d} 10:00:00", float(i))
        for i in range(56)
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "ts", "value"]
    ).select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp").alias("ts"),
        "value",
    )
    out = rfm_segments(df)
    totals = out.agg(
        F.sum("n_users").alias("u"), F.sum("total_cents").alias("c")
    ).collect()[0]
    assert totals["u"] == 7  # every purchasing user lands in one segment
    assert totals["c"] == sum(i * 100 for i in range(56))


def test_rfm_deterministic_under_repartition(spark):
    rows = [
        (i, i % 11, "purchase", f"2024-01-{(i % 28) + 1:02d} 10:00:00", float(i % 13))
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "ts", "value"]
    ).select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp").alias("ts"),
        "value",
    )
    a = sorted(map(tuple, rfm_segments(df).collect()))
    b = sorted(map(tuple, rfm_segments(df.repartition(17)).collect()))
    assert a == b
