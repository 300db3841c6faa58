"""Property tests for the round-12 operator band (q304–q314):
clustering (Lloyd k-means, silhouette), edit-distance dedup +
blocking quality, Adamic–Adar link prediction, Neyman allocation,
streaming heavy hitters, and the TPC-H additions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from public_projet_data_engineering_tarification_electrique_spark.operators.clustering import (
    kmeans_lloyd,
    silhouette_audit,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.dedup import (
    blocking_quality,
    editdist_neardup,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.graph import (
    adamic_adar_linkpred,
)
from public_projet_data_engineering_tarification_electrique_spark.plans import registry

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    from public_projet_data_engineering_tarification_electrique_spark.sources.tables import (
        load_table,
    )

    return load_table(spark, SF_SMOKE, "embeddings")


@pytest.fixture(scope="module")
def docs(spark):
    from public_projet_data_engineering_tarification_electrique_spark.sources.tables import (
        load_table,
    )

    return load_table(spark, SF_SMOKE, "documents")


# ---------- k-means ----------


def test_kmeans_partitions_corpus(spark, emb):
    total = emb.filter(F.col("embedding").isNotNull()).count()
    rows = kmeans_lloyd(emb, k=8, iters=2).collect()
    assert sum(r["n"] for r in rows) == total
    assert len(rows) <= 8
    assert all(r["inertia"] >= 0 for r in rows)
    assert all(0 <= r["cluster"] < 8 for r in rows)


def test_kmeans_deterministic(spark, emb):
    a = kmeans_lloyd(emb, k=8, iters=2).collect()
    b = kmeans_lloyd(emb, k=8, iters=2).collect()
    assert a == b


def test_kmeans_iterations_do_not_increase_inertia(spark, emb):
    """Lloyd's update provably never increases total inertia; the
    snapping grid perturbs at 1e-6 per row, so allow that slack."""
    tot = {
        it: sum(
            r["inertia"]
            for r in kmeans_lloyd(emb, k=8, iters=it).collect()
        )
        for it in (0, 1, 2)
    }
    n = emb.count()
    slack = 2e-6 * n
    assert tot[1] <= tot[0] + slack
    assert tot[2] <= tot[1] + slack


def test_kmeans_k1_single_cluster(spark, emb):
    rows = kmeans_lloyd(emb, k=1, iters=1).collect()
    assert len(rows) == 1 and rows[0]["cluster"] == 0


def test_kmeans_rejects_bad_params(spark, emb):
    with pytest.raises(ValueError):
        kmeans_lloyd(emb, k=0)
    with pytest.raises(ValueError):
        kmeans_lloyd(emb, iters=-1)


# ---------- silhouette ----------


def test_silhouette_bounds_and_counts(spark, emb):
    total = emb.filter(F.col("embedding").isNotNull()).count()
    rows = silhouette_audit(emb).collect()
    assert sum(r["n"] for r in rows) == total
    assert all(-1.0 <= r["mean_silhouette"] <= 1.0 for r in rows)


def test_silhouette_separated_clusters_score_high(spark):
    # two tight, far-apart clusters -> silhouette near 1 for both
    rows = [
        (i, [float(base + 0.01 * i), 0.0], lab)
        for lab, base in ((0, 0.0), (1, 100.0))
        for i in range(5)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = silhouette_audit(df).collect()
    assert len(out) == 2
    assert all(r["mean_silhouette"] > 0.99 for r in out)


# ---------- edit-distance dedup ----------


def test_editdist_exact_duplicates_found(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog", "en"),
            (2, "the quick brown fox jumps over the lazy dog", "en"),
            (3, "a completely different document body here", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    rows = editdist_neardup(df).collect()
    assert [(r["id_a"], r["id_b"]) for r in rows] == [(1, 2)]
    assert rows[0]["lev"] == 0 and rows[0]["sim"] == 1.0


def test_editdist_near_duplicate_scored(spark):
    a = "the quick brown fox jumps over the lazy dog again and again"
    b = a.replace("lazy", "hazy")
    df = spark.createDataFrame(
        [(1, a, "en"), (2, b, "en")],
        "doc_id long, text string, lang string",
    )
    rows = editdist_neardup(df, threshold=0.9).collect()
    assert len(rows) == 1
    assert 0.9 <= rows[0]["sim"] < 1.0


def test_editdist_cross_lang_never_pairs(spark):
    df = spark.createDataFrame(
        [(1, "same text here", "en"), (2, "same text here", "fr")],
        "doc_id long, text string, lang string",
    )
    assert editdist_neardup(df).count() == 0


def test_editdist_threshold_respected(spark, docs):
    rows = editdist_neardup(docs, threshold=0.9).collect()
    assert all(r["sim"] >= 0.9 for r in rows)
    assert all(r["id_a"] < r["id_b"] for r in rows)


# ---------- blocking quality ----------


def test_blocking_quality_invariants(spark, docs):
    r = blocking_quality(docs, audit_mod=4).collect()[0]
    assert r["caught"] <= r["true_matches"] <= r["all_pairs"]
    assert r["candidates"] <= r["all_pairs"]
    if r["true_matches"]:
        assert 0.0 <= r["pair_completeness"] <= 1.0
    if r["all_pairs"]:
        assert 0.0 <= r["reduction_ratio"] <= 1.0


# ---------- Adamic–Adar ----------


def test_adamic_adar_triangle_free_pair(spark):
    # path graph a-b-c: the only wedge is (a, c) through b (deg 2)
    import math

    edges = spark.createDataFrame(
        [(1, 2), (2, 3)], "src long, dst long"
    )
    rows = adamic_adar_linkpred(edges).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"], r["common"]) == (1, 3, 1)
    assert r["score"] == round(round(1 / math.log(2), 6), 6)


def test_adamic_adar_excludes_existing_edges(spark):
    # triangle: every wedge pair is already an edge -> no suggestions
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src long, dst long"
    )
    assert adamic_adar_linkpred(edges).count() == 0


# ---------- registry-level round-12 queries ----------


def test_neyman_allocation_shares(spark):
    rows = registry.q312_neyman_allocation(spark, SF_SMOKE).collect()
    assert rows
    assert abs(sum(r["alloc_share"] for r in rows) - 1.0) < 1e-4
    total = sum(r["alloc_n"] for r in rows)
    # floor allocation: within one unit per stratum of the target
    assert 1000 - len(rows) <= total <= 1000
    assert all(r["sd_chars"] >= 0 for r in rows)


def test_stream_heavy_hitters_matches_batch(spark):
    from public_projet_data_engineering_tarification_electrique_spark.sources.tables import (
        load_table,
    )

    out = registry.q310_stream_heavy_hitters(spark, SF_SMOKE).collect()
    assert out, "no closed day emitted"
    assert all(1 <= r["rank"] <= 3 for r in out)
    # per emitted day, counts must equal the batch count
    ev = load_table(spark, SF_SMOKE, "events")
    batch = {
        (r["d"], r["event_type"]): r["n"]
        for r in ev.groupBy(
            F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("d"),
            "event_type",
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in out:
        assert batch[(r["day"], r["event_type"])] == r["n"]


def test_tpch_returned_items_topk(spark):
    rows = registry.q311_tpch_returned_items(spark, SF_SMOKE).collect()
    assert len(rows) <= 20
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_tpch_sales_opportunity_excludes_order_holders(spark):
    from public_projet_data_engineering_tarification_electrique_spark.sources.tables import (
        load_table,
    )

    rows = registry.q314_tpch_sales_opportunity(
        spark, SF_SMOKE
    ).collect()
    custs = load_table(spark, SF_SMOKE, "customer").count()
    assert sum(r["numcust"] for r in rows) <= custs
    assert all(r["totacctbal"] > 0 for r in rows)


# ---------- batch B: q315-q320 ----------


def test_l_diversity_single_source_cells_flagged(spark):
    from public_projet_data_engineering_tarification_electrique_spark.operators.audit import (
        l_diversity_audit,
    )

    df = spark.createDataFrame(
        [
            ("en", 0, "web"), ("en", 0, "web"),   # cell l=1: risky
            ("fr", 0, "web"), ("fr", 0, "book"),  # cell l=2: fine
        ],
        "lang string, band int, source string",
    )
    rows = {
        r["grp"]: r
        for r in l_diversity_audit(
            df, ["lang", "band"], "source", l=2
        ).collect()
    }
    assert rows["en"]["n_risky_cells"] == 1
    assert rows["en"]["n_rows_at_risk"] == 2
    assert rows["fr"]["n_risky_cells"] == 0
    with pytest.raises(ValueError):
        l_diversity_audit(df, ["lang"], "source", l=1)


def test_geometric_median_resists_outlier(spark):
    from public_projet_data_engineering_tarification_electrique_spark.operators.clustering import (
        geometric_median,
    )

    # 9 points at ~1.0 plus one far outlier at 1000: the MEAN is
    # dragged to ~100, the geometric median stays near 1.0
    rows = [(i, [1.0 + 0.001 * i, 0.0], 0) for i in range(9)]
    rows.append((9, [1000.0, 0.0], 0))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = geometric_median(df, iters=2).collect()[0]
    assert out["n"] == 10
    assert out["med_norm"] < 5.0, "median was dragged by the outlier"


def test_mahalanobis_planted_outlier_ranks_first(spark, emb):
    from public_projet_data_engineering_tarification_electrique_spark.operators.clustering import (
        mahalanobis_outliers,
    )

    rows = mahalanobis_outliers(emb, top_n=20).collect()
    assert len(rows) == 20
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s >= 0 for s in scores)


def test_simpson_audit_signs_consistent(spark):
    rows = registry.q318_simpson_audit(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["seg_sign"] in (-1, 0, 1)
        assert r["pooled_sign"] in (-1, 0, 1)
        assert r["simpson_flag"] == (
            r["seg_sign"] * r["pooled_sign"] < 0
        )


def test_robust_dim_scaler_shape(spark, emb):
    from public_projet_data_engineering_tarification_electrique_spark.operators.clustering import (
        robust_dim_scaler,
    )

    rows = robust_dim_scaler(emb).collect()
    assert len(rows) == 64
    for r in rows:
        assert r["iqr"] >= 0
        assert r["n_outliers"] <= r["n"]


def test_shipdelay_counts_partition_lineitems(spark):
    from public_projet_data_engineering_tarification_electrique_spark.sources.tables import (
        load_table,
    )

    rows = registry.q320_tpch_shipdelay_priority(
        spark, SF_SMOKE
    ).collect()
    total = sum(r["high_count"] + r["low_count"] for r in rows)
    li = load_table(spark, SF_SMOKE, "lineitem").count()
    assert total == li


# ---------- batch C: q321-q323 ----------


def test_min_cost_supplier_unique_per_part(spark):
    rows = registry.q321_tpch_min_cost_supplier(
        spark, SF_SMOKE
    ).collect()
    assert rows
    keys = [r["partkey"] for r in rows]
    assert len(keys) == len(set(keys)), "multiple suppliers per part"
    assert all(r["best_price"] > 0 for r in rows)


def test_editdist_clusters_cover_pair_nodes(spark, docs):
    pair_rows = editdist_neardup(docs).collect()
    nodes = {r["id_a"] for r in pair_rows} | {
        r["id_b"] for r in pair_rows
    }
    out = registry.q322_editdist_clusters(spark, SF_SMOKE).collect()
    assert {r["doc_id"] for r in out} == nodes
    # every cluster id is its component's minimum member
    by_cluster: dict = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], []).append(r["doc_id"])
    for cid, members in by_cluster.items():
        assert cid == min(members)
        assert all(
            r["cluster_size"] == len(members)
            for r in out
            if r["cluster_id"] == cid
        )


def test_pipeline_stage_checksums_monotone(spark):
    rows = {
        r["stage"]: r
        for r in registry.q323_pipeline_stage_checksums(
            spark, SF_SMOKE
        ).collect()
    }
    assert set(rows) == {"1_ingest", "2_filter", "3_dedup"}
    assert (
        rows["1_ingest"]["n_rows"]
        >= rows["2_filter"]["n_rows"]
        >= rows["3_dedup"]["n_rows"]
    )
    # rerun must be bit-identical (commutative digest, no RNG)
    again = {
        r["stage"]: r
        for r in registry.q323_pipeline_stage_checksums(
            spark, SF_SMOKE
        ).collect()
    }
    assert {k: (v["n_rows"], v["checksum"]) for k, v in rows.items()} == {
        k: (v["n_rows"], v["checksum"]) for k, v in again.items()
    }
