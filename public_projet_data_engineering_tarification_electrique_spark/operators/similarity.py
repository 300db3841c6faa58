"""Similarity search over embedding columns (extension surface,
BASELINE.json north star).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Queries are broadcast; candidates stream through a map-side cross
  join; per-query top-k via a window. At 100 TB the candidate side
  stays partition-parallel with no shuffle until the (tiny) per-query
  k-row aggregation.
- ``lsh_topk``: the scale path — MLlib BucketedRandomProjectionLSH
  buckets candidates so each query only scores its bucket's collisions
  (probabilistic recall, tunable via bucketLength/numHashTables).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import dot_product, l2_norm
from .util import ensure_parallelism


def cosine_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact brute-force cosine top-k per query.

    ``queries``: (query_id, embedding). Output:
    (query_id, vec_id, sim, rank) with rank 1..k ordered by rounded sim
    desc then vec_id (the rounded value is the ranking key so ordering
    is reproducible across engines).
    """
    # Precompute each side's norm ONCE per row (not per pair): the pair
    # scoring then does a single dot-product fold instead of three.
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qvec"),
        l2_norm(F.col(vec_col)).alias("_qnorm"),
    )
    c = ensure_parallelism(candidates).select(
        id_col,
        F.col(vec_col).alias("_cvec"),
        l2_norm(F.col(vec_col)).alias("_cnorm"),
    )
    sims = c.crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        F.round(
            dot_product(F.col("_qvec"), F.col("_cvec"))
            / (F.col("_qnorm") * F.col("_cnorm")),
            6,
        ).alias("sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "sim", "rank")
    )


def embedding_neardup(
    embeddings: DataFrame,
    threshold: float = 0.8,
    bucket_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by cosine within a blocking bucket.

    The bucket join (e.g. on a cluster/label/LSH-band column) keeps the
    pairwise comparison O(Σ bucket²) instead of O(N²) — the standard
    blocking pattern for embedding dedup at scale.
    Output: (id_a, id_b, sim) with id_a < id_b and sim ≥ threshold.
    """
    # Norms once per row; pair scoring is then a single fold (see cosine_topk).
    normed = ensure_parallelism(embeddings).select(
        F.col(bucket_col).alias("_bk"),
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        l2_norm(F.col(vec_col)).alias("_n"),
    )
    a = normed.select(
        F.col("_bk"), F.col("_id").alias("id_a"), F.col("_v").alias("_va"),
        F.col("_n").alias("_na"),
    )
    b = normed.select(
        F.col("_bk"), F.col("_id").alias("id_b"), F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"),
    )
    return (
        a.join(b, on="_bk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                dot_product(F.col("_va"), F.col("_vb"))
                / (F.col("_na") * F.col("_nb")),
                6,
            ).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def anchored_neardup(
    embeddings: DataFrame,
    threshold: float = 0.35,
    n_probe: int = 6,
    bucket_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale-safe near-dup pairs via deterministic IVF-style anchor
    blocking — the sub-quadratic replacement for ``embedding_neardup``
    when buckets grow with the corpus (SemDeDup-style curation).

    Blocking: anchors are the vectors whose md5-hashed id falls on the
    ``ceil(sqrt(n))`` residue grid (a random-sample codebook of
    k ≈ √n centroids for ANY id distribution — data-derived and
    SQL-expressible, so the DuckDB oracle reproduces the EXACT same
    blocking; no k-means fit, no driver-side action: the stride is a
    broadcast scalar subquery). Each vector is multi-assigned to its
    ``n_probe`` nearest anchors by cosine; a candidate pair must share
    ``bucket_col`` AND at least one probed anchor. Exact cosine then
    filters candidates at ``threshold``.

    Cost: assignment n·k = n^1.5 dot products; candidate scoring
    Σ (bucket ∩ anchor)² ≈ n^1.5/n_probe — sub-quadratic end-to-end vs
    the O(Σ bucket²) of plain bucket blocking (measured 7.9× pair-work
    growth for 4× rows at test SFs vs 16× quadratic; PLANS.md §2).

    Recall (vs exhaustive in-bucket scoring) is probabilistic, not 1:
    a pair is found iff it shares a probed anchor. Measured at
    threshold 0.35: 26/26 pairs at sf0.01, 350/391 at sf0.1 with
    n_probe=6 — the standard approximate-curation contract; raise
    ``n_probe`` to trade work for recall. Both engines compute the
    identical candidate set, so oracle parity is exact BY CONSTRUCTION
    at every scale, independent of recall.

    Routing determinism: anchors are ranked by ``round(sim+1e-9, 4)``
    desc then anchor id — the coarse grid absorbs last-ulp float
    divergence between engines' fold orders, and the id tie-break makes
    equal-grid ranks total.

    Output: (id_a, id_b, sim) with id_a < id_b and sim ≥ threshold.
    """
    base = ensure_parallelism(embeddings).select(
        F.col(id_col).alias("_id"),
        F.col(bucket_col).alias("_bk"),
        F.col(vec_col).cast("array<double>").alias("_v"),
        l2_norm(F.col(vec_col)).alias("_n"),
    )
    stride = base.agg(
        F.ceil(F.sqrt(F.count("*"))).cast("long").alias("_stride"),
        F.min("_id").alias("_mid"),
    )
    # Anchor selection hashes the id (md5 prefix — reproducible in the
    # SQL oracle) before the modulus: a raw `id % stride` sample would
    # silently collapse to ZERO anchors for id spaces that never hit
    # the residue (all-odd ids with an even stride, hash-derived ids),
    # where the hash keeps the expected k ≈ n/stride ≈ √n codebook for
    # ANY id distribution. The min-id row is ALWAYS an anchor: for tiny
    # inputs the residue sample is empty with probability (1-1/s)^n,
    # and an empty codebook would silently return zero pairs.
    id_hash = F.conv(
        F.substring(F.md5(F.col("_id").cast("string")), 1, 6), 16, 10
    ).cast("long")
    anchors = (
        base.crossJoin(F.broadcast(stride))
        .filter(
            (id_hash % F.col("_stride") == 0)
            | (F.col("_id") == F.col("_mid"))
        )
        .select(
            F.col("_id").alias("_aid"),
            F.col("_v").alias("_av"),
            F.col("_n").alias("_an"),
        )
    )
    probe_w = Window.partitionBy("_id").orderBy(
        F.desc("_rsim"), F.asc("_aid")
    )
    # Rank on scalars only — the n×k assignment rows shuffle through the
    # top-n_probe window WITHOUT the vectors (k× smaller exchange);
    # vectors re-attach via one id-key join after the filter.
    assignments = (
        base.crossJoin(F.broadcast(anchors))
        .select(
            "_id",
            "_bk",
            "_aid",
            F.round(
                dot_product(F.col("_v"), F.col("_av"))
                / (F.col("_n") * F.col("_an"))
                + F.lit(1e-9),
                4,
            ).alias("_rsim"),
        )
        .withColumn("_p", F.row_number().over(probe_w))
        .filter(F.col("_p") <= n_probe)
        .select("_id", "_bk", "_aid")
    )
    probes = assignments.join(base.select("_id", "_v", "_n"), on="_id")
    a = probes.select(
        F.col("_bk"), F.col("_aid"),
        F.col("_id").alias("id_a"), F.col("_v").alias("_va"),
        F.col("_n").alias("_na"),
    )
    b = probes.select(
        F.col("_bk"), F.col("_aid"),
        F.col("_id").alias("id_b"), F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"),
    )
    return (
        a.join(b, on=["_bk", "_aid"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                dot_product(F.col("_va"), F.col("_vb"))
                / (F.col("_na") * F.col("_nb")),
                6,
            ).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
        # a pair sharing several probed anchors scores identically each
        # time — distinct on the scored row dedupes without comparing
        # arrays
        .distinct()
    )


def lsh_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    bucket_length: float = 0.5,
    num_hash_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via BucketedRandomProjectionLSH (MLlib).

    Unit-norm embeddings ⇒ euclidean distance is monotone in cosine
    (d² = 2 − 2·cos), so ranking by LSH euclidean distance matches the
    cosine ranking. Not SQL-expressible → rows-only correctness check.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    cand = ensure_parallelism(candidates).select(
        id_col, array_to_vector(F.col(vec_col).cast("array<double>")).alias("_features")
    )
    qs = queries.select(
        F.col(query_id_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("_features"),
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="_features",
        outputCol="_hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(cand)
    joined = model.approxSimilarityJoin(
        model.transform(qs), model.transform(cand), 2.0, distCol="_dist"
    ).select(
        F.col(f"datasetA.{query_id_col}").alias(query_id_col),
        F.col(f"datasetB.{id_col}").alias(id_col),
        F.round(F.lit(1.0) - F.col("_dist") * F.col("_dist") / 2, 6).alias("sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "sim", "rank")
    )


def ivf_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_clusters: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """IVF-style ANN: k-means coarse quantizer + probed-cluster search.

    The scale path for similarity search when LSH recall is too blunt:
    fit k-means centroids (MLlib), assign every candidate to its
    nearest centroid (the "inverted file"), route each query to its
    ``n_probe`` nearest centroids, and score exact cosine only inside
    the probed clusters — an equi-join on cluster id instead of a cross
    join, cutting scored pairs by ~n_clusters/n_probe. At 100 TB the
    assignment is a write-once partitioned materialization; queries
    broadcast. Not SQL-expressible (k-means) → rows-only check.
    Output: (query_id, vec_id, sim, rank) — rank 1..k per query.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    cand = ensure_parallelism(candidates).select(
        id_col,
        F.col(vec_col).cast("array<double>").alias("_cvec"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("_features"),
    )
    # maxIter 8: the quantizer only routes candidates to buckets — a
    # near-converged codebook changes recall marginally but the default
    # 20 iterations double the fit cost
    model = KMeans(
        k=n_clusters, seed=seed, maxIter=8,
        featuresCol="_features", predictionCol="_cluster",
    ).fit(cand)
    inverted = model.transform(cand).select(
        id_col, "_cvec", "_cluster", l2_norm(F.col("_cvec")).alias("_cnorm")
    )

    # Tiny centroid table (n_clusters × dim floats) — route queries to
    # their n_probe nearest centroids via a broadcast cross join.
    spark = candidates.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "_cluster int, _centroid array<double>",
    )
    q = queries.select(
        query_id_col,
        F.col(vec_col).cast("array<double>").alias("_qvec"),
        l2_norm(F.col(vec_col)).alias("_qnorm"),
    )
    d2 = F.aggregate(
        F.zip_with(F.col("_qvec"), F.col("_centroid"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    probe_w = Window.partitionBy(query_id_col).orderBy(F.asc("_d2"), F.asc("_cluster"))
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("_d2", d2)
        .withColumn("_probe", F.row_number().over(probe_w))
        .filter(F.col("_probe") <= n_probe)
        .select(query_id_col, "_cluster", "_qvec", "_qnorm")
    )

    sims = inverted.join(F.broadcast(probes), on="_cluster").select(
        query_id_col,
        id_col,
        F.round(
            dot_product(F.col("_qvec"), F.col("_cvec"))
            / (F.col("_qnorm") * F.col("_cnorm")),
            6,
        ).alias("sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "sim", "rank")
    )


def embedding_neardup_lsh(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 48,
    n_bands: int = 4,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dup at scale: random-hyperplane LSH blocking +
    exact cosine verification.

    Answers the quadratic-within-block cost of ``embedding_neardup``
    (PLANS.md §2): each vector gets an ``n_planes``-bit sign signature
    (bit i = sign⟨v, rᵢ⟩, rᵢ from a seeded Gaussian — plan-literal, so
    the operator is deterministic); signatures band into ``n_bands``
    groups and only band-colliding vectors are cosine-scored. Cosine-
    similar vectors agree on most sign bits, so recall per band is
    high while candidate pairs drop ~2^(bits/band)-fold.

    Recall math (sets the threshold regime): two vectors at cosine θ
    agree on a sign bit with p = 1 − arccos(cos θ)/π, so a 12-bit band
    collides with p¹², OR-amplified over 4 bands. At sim 0.95 that is
    ~73 % recall, at sim 1.0 it is 100 %, at sim 0.35 it is ~1 % — this
    operator is for NEAR-DUPLICATES (threshold ≥ 0.9), not broad
    similarity search (use ivf_topk/lsh_topk there). Narrow bands would
    raise recall but collapse the bucket space: measured 16 buckets/band
    (n_planes=16) made the candidate join quadratic again, while 12-bit
    bands hold runtime FLAT from 2k to 20k vectors (PLANS.md §2).
    Output: (id_a, id_b, sim) with id_a < id_b and sim ≥ threshold.
    """
    assert n_planes % n_bands == 0 and n_planes <= 63
    width = n_planes // n_bands

    # Signature = packed sign bits of 48 hyperplane dot products. Spark
    # does NOT codegen higher-order functions — a per-plane
    # F.aggregate(F.zip_with(...)) chain is interpreted per element
    # (n_planes × dim interpreted ops/row; measured ~2× slower at
    # sf0.1). One Arrow batch → BLAS matmul computes every plane at
    # once and returns the packed long. Sign choice (d >= 0 → 1)
    # matches the former expression path bit-for-bit up to float
    # summation order; pairs at sim→1 are unaffected (identical rows
    # produce identical dots either way).
    #
    # The seeded plane matrix is generated INSIDE the UDF from the
    # batch's own vector width (``dim`` accepted for API compatibility;
    # when None no job runs at plan-construction time): RandomState(seed)
    # is reproducible, so every executor derives the identical planes.
    plane_cache: dict[int, np.ndarray] = {}

    def _planes_t(d: int) -> np.ndarray:
        if d not in plane_cache:
            plane_cache[d] = np.random.RandomState(seed).randn(n_planes, d).T.copy()
        return plane_cache[d]

    @F.pandas_udf("long")
    def _sig(v: pd.Series) -> pd.Series:
        mat = np.stack(v.values).astype(np.float64)
        bits = (mat @ _planes_t(mat.shape[1])) >= 0.0
        sig = np.zeros(len(mat), dtype=np.uint64)
        for i in range(bits.shape[1]):
            sig |= bits[:, i].astype(np.uint64) << np.uint64(i)
        return pd.Series(sig.astype(np.int64))

    v = F.col(vec_col).cast("array<double>")
    signed = ensure_parallelism(embeddings).select(
        F.col(id_col).alias("_id"),
        v.alias("_v"),
        l2_norm(F.col(vec_col)).alias("_n"),
        _sig(v).alias("_sig"),
        # persist (lazy): signatures compute once at first action and
        # both self-join sides reuse the cache; localCheckpoint would
        # convert to RDD and — under AQE — materialize the upstream
        # shuffle DURING plan construction (a job before any action)
    ).persist()
    banded = signed.select(
        "_id", "_v", "_n",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftrightunsigned(F.col("_sig"), b * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("key"),
                )
                for b in range(n_bands)
            ])
        ).alias("_b"),
    ).select("_id", "_v", "_n", "_b.band", "_b.key")
    a = banded.select(
        "band", "key", F.col("_id").alias("id_a"),
        F.col("_v").alias("_va"), F.col("_n").alias("_na"),
    )
    b = banded.select(
        "band", "key", F.col("_id").alias("id_b"),
        F.col("_v").alias("_vb"), F.col("_n").alias("_nb"),
    )
    return (
        a.join(b, on=["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.round(
                dot_product(F.col("_va"), F.col("_vb"))
                / (F.col("_na") * F.col("_nb")),
                6,
            ).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
        .distinct()
    )
