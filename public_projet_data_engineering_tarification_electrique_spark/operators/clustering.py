"""Distributed clustering over embedding columns: fixed-iteration
Lloyd k-means and a centroid-based silhouette audit.

Reference scope: the reference's batch-scoring pipeline stops at
per-group regression (``conso_an_ville`` OLS, reference
``training.py``); clustering belongs to the LLM-pipeline extension
surface (semantic grouping of corpus embeddings for curation,
mixture design, and IVF codebook training — the q27 quantizer's
training step made a first-class, auditable operator).

Exactness discipline (the module convention, see operators/spectral.py):
every cross-row SUM rides an integer grid — embedding components are
snapped once to the 1e-6 grid as BIGINT, centroid components are the
snapped-sum divided by count and rounded to 6 dp, and per-row squared
distances snap to the 1e-6 grid before the inertia sum — so all
aggregates are order-free exact integers and the DuckDB oracle matches
bit-for-bit regardless of partitioning. Scalar double arithmetic
(d² = |v|² − 2·v·c + |c|²) is IEEE-deterministic and the folds are
sequential in array order on BOTH engines (see functions/vectors.py).

Scale shape: per iteration, ONE broadcast of the k×d centroid table
to a map-side scored projection of the corpus (N·k rows, no shuffle of
the corpus), one partial-aggregatable argmin (min(struct)), and one
(k·d)-group hash agg for the update — the corpus is scanned, never
shuffled; only k·d-sized frames move. Centroid frames localCheckpoint
per step (the documented iterative-lineage pattern, cf. q134 pagerank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import dot_product
from .util import ensure_parallelism

GRID = 1e6  # 1e-6 value grid; matches the spectral/stats module grid


def _prepared(
    emb: DataFrame, id_col: str, vec_col: str, keep: tuple = ()
) -> DataFrame:
    """(vid, ve double[], xq long[] 1e-6-snapped, vv = |ve|², *keep)."""
    v = F.col(vec_col).cast("array<double>")
    return ensure_parallelism(emb).filter(
        F.col(vec_col).isNotNull()
    ).select(
        F.col(id_col).alias("_vid"),
        v.alias("_ve"),
        F.transform(
            v, lambda x: F.round(x * GRID, 0).cast("long")
        ).alias("_xq"),
        dot_product(v, v).alias("_vv"),
        *keep,
    )


def _centroids_from(labeled: DataFrame) -> DataFrame:
    """(cl, cvec double[] 6-dp, cc = |cvec|²) from rows carrying
    (_cl, _xq).

    Quantize-sum-divide: components sum as exact longs on the 1e-6
    grid, ONE terminal division per (cluster, dim), so the centroid is
    identical under any aggregation order. Empty clusters simply
    produce no row (k shrinks) — mirrored by GROUP BY in the oracle.
    """
    comp = (
        labeled.select("_cl", F.posexplode("_xq").alias("_pos", "_val"))
        .groupBy("_cl", "_pos")
        .agg(
            F.sum("_val").alias("_s"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select(
            "_cl",
            "_pos",
            F.round(F.col("_s") / (F.lit(GRID) * F.col("_n")), 6).alias(
                "_cv"
            ),
        )
    )
    cvec = F.transform(
        F.array_sort(F.collect_list(F.struct("_pos", "_cv"))),
        lambda s: s["_cv"],
    )
    return comp.groupBy("_cl").agg(cvec.alias("_cvec")).select(
        "_cl",
        "_cvec",
        dot_product(F.col("_cvec"), F.col("_cvec")).alias("_cc"),
    )


def _assign(q: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: (vid, cl, d2 6-dp).

    d² = |v|² − 2·v·c + |c|² from precomputed norms — one fold per
    (row, centroid) pair instead of three. Argmin via min(struct(d2,
    cl)): partial-aggregatable, ties to the lower cluster id (total
    order; the oracle's row_number(ORDER BY d2, cl) twin).
    """
    d2 = F.round(
        F.col("_vv")
        - 2 * dot_product(F.col("_ve"), F.col("_cvec"))
        + F.col("_cc"),
        6,
    )
    scored = q.crossJoin(F.broadcast(cent)).select(
        "_vid", "_cl", d2.alias("_d2")
    )
    best = F.min(F.struct("_d2", "_cl")).alias("_best")
    return scored.groupBy("_vid").agg(best).select(
        "_vid",
        F.col("_best._cl").alias("_cl"),
        F.col("_best._d2").alias("_d2"),
    )


def kmeans_lloyd(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fixed-iteration Lloyd k-means; per-cluster summary.

    Deterministic init (no RNG, the q134 fixed-iteration convention):
    cluster j starts as the quantized mean of rows with id % k == j.
    Then ``iters`` assign→update rounds, then one final assignment
    against the final centroids. Output one row per non-empty cluster:
    (cluster, n, inertia) with inertia = Σ snapped-d² exact on the
    1e-6 grid, ordered by cluster.

    100 TB posture: per round the corpus is scanned once map-side
    against broadcast centroids; the only shuffles move k·d-sized
    partials. The assignment join (assigned ⋈ corpus on id) is
    co-partitioned at scale by bucketing the corpus on the id.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    # The q134 pagerank layout: ONE eager checkpoint of the static
    # substrate (the prepared corpus — every round re-reads it), then
    # a LAZY linear chain for the loop itself. Each cent_t appears in
    # exactly one downstream subtree (a_{t+1}), so the whole
    # iteration runs as one action with every stage computed once —
    # no per-step eager jobs at plan-construction time (measured:
    # 7.1 s with per-step eager checkpoints → see PLANS.md r12).
    q = _prepared(emb, id_col, vec_col).localCheckpoint(eager=True)
    init = q.select(
        F.pmod(F.col("_vid"), F.lit(k)).cast("int").alias("_cl"),
        "_xq",
    )
    cent = _centroids_from(init)
    for _ in range(iters):
        # carry _xq THROUGH the argmin struct instead of joining it
        # back per round (guide §2.4 — one exchange, no join): every
        # scored row of a _vid holds the identical _xq, so
        # min(struct(_d2, _cl, _xq)) is exactly the old argmin with
        # the quantized vector attached; the update agg reads it
        # directly. Removes one shuffle join (2 exchanges + sort) per
        # iteration; the argmin exchange carries N partial-aggregated
        # rows either way (the join's q side shuffled the same _xq).
        d2 = F.round(
            F.col("_vv")
            - 2 * dot_product(F.col("_ve"), F.col("_cvec"))
            + F.col("_cc"),
            6,
        )
        scored = q.crossJoin(F.broadcast(cent)).select(
            "_vid", "_cl", d2.alias("_d2"), "_xq"
        )
        assigned = (
            scored.groupBy("_vid")
            .agg(F.min(F.struct("_d2", "_cl", "_xq")).alias("_b"))
            .select(
                F.col("_b._cl").alias("_cl"), F.col("_b._xq").alias("_xq")
            )
        )
        cent = _centroids_from(assigned)
    final = _assign(q, cent)
    return (
        final.groupBy("_cl")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.round(F.col("_d2") * GRID, 0).cast("long")
            ).alias("_ine"),
        )
        .select(
            F.col("_cl").alias("cluster"),
            F.col("n").cast("long").alias("n"),
            F.round(F.col("_ine") / GRID, 6).alias("inertia"),
        )
        .orderBy("cluster")
    )


def silhouette_audit(
    emb: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Centroid-based (simplified) silhouette per label.

    For each vector: a = snapped d² to its OWN label centroid, b = min
    snapped d² to any OTHER label centroid, s = (b − a) / max(a, b)
    (0 when both are 0), snapped to 6 dp. Output per label: (label, n,
    mean_silhouette) with the mean ridden on the 1e-6 integer grid —
    one terminal division. The classic O(N²) silhouette is replaced by
    the O(N·k) centroid form — the variant that survives corpus scale
    (same reduction medoid libraries ship as "simplified silhouette").

    Scale shape: identical to one k-means assignment round — broadcast
    k×d centroids, map-side scoring, one hash agg; corpus never
    shuffles.
    """
    q = _prepared(
        emb,
        id_col,
        vec_col,
        keep=(F.col(label_col).cast("int").alias("_own"),),
    ).localCheckpoint(eager=False)
    cent = _centroids_from(
        q.select(F.col("_own").alias("_cl"), "_xq")
    )
    d2 = F.round(
        F.col("_vv")
        - 2 * dot_product(F.col("_ve"), F.col("_cvec"))
        + F.col("_cc"),
        6,
    )
    scored = q.crossJoin(F.broadcast(cent)).select(
        "_vid", "_own", "_cl", d2.alias("_d2")
    )
    per_vec = scored.groupBy("_vid", "_own").agg(
        F.min(F.when(F.col("_cl") == F.col("_own"), F.col("_d2"))).alias(
            "_a"
        ),
        F.min(F.when(F.col("_cl") != F.col("_own"), F.col("_d2"))).alias(
            "_b"
        ),
    )
    s = F.when(
        F.greatest("_a", "_b") > 0,
        F.round(
            (F.col("_b") - F.col("_a")) / F.greatest("_a", "_b"), 6
        ),
    ).otherwise(F.lit(0.0))
    return (
        per_vec.filter(F.col("_b").isNotNull())
        .select(
            F.col("_own").alias("label"),
            F.round(s * GRID, 0).cast("long").alias("_sq"),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("_sq") / (F.lit(GRID) * F.count(F.lit(1))), 6)
            .alias("mean_silhouette"),
        )
        .orderBy("label")
    )


def geometric_median(
    emb: DataFrame,
    iters: int = 2,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label geometric median by ``iters`` fixed Weiszfeld steps
    from the quantized mean — the robust centroid (minimizes Σ‖x−m‖,
    not Σ‖x−m‖²), immune to the embedding outliers that drag a mean.

    Exactness: per-step weights w = round(1e3/max(d, 1e-3)) ride a
    1e-3 grid as longs (the ε-clamp is also Weiszfeld's standard
    singularity guard); numerators Σ w·xq are exact long sums
    (|w| ≤ 1e6, |xq| ≲ 4e6, N ≤ 1e5 per label ⇒ < 2^62), ONE terminal
    division per (label, dim); distances re-snap to 6 dp each step.

    Scale shape: per step, one broadcast of the k×d median table to a
    map-side distance projection, one (label, dim) hash agg — same
    shuffle economics as kmeans_lloyd. Lazy linear lineage (the q134
    layout); the prepared corpus checkpoints once.

    Output per label: (label, n, med_norm, mean_dist) — mean distance
    to the final median on the 1e-6 grid.
    """
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    q = _prepared(
        emb,
        id_col,
        vec_col,
        keep=(F.col(label_col).cast("int").alias("_cl"),),
    ).localCheckpoint(eager=True)
    med = _centroids_from(q.select("_cl", "_xq"))

    def _dist(df):
        return F.round(
            F.col("_vv")
            - 2 * dot_product(F.col("_ve"), F.col("_cvec"))
            + F.col("_cc"),
            6,
        )

    for _ in range(iters):
        joined = q.join(F.broadcast(med), on="_cl")
        d = F.sqrt(F.greatest(_dist(joined), F.lit(0.0)))
        w = F.round(1e3 / F.greatest(d, F.lit(1e-3)), 0).cast("long")
        comp = (
            joined.select(
                "_cl", w.alias("_w"),
                F.posexplode("_xq").alias("_pos", "_val"),
            )
            .groupBy("_cl", "_pos")
            .agg(
                F.sum(F.col("_w") * F.col("_val")).alias("_num"),
                F.sum("_w").alias("_den"),
            )
            .select(
                "_cl",
                "_pos",
                F.round(
                    F.col("_num") / (F.lit(GRID) * F.col("_den")), 6
                ).alias("_cv"),
            )
        )
        cvec = F.transform(
            F.array_sort(F.collect_list(F.struct("_pos", "_cv"))),
            lambda s: s["_cv"],
        )
        med = comp.groupBy("_cl").agg(cvec.alias("_cvec")).select(
            "_cl",
            "_cvec",
            dot_product(F.col("_cvec"), F.col("_cvec")).alias("_cc"),
        )
    final = q.join(F.broadcast(med), on="_cl")
    d_fin = F.sqrt(F.greatest(_dist(final), F.lit(0.0)))
    return (
        final.select(
            "_cl",
            F.col("_cc"),
            F.round(F.round(d_fin, 6) * GRID, 0)
            .cast("long")
            .alias("_dg"),
        )
        .groupBy("_cl")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sqrt(F.min("_cc")), 6).alias("med_norm"),
            F.round(
                F.sum("_dg") / (F.lit(GRID) * F.count(F.lit(1))), 6
            ).alias("mean_dist"),
        )
        .select(
            F.col("_cl").alias("label"), "n", "med_norm", "mean_dist"
        )
        .orderBy("label")
    )


def mahalanobis_outliers(
    emb: DataFrame,
    top_n: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-N embedding outliers by diagonal-covariance Mahalanobis
    distance: score = Σ_i (x_i − μ_i)²/σ²_i over dims with σ² > 0 —
    the cheap whitened-distance screen (full covariance needs the
    q244 Gram; the diagonal is one hash agg) every embedding-quality
    triage starts with.

    Exactness: μ_i snaps to 6 dp via quantize-sum-divide; σ²_i comes
    from exact integer component moments through one deterministic
    scalar-double expression, snapped to 6 dp; each dim's term snaps
    to the 1e-6 grid as a long so the per-vector score sum is
    order-free; ONE terminal division.

    Scale shape: the d-row stats table aggregates map-side and
    broadcasts back to a second map-side pass; top-N via TakeOrdered.

    Output: (vec_id, label, score) desc, ties by vec_id.
    """
    q = _prepared(
        emb,
        id_col,
        vec_col,
        keep=(F.col("label").cast("int").alias("_lab"),),
    )
    ex = q.select(
        "_vid", "_lab", F.posexplode("_xq").alias("_pos", "_val")
    )
    mu = F.round(F.col("_sx") / (F.lit(GRID) * F.col("_n")), 6)
    # var in VALUE units: E[xq²]/n and (E[xq]/n)² are exact-integer /
    # double divisions (deterministic on both engines), /1e12 rescales
    # the 1e-6 grid to values; snap once
    var = F.round(
        (
            F.col("_sx2") / F.col("_n")
            - (F.col("_sx") / F.col("_n")) * (F.col("_sx") / F.col("_n"))
        )
        / F.lit(1e12),
        6,
    )
    stats = (
        ex.groupBy("_pos")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("_val").alias("_sx"),
            F.sum(F.col("_val") * F.col("_val")).alias("_sx2"),
        )
        .select("_pos", mu.alias("_mu"), var.alias("_var"))
        .localCheckpoint(eager=False)
    )
    dx = F.col("_val") / F.lit(GRID) - F.col("_mu")
    term = F.round(dx * dx / F.col("_var"), 6)
    return (
        ex.join(F.broadcast(stats), on="_pos")
        .filter(F.col("_var") > 0)
        .select(
            "_vid",
            "_lab",
            F.round(term * GRID, 0).cast("long").alias("_tg"),
        )
        .groupBy("_vid", "_lab")
        .agg(F.sum("_tg").alias("_sg"))
        .select(
            F.col("_vid").alias(id_col),
            F.col("_lab").alias("label"),
            F.round(F.col("_sg") / GRID, 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(top_n)
    )


def robust_dim_scaler(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension robust-scaling audit: exact discrete median, IQR
    and 1.5·IQR outlier count for every embedding dimension — the
    median/IQR twin of q204's mean/variance panel, robust to the very
    outliers q204 is blind to.

    Quantiles are DISCRETE k-th smallest values on the 1e-6 component
    grid (k = ⌈p·n⌉, 1-based) — no interpolation arithmetic to drift
    between engines — and the outlier test runs entirely in integers
    (2·v < 2·q1 − 3·IQR ∨ 2·v > 2·q3 + 3·IQR). The rank window
    partitions by dimension (d partitions of n rows — the honest cost
    of EXACT per-dim quantiles; the approx path at corpus scale is
    q31's approx_percentile).

    Output per dim: (pos 0-based, n, median, iqr, n_outliers).
    """
    q = _prepared(emb, id_col, vec_col)
    ex = q.select(
        "_vid", F.posexplode("_xq").alias("_pos", "_val")
    )
    n_by = ex.groupBy("_pos").agg(F.count(F.lit(1)).alias("_n"))
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy("_pos").orderBy(F.col("_val").asc())
    )
    ranked = ex.join(F.broadcast(n_by), on="_pos").withColumn(
        "_rn", rn
    )
    k1 = F.ceil(0.25 * F.col("_n"))
    k2 = F.ceil(0.5 * F.col("_n"))
    k3 = F.ceil(0.75 * F.col("_n"))
    qs = (
        ranked.filter(
            (F.col("_rn") == k1)
            | (F.col("_rn") == k2)
            | (F.col("_rn") == k3)
        )
        .groupBy("_pos")
        .agg(
            F.min(F.when(F.col("_rn") == k1, F.col("_val"))).alias(
                "_q1"
            ),
            F.min(F.when(F.col("_rn") == k2, F.col("_val"))).alias(
                "_med"
            ),
            F.min(F.when(F.col("_rn") == k3, F.col("_val"))).alias(
                "_q3"
            ),
        )
        .localCheckpoint(eager=False)
    )
    iqr = F.col("_q3") - F.col("_q1")
    out_lo = 2 * F.col("_val") < 2 * F.col("_q1") - 3 * iqr
    out_hi = 2 * F.col("_val") > 2 * F.col("_q3") + 3 * iqr
    return (
        ex.join(F.broadcast(qs), on="_pos")
        .groupBy("_pos")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("_med").alias("_m"),
            F.min("_q1").alias("_l"),
            F.min("_q3").alias("_u"),
            F.sum(F.when(out_lo | out_hi, 1).otherwise(0))
            .cast("long")
            .alias("n_outliers"),
        )
        .select(
            F.col("_pos").cast("int").alias("pos"),
            "n",
            F.round(F.col("_m") / GRID, 6).alias("median"),
            F.round((F.col("_u") - F.col("_l")) / GRID, 6).alias(
                "iqr"
            ),
            "n_outliers",
        )
        .orderBy("pos")
    )
