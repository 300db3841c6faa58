"""Literal DuckDB oracles for the q304+ band (round 12).

Same conventions as the sibling band modules: every cross-row sum
rides an integer grid (1e-6 for unit-scale values, 1e-4 for money),
one terminal division, round-snaps mirrored expression-for-expression
against the Spark plans in plans/registry.py.
"""

ORACLE_SQL: dict[str, str] = {}

# q304: fixed-iteration Lloyd k-means (k=8, 2 update rounds + final
# scoring assignment), deterministic mod-8 init. Iterations unrolled;
# MATERIALIZED CTEs pin each step's frame (the iterative-lineage
# convention, cf. q134). Mirrors operators/clustering.kmeans_lloyd.
ORACLE_SQL["q304_kmeans_lloyd"] = """
    WITH v AS MATERIALIZED (
      SELECT vec_id AS vid, embedding::DOUBLE[] AS ve,
             list_transform(embedding::DOUBLE[],
                            x -> cast(round(x * 1e6) AS BIGINT)) AS xq,
             list_dot_product(embedding::DOUBLE[],
                              embedding::DOUBLE[]) AS vv
      FROM embeddings
      WHERE embedding IS NOT NULL
    ), a0 AS (
      SELECT vid, cast(vid % 8 AS INTEGER) AS cl FROM v
    ), comp0 AS (
      SELECT a0.cl, unnest(range(len(v.xq))) AS pos,
             unnest(v.xq) AS val
      FROM v JOIN a0 USING (vid)
    ), cs0 AS (
      SELECT cl, pos, round(sum(val) / (1e6 * count(*)), 6) AS cv
      FROM comp0 GROUP BY 1, 2
    ), c0 AS MATERIALIZED (
      SELECT cl, list(cv ORDER BY pos) AS cvec FROM cs0 GROUP BY 1
    ), s1 AS (
      SELECT v.vid, c.cl,
             round(v.vv - 2 * list_dot_product(v.ve, c.cvec)
                   + list_dot_product(c.cvec, c.cvec), 6) AS d2
      FROM v CROSS JOIN c0 c
    ), a1 AS (
      SELECT vid, cl FROM (
        SELECT vid, cl, row_number() OVER (
          PARTITION BY vid ORDER BY d2 ASC, cl ASC) AS rn
        FROM s1) WHERE rn = 1
    ), comp1 AS (
      SELECT a1.cl, unnest(range(len(v.xq))) AS pos,
             unnest(v.xq) AS val
      FROM v JOIN a1 USING (vid)
    ), cs1 AS (
      SELECT cl, pos, round(sum(val) / (1e6 * count(*)), 6) AS cv
      FROM comp1 GROUP BY 1, 2
    ), c1 AS MATERIALIZED (
      SELECT cl, list(cv ORDER BY pos) AS cvec FROM cs1 GROUP BY 1
    ), s2 AS (
      SELECT v.vid, c.cl,
             round(v.vv - 2 * list_dot_product(v.ve, c.cvec)
                   + list_dot_product(c.cvec, c.cvec), 6) AS d2
      FROM v CROSS JOIN c1 c
    ), a2 AS (
      SELECT vid, cl FROM (
        SELECT vid, cl, row_number() OVER (
          PARTITION BY vid ORDER BY d2 ASC, cl ASC) AS rn
        FROM s2) WHERE rn = 1
    ), comp2 AS (
      SELECT a2.cl, unnest(range(len(v.xq))) AS pos,
             unnest(v.xq) AS val
      FROM v JOIN a2 USING (vid)
    ), cs2 AS (
      SELECT cl, pos, round(sum(val) / (1e6 * count(*)), 6) AS cv
      FROM comp2 GROUP BY 1, 2
    ), c2 AS MATERIALIZED (
      SELECT cl, list(cv ORDER BY pos) AS cvec FROM cs2 GROUP BY 1
    ), s3 AS (
      SELECT v.vid, c.cl,
             round(v.vv - 2 * list_dot_product(v.ve, c.cvec)
                   + list_dot_product(c.cvec, c.cvec), 6) AS d2
      FROM v CROSS JOIN c2 c
    ), fin AS (
      SELECT cl, d2 FROM (
        SELECT vid, cl, d2, row_number() OVER (
          PARTITION BY vid ORDER BY d2 ASC, cl ASC) AS rn
        FROM s3) WHERE rn = 1
    )
    SELECT cast(cl AS INTEGER) AS cluster,
           cast(count(*) AS BIGINT) AS n,
           round(cast(sum(cast(round(d2 * 1e6) AS BIGINT)) AS BIGINT)
                 / 1e6, 6) AS inertia
    FROM fin GROUP BY 1
"""

# q305: (lang, length-band, prefix) blocking -> exact Levenshtein
# verify. Mirrors operators/dedup.editdist_neardup (trunc=120, band=8,
# prefix=8, threshold=0.9).
ORACLE_SQL["q305_editdist_neardup"] = """
    WITH d AS (
      SELECT doc_id, lang, substr(lower(text), 1, 120) AS t,
             length(substr(lower(text), 1, 120)) AS len
      FROM documents
      WHERE text IS NOT NULL AND length(trim(text)) > 0
    ), keyed AS (
      SELECT doc_id, lang, t, len, len // 8 AS bk,
             substr(t, 1, 8) AS pfx
      FROM d
      UNION ALL
      SELECT doc_id, lang, t, len, len // 8 + 1 AS bk,
             substr(t, 1, 8) AS pfx
      FROM d
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.t AS ta, b.t AS tb, a.len AS la, b.len AS lb
      FROM keyed a
      JOIN keyed b ON a.lang = b.lang AND a.bk = b.bk
                  AND a.pfx = b.pfx AND a.doc_id < b.doc_id
      WHERE abs(a.len - b.len) <= 8
    ), scored AS (
      SELECT id_a, id_b,
             cast(levenshtein(ta, tb) AS BIGINT) AS lev,
             round(1.0 - levenshtein(ta, tb) * 1.0
                   / greatest(la, lb), 6) AS sim
      FROM pairs
    )
    SELECT id_a, id_b, lev, sim FROM scored WHERE sim >= 0.9
"""

# q306: centroid-based (simplified) silhouette per label. Mirrors
# operators/clustering.silhouette_audit.
ORACLE_SQL["q306_silhouette_audit"] = """
    WITH v AS MATERIALIZED (
      SELECT vec_id AS vid, label, embedding::DOUBLE[] AS ve,
             list_transform(embedding::DOUBLE[],
                            x -> cast(round(x * 1e6) AS BIGINT)) AS xq,
             list_dot_product(embedding::DOUBLE[],
                              embedding::DOUBLE[]) AS vv
      FROM embeddings
      WHERE embedding IS NOT NULL
    ), comp AS (
      SELECT cast(label AS INTEGER) AS cl,
             unnest(range(len(xq))) AS pos, unnest(xq) AS val
      FROM v
    ), cs AS (
      SELECT cl, pos, round(sum(val) / (1e6 * count(*)), 6) AS cv
      FROM comp GROUP BY 1, 2
    ), c AS MATERIALIZED (
      SELECT cl, list(cv ORDER BY pos) AS cvec FROM cs GROUP BY 1
    ), s AS (
      SELECT v.vid, cast(v.label AS INTEGER) AS own, c.cl,
             round(v.vv - 2 * list_dot_product(v.ve, c.cvec)
                   + list_dot_product(c.cvec, c.cvec), 6) AS d2
      FROM v CROSS JOIN c
    ), pv AS (
      SELECT vid, own,
             min(CASE WHEN cl = own THEN d2 END) AS a,
             min(CASE WHEN cl <> own THEN d2 END) AS b
      FROM s GROUP BY 1, 2
    ), sil AS (
      SELECT own AS label,
             CASE WHEN greatest(a, b) > 0
                  THEN cast(round(round((b - a) / greatest(a, b), 6)
                                  * 1e6) AS BIGINT)
                  ELSE 0 END AS sq
      FROM pv WHERE b IS NOT NULL
    )
    SELECT label, cast(count(*) AS BIGINT) AS n,
           round(cast(sum(sq) AS BIGINT) / (1e6 * count(*)), 6)
             AS mean_silhouette
    FROM sil GROUP BY 1
"""

# q308: blocking quality on the 1/4 id-hash audit panel — all-pairs
# Levenshtein ground truth vs the q305 blocking. Mirrors
# operators/dedup.blocking_quality (audit_mod=4).
ORACLE_SQL["q308_blocking_quality"] = """
    WITH p AS MATERIALIZED (
      SELECT doc_id, lang, substr(lower(text), 1, 120) AS t,
             length(substr(lower(text), 1, 120)) AS len
      FROM documents
      WHERE text IS NOT NULL AND length(trim(text)) > 0
        AND ('0x' || substring(md5(cast(doc_id AS VARCHAR)), 1, 6))
              ::BIGINT % 4 = 0
    ), ex AS MATERIALIZED (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             round(1.0 - levenshtein(a.t, b.t) * 1.0
                   / greatest(a.len, b.len), 6) AS sim
      FROM p a JOIN p b ON a.lang = b.lang AND a.doc_id < b.doc_id
    ), tr AS MATERIALIZED (
      SELECT id_a, id_b FROM ex WHERE sim >= 0.9
    ), keyed AS (
      SELECT doc_id, lang, t, len, len // 8 AS bk,
             substr(t, 1, 8) AS pfx
      FROM p
      UNION ALL
      SELECT doc_id, lang, t, len, len // 8 + 1 AS bk,
             substr(t, 1, 8) AS pfx
      FROM p
    ), cand AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM keyed a
      JOIN keyed b ON a.lang = b.lang AND a.bk = b.bk
                  AND a.pfx = b.pfx AND a.doc_id < b.doc_id
      WHERE abs(a.len - b.len) <= 8
    ), caught AS (
      SELECT tr.id_a, tr.id_b
      FROM tr JOIN cand ON tr.id_a = cand.id_a AND tr.id_b = cand.id_b
    )
    SELECT cast((SELECT count(*) FROM ex) AS BIGINT) AS all_pairs,
           cast((SELECT count(*) FROM tr) AS BIGINT) AS true_matches,
           cast((SELECT count(*) FROM cand) AS BIGINT) AS candidates,
           cast((SELECT count(*) FROM caught) AS BIGINT) AS caught,
           CASE WHEN (SELECT count(*) FROM tr) > 0
                THEN round((SELECT count(*) FROM caught) * 1.0
                           / (SELECT count(*) FROM tr), 6)
           END AS pair_completeness,
           CASE WHEN (SELECT count(*) FROM ex) > 0
                THEN round(1.0 - (SELECT count(*) FROM cand) * 1.0
                           / (SELECT count(*) FROM ex), 6)
           END AS reduction_ratio
"""

# q309: TPC-H Q20 shape (potential part promotion) over the
# lineitem-observed supply relation; exact 1e-2 quantity grid, one
# exact-ratio scalar threshold.
ORACLE_SQL["q309_tpch_potential_promotion"] = """
    WITH per_supp AS (
      SELECT l_suppkey,
             cast(sum(cast(round(l_quantity * 1e2) AS BIGINT))
                  AS BIGINT) AS q
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_type = 'PROMO'
        AND l_shipdate >= TIMESTAMP '1999-01-01'
        AND l_shipdate < TIMESTAMP '2000-01-01'
      GROUP BY 1
    ), t AS (
      SELECT 0.5 * cast(sum(q) AS BIGINT) / count(*) AS thr
      FROM per_supp
    )
    SELECT n_name AS nation, cast(count(*) AS BIGINT) AS numsupp,
           round(cast(sum(q) AS BIGINT) / 1e2, 2) AS total_qty
    FROM per_supp
    CROSS JOIN t
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE cast(q AS DOUBLE) > thr
    GROUP BY 1
    ORDER BY 1
"""

# q310: streaming per-day top-3 heavy hitters — batch twin of the
# watermark-gated window counts + per-day rank, INCLUDING the
# availableNow emission cutoff (window end <= max(ts) - 1 day, the
# q270/q303 convention).
ORACLE_SQL["q310_stream_heavy_hitters"] = """
    WITH mx AS (SELECT max(ts) AS m FROM events),
    agg AS (
      SELECT CAST(ts AS DATE) AS d, event_type,
             cast(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), closed AS (
      SELECT d, event_type, n FROM agg, mx
      WHERE CAST(d AS TIMESTAMP) + INTERVAL 1 DAY
            <= mx.m - INTERVAL 1 DAY
    ), ranked AS (
      SELECT strftime(d, '%Y-%m-%d') AS day, event_type, n,
             cast(row_number() OVER (
               PARTITION BY d ORDER BY n DESC, event_type ASC)
               AS INTEGER) AS rank
      FROM closed
    )
    SELECT day, event_type, n, rank FROM ranked WHERE rank <= 3
"""

# q311: TPC-H Q10 shape (returned item reporting, 1999-H1, top 20).
ORACLE_SQL["q311_tpch_returned_items"] = """
    SELECT c_custkey AS custkey, c_name AS name,
           round(c_acctbal, 2) AS acctbal, n_name AS nation,
           round(cast(sum(cast(round(l_extendedprice
                   * (1 - l_discount) * 1e4) AS BIGINT)) AS BIGINT)
                 / 1e4, 2) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1999-01-01'
      AND o_orderdate < TIMESTAMP '1999-07-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, custkey ASC
    LIMIT 20
"""

# q312: Neyman-optimal stratified allocation per lang — exact
# integer stratum moments, 6-dp sigma, N*sigma products on the 1e-6
# grid, floor of the identical double ratio on both engines.
ORACLE_SQL["q312_neyman_allocation"] = """
    WITH s AS (
      SELECT lang, cast(count(*) AS BIGINT) AS n_docs,
             cast(sum(n_chars) AS BIGINT) AS sx,
             cast(sum(n_chars * n_chars) AS BIGINT) AS sx2
      FROM documents WHERE n_chars IS NOT NULL GROUP BY 1
    ), w AS (
      SELECT lang, n_docs,
             round(sqrt(cast(n_docs * sx2 - sx * sx AS DOUBLE)
                        / cast(n_docs * n_docs AS DOUBLE)), 6)
               AS sd_chars,
             cast(round(round(sqrt(cast(n_docs * sx2 - sx * sx
                                        AS DOUBLE)
                                   / cast(n_docs * n_docs AS DOUBLE)),
                              6) * 1e6) AS BIGINT) * n_docs AS wv
      FROM s
    ), d AS (
      SELECT cast(sum(wv) AS BIGINT) AS wsum FROM w
    )
    SELECT lang, n_docs, sd_chars,
           round(cast(wv AS DOUBLE) / wsum, 6) AS alloc_share,
           cast(floor(1000 * wv / wsum) AS BIGINT) AS alloc_n
    FROM w CROSS JOIN d
    ORDER BY lang
"""

# q313: TPC-H Q16 shape (parts/supplier relationship) over the
# lineitem-observed associations; deficit suppliers excluded (NOT IN).
ORACLE_SQL["q313_tpch_parts_supplier_relation"] = """
    WITH assoc AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ), ok AS (
      SELECT * FROM assoc
      WHERE l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    )
    SELECT p_brand AS brand, cast(p_size AS INTEGER) AS size,
           cast(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM ok JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
    GROUP BY 1, 2
    ORDER BY supplier_cnt DESC, brand ASC, size ASC
"""

# q314: TPC-H Q22 shape (sales opportunity): above-average positive
# balance, no orders at all; exact-ratio threshold on the 1e-4 grid.
ORACLE_SQL["q314_tpch_sales_opportunity"] = """
    WITH t AS (
      SELECT cast(sum(cast(round(c_acctbal * 1e4) AS BIGINT))
                  AS BIGINT) / (1e4 * count(*)) AS thr
      FROM customer WHERE c_acctbal > 0
    )
    SELECT n_name AS nation, cast(count(*) AS BIGINT) AS numcust,
           round(cast(sum(cast(round(c_acctbal * 1e4) AS BIGINT))
                      AS BIGINT) / 1e4, 2) AS totacctbal
    FROM customer
    CROSS JOIN t
    JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > thr
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY 1
    ORDER BY 1
"""

# q315: l-diversity (l=2) over (lang, n_chars div 500) with source
# as the sensitive attribute. Mirrors operators/audit.l_diversity_audit.
ORACLE_SQL["q315_l_diversity"] = """
    WITH level AS (
      SELECT lang, n_chars // 500 AS band, source,
             count(*) AS n
      FROM documents GROUP BY 1, 2, 3
    ), cells AS (
      SELECT lang, band, count(*) AS l, sum(n) AS rws
      FROM level GROUP BY 1, 2
    )
    SELECT lang AS grp,
           cast(count(*) AS BIGINT) AS n_cells,
           cast(sum(CASE WHEN l < 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_risky_cells,
           cast(sum(rws) AS BIGINT) AS n_rows,
           cast(sum(CASE WHEN l < 2 THEN rws ELSE 0 END) AS BIGINT)
             AS n_rows_at_risk,
           round(cast(sum(CASE WHEN l < 2 THEN rws ELSE 0 END)
                      AS DOUBLE)
                 / cast(sum(rws) AS DOUBLE) + 1e-9, 4)
             AS risk_fraction
    FROM cells GROUP BY 1 ORDER BY 1
"""

# q316: per-label geometric median, 2 unrolled Weiszfeld steps from
# the quantized mean. Mirrors operators/clustering.geometric_median.
ORACLE_SQL["q316_geometric_median"] = """
    WITH v AS MATERIALIZED (
      SELECT vec_id AS vid, cast(label AS INTEGER) AS cl,
             embedding::DOUBLE[] AS ve,
             list_transform(embedding::DOUBLE[],
                            x -> cast(round(x * 1e6) AS BIGINT)) AS xq,
             list_dot_product(embedding::DOUBLE[],
                              embedding::DOUBLE[]) AS vv
      FROM embeddings
      WHERE embedding IS NOT NULL
    ), comp0 AS (
      SELECT cl, unnest(range(len(xq))) AS pos, unnest(xq) AS val
      FROM v
    ), cs0 AS (
      SELECT cl, pos, round(sum(val) / (1e6 * count(*)), 6) AS cv
      FROM comp0 GROUP BY 1, 2
    ), m0 AS MATERIALIZED (
      SELECT cl, list(cv ORDER BY pos) AS cvec FROM cs0 GROUP BY 1
    ), j1 AS (
      SELECT v.cl,
             cast(round(1e3 / greatest(
               sqrt(greatest(round(v.vv
                 - 2 * list_dot_product(v.ve, m.cvec)
                 + list_dot_product(m.cvec, m.cvec), 6), 0.0)),
               1e-3)) AS BIGINT) AS w,
             v.xq
      FROM v JOIN m0 m ON v.cl = m.cl
    ), e1 AS (
      SELECT cl, w, unnest(range(len(xq))) AS pos, unnest(xq) AS val
      FROM j1
    ), cs1 AS (
      SELECT cl, pos,
             round(cast(sum(w * val) AS BIGINT)
                   / (1e6 * cast(sum(w) AS BIGINT)), 6) AS cv
      FROM e1 GROUP BY 1, 2
    ), m1 AS MATERIALIZED (
      SELECT cl, list(cv ORDER BY pos) AS cvec FROM cs1 GROUP BY 1
    ), j2 AS (
      SELECT v.cl,
             cast(round(1e3 / greatest(
               sqrt(greatest(round(v.vv
                 - 2 * list_dot_product(v.ve, m.cvec)
                 + list_dot_product(m.cvec, m.cvec), 6), 0.0)),
               1e-3)) AS BIGINT) AS w,
             v.xq
      FROM v JOIN m1 m ON v.cl = m.cl
    ), e2 AS (
      SELECT cl, w, unnest(range(len(xq))) AS pos, unnest(xq) AS val
      FROM j2
    ), cs2 AS (
      SELECT cl, pos,
             round(cast(sum(w * val) AS BIGINT)
                   / (1e6 * cast(sum(w) AS BIGINT)), 6) AS cv
      FROM e2 GROUP BY 1, 2
    ), m2 AS MATERIALIZED (
      SELECT cl, list(cv ORDER BY pos) AS cvec,
             list_dot_product(list(cv ORDER BY pos),
                              list(cv ORDER BY pos)) AS cc
      FROM cs2 GROUP BY 1
    ), fin AS (
      SELECT v.cl, m.cc,
             cast(round(round(sqrt(greatest(round(v.vv
               - 2 * list_dot_product(v.ve, m.cvec)
               + list_dot_product(m.cvec, m.cvec), 6), 0.0)), 6)
               * 1e6) AS BIGINT) AS dg
      FROM v JOIN m2 m ON v.cl = m.cl
    )
    SELECT cl AS label, cast(count(*) AS BIGINT) AS n,
           round(sqrt(min(cc)), 6) AS med_norm,
           round(cast(sum(dg) AS BIGINT) / (1e6 * count(*)), 6)
             AS mean_dist
    FROM fin GROUP BY 1 ORDER BY 1
"""

# q317: diagonal-covariance Mahalanobis top-20. Mirrors
# operators/clustering.mahalanobis_outliers.
ORACLE_SQL["q317_mahalanobis_outliers"] = """
    WITH v AS MATERIALIZED (
      SELECT vec_id AS vid, cast(label AS INTEGER) AS lab,
             list_transform(embedding::DOUBLE[],
                            x -> cast(round(x * 1e6) AS BIGINT)) AS xq
      FROM embeddings
      WHERE embedding IS NOT NULL
    ), ex AS (
      SELECT vid, lab, unnest(range(len(xq))) AS pos,
             unnest(xq) AS val
      FROM v
    ), st AS MATERIALIZED (
      SELECT pos,
             round(cast(sum(val) AS BIGINT)
                   / (1e6 * count(*)), 6) AS mu,
             round((cast(sum(val * val) AS BIGINT) / count(*)
                    - (cast(sum(val) AS BIGINT) / count(*))
                      * (cast(sum(val) AS BIGINT) / count(*)))
                   / 1e12, 6) AS var
      FROM ex GROUP BY 1
    ), terms AS (
      SELECT ex.vid, ex.lab,
             cast(round(round((ex.val / 1e6 - st.mu)
                              * (ex.val / 1e6 - st.mu) / st.var, 6)
                        * 1e6) AS BIGINT) AS tg
      FROM ex JOIN st ON ex.pos = st.pos
      WHERE st.var > 0
    )
    SELECT vid AS vec_id, lab AS label,
           round(cast(sum(tg) AS BIGINT) / 1e6, 6) AS score
    FROM terms GROUP BY 1, 2
    ORDER BY score DESC, vec_id ASC
    LIMIT 20
"""

# q318: Simpson's-paradox screen — exact integer delta signs, exact
# cent-ratio means, md5 arm split (q48/q295 convention).
ORACLE_SQL["q318_simpson_audit"] = """
    WITH base AS (
      SELECT event_type AS segment,
             (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
              ::BIGINT % 2 = 0) AS is_a,
             cast(round(value * 1e2) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL
    ), seg AS (
      SELECT segment,
             cast(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT)
               AS n_a,
             cast(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT)
               AS n_b,
             cast(sum(CASE WHEN is_a THEN c ELSE 0 END) AS BIGINT)
               AS sa,
             cast(sum(CASE WHEN is_a THEN 0 ELSE c END) AS BIGINT)
               AS sb
      FROM base GROUP BY 1
    ), pooled AS (
      SELECT cast(sum(n_a) AS BIGINT) AS pna,
             cast(sum(n_b) AS BIGINT) AS pnb,
             cast(sum(sa) AS BIGINT) AS psa,
             cast(sum(sb) AS BIGINT) AS psb
      FROM seg
    )
    SELECT segment, n_a, n_b,
           CASE WHEN n_a > 0
                THEN round(sa / (1e2 * n_a), 6) END AS mean_a,
           CASE WHEN n_b > 0
                THEN round(sb / (1e2 * n_b), 6) END AS mean_b,
           cast(sign(cast(sa * n_b - sb * n_a AS DOUBLE))
                AS INTEGER) AS seg_sign,
           cast(sign(cast(psa * pnb - psb * pna AS DOUBLE))
                AS INTEGER) AS pooled_sign,
           (cast(sign(cast(sa * n_b - sb * n_a AS DOUBLE))
                 AS INTEGER)
            * cast(sign(cast(psa * pnb - psb * pna AS DOUBLE))
                   AS INTEGER) < 0) AS simpson_flag
    FROM seg CROSS JOIN pooled
    ORDER BY segment
"""

# q319: per-dim discrete median/IQR + integer 1.5*IQR outlier count.
# Mirrors operators/clustering.robust_dim_scaler.
ORACLE_SQL["q319_robust_dim_scaler"] = """
    WITH v AS MATERIALIZED (
      SELECT vec_id AS vid,
             list_transform(embedding::DOUBLE[],
                            x -> cast(round(x * 1e6) AS BIGINT)) AS xq
      FROM embeddings
      WHERE embedding IS NOT NULL
    ), ex AS (
      SELECT vid, unnest(range(len(xq))) AS pos, unnest(xq) AS val
      FROM v
    ), nb AS (
      SELECT pos, count(*) AS n FROM ex GROUP BY 1
    ), ranked AS (
      SELECT ex.pos, ex.val, nb.n,
             row_number() OVER (PARTITION BY ex.pos
                                ORDER BY ex.val ASC) AS rn
      FROM ex JOIN nb ON ex.pos = nb.pos
    ), qs AS MATERIALIZED (
      SELECT pos,
             min(CASE WHEN rn = ceil(0.25 * n) THEN val END) AS q1,
             min(CASE WHEN rn = ceil(0.5 * n) THEN val END) AS med,
             min(CASE WHEN rn = ceil(0.75 * n) THEN val END) AS q3
      FROM ranked
      WHERE rn = ceil(0.25 * n) OR rn = ceil(0.5 * n)
         OR rn = ceil(0.75 * n)
      GROUP BY 1
    )
    SELECT cast(ex.pos AS INTEGER) AS pos,
           cast(count(*) AS BIGINT) AS n,
           round(min(qs.med) / 1e6, 6) AS median,
           round((min(qs.q3) - min(qs.q1)) / 1e6, 6) AS iqr,
           cast(sum(CASE WHEN 2 * ex.val
                          < 2 * qs.q1 - 3 * (qs.q3 - qs.q1)
                      OR 2 * ex.val
                          > 2 * qs.q3 + 3 * (qs.q3 - qs.q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM ex JOIN qs ON ex.pos = qs.pos
    GROUP BY 1 ORDER BY 1
"""

# q320: TPC-H Q12 shape adapted: order-to-ship delay buckets x
# priority class.
ORACLE_SQL["q320_tpch_shipdelay_priority"] = """
    SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) < 30
                THEN 'lt30'
                WHEN date_diff('day', o_orderdate, l_shipdate) < 90
                THEN 'd30to89'
                ELSE 'ge90' END AS delay_bucket,
           cast(sum(CASE WHEN o_orderpriority IN
                          ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
           cast(sum(CASE WHEN o_orderpriority IN
                          ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_count
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1 ORDER BY 1
"""

# q321: TPC-H Q2 shape (min-cost supplier) over lineitem-observed
# supply; 1e-4 unit-price grid, per-(part,supplier) average re-snapped
# to one long so the argmin compares integers.
ORACLE_SQL["q321_tpch_min_cost_supplier"] = """
    WITH per AS (
      SELECT p_partkey, p_brand, l_suppkey,
             cast(round(cast(sum(cast(round(
                     l_extendedprice / l_quantity * 1e4) AS BIGINT))
                   AS BIGINT) * 1.0 / count(*)) AS BIGINT) AS avg_e4
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_size = 10 AND l_quantity > 0
      GROUP BY 1, 2, 3
    ), best AS (
      SELECT p_partkey, p_brand, l_suppkey, avg_e4,
             row_number() OVER (PARTITION BY p_partkey
                                ORDER BY avg_e4 ASC, l_suppkey ASC)
               AS rn
      FROM per
    )
    SELECT p_partkey AS partkey, p_brand AS brand,
           s_name AS supplier,
           round(avg_e4 / 1e4, 4) AS best_price
    FROM best JOIN supplier ON l_suppkey = s_suppkey
    WHERE rn = 1
    ORDER BY partkey
"""

# q323: stage-by-stage pipeline fingerprints (count + commutative
# md5-xor digest) — ingest, length filter, exact-dedup survivors.
ORACLE_SQL["q323_pipeline_stage_checksums"] = """
    WITH flt AS (
      SELECT doc_id, text FROM documents WHERE n_chars >= 100
    ), ded AS (
      SELECT min(doc_id) AS doc_id FROM flt
      GROUP BY md5(lower(trim(text)))
    )
    SELECT '1_ingest' AS stage,
           cast(count(*) AS BIGINT) AS n_rows,
           cast(coalesce(bit_xor(('0x' || substring(
                 md5(cast(doc_id AS VARCHAR)), 1, 15))::BIGINT), 0)
                AS BIGINT) AS checksum
    FROM documents
    UNION ALL
    SELECT '2_filter', cast(count(*) AS BIGINT),
           cast(coalesce(bit_xor(('0x' || substring(
                 md5(cast(doc_id AS VARCHAR)), 1, 15))::BIGINT), 0)
                AS BIGINT)
    FROM flt
    UNION ALL
    SELECT '3_dedup', cast(count(*) AS BIGINT),
           cast(coalesce(bit_xor(('0x' || substring(
                 md5(cast(doc_id AS VARCHAR)), 1, 15))::BIGINT), 0)
                AS BIGINT)
    FROM ded
    ORDER BY stage
"""
