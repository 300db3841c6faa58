"""Computed and cross-referencing DuckDB oracles (round-11 split).

These entries cannot live in the literal band modules: they are
GENERATED SQL (signature/band constructions rebuilt from the same
pure helpers the Spark plans use, so the two sides cannot drift) or
f-strings over OTHER oracle entries (q152 embeds q130's text, q164
embeds q17/q21). Imported by plans/oracles/__init__ AFTER the base
dict is assembled; every statement below mutates that shared dict in
place, in registry-original order.
"""

from . import ORACLE_SQL
from .core import _STOP_SQL

def _simhash_oracle_sql() -> str:
    """Full value-level SimHash oracle: recompute the md5-derived
    signatures, band keys, candidate join, and hamming filter in SQL —
    bit-for-bit the semantics of operators.dedup.simhash_neardup
    (max_hamming=3, n_bands=4, width 16)."""
    bit_sums = ",\n                 ".join(
        f"sum(({'ha' if i < 60 else 'hb'} >> {i if i < 60 else i - 60}) & 1)"
        f" AS b{i}"
        for i in range(64)
    )
    band_keys = ",\n                 ".join(
        "("
        + " + ".join(
            f"((CASE WHEN 2 * b{16 * b + j} > n THEN 1 ELSE 0 END)::BIGINT << {j})"
            for j in range(16)
        )
        + f") AS k{b}"
        for b in range(4)
    )
    return f"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
          FROM documents
        ), hashed AS (
          SELECT doc_id,
                 ('0x' || substring(md5(tok), 1, 15))::BIGINT AS ha,
                 ('0x' || substring(md5(tok), 17, 15))::BIGINT AS hb
          FROM toks
        ), votes AS (
          SELECT doc_id, count(*) AS n,
                 {bit_sums}
          FROM hashed GROUP BY doc_id
        ), sig AS (
          SELECT doc_id,
                 {band_keys}
          FROM votes
        )
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.k0, b.k0)) + bit_count(xor(a.k1, b.k1))
                    + bit_count(xor(a.k2, b.k2)) + bit_count(xor(a.k3, b.k3))
                    AS INTEGER) AS hamming
        FROM sig a JOIN sig b
          ON a.doc_id < b.doc_id
         AND (a.k0 = b.k0 OR a.k1 = b.k1 OR a.k2 = b.k2 OR a.k3 = b.k3)
        WHERE bit_count(xor(a.k0, b.k0)) + bit_count(xor(a.k1, b.k1))
              + bit_count(xor(a.k2, b.k2)) + bit_count(xor(a.k3, b.k3)) <= 3
    """

ORACLE_SQL["q21_simhash_neardup"] = _simhash_oracle_sql()


ORACLE_SQL["q152_rrf_hybrid"] = f"""
    WITH bm AS (
      SELECT doc_id AS l_id, rank AS l_rank
      FROM ({ORACLE_SQL["q130_bm25_topk"]}) b
    ), dn AS (
      WITH q AS (
        SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0
      ), c AS (
        SELECT vec_id, embedding::DOUBLE[] AS ce FROM embeddings
      ), sims AS (
        SELECT c.vec_id,
               round(list_dot_product(qe, ce)
                     / (sqrt(list_dot_product(qe, qe))
                        * sqrt(list_dot_product(ce, ce))), 6) AS sim
        FROM q CROSS JOIN c
      ), ranked AS (
        SELECT vec_id, row_number() OVER (ORDER BY sim DESC, vec_id ASC)
                 AS rank
        FROM sims
      )
      SELECT vec_id AS d_id, rank AS d_rank FROM ranked WHERE rank <= 20
    ), fused AS (
      SELECT coalesce(l_id, d_id) AS doc_id,
             cast(round((coalesce(1.0 / (60 + l_rank), 0.0)
                         + coalesce(1.0 / (60 + d_rank), 0.0)) * 1e6)
                  AS BIGINT) AS s_e6
      FROM bm FULL OUTER JOIN dn ON l_id = d_id
    )
    SELECT doc_id, cast(rank AS INTEGER) AS rank,
           round(s_e6 / 1e6, 6) AS rrf_score
    FROM (SELECT doc_id, s_e6,
                 row_number() OVER (ORDER BY s_e6 DESC, doc_id) AS rank
          FROM fused) r
    WHERE rank <= 10
"""





















ORACLE_SQL["q164_dedup_eval"] = f"""
    WITH cand AS (
      SELECT id_a, id_b FROM ({ORACLE_SQL["q21_simhash_neardup"]})
    ), truth AS (
      SELECT id_a, id_b FROM ({ORACLE_SQL["q17_ngram_jaccard"]})
    ), tp AS (
      SELECT c.id_a FROM cand c JOIN truth t USING (id_a, id_b)
    )
    SELECT
      (SELECT cast(count(*) AS BIGINT) FROM cand) AS n_candidates,
      (SELECT cast(count(*) AS BIGINT) FROM truth) AS n_truth,
      (SELECT cast(count(*) AS BIGINT) FROM tp) AS n_tp,
      CASE WHEN (SELECT count(*) FROM cand) > 0
           THEN round((SELECT count(*) FROM tp) * 1.0
                      / (SELECT count(*) FROM cand), 4) END AS precision,
      CASE WHEN (SELECT count(*) FROM truth) > 0
           THEN round((SELECT count(*) FROM tp) * 1.0
                      / (SELECT count(*) FROM truth), 4) END AS recall
"""












def _hll_oracle() -> str:
    from ...operators.sketches import hll_oracle_sql

    return hll_oracle_sql("events", "user_id", "event_type")


ORACLE_SQL["q170_hll_distinct"] = _hll_oracle()




















def _cms_oracle() -> str:
    from ...operators.sketches import cms_oracle_sql

    return cms_oracle_sql("events", "user_id", list(range(10)))


ORACLE_SQL["q178_cms_sketch"] = _cms_oracle()






























ORACLE_SQL["q193_cohens_kappa"] = f"""
    WITH feats AS (
      SELECT (lang = 'en') AS ra,
             string_split_regex(trim(lower(text)), '\\s+') AS toks
      FROM documents
    ), rated AS (
      SELECT CASE WHEN ra THEN 1 ELSE 0 END AS a,
             CASE WHEN len(list_filter(toks,
                       x -> list_contains({_STOP_SQL}, x)))
                    * 1.0 / len(toks) > 0.04
                  THEN 1 ELSE 0 END AS b
      FROM feats
    ), cells AS (
      SELECT count(*) AS n,
             sum(a * b) AS tt, sum(a * (1 - b)) AS tf,
             sum((1 - a) * b) AS ft, sum((1 - a) * (1 - b)) AS ff
      FROM rated
    )
    SELECT cast(n AS BIGINT) AS n,
           cast(tt + ff AS BIGINT) AS n_agree,
           CASE WHEN n * n - ((tt + tf) * (tt + ft)
                              + (ft + ff) * (tf + ff)) <> 0
                THEN round(
                  cast(n * (tt + ff) - ((tt + tf) * (tt + ft)
                                        + (ft + ff) * (tf + ff))
                       AS DOUBLE)
                  / cast(n * n - ((tt + tf) * (tt + ft)
                                  + (ft + ff) * (tf + ff)) AS DOUBLE),
                  6)
           END AS kappa
    FROM cells
"""








ORACLE_SQL["q195_canonical_docs"] = f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, unnest(
        CASE WHEN len(t) >= 3
             THEN list_transform(range(1, len(t) - 1),
                                 i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
             ELSE [array_to_string(t, ' ')] END) AS sh
      FROM toks
    ), capped AS (
      SELECT s.* FROM sh s JOIN (
        SELECT sh FROM sh GROUP BY sh HAVING count(*) <= 100) r USING (sh)
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM capped GROUP BY 1
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      FROM capped a JOIN capped b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT id_a, id_b
      FROM inter
      JOIN sizes sa ON id_a = sa.doc_id
      JOIN sizes sb ON id_b = sb.doc_id
      WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.2
    ), edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ), reach(node, comp) AS (
      SELECT DISTINCT s, s FROM edges
      UNION
      SELECT e.d, r.comp FROM reach r JOIN edges e ON e.s = r.node
    ), comp AS (
      SELECT node, min(comp) AS cluster_id FROM reach GROUP BY 1
    ), clustered AS (
      SELECT node AS doc_id, cluster_id,
             cast(count(*) OVER (PARTITION BY cluster_id) AS INTEGER)
               AS cluster_size
      FROM comp
    ), feats AS (
      SELECT doc_id,
             string_split_regex(trim(lower(text)), '\\s+') AS tq,
             length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
               * 1.0 / length(text) AS punct_ratio
      FROM documents
    ), quality AS (
      SELECT doc_id,
             round(least(1.0, len(list_filter(tq, x -> x <> '')) / 120.0)
                   * (1.0 - punct_ratio), 4) AS quality
      FROM feats
    ), ranked AS (
      SELECT c.cluster_id, c.doc_id, q.quality, c.cluster_size,
             row_number() OVER (PARTITION BY c.cluster_id
                                ORDER BY q.quality DESC, c.doc_id ASC)
               AS rk
      FROM clustered c JOIN quality q USING (doc_id)
    )
    SELECT cluster_id, doc_id AS kept_doc_id, quality AS kept_quality,
           cluster_size
    FROM ranked WHERE rk = 1
"""


























def _q210_oracle() -> str:
    from ...operators.classifier import hashed_ngram_oracle_sql

    return hashed_ngram_oracle_sql("documents", "source")


ORACLE_SQL["q210_hashed_classifier"] = _q210_oracle()


#: Shared mutual-kNN edge CTE text (the q173 oracle's core) — q211
#: builds label propagation on the IDENTICAL edge set.
_MUTUAL_KNN_CTE = """
    v AS (
      SELECT label, vec_id, embedding::DOUBLE[] AS e,
             sqrt(list_dot_product(embedding::DOUBLE[],
                                   embedding::DOUBLE[])) AS n
      FROM embeddings
      WHERE sqrt(list_dot_product(embedding::DOUBLE[],
                                  embedding::DOUBLE[])) > 0
    ), scored AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             round(list_dot_product(a.e, b.e) / (a.n * b.n), 6) AS sim
      FROM v a JOIN v b ON a.label = b.label AND a.vec_id <> b.vec_id
    ), ranked AS (
      SELECT src, dst, sim,
             row_number() OVER (PARTITION BY src
                                ORDER BY sim DESC, dst ASC) AS rank
      FROM scored
    ), kedges AS (
      SELECT src, dst FROM ranked WHERE rank <= 5
    ), medges AS (
      SELECT e.src, e.dst
      FROM kedges e JOIN kedges r ON r.src = e.dst AND r.dst = e.src
    )
"""


ORACLE_SQL["q211_label_propagation"] = f"""
    WITH {_MUTUAL_KNN_CTE},
    nodes AS (
      SELECT vec_id AS id,
             CASE WHEN vec_id % 10 < 3 THEN label END AS lab
      FROM v
    ), a0 AS (
      SELECT id, lab AS label, 0 AS rnd FROM nodes WHERE lab IS NOT NULL
    ), u0 AS (
      SELECT id FROM nodes WHERE lab IS NULL
    ), votes1 AS (
      SELECT m.src AS id, a.label, count(*) AS nv
      FROM medges m
      JOIN a0 a ON m.dst = a.id
      JOIN u0 ON m.src = u0.id
      GROUP BY 1, 2
    ), pick1 AS (
      SELECT id, label FROM (
        SELECT id, label,
               row_number() OVER (PARTITION BY id
                                  ORDER BY nv DESC, label ASC) AS rk
        FROM votes1) WHERE rk = 1
    ), a1 AS (
      SELECT * FROM a0
      UNION ALL SELECT id, label, 1 FROM pick1
    ), u1 AS (
      SELECT id FROM u0 WHERE id NOT IN (SELECT id FROM pick1)
    ), votes2 AS (
      SELECT m.src AS id, a.label, count(*) AS nv
      FROM medges m
      JOIN a1 a ON m.dst = a.id
      JOIN u1 ON m.src = u1.id
      GROUP BY 1, 2
    ), pick2 AS (
      SELECT id, label FROM (
        SELECT id, label,
               row_number() OVER (PARTITION BY id
                                  ORDER BY nv DESC, label ASC) AS rk
        FROM votes2) WHERE rk = 1
    ), a2 AS (
      SELECT * FROM a1
      UNION ALL SELECT id, label, 2 FROM pick2
    )
    SELECT cast(coalesce(a.label, -1) AS INTEGER) AS label,
           cast(count(*) AS BIGINT) AS n_nodes,
           cast(sum(CASE WHEN a.rnd = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_seed,
           cast(sum(CASE WHEN a.rnd = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_round1,
           cast(sum(CASE WHEN a.rnd = 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_round2
    FROM nodes n LEFT JOIN a2 a ON n.id = a.id
    GROUP BY 1
"""




def _q213_oracle() -> str:
    from ...operators.sketches import source_minhash_oracle_sql

    return source_minhash_oracle_sql("documents", 3)


ORACLE_SQL["q213_source_minhash"] = _q213_oracle()








ORACLE_SQL["q217_recursive_cte"] = f"""
    WITH RECURSIVE {_MUTUAL_KNN_CTE},
    reach(id, depth) AS (
      SELECT min(src), CAST(0 AS INTEGER) FROM medges
      UNION ALL
      SELECT e.dst, r.depth + 1
      FROM reach r JOIN medges e ON e.src = r.id
      WHERE r.depth < 3
    )
    SELECT depth, cast(count(*) AS BIGINT) AS n_nodes FROM (
      SELECT id, min(depth) AS depth FROM reach GROUP BY id
    ) GROUP BY depth
"""


def _q218_oracle() -> str:
    bits, n_files = 8, 32
    x_lo, x_hi, y_lo, y_hi = 64, 127, 32, 63
    z_terms = " + ".join(
        f"(((x >> {i}) & 1) * {1 << (2 * i)}"
        f" + ((y >> {i}) & 1) * {1 << (2 * i + 1)})"
        for i in range(bits)
    )
    return f"""
        WITH keyed AS (
          SELECT l_orderkey,
                 l_partkey % {1 << bits} AS x,
                 l_suppkey % {1 << bits} AS y
          FROM lineitem
        ), zk AS (
          SELECT l_orderkey, x, y, cast({z_terms} AS BIGINT) AS z
          FROM keyed
        ), maxes AS (
          SELECT max(l_orderkey) AS kmax, max(z) AS zmax FROM zk
        ), tagged AS (
          SELECT (l_orderkey * {n_files}) // (kmax + 1) AS nat_file,
                 (z * {n_files}) // (zmax + 1) AS z_file
          FROM zk CROSS JOIN maxes
          WHERE x BETWEEN {x_lo} AND {x_hi}
            AND y BETWEEN {y_lo} AND {y_hi}
        ), per AS (
          SELECT cast(count(DISTINCT nat_file) AS BIGINT) AS nat_files,
                 cast(count(DISTINCT z_file) AS BIGINT) AS z_files,
                 cast(count(*) AS BIGINT) AS n_match
          FROM tagged
        )
        SELECT 'natural' AS layout, nat_files AS files_touched, n_match,
               round(1 - nat_files / {float(n_files)!r}, 4) AS prune_fraction
        FROM per
        UNION ALL
        SELECT 'zorder', z_files, n_match,
               round(1 - z_files / {float(n_files)!r}, 4)
        FROM per
    """


ORACLE_SQL["q218_zorder_audit"] = _q218_oracle()






def _q221_oracle() -> str:
    from ...operators.textstats import bpe_merges_oracle_sql

    return bpe_merges_oracle_sql("documents", 3)


ORACLE_SQL["q221_bpe_train"] = _q221_oracle()












def _q227_oracle() -> str:
    from ...operators.classifier import doc_scores_oracle_cte

    return f"""
        WITH {doc_scores_oracle_cte("documents", "lang")},
        lv AS (
          SELECT score AS s,
                 cast(sum(CASE WHEN extra = 'en' THEN 1 ELSE 0 END)
                      AS BIGINT) AS pos,
                 cast(sum(CASE WHEN extra = 'en' THEN 0 ELSE 1 END)
                      AS BIGINT) AS neg
          FROM per_doc GROUP BY 1
        ), terms AS (
          SELECT pos, neg,
                 pos * (2 * coalesce(sum(neg) OVER (
                          ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND 1 PRECEDING), 0)
                        + neg) AS u2
          FROM lv
        )
        SELECT cast(sum(pos) AS BIGINT) AS n_pos,
               cast(sum(neg) AS BIGINT) AS n_neg,
               CASE WHEN sum(pos) > 0 AND sum(neg) > 0
                    THEN round(sum(u2) / (2.0 * sum(pos) * sum(neg)), 6)
               END AS auc
        FROM terms
    """


ORACLE_SQL["q227_exact_auc"] = _q227_oracle()


def _q228_oracle() -> str:
    from ...operators.classifier import doc_scores_oracle_cte

    return f"""
        WITH {doc_scores_oracle_cte("documents", "lang")},
        lv AS (
          SELECT score AS s,
                 cast(sum(CASE WHEN extra = 'en' THEN 1 ELSE 0 END)
                      AS BIGINT) AS pos,
                 cast(count(*) AS BIGINT) AS cnt
          FROM per_doc GROUP BY 1
        ), cum AS (
          SELECT s,
                 sum(cnt) OVER (ORDER BY s DESC
                                ROWS UNBOUNDED PRECEDING) AS cum_ge,
                 sum(pos) OVER (ORDER BY s DESC
                                ROWS UNBOUNDED PRECEDING) AS pos_ge
          FROM lv
        ), tot AS (
          SELECT max(cum_ge) AS n_total, max(pos_ge) AS n_pos FROM cum
        ), dec AS (
          SELECT d AS decile, n_total, n_pos,
                 (d * n_total + 9) // 10 AS k
          FROM (SELECT unnest(range(1, 11)) AS d) CROSS JOIN tot
        ), picked AS (
          SELECT decile, n_pos,
                 min(struct_pack(cum_ge := cum_ge, pos_ge := pos_ge,
                                 s := s)) AS m
          FROM dec JOIN cum ON cum.cum_ge >= dec.k
          GROUP BY 1, 2
        )
        SELECT cast(decile AS INTEGER) AS decile,
               m.s AS threshold_score,
               cast(m.cum_ge AS BIGINT) AS n_flagged,
               cast(m.pos_ge AS BIGINT) AS n_pos_flagged,
               round(m.pos_ge / m.cum_ge::DOUBLE, 6) AS precision,
               CASE WHEN n_pos > 0
                    THEN round(m.pos_ge / n_pos::DOUBLE, 6) END AS recall
        FROM picked
    """


ORACLE_SQL["q228_pr_deciles"] = _q228_oracle()










# Same oracle as q230: with the registered delay above every fixture
# duplicate id-span, the watermarked kept-set equals the exact
# distinct non-null fingerprint count.
ORACLE_SQL["q232_stream_dedup_watermarked"] = ORACLE_SQL["q230_stream_dedup"]

# z-value interleave for the q233 oracle: x bit i -> position 2i+1,
# y bit i -> position 2i (generated from the same bits=8 the Spark
# side uses, so the two cannot drift).
_Z_TERMS = " + ".join(
    f"(((gx >> {i}) & 1) * {1 << (2 * i + 1)}) "
    f"+ (((gy >> {i}) & 1) * {1 << (2 * i)})"
    for i in range(8)
)
ORACLE_SQL["q233_sort_vs_zorder"] = f"""
    WITH base AS (
      SELECT event_id AS id, user_id AS x,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL
    ), b AS (
      SELECT min(x) AS xlo, max(x) AS xhi, min(y) AS ylo, max(y) AS yhi
      FROM base
    ), g AS (
      SELECT id,
             ((x - xlo) * 256) // (xhi - xlo + 1) AS gx,
             ((y - ylo) * 256) // (yhi - ylo + 1) AS gy
      FROM base, b
    ), gz AS (
      SELECT id, gx, gy, {_Z_TERMS} AS z FROM g
    ), tiled AS (
      SELECT gx, gy,
             ntile(64) OVER (ORDER BY gx, gy, id) AS zone_lin,
             ntile(64) OVER (ORDER BY z, id) AS zone_z
      FROM gz
    ), probes AS (
      SELECT DISTINCT
             (gx // 32) * 32 AS plo_x, (gx // 32) * 32 + 31 AS phi_x,
             (gy // 32) * 32 AS plo_y, (gy // 32) * 32 + 31 AS phi_y
      FROM tiled
    ), zl AS (
      SELECT zone_lin AS zone,
             min(gx) AS zlo_x, max(gx) AS zhi_x,
             min(gy) AS zlo_y, max(gy) AS zhi_y
      FROM tiled GROUP BY 1
    ), zz AS (
      SELECT zone_z AS zone,
             min(gx) AS zlo_x, max(gx) AS zhi_x,
             min(gy) AS zlo_y, max(gy) AS zhi_y
      FROM tiled GROUP BY 1
    ), tl AS (
      SELECT p.plo_x, p.plo_y, count(*) AS nz
      FROM probes p JOIN zl z
        ON z.zlo_x <= p.phi_x AND z.zhi_x >= p.plo_x
       AND z.zlo_y <= p.phi_y AND z.zhi_y >= p.plo_y
      GROUP BY 1, 2
    ), tz AS (
      SELECT p.plo_x, p.plo_y, count(*) AS nz
      FROM probes p JOIN zz z
        ON z.zlo_x <= p.phi_x AND z.zhi_x >= p.plo_x
       AND z.zlo_y <= p.phi_y AND z.zhi_y >= p.plo_y
      GROUP BY 1, 2
    )
    SELECT 'linear_xy' AS layout, CAST(64 AS INTEGER) AS n_zones,
           CAST(count(*) AS BIGINT) AS n_probes,
           round(avg(nz), 4) AS avg_zones_touched
    FROM tl
    UNION ALL
    SELECT 'zorder', CAST(64 AS INTEGER), CAST(count(*) AS BIGINT),
           round(avg(nz), 4)
    FROM tz
"""


# q238: the 16×64 ±1 JL matrix regenerated from the SAME pure helper
# the Spark plan uses (md5-derived, no RNG state) and inlined as
# list_dot_product literals — the two sides cannot drift.
_JL_D, _JL_K = 64, 16


def _jl_oracle_sql() -> str:
    from ...operators.similarity import jl_signs

    signs = jl_signs(_JL_D, _JL_K)
    proj_cols = ",\n             ".join(
        "list_dot_product(embedding::DOUBLE[], ["
        + ", ".join(f"{float(s)}" for s in row)
        + f"]) AS p{j}"
        for j, row in enumerate(signs)
    )
    d2p = " + ".join(f"(a.p{j} - b.p{j}) ^ 2" for j in range(_JL_K))
    return f"""
    WITH panel AS (
      SELECT vec_id AS id, label, embedding::DOUBLE[] AS e,
             list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS aa,
             {proj_cols}
      FROM embeddings WHERE vec_id % 5 = 0
    ), pairs AS (
      SELECT a.label AS label,
             round(sqrt(({d2p}) * {_JL_D / _JL_K}
                        / (a.aa - 2 * list_dot_product(a.e, b.e) + b.aa)),
                   6) AS ratio
      FROM panel a JOIN panel b ON a.label = b.label AND a.id < b.id
      WHERE a.aa - 2 * list_dot_product(a.e, b.e) + b.aa > 1e-12
    )
    SELECT label, cast(count(*) AS BIGINT) AS n_pairs,
           round(avg(ratio), 4) AS mean_ratio,
           round(min(ratio), 6) AS min_ratio,
           round(max(ratio), 6) AS max_ratio
    FROM pairs GROUP BY 1
    """


ORACLE_SQL["q238_jl_distortion"] = _jl_oracle_sql()





























































# q274: identical md5 registers, identical (day × register) spine +
# trailing RANGE-window merge, identical integer harmonic sum and the
# single division — the hll_oracle_sql construction extended over the
# rolling window.
from ...operators.sketches import _ALPHA_256 as _HLL_A  # noqa: E402
from ...operators.sketches import _M as _HLL_M  # noqa: E402
from ...operators.sketches import _SCALE as _HLL_SCALE  # noqa: E402
from ...operators.sketches import _WBITS as _HLL_W  # noqa: E402

ORACLE_SQL["q274_rolling_hll"] = f"""
    WITH base AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
             user_id AS k
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ), h AS (
      SELECT d,
             ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 2))::INT AS reg,
             ('0x' || substr(md5(CAST(k AS VARCHAR)), 3, 13))::BIGINT AS w
      FROM base
    ), regs AS (
      SELECT d, reg,
             max(CASE WHEN w = 0 THEN {_HLL_W + 1}
                      ELSE {_HLL_W + 1} - length(bin(w)) END) AS max_rho
      FROM h GROUP BY 1, 2
    ), days AS (SELECT DISTINCT d FROM regs),
    allregs AS (SELECT DISTINCT reg FROM regs),
    joined AS (
      SELECT s.d, s.reg, r.max_rho
      FROM (SELECT days.d, allregs.reg FROM days, allregs) s
      LEFT JOIN regs r ON r.d = s.d AND r.reg = s.reg
    ), rolled AS (
      SELECT d, reg,
             max(max_rho) OVER (PARTITION BY reg ORDER BY d
                                RANGE BETWEEN 6 PRECEDING
                                          AND CURRENT ROW) AS roll_rho
      FROM joined
    ), sk AS (
      SELECT d, CAST(count(*) AS INT) AS n_registers,
             CAST(sum(1::BIGINT << ({_HLL_W + 1} - roll_rho)) AS BIGINT)
               AS s_present
      FROM rolled WHERE roll_rho IS NOT NULL GROUP BY 1
    ), pairs AS (SELECT DISTINCT d, k FROM base),
    ex AS (
      SELECT days.d AS td,
             CAST(count(DISTINCT p.k) AS BIGINT) AS exact_distinct
      FROM days JOIN pairs p ON p.d <= days.d AND p.d > days.d - 7
      GROUP BY 1
    )
    SELECT strftime(DATE '1970-01-01' + sk.d * INTERVAL 1 DAY,
                    '%Y-%m-%d') AS day,
           n_registers,
           round(({_HLL_A * _HLL_M * _HLL_M}::DOUBLE
                  * {_HLL_SCALE!r}::DOUBLE)
                 / CAST(s_present
                        + ({_HLL_M} - n_registers)::BIGINT
                          * {1 << (_HLL_W + 1)}::BIGINT AS DOUBLE), 2)
             AS est_distinct,
           exact_distinct,
           round(abs(round(({_HLL_A * _HLL_M * _HLL_M}::DOUBLE
                            * {_HLL_SCALE!r}::DOUBLE)
                 / CAST(s_present
                        + ({_HLL_M} - n_registers)::BIGINT
                          * {1 << (_HLL_W + 1)}::BIGINT AS DOUBLE), 2)
                     - exact_distinct)
                 / CAST(exact_distinct AS DOUBLE), 4) AS rel_err
    FROM sk JOIN ex ON ex.td = sk.d
"""











def _q284_oracle() -> str:
    """nDCG@10 oracle on the SAME integer-millionths discount grid as
    the Spark plan — the gain/prefix literals are imported from
    operators.ranking_eval at module load, so the two engines cannot
    disagree on the grid by construction."""
    from ...operators.ranking_eval import _DCG_GAIN_U, _IDCG_U, NDCG_K

    gains = ", ".join(
        f"({d + 1}, {g})" for d, g in enumerate(_DCG_GAIN_U)
    )
    prefix = ", ".join(
        f"({m}, {_IDCG_U[m]})" for m in range(1, NDCG_K + 1)
    )
    return f"""
    WITH q AS (
      SELECT vec_id AS query_id, label AS ql,
             embedding::DOUBLE[] AS qe
      FROM embeddings WHERE vec_id < 5
    ), c AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS ce FROM embeddings
    ), sims AS (
      SELECT q.query_id, q.ql, c.vec_id, c.label,
             round(list_dot_product(qe, ce)
                   / (sqrt(list_dot_product(qe, qe))
                      * sqrt(list_dot_product(ce, ce))), 6) AS sim
      FROM q CROSS JOIN c
    ), ranked AS (
      SELECT query_id, ql, label,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, vec_id ASC) AS rank
      FROM sims
    ), run AS (
      SELECT query_id, rank,
             CASE WHEN label = ql THEN 1 ELSE 0 END AS rel
      FROM ranked WHERE rank <= {NDCG_K}
    ), gains(rank, gain) AS (VALUES {gains}),
    pre(m, idcg) AS (VALUES {prefix}),
    dcg AS (
      SELECT query_id, CAST(sum(rel * gain) AS BIGINT) AS dcg_u
      FROM run JOIN gains USING (rank) GROUP BY 1
    ), pool AS (
      SELECT q.query_id,
             CAST(count(*) AS BIGINT) AS n_rel_pool
      FROM q JOIN c ON c.label = q.ql GROUP BY 1
    ), base AS (
      SELECT p.query_id, p.n_rel_pool,
             COALESCE(d.dcg_u, 0) AS dcg_u,
             CASE WHEN p.n_rel_pool > 0 THEN
               (SELECT idcg FROM pre
                WHERE m = least(p.n_rel_pool, {NDCG_K}))
             END AS idcg_u
      FROM pool p LEFT JOIN dcg d USING (query_id)
    )
    SELECT query_id, n_rel_pool, dcg_u,
           CAST(idcg_u AS BIGINT) AS idcg_u,
           round(CAST(dcg_u AS DOUBLE) / CAST(idcg_u AS DOUBLE)
                 + 1e-9, 6) AS ndcg
    FROM base ORDER BY query_id
"""


ORACLE_SQL["q284_ndcg_label_match"] = _q284_oracle()


def _q285_oracle() -> str:
    """RBO oracle with the SAME exact-integer rational-p weights as
    operators.ranking_eval (imported, not re-derived); the quantized
    run's integer dot products are exactly representable in DuckDB's
    double list_dot_product, so both engines rank identical keys."""
    from ...operators.ranking_eval import _RBO_DIV, _RBO_W, RBO_K

    weights = ", ".join(
        f"({d + 1}, {w})" for d, w in enumerate(_RBO_W)
    )
    return f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
      FROM embeddings WHERE vec_id < 5
    ), c AS (
      SELECT vec_id, embedding::DOUBLE[] AS ce FROM embeddings
    ), sa AS (
      SELECT q.query_id, c.vec_id,
             round(list_dot_product(qe, ce)
                   / (sqrt(list_dot_product(qe, qe))
                      * sqrt(list_dot_product(ce, ce))), 6) AS sim
      FROM q CROSS JOIN c
    ), ra AS (
      SELECT query_id, vec_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, vec_id ASC) AS ra
      FROM sa
    ), qq AS (
      SELECT vec_id AS query_id,
             list_transform(embedding::DOUBLE[],
                            x -> CAST(round(x * 10) AS BIGINT)) AS qv
      FROM embeddings WHERE vec_id < 5
    ), cq AS (
      SELECT vec_id,
             list_transform(embedding::DOUBLE[],
                            x -> CAST(round(x * 10) AS BIGINT)) AS cv
      FROM embeddings
    ), sb AS (
      SELECT qq.query_id, cq.vec_id,
             list_dot_product(qv, cv) AS sim
      FROM qq CROSS JOIN cq
    ), rb AS (
      SELECT query_id, vec_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, vec_id ASC) AS rb
      FROM sb
    ), common AS (
      SELECT a.query_id, greatest(a.ra, b.rb) AS d0
      FROM (SELECT * FROM ra WHERE ra <= {RBO_K}) a
      JOIN (SELECT * FROM rb WHERE rb <= {RBO_K}) b
        USING (query_id, vec_id)
    ), w(d, wt) AS (VALUES {weights}),
    terms AS (
      SELECT query_id, CAST(sum(wt) AS BIGINT) AS s,
             CAST(sum(CASE WHEN d = {RBO_K} THEN 1 ELSE 0 END)
                  AS BIGINT) AS overlap_at_k
      FROM common, w WHERE w.d >= common.d0 GROUP BY 1
    )
    SELECT qs.query_id,
           COALESCE(t.overlap_at_k, 0) AS overlap_at_k,
           round(CAST(COALESCE(t.s, 0) AS DOUBLE)
                 / {float(_RBO_DIV)!r} + 1e-9, 6) AS rbo_min
    FROM (SELECT DISTINCT query_id FROM ra) qs
    LEFT JOIN terms t USING (query_id)
    ORDER BY qs.query_id
"""


ORACLE_SQL["q285_rbo_cosine_vs_dot"] = _q285_oracle()


def _q289_oracle(iters: int = 6) -> str:
    """Generated power-iteration oracle: the 6 integer-renormalized
    steps unroll to chained CTEs, each the exact mirror of one Spark
    matvec + renormalization (HUGEINT sums = decimal(38,0) sums; the
    one double sequence per step is byte-identical). Grid constants
    imported from operators.spectral."""
    from ...operators.spectral import GRID_DP, V_UNIT

    steps = []
    prev = "v0"
    for t in range(1, iters + 1):
        steps.append(f"""
    u{t} AS MATERIALIZED (
      SELECT g.i, sum(g.g * {prev}.v) AS u
      FROM g JOIN {prev} ON g.j = {prev}.j GROUP BY 1
    ), m{t} AS (SELECT max(abs(u)) AS m FROM u{t}),
    v{t} AS MATERIALIZED (
      SELECT i AS j,
             CAST(round(CAST(u AS DOUBLE) / CAST(m AS DOUBLE)
                        * {V_UNIT}) AS BIGINT) AS v
      FROM u{t}, m{t}
    )""")
        prev = f"v{t}"
    chain = ",".join(steps)
    return f"""
    WITH xq AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(round(CAST(unnest(embedding) AS DOUBLE)
                        * {10 ** GRID_DP}) AS BIGINT) AS xi
      FROM embeddings
    ), g AS MATERIALIZED (
      SELECT a.i, b.i AS j, sum(a.xi * b.xi) AS g
      FROM xq a JOIN xq b USING (vec_id) GROUP BY 1, 2
    ), v0 AS (
      SELECT DISTINCT j, CAST({V_UNIT} AS BIGINT) AS v FROM g
    ),{chain},
    uf AS (
      SELECT g.i, sum(g.g * {prev}.v) AS u
      FROM g JOIN {prev} ON g.j = {prev}.j GROUP BY 1
    ), st AS (
      SELECT sum(CAST(v.v AS HUGEINT) * uf.u) AS num,
             sum(CAST(v.v AS HUGEINT) * v.v) AS den
      FROM uf JOIN {prev} v ON uf.i = v.j
    ), sg AS (
      SELECT CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END AS sgn
      FROM {prev} WHERE v <> 0 ORDER BY j LIMIT 1
    )
    SELECT CAST(v.j AS INTEGER) AS i,
           round(sg.sgn * CAST(v.v AS DOUBLE)
                 / sqrt(CAST(st.den AS DOUBLE)) + 1e-9, 6) AS loading,
           round(CAST(st.num AS DOUBLE) / CAST(st.den AS DOUBLE)
                 / {float(10 ** (2 * GRID_DP))!r} + 1e-9, 6)
             AS eigenvalue,
           CAST({iters} AS INTEGER) AS iters
    FROM {prev} v, st, sg
    ORDER BY i
"""


ORACLE_SQL["q289_top_principal_component"] = _q289_oracle()


def _q291_oracle() -> str:
    """Whitening-audit oracle: the same exact-integer Gram CTE as
    q289 (grid constants imported from operators.spectral), then
    d²-bounded correlation arithmetic — each |dimension cosine| is
    the identical double sequence, the argmax is a deterministic
    (corr DESC, i, j) row_number."""
    from ...operators.spectral import GRID_DP

    return f"""
    WITH xq AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(round(CAST(unnest(embedding) AS DOUBLE)
                        * {10 ** GRID_DP}) AS BIGINT) AS xi
      FROM embeddings
    ), g AS MATERIALIZED (
      SELECT a.i, b.i AS j, sum(a.xi * b.xi) AS g
      FROM xq a JOIN xq b USING (vec_id) GROUP BY 1, 2
    ), diag AS (
      SELECT i, g AS gd FROM g WHERE i = j
    ), offc AS (
      SELECT g.i, g.j, g.g, d1.gd AS gii, d2.gd AS gjj
      FROM g JOIN diag d1 ON g.i = d1.i JOIN diag d2 ON g.j = d2.i
      WHERE g.i < g.j
    ), cells AS (
      SELECT i, j,
             CASE WHEN gii > 0 AND gjj > 0 THEN
               round(abs(CAST(g AS DOUBLE))
                     / sqrt(CAST(gii AS DOUBLE) * CAST(gjj AS DOUBLE))
                     + 1e-9, 6)
             END AS c,
             g * g AS g2
      FROM offc
    ), best AS (
      SELECT c, i, j FROM (
        SELECT c, i, j,
               row_number() OVER (ORDER BY c DESC, i, j) AS rn
        FROM cells WHERE c IS NOT NULL) r
      WHERE rn = 1
    ), offs AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CASE WHEN c >= 0.1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_corr_ge_floor,
             sum(g2) AS off2
      FROM cells
    ), ds AS (
      SELECT CAST(count(*) AS BIGINT) AS n_dims, sum(gd * gd) AS d2
      FROM diag
    )
    SELECT ds.n_dims, offs.n_pairs, offs.n_corr_ge_floor,
           best.c AS max_abs_corr,
           CAST(best.i AS INTEGER) AS max_i,
           CAST(best.j AS INTEGER) AS max_j,
           round(2.0 * CAST(offs.off2 AS DOUBLE)
                 / CAST(ds.d2 AS DOUBLE) + 1e-9, 6)
             AS off_to_diag_fro2
    FROM ds, offs, best
"""


ORACLE_SQL["q291_whitening_audit"] = _q291_oracle()


def _q297_oracle() -> str:
    """MDE oracle with the z-quantile literals imported from
    operators.stats (Z_ALPHA_2 + Z_BETA_80 pre-summed in Python so
    both engines see ONE literal, not a sum)."""
    from ...operators.stats import Z_ALPHA_2, Z_BETA_80

    zsum = Z_ALPHA_2 + Z_BETA_80
    return f"""
    WITH per_user AS (
      SELECT event_type AS k, user_id AS u,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2
    ), agg AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n_users,
             sum(x) AS sx, sum(x * x) AS sxx
      FROM per_user GROUP BY 1
    ), fit AS (
      SELECT k, n_users,
             CAST(sx AS DOUBLE) / CAST(n_users AS DOUBLE) AS mean,
             (CAST(n_users AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             / (CAST(n_users AS DOUBLE)
                * (CAST(n_users AS DOUBLE) - 1.0)) AS var
      FROM agg
    ), m AS (
      SELECT k, n_users, mean, var,
             CASE WHEN n_users >= 2 AND var > 0 THEN
               {zsum!r} * sqrt(var)
               * sqrt(2.0 / (CAST(n_users AS DOUBLE) / 2.0))
             END AS mde
      FROM fit
    )
    SELECT k AS event_type, n_users,
           round(mean / 100.0 + 1e-9, 6) AS mean_per_user,
           round(CASE WHEN n_users >= 2 AND var > 0
                 THEN sqrt(var) END / 100.0 + 1e-9, 6)
             AS sd_per_user,
           round(mde / 100.0 + 1e-9, 6) AS mde_abs,
           round(CASE WHEN mean <> 0.0 THEN mde / mean * 100.0 END
                 + 1e-9, 4) AS mde_rel_pct
    FROM m ORDER BY event_type
"""


ORACLE_SQL["q297_mde_power"] = _q297_oracle()


def _q298_oracle() -> str:
    """Delta-method ratio-CI oracle; z literal imported from
    operators.stats, every double sequence mirrored token-for-token."""
    from ...operators.stats import Z_ALPHA_2

    return f"""
    WITH per_user AS (
      SELECT event_type AS k, user_id AS u,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS y,
             CAST(count(*) AS BIGINT) AS n
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2
    ), agg AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n_users,
             sum(y) AS sy, sum(n) AS sn, sum(y * y) AS syy,
             sum(n * n) AS snn, sum(y * n) AS syn
      FROM per_user GROUP BY 1
    ), fit AS (
      SELECT k, n_users, CAST(sn AS BIGINT) AS n_events,
             CAST(sy AS DOUBLE) / CAST(sn AS DOUBLE) AS r,
             CAST(sn AS DOUBLE) / CAST(n_users AS DOUBLE) AS nbar,
             (CAST(n_users AS DOUBLE) * CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n_users AS DOUBLE)
                * (CAST(n_users AS DOUBLE) - 1.0)) AS s_yy,
             (CAST(n_users AS DOUBLE) * CAST(snn AS DOUBLE)
              - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE))
             / (CAST(n_users AS DOUBLE)
                * (CAST(n_users AS DOUBLE) - 1.0)) AS s_nn,
             (CAST(n_users AS DOUBLE) * CAST(syn AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sn AS DOUBLE))
             / (CAST(n_users AS DOUBLE)
                * (CAST(n_users AS DOUBLE) - 1.0)) AS s_yn
      FROM agg
    ), se AS (
      SELECT k, n_users, n_events, r,
             CASE WHEN n_users >= 2 THEN
               sqrt(greatest((s_yy - 2.0 * r * s_yn + r * r * s_nn)
                             / (CAST(n_users AS DOUBLE) * nbar * nbar),
                             0.0))
             END AS se
      FROM fit
    )
    SELECT k AS event_type, n_users, n_events,
           round(r / 100.0 + 1e-9, 6) AS ratio,
           round(se / 100.0 + 1e-9, 6) AS se,
           round((r - {Z_ALPHA_2!r} * se) / 100.0 + 1e-9, 6) AS ci_lo,
           round((r + {Z_ALPHA_2!r} * se) / 100.0 + 1e-9, 6) AS ci_hi
    FROM se ORDER BY event_type
"""


ORACLE_SQL["q298_ratio_metric_ci"] = _q298_oracle()


# q307: Adamic–Adar link prediction over q173's mutual-kNN edges —
# embeds the q173 oracle text so the edge substrate cannot drift
# (the q152/q164 cross-reference pattern). Mirrors
# operators/graph.adamic_adar_linkpred (top_n=20).
ORACLE_SQL["q307_adamic_adar"] = f"""
    WITH edges AS MATERIALIZED (
      SELECT src, dst FROM ({ORACLE_SQL["q173_knn_graph"]})
      WHERE mutual
    ), und AS (
      SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
      FROM edges
    ), adj AS (
      SELECT u, v FROM und
      UNION ALL
      SELECT v AS u, u AS v FROM und
    ), deg AS (
      SELECT u AS z, count(*) AS dg FROM adj GROUP BY 1
    ), w AS (
      SELECT z, round(1.0 / ln(cast(dg AS DOUBLE)), 6) AS wz
      FROM deg WHERE dg >= 2
    ), nb AS (
      SELECT adj.u AS z, adj.v AS n, w.wz
      FROM adj JOIN w ON adj.u = w.z
    ), wedges AS (
      SELECT a.n AS id_a, b.n AS id_b, a.wz
      FROM nb a JOIN nb b ON a.z = b.z AND a.n < b.n
    ), non_edges AS (
      SELECT wd.id_a, wd.id_b, wd.wz
      FROM wedges wd
      LEFT JOIN und ON und.u = wd.id_a AND und.v = wd.id_b
      WHERE und.u IS NULL
    ), scored AS (
      SELECT id_a, id_b, cast(count(*) AS BIGINT) AS common,
             round(cast(sum(cast(round(wz * 1e6) AS BIGINT))
                        AS BIGINT) / 1e6, 6) AS score
      FROM non_edges GROUP BY 1, 2
    )
    SELECT id_a, id_b, common, score
    FROM scored
    ORDER BY score DESC, id_a ASC, id_b ASC
    LIMIT 20
"""


# q322: transitive closure of the q305 edit-distance pairs — embeds
# the q305 oracle text (pair substrate cannot drift) + the q47
# recursive-CTE min-label closure.
ORACLE_SQL["q322_editdist_clusters"] = f"""
    WITH RECURSIVE pairs AS (
      SELECT id_a, id_b FROM ({ORACLE_SQL["q305_editdist_neardup"]})
    ), edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ), reach(node, comp) AS (
      SELECT DISTINCT s, s FROM edges
      UNION
      SELECT e.d, r.comp FROM reach r JOIN edges e ON e.s = r.node
    ), comp AS (
      SELECT node, min(comp) AS cluster_id FROM reach GROUP BY 1
    )
    SELECT node AS doc_id, cluster_id,
           cast(count(*) OVER (PARTITION BY cluster_id) AS INTEGER)
             AS cluster_size
    FROM comp
    ORDER BY doc_id
"""
