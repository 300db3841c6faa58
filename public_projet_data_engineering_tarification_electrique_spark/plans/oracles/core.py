"""DuckDB oracle SQL — the core dict (q01 onward, literal entries).

Every string here is the ANSI-SQL twin of a registered Spark query:
the driver runs both at sf0.01 and compares row counts, schemas, and
value hashes exactly (tests/oracle_utils). Keep each oracle's float
op sequence IDENTICAL to its Spark plan (see PLANS.md and the
exactness recipes in the repo docs) — a drifted sibling expression is
a parity break, not a style choice.

Split out of plans/registry.py in round 11 (VERDICT r10 item 6) so
the query plans stay reviewable; entries are verbatim. Computed and
cross-referencing oracles (f-strings over other entries, generated
SQL) remain in registry.py next to their helpers.
"""

from ...functions import text as X
from ..constants import ALPHA_YEAR, RUN_DATE

_DOMAIN_CTES = f"""
requests AS (
  SELECT r_name AS libelle_region, c_name AS nom_commune,
         cast(c_custkey AS VARCHAR) AS code_commune,
         cast(1 + c_custkey % 5 AS INTEGER) AS nb_personne,
         cast(50 + (c_custkey % 10) * 15 AS INTEGER) AS nb_m2
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
),
daily AS (
  SELECT r_name AS libelle_region, cast(ts AS DATE) AS date,
         round(avg(value) * 100, 4) AS conso_mwh
  FROM events JOIN region ON cast(user_id % 5 AS INTEGER) = r_regionkey
  GROUP BY 1, 2
),
annual AS (
  SELECT c_name AS nom_commune, cast(o_custkey AS VARCHAR) AS code_commune,
         cast(year(o_orderdate) AS INTEGER) AS annee,
         round(avg(o_totalprice) / 1000 + 1e-9, 4) AS conso_moyenne_mwh
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2, 3
)
"""

_STOP_SQL = "['" + "', '".join(X.STOPWORDS) + "']"


#: q94 (batch) and q98 (streaming) score the SAME salted requests and
#: must stay in lockstep — one oracle text serves both keys.
_SALTED_SERVING_ORACLE = f"""
        WITH {_DOMAIN_CTES},
        salted AS (
          SELECT CASE WHEN cast(code_commune AS BIGINT) % 41 = 1
                      THEN 'ATLANTIS' ELSE libelle_region END
                   AS libelle_region,
                 CASE WHEN cast(code_commune AS BIGINT) % 41 = 2
                      THEN 'UNKNOWN-' || nom_commune ELSE nom_commune END
                   AS nom_commune,
                 code_commune, nb_personne,
                 CASE WHEN cast(code_commune AS BIGINT) % 41 = 0
                      THEN NULL ELSE nb_m2 END AS nb_m2
          FROM requests
        ), region_avg AS (
          SELECT libelle_region, round(avg(conso_mwh), 4) AS conso30
          FROM daily
          WHERE date >= DATE '{RUN_DATE}' - 30 AND date <= DATE '{RUN_DATE}'
          GROUP BY 1
        ), led AS (
          SELECT nom_commune, code_commune, annee, conso_moyenne_mwh,
                 lead(conso_moyenne_mwh) OVER w AS next_conso,
                 lead(annee) OVER w AS next_annee
          FROM annual
          WHERE annee IN ({ALPHA_YEAR}, {ALPHA_YEAR + 1})
          WINDOW w AS (PARTITION BY nom_commune, code_commune ORDER BY annee)
        ), alpha AS (
          SELECT nom_commune, code_commune,
                 round(least(greatest(next_conso / conso_moyenne_mwh, 1.0),
                             1.3) + 1e-9, 6) AS alpha
          FROM led
          WHERE annee = {ALPHA_YEAR} AND next_annee = {ALPHA_YEAR + 1}
            AND conso_moyenne_mwh IS NOT NULL AND conso_moyenne_mwh <> 0
            AND next_conso IS NOT NULL
        ), scored AS (
          SELECT q.code_commune,
                 CASE WHEN q.libelle_region IS NULL OR q.nom_commune IS NULL
                           OR q.code_commune IS NULL
                           OR q.nb_personne IS NULL OR q.nb_m2 IS NULL
                      THEN 'missing_field'
                      WHEN r.conso30 IS NULL THEN 'unknown_region'
                      WHEN a.alpha IS NULL THEN 'unknown_city'
                      ELSE 'ok' END AS status,
                 a.alpha,
                 round(least(0.05, 0.01 * r.conso30 / 4000.0), 6) AS m_factor,
                 110.0 * q.nb_m2 + 1000.0 * q.nb_personne + 1100.0
                   AS conso_foyer
          FROM salted q
          LEFT JOIN region_avg r USING (libelle_region)
          LEFT JOIN alpha a USING (nom_commune, code_commune)
        )
        SELECT code_commune, status,
               CASE WHEN status = 'ok'
                    THEN round((0.1558 + alpha * m_factor) * conso_foyer
                               + 72.0)
               END AS price
        FROM scored
    """

ORACLE_SQL: dict[str, str] = {
    "q01_trailing_window_avg": f"""
        SELECT round(avg(value), 4) AS avg_value
        FROM events
        WHERE cast(ts AS DATE) >= DATE '{RUN_DATE}' - 10
          AND cast(ts AS DATE) <= DATE '{RUN_DATE}'
          AND event_type = 'click'
    """,
    "q02_groupby_mean": """
        SELECT l_suppkey, cast(year(l_shipdate) AS INTEGER) AS annee,
               round(avg(l_extendedprice) + 1e-9, 4) AS avg_price
        FROM lineitem GROUP BY 1, 2
    """,
    "q03_daily_downsample": """
        SELECT user_id, cast(strftime(ts, '%Y-%m-%d') AS DATE) AS date,
               round(avg(value)) AS conso_mwh
        FROM events GROUP BY 1, 2
    """,
    "q04_filter_project": """
        SELECT l_orderkey, l_partkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <= TIMESTAMP '1997-12-31 00:00:00'
          AND l_returnflag IN ('A', 'R')
          AND l_quantity > 10
    """,
    "q05_union_all": """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        WHERE o_orderstatus = 'F' AND year(o_orderdate) < 1997
        UNION ALL
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        WHERE o_orderstatus = 'O' AND year(o_orderdate) >= 1999
    """,
    "q06_orderby_topk": """
        SELECT p_partkey, p_name, p_retailprice
        FROM part ORDER BY p_retailprice DESC, p_partkey ASC LIMIT 100
    """,
    "q07_alpha_lead": f"""
        WITH yearly AS (
          SELECT o_custkey, cast(year(o_orderdate) AS INTEGER) AS annee,
                 round(avg(o_totalprice) + 1e-9, 4) AS conso
          FROM orders GROUP BY 1, 2
        ), led AS (
          SELECT o_custkey, annee, conso,
                 lead(conso) OVER w AS next_conso,
                 lead(annee) OVER w AS next_annee
          FROM yearly
          WHERE annee IN ({ALPHA_YEAR}, {ALPHA_YEAR + 1})
          WINDOW w AS (PARTITION BY o_custkey ORDER BY annee)
        )
        SELECT o_custkey,
               round(least(greatest(next_conso / conso, 1.0), 1.3) + 1e-9, 6) AS alpha
        FROM led
        WHERE annee = {ALPHA_YEAR} AND next_annee = {ALPHA_YEAR + 1}
          AND conso IS NOT NULL AND conso <> 0 AND next_conso IS NOT NULL
    """,
    "q08_ols_forecast": """
        WITH yearly AS (
          SELECT l_suppkey, cast(year(l_shipdate) AS INTEGER) AS annee,
                 round(avg(l_quantity), 4) AS conso
          FROM lineitem GROUP BY 1, 2
        ), fit AS (
          SELECT l_suppkey,
                 CASE WHEN var_pop(annee) = 0 THEN NULL
                      ELSE covar_pop(annee, conso) / var_pop(annee) END AS slope,
                 avg(conso) AS ybar, avg(annee) AS xbar
          FROM yearly GROUP BY 1
        )
        SELECT l_suppkey, cast(t.annee AS INTEGER) AS annee,
               round(ybar + slope * (t.annee - xbar) + 1e-9, 2) AS prediction
        FROM fit CROSS JOIN (VALUES (2002), (2003), (2004)) t(annee)
    """,
    "q09_price_batch": f"""
        WITH {_DOMAIN_CTES},
        region_avg AS (
          SELECT libelle_region, round(avg(conso_mwh), 4) AS conso30
          FROM daily
          WHERE date >= DATE '{RUN_DATE}' - 30 AND date <= DATE '{RUN_DATE}'
          GROUP BY 1
        ), led AS (
          SELECT nom_commune, code_commune, annee, conso_moyenne_mwh,
                 lead(conso_moyenne_mwh) OVER w AS next_conso,
                 lead(annee) OVER w AS next_annee
          FROM annual
          WHERE annee IN ({ALPHA_YEAR}, {ALPHA_YEAR + 1})
          WINDOW w AS (PARTITION BY nom_commune, code_commune ORDER BY annee)
        ), alpha AS (
          SELECT nom_commune, code_commune,
                 round(least(greatest(next_conso / conso_moyenne_mwh, 1.0), 1.3) + 1e-9, 6)
                   AS alpha
          FROM led
          WHERE annee = {ALPHA_YEAR} AND next_annee = {ALPHA_YEAR + 1}
            AND conso_moyenne_mwh IS NOT NULL AND conso_moyenne_mwh <> 0
            AND next_conso IS NOT NULL
        ), scored AS (
          SELECT q.libelle_region, q.nom_commune, q.code_commune,
                 q.nb_personne, q.nb_m2, r.conso30, a.alpha,
                 110.0 * q.nb_m2 + 1000.0 * q.nb_personne + 1100.0 AS conso_foyer,
                 round(least(0.05, 0.01 * r.conso30 / 4000.0), 6) AS m_factor
          FROM requests q
          LEFT JOIN region_avg r USING (libelle_region)
          LEFT JOIN alpha a USING (nom_commune, code_commune)
        )
        SELECT libelle_region, nom_commune, code_commune, nb_personne, nb_m2,
               conso30, alpha, conso_foyer, m_factor,
               round((0.1558 + alpha * m_factor) * conso_foyer + 72.0) AS price
        FROM scored
    """,
    "q10_bootstrap_annual": """
        WITH raw AS (
          SELECT cast(l_suppkey AS VARCHAR) AS nom_commune,
                 cast(l_suppkey AS VARCHAR) AS code_commune,
                 l_quantity AS conso_moyenne_mwh,
                 cast(year(l_shipdate) AS INTEGER) AS annee,
                 CASE WHEN l_returnflag = 'N' THEN 'RESIDENTIEL' ELSE 'PRO' END
                   AS code_grand_secteur
          FROM lineitem
        ), hist AS (
          SELECT nom_commune, code_commune, annee,
                 round(avg(conso_moyenne_mwh), 4) AS conso_moyenne_mwh
          FROM raw
          WHERE annee IN (1995, 1996, 1997) AND code_grand_secteur = 'RESIDENTIEL'
          GROUP BY 1, 2, 3
        ), fit AS (
          SELECT nom_commune, code_commune,
                 CASE WHEN var_pop(annee) = 0 THEN NULL
                      ELSE covar_pop(annee, conso_moyenne_mwh) / var_pop(annee) END
                   AS slope,
                 avg(conso_moyenne_mwh) AS ybar, avg(annee) AS xbar
          FROM hist GROUP BY 1, 2
        ), fc AS (
          SELECT nom_commune, code_commune,
                 round(ybar + slope * (t.annee - xbar) + 1e-9, 4)
                   AS conso_moyenne_mwh,
                 cast(t.annee AS INTEGER) AS annee
          FROM fit CROSS JOIN (VALUES (1998), (1999)) t(annee)
        )
        SELECT nom_commune, code_commune, conso_moyenne_mwh, annee FROM hist
        UNION ALL
        SELECT nom_commune, code_commune, conso_moyenne_mwh, annee FROM fc
    """,
    "q11_dedup_exact": """
        SELECT min(doc_id) AS doc_id, count(*) AS n_dups
        FROM documents GROUP BY text
    """,
    "q13_ann_cosine_topk": """
        WITH q AS (
          SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
          FROM embeddings WHERE vec_id < 5
        ), c AS (
          SELECT vec_id, embedding::DOUBLE[] AS ce FROM embeddings
        ), sims AS (
          SELECT q.query_id, c.vec_id,
                 round(list_dot_product(qe, ce)
                       / (sqrt(list_dot_product(qe, qe))
                          * sqrt(list_dot_product(ce, ce))), 6) AS sim
          FROM q CROSS JOIN c
        ), ranked AS (
          SELECT query_id, vec_id, sim,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY sim DESC, vec_id ASC) AS rank
          FROM sims
        )
        SELECT query_id, vec_id, sim, cast(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 10
    """,
    "q14_embedding_neardup": """
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                     / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                        * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
                     6) AS sim
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                    / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                       * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
                    6) >= 0.35
    """,
    # q15/q27: the oracle pins the IN-PLAN recall assertion (the Spark
    # side computes recall@k against the exact top-k and emits the
    # boolean; a broken ANN path flips it and fails the hash).
    "q15_lsh_topk": """
        SELECT CAST(5 AS INTEGER) AS n_queries, CAST(10 AS INTEGER) AS k,
               true AS recall_ge_80pct
    """,
    "q27_ivf_topk": """
        SELECT CAST(5 AS INTEGER) AS n_queries, CAST(10 AS INTEGER) AS k,
               true AS recall_ge_60pct
    """,
    # q16: exhaustive exact shingle-Jaccard pairs — the Spark side emits
    # LSH candidates re-verified with the same exact Jaccard, so the
    # sets coincide unless MinHash recall fails (P < 3e-6 per pair at
    # the planted near-dups' j >= 0.8).
    "q16_minhash_dedup": """
        WITH toks AS (
          SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
          FROM documents
        ), sh AS (
          SELECT DISTINCT doc_id, unnest(
            CASE WHEN len(t) >= 3
                 THEN list_transform(range(1, len(t) - 1),
                                     i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
                 ELSE [array_to_string(t, ' ')] END) AS sh
          FROM toks
        ), sizes AS (
          SELECT doc_id, count(*) AS n FROM sh GROUP BY 1
        ), inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               round(i * 1.0 / (sa.n + sb.n - i), 4) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.5
    """,
    "q17_ngram_jaccard": """
        WITH toks AS (
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
        )
        SELECT id_a, id_b,
               round(inter * 1.0 / (sa.n + sb.n - inter), 4) AS jaccard
        FROM inter
        JOIN sizes sa ON id_a = sa.doc_id
        JOIN sizes sb ON id_b = sb.doc_id
        WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.2
    """,
    "q18_lang_quality": f"""
        WITH feats AS (
          SELECT doc_id, lang,
                 string_split_regex(trim(lower(text)), '\\s+') AS toks,
                 length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
                   * 1.0 / length(text) AS punct_ratio
          FROM documents
        ), ratios AS (
          SELECT doc_id, lang, punct_ratio,
                 len(list_filter(toks, x -> x <> '')) AS n_tokens,
                 len(list_filter(toks, x -> list_contains({_STOP_SQL}, x)))
                   * 1.0 / len(toks) AS stop_ratio
          FROM feats
        )
        SELECT doc_id, lang,
               CASE WHEN stop_ratio > 0.04 THEN 'en' ELSE 'unk' END AS pred_lang,
               round(least(1.0, n_tokens / 120.0) * (1.0 - punct_ratio), 4)
                 AS quality
        FROM ratios
    """,
    "q19_streaming_daily": """
        SELECT cast(date_trunc('day', ts) AS DATE) AS date, event_type,
               round(avg(value) + 1e-9, 4) AS avg_value
        FROM events GROUP BY 1, 2
    """,
    "q20_multimodal_meta": """
        SELECT doc_id,
               cast(octet_length(encode(text)) AS INTEGER) AS n_bytes,
               cast(64 + octet_length(encode(text)) % 64 AS INTEGER) AS width,
               cast(64 + (octet_length(encode(text)) // 64) % 64 AS INTEGER)
                 AS height,
               ['png', 'jpg', 'webp'][cast(doc_id % 3 AS INTEGER) + 1] AS format
        FROM documents
    """,
    "q46_sentence_udtf": """
        SELECT doc_id, trim(s) AS sentence,
               cast(len(string_split_regex(trim(s), '\\s+')) AS INTEGER)
                 AS n_words
        FROM (SELECT doc_id, unnest(string_split(text, '.')) AS s
              FROM documents)
        WHERE trim(s) <> ''
    """,
    "q45_session_window": """
        WITH e AS (
          SELECT user_id, value, epoch_ns(ts) // 1000000000 AS ts_s FROM events
        ), flagged AS (
          SELECT user_id, value, ts_s,
                 CASE WHEN lag(ts_s) OVER w IS NULL
                           OR ts_s - lag(ts_s) OVER w > 1800
                      THEN 1 ELSE 0 END AS b
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s)
        ), sess AS (
          SELECT user_id, value, ts_s,
                 sum(b) OVER (PARTITION BY user_id ORDER BY ts_s
                              ROWS UNBOUNDED PRECEDING) AS sid
          FROM flagged
        )
        SELECT user_id, min(ts_s) AS start_s, count(*) AS n_events,
               round(sum(value), 4) AS sum_value
        FROM sess GROUP BY user_id, sid
    """,
    "q44_stream_dedup": """
        SELECT event_id, user_id, event_type, value FROM events
    """,
    "q43_embedding_lsh_neardup": """
        -- DOUBLE[] arithmetic mirroring the Spark side's
        -- array<double> cast (list_cosine_similarity on the raw
        -- FLOAT[] computes — and returns — float32, a latent 3-dp
        -- boundary risk and a dtype-width mismatch); the round(·,6)
        -- then round(·,3) chain matches the operator's sim grid.
        WITH aug AS (
          SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
          UNION ALL
          SELECT vec_id + 10000000000 AS vec_id, embedding::DOUBLE[] AS e
          FROM embeddings
          WHERE vec_id % 10 = 0
        ), pairs AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 round(list_dot_product(a.e, b.e)
                       / (sqrt(list_dot_product(a.e, a.e))
                          * sqrt(list_dot_product(b.e, b.e))), 6) AS sim6
          FROM aug a JOIN aug b ON a.vec_id < b.vec_id
        )
        SELECT id_a, id_b, round(sim6, 3) AS sim
        FROM pairs WHERE sim6 >= 0.9
    """,
    "q41_cube_daily": """
        SELECT event_type, cast(ts AS DATE) AS date,
               count(*) AS n_events, round(avg(value) + 1e-9, 4) AS avg_value
        FROM events
        GROUP BY CUBE (event_type, cast(ts AS DATE))
    """,
    "q42_range_join": """
        WITH e AS (
          SELECT event_id, user_id, event_type,
                 epoch_ns(ts) // 1000000000 AS ts_s
          FROM events
        ), clicks AS (
          SELECT event_id AS click_id, user_id, ts_s FROM e
          WHERE event_type = 'click'
        ), errors AS (
          SELECT event_id, user_id, ts_s FROM e WHERE event_type = 'error'
        )
        SELECT c.click_id, c.user_id, er.event_id AS error_event_id
        FROM clicks c JOIN errors er
          ON c.user_id = er.user_id AND abs(c.ts_s - er.ts_s) <= 3600
    """,
    "q38_token_frequencies": """
        SELECT token, freq FROM (
          SELECT token, count(*) AS freq FROM (
            SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
            FROM documents) t
          WHERE token <> ''
          GROUP BY token HAVING count(*) >= 10) g
        ORDER BY freq DESC, token ASC LIMIT 20
    """,
    "q39_intersect_except": """
        WITH k99 AS (
          SELECT o_custkey FROM orders
          WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
            AND o_orderdate <  TIMESTAMP '2000-01-01 00:00:00'
        ), k00 AS (
          SELECT o_custkey FROM orders
          WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
            AND o_orderdate <  TIMESTAMP '2001-01-01 00:00:00'
        )
        SELECT 'both' AS tag, o_custkey FROM (
          SELECT o_custkey FROM k99 INTERSECT SELECT o_custkey FROM k00)
        UNION ALL
        SELECT 'only_1999' AS tag, o_custkey FROM (
          SELECT o_custkey FROM k99 EXCEPT SELECT o_custkey FROM k00)
    """,
    "q40_latest_event": """
        SELECT user_id,
               arg_max(event_id, ts) AS last_event_id,
               arg_max(event_type, ts) AS last_event_type,
               count(*) AS n_events
        FROM events GROUP BY 1
    """,
    "q36_stats_aggregates": """
        SELECT l_returnflag,
               round(stddev_samp(l_quantity), 4) AS sd_qty,
               round(var_pop(l_quantity), 4) AS var_qty,
               round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
               round(covar_pop(l_quantity, l_extendedprice), 4) AS covar_qty_price,
               count(*) AS n
        FROM lineitem GROUP BY 1
    """,
    "q37_string_funcs": """
        SELECT doc_id,
               upper(substr(text, 1, 12)) AS head_upper,
               cast(length(regexp_replace(lower(text), '[aeiou]', '', 'g'))
                    AS INTEGER) AS len_novowels,
               concat_ws('|', lang, source) AS lang_source,
               CASE WHEN length(text) > 200 THEN 'long' ELSE 'short' END
                 AS size_class,
               trim(substr(text, 1, 5)) AS head_trim
        FROM documents
    """,
    "q34_semi_anti_join": """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
            AND o_orderdate <  TIMESTAMP '2000-01-01 00:00:00')
        AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
            AND o_orderdate <  TIMESTAMP '2001-01-01 00:00:00')
    """,
    "q35_moving_average": """
        WITH daily AS (
          SELECT event_type, cast(ts AS DATE) AS date,
                 round(avg(value) + 1e-9, 4) AS day_avg
          FROM events GROUP BY 1, 2
        )
        SELECT event_type, date, day_avg,
               round(avg(day_avg) OVER (
                 PARTITION BY event_type ORDER BY date
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7
        FROM daily
    """,
    "q33_sql_text": """
        SELECT event_type, round(avg(value), 4) AS avg_value, count(*) AS n
        FROM events GROUP BY event_type
    """,
    "q29_approx_stats": """
        SELECT event_type, count(*) AS n_events,
               count(DISTINCT user_id) AS n_users,
               true AS users_within_5pct, true AS median_within_5pct
        FROM events GROUP BY 1
    """,
    "q30_pivot_daily": """
        SELECT cast(ts AS DATE) AS date,
               round(avg(value) FILTER (event_type = 'click') + 1e-9, 4)
                 AS click,
               round(avg(value) FILTER (event_type = 'view') + 1e-9, 4)
                 AS view,
               round(avg(value) FILTER (event_type = 'purchase') + 1e-9, 4)
                 AS purchase,
               round(avg(value) FILTER (event_type = 'error') + 1e-9, 4)
                 AS error
        FROM events GROUP BY 1
    """,
    "q31_percentiles": """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 4) AS p50,
               round(quantile_cont(value, 0.9), 4) AS p90
        FROM events GROUP BY 1
    """,
    "q32_json_extract": """
        SELECT event_type,
               round(avg(cast(json_extract_string(props, '$.k') AS INTEGER)), 4)
                 AS avg_k,
               max(cast(json_extract_string(props, '$.k') AS INTEGER)) AS max_k,
               count(DISTINCT cast(json_extract_string(props, '$.k') AS INTEGER))
                 AS n_distinct_k
        FROM events GROUP BY 1
    """,
    "q22_sessionize": """
        WITH e AS (
          SELECT event_id, user_id, value,
                 epoch_ns(ts) // 1000000000 AS ts_s
          FROM events
        ), flagged AS (
          SELECT user_id, event_id, value, ts_s,
                 CASE WHEN lag(ts_s) OVER w IS NULL
                           OR ts_s - lag(ts_s) OVER w > 1800
                      THEN 1 ELSE 0 END AS b
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)
        ), sess AS (
          -- CAST: DuckDB sums integers into HUGEINT, which fetchdf()
          -- materializes as float64 (9549.0) while Spark emits int64 —
          -- value-identical but hash-different to the driver's gate.
          SELECT user_id, value, ts_s,
                 CAST(sum(b) OVER (PARTITION BY user_id
                                   ORDER BY ts_s, event_id
                                   ROWS UNBOUNDED PRECEDING)
                      AS BIGINT) AS session_id
          FROM flagged
        )
        SELECT user_id, session_id, count(*) AS n_events,
               min(ts_s) AS start_s, max(ts_s) AS end_s,
               sum(CAST(round(value * 1e4) AS BIGINT)) / 1e4 AS sum_value
        FROM sess GROUP BY 1, 2
    """,
    "q23_rollup_daily": """
        SELECT event_type, cast(ts AS DATE) AS date,
               count(*) AS n_events, round(sum(value), 2) AS sum_value
        FROM events
        GROUP BY ROLLUP (event_type, cast(ts AS DATE))
    """,
    "q24_asof_join": """
        WITH e AS (
          SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us
          FROM events
        ), clicks AS (
          SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'click'
        ), errors AS (
          SELECT event_id, user_id, ts_us, value FROM e WHERE event_type = 'error'
        )
        SELECT c.event_id, c.user_id, c.ts_us,
               e.event_id AS asof_event_id, e.value AS asof_value
        FROM clicks c
        ASOF LEFT JOIN errors e
          ON c.user_id = e.user_id AND c.ts_us >= e.ts_us
    """,
    "q25_rolling_fingerprint": """
        WITH norm AS (
          SELECT doc_id, lower(trim(text)) AS t FROM documents
        )
        SELECT doc_id,
               CASE WHEN length(t) > 0 THEN
                 list_reduce(
                   list_prepend(0::BIGINT,
                     list_transform(range(1, length(t) + 1),
                                    i -> ascii(substr(t, i, 1))::BIGINT)),
                   (acc, c) -> (acc * 131 + c) % 2147483647)
               ELSE 0 END AS rk_fingerprint,
               md5(t) AS md5_fingerprint
        FROM norm
    """,
    "q26_bpe_tokens": """
        SELECT doc_id,
               cast(len(regexp_extract_all(lower(text),
                    ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s]+|\\s+')) AS INTEGER)
                 AS n_bpe_tokens,
               cast(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                    x -> x <> '')) AS INTEGER)
                 AS n_ws_tokens
        FROM documents
    """,
    "q12_text_stats": f"""
        SELECT doc_id,
               cast(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                    x -> x <> '')) AS INTEGER)
                 AS n_tokens,
               cast(length(text) AS INTEGER) AS len_chars,
               round(
                 CASE WHEN len(string_split_regex(trim(lower(text)), '\\s+')) > 0
                      THEN len(list_filter(
                             string_split_regex(trim(lower(text)), '\\s+'),
                             x -> list_contains({_STOP_SQL}, x)))
                           / len(string_split_regex(trim(lower(text)), '\\s+'))
                      ELSE 0.0 END, 4) AS stop_ratio,
               md5(lower(trim(text))) AS fingerprint
        FROM documents
    """,
    # Same pair pipeline as q17 (k=3, threshold 0.2, max_df 100), then
    # transitive closure via a recursive CTE: every node reaches the
    # minimum id of its component, matching min-label propagation.
    "q47_dedup_clusters": """
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
        )
        SELECT node AS doc_id, cluster_id,
               cast(count(*) OVER (PARTITION BY cluster_id) AS INTEGER)
                 AS cluster_size
        FROM comp
    """,
    "q48_hash_split": """
        WITH b AS (
          SELECT lang, n_chars,
                 ('0x' || substr(md5(cast(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   % 100 AS bucket
          FROM documents
        )
        SELECT CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val'
                    ELSE 'test' END AS split,
               lang, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars
        FROM b GROUP BY 1, 2
    """,
    "q49_topk_per_group": """
        WITH totals AS (
          SELECT event_type, user_id, round(sum(value), 4) AS total_value
          FROM events GROUP BY 1, 2
        ), ranked AS (
          SELECT event_type, user_id, total_value,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY total_value DESC, user_id ASC)
                   AS rank
          FROM totals
        )
        SELECT event_type, user_id, total_value, cast(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 3
    """,
    "q50_stratified_sample": """
        WITH b AS (
          SELECT doc_id, lang, source,
                 ('0x' || substr(md5(cast(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   % 10000 AS bucket
          FROM documents
        )
        SELECT doc_id, lang, source FROM b
        WHERE bucket < (CASE lang WHEN 'en' THEN 1000
                                  WHEN 'zh' THEN 5000
                                  WHEN 'es' THEN 5000
                                  WHEN 'de' THEN 5000
                                  WHEN 'fr' THEN 5000
                                  ELSE 0 END)
    """,
    "q51_tfidf_topterms": """
        WITH toks AS (
          SELECT doc_id,
                 unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
          FROM documents
        ), tf AS (
          SELECT doc_id, token, count(*) AS tf
          FROM toks WHERE token <> '' GROUP BY 1, 2
        ), dfreq AS (
          SELECT token, count(*) AS df FROM tf GROUP BY 1
        ), n AS (
          SELECT count(*) AS n_docs FROM documents
        ), scored AS (
          SELECT tf.doc_id, tf.token, tf.tf,
                 round(tf.tf * (ln((n.n_docs + 1.0) / (dfreq.df + 1.0)) + 1.0),
                       4) AS tfidf
          FROM tf JOIN dfreq USING (token) CROSS JOIN n
        )
        SELECT doc_id, token, cast(tf AS INTEGER) AS tf, tfidf,
               cast(row_number() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, token ASC)
                    AS INTEGER) AS rank
        FROM scored QUALIFY rank <= 3
    """,
    "q52_pack_chunks": """
        WITH toks AS (
          SELECT source, doc_id,
                 len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                 x -> x <> '')) AS n_tok
          FROM documents
        ), spans AS (
          SELECT source, doc_id, n_tok,
                 cast(coalesce(sum(n_tok) OVER (
                          PARTITION BY source ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS BIGINT) AS s
          FROM toks WHERE n_tok > 0
        ), covered AS (
          SELECT source,
                 unnest(range(s // 512, (s + n_tok - 1) // 512 + 1))
                   AS chunk_id,
                 s, n_tok
          FROM spans
        )
        SELECT source, cast(chunk_id AS INTEGER) AS chunk_id,
               cast(count(*) AS INTEGER) AS n_docs,
               cast(sum(least(s + n_tok, (chunk_id + 1) * 512)
                        - greatest(s, chunk_id * 512)) AS INTEGER)
                 AS n_tokens
        FROM covered GROUP BY 1, 2
    """,
    "q53_constraint_audit": """
        SELECT 'orders_null_custkey' AS rule, count(*) AS n_violations
        FROM orders WHERE o_custkey IS NULL
        UNION ALL
        SELECT 'orders_nonpositive_total', count(*)
        FROM orders WHERE o_totalprice <= 0
        UNION ALL
        SELECT 'orders_duplicate_orderkey', count(*) FROM (
          SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1)
        UNION ALL
        SELECT 'lineitem_orphan_orderkey', count(*) FROM lineitem
        WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        UNION ALL
        SELECT 'orders_orphan_custkey', count(*) FROM orders
        WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
        UNION ALL
        SELECT 'lineitem_discount_range', count(*) FROM lineitem
        WHERE l_discount < 0 OR l_discount > 0.5
        UNION ALL
        SELECT 'customer_negative_acctbal', count(*) FROM customer
        WHERE c_acctbal < 0
    """,
    "q54_decontamination": """
        WITH b AS (
          SELECT doc_id, text,
                 ('0x' || substr(md5(cast(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   % 100 AS bucket
          FROM documents
        ), split AS (
          SELECT doc_id, text,
                 CASE WHEN bucket < 80 THEN 'train'
                      WHEN bucket < 90 THEN 'val'
                      ELSE 'test' END AS split
          FROM b
        ), toks AS (
          SELECT doc_id, split,
                 string_split_regex(trim(lower(text)), '\\s+') AS t
          FROM split
        ), sh AS (
          SELECT DISTINCT doc_id, split, unnest(
            CASE WHEN len(t) >= 5
                 THEN list_transform(range(1, len(t) - 3),
                        i -> concat_ws(' ', t[i], t[i+1], t[i+2],
                                       t[i+3], t[i+4]))
                 ELSE [array_to_string(t, ' ')] END) AS sh
          FROM toks
        ), contaminated AS (
          SELECT split, count(DISTINCT doc_id) AS n_contaminated
          FROM sh s
          WHERE split <> 'train' AND EXISTS (
            SELECT 1 FROM sh tr WHERE tr.split = 'train' AND tr.sh = s.sh)
          GROUP BY 1
        ), totals AS (
          SELECT split, count(*) AS n_docs FROM split
          WHERE split <> 'train' GROUP BY 1
        )
        SELECT t.split, t.n_docs, coalesce(c.n_contaminated, 0) AS n_contaminated
        FROM totals t LEFT JOIN contaminated c USING (split)
    """,
    "q55_repetition_filters": """
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                             x -> x <> '') AS toks
          FROM documents
        ), big AS (
          SELECT doc_id, toks, len(toks) AS n,
                 CASE WHEN len(toks) >= 2
                      THEN list_transform(range(1, len(toks)),
                             i -> concat_ws(' ', toks[i], toks[i+1]))
                      ELSE [] END AS bigrams
          FROM t
        )
        SELECT doc_id, cast(n AS INTEGER) AS n_tokens,
               CASE WHEN n > 0
                    THEN round(1.0 - len(list_distinct(toks)) * 1.0 / n, 4)
                    ELSE 0.0 END AS frac_dup_tokens,
               CASE WHEN n - 1 > 0
                    THEN round(1.0 - len(list_distinct(bigrams)) * 1.0
                               / (n - 1), 4)
                    ELSE 0.0 END AS frac_dup_bigrams,
               CASE WHEN n > 0
                    THEN round(list_aggregate(
                           list_transform(toks, x -> len(x)), 'sum')
                           * 1.0 / n, 4)
                    ELSE 0.0 END AS mean_word_len,
               (CASE WHEN n - 1 > 0
                     THEN round(1.0 - len(list_distinct(bigrams)) * 1.0
                                / (n - 1), 4)
                     ELSE 0.0 END) <= 0.05
               AND (CASE WHEN n > 0
                         THEN round(list_aggregate(
                                list_transform(toks, x -> len(x)), 'sum')
                                * 1.0 / n, 4)
                         ELSE 0.0 END) BETWEEN 3.0 AND 10.0 AS keep
        FROM big
    """,
    "q56_mixture_plan": """
        WITH counts AS (
          SELECT source, count(*) AS n_docs FROM documents GROUP BY 1
        ), w AS (
          SELECT source, n_docs,
                 CASE WHEN regexp_extract(source, 'src(\\d+)', 1)::INT % 2 = 1
                      THEN 3 ELSE 1 END AS w
          FROM counts
        ), g AS (
          SELECT *, cast(sum(w) OVER () AS BIGINT) AS sumw FROM w
        ), t AS (
          SELECT *, cast(min(n_docs * sumw // w) OVER () AS BIGINT) AS t
          FROM g
        )
        SELECT source, cast(n_docs AS INTEGER) AS n_docs,
               round(w * 1.0 / sumw, 4) AS target_share,
               cast(w * t // sumw AS INTEGER) AS take_n,
               round((w * t // sumw) * 1.0 / n_docs, 4) AS rate
        FROM t
    """,
    "q57_top_quality": f"""
        WITH feats AS (
          SELECT doc_id, lang,
                 string_split_regex(trim(lower(text)), '\\s+') AS toks,
                 length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
                   * 1.0 / length(text) AS punct_ratio
          FROM documents
        ), ratios AS (
          SELECT doc_id, lang, punct_ratio,
                 len(list_filter(toks, x -> x <> '')) AS n_tokens,
                 len(list_filter(toks, x -> list_contains({_STOP_SQL}, x)))
                   * 1.0 / len(toks) AS stop_ratio
          FROM feats
        ), scored AS (
          SELECT doc_id, lang,
                 CASE WHEN stop_ratio > 0.04 THEN 'en' ELSE 'unk' END
                   AS pred_lang,
                 round(least(1.0, n_tokens / 120.0) * (1.0 - punct_ratio), 4)
                   AS quality
          FROM ratios
        ), hist AS (
          SELECT quality, count(*) AS n FROM scored GROUP BY 1
        ), cum AS (
          SELECT quality,
                 cast(sum(n) OVER (ORDER BY quality DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS c
          FROM hist
        ), tot AS (
          SELECT count(*) AS total FROM scored
        ), thr AS (
          SELECT max(quality) AS threshold FROM cum, tot
          WHERE c * 10 >= 3 * total
        )
        SELECT s.doc_id, s.lang, s.pred_lang, s.quality, t.threshold
        FROM scored s, thr t WHERE s.quality >= t.threshold
    """,
    "q58_curation_pipeline": """
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                             x -> x <> '') AS toks
          FROM documents
        ), big AS (
          SELECT doc_id, toks, len(toks) AS n,
                 CASE WHEN len(toks) >= 2
                      THEN list_transform(range(1, len(toks)),
                             i -> concat_ws(' ', toks[i], toks[i+1]))
                      ELSE [] END AS bigrams
          FROM t
        ), kept AS (
          SELECT doc_id, n FROM big
          WHERE (CASE WHEN n - 1 > 0
                      THEN round(1.0 - len(list_distinct(bigrams)) * 1.0
                                 / (n - 1), 4)
                      ELSE 0.0 END) <= 0.05
            AND (CASE WHEN n > 0
                      THEN round(list_aggregate(
                             list_transform(toks, x -> len(x)), 'sum')
                             * 1.0 / n, 4)
                      ELSE 0.0 END) BETWEEN 3.0 AND 10.0
        ), b AS (
          SELECT n,
                 ('0x' || substr(md5(cast(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   % 100 AS bucket
          FROM kept
        )
        SELECT CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val'
                    ELSE 'test' END AS split,
               cast(count(*) AS INTEGER) AS n_docs,
               cast(sum(n) AS BIGINT) AS n_tokens
        FROM b GROUP BY 1
    """,
    "q59_tpch_local_supplier_volume": """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
                     AND s_nationkey = c_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    "q60_tpch_shipping_priority": """
        SELECT l_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               o_orderpriority,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-06-30'
          AND l_shipdate > TIMESTAMP '1997-06-30'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    "q61_change_compaction": """
        WITH w AS (
          SELECT user_id, epoch_us(ts) AS ts_us,
                 CAST(floor(value) AS INTEGER) AS v,
                 lag(CAST(floor(value) AS INTEGER)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS pv
          FROM events
        )
        SELECT user_id, ts_us, v FROM w WHERE pv IS NULL OR v <> pv
    """,
    "q62_gap_fill_ffill": """
        WITH daily AS (
          SELECT user_id, date_trunc('day', ts) AS day,
                 round(avg(value) + 1e-9, 4) AS obs
          FROM events WHERE event_type = 'error' GROUP BY 1, 2
        ), span AS (
          SELECT user_id, min(day) AS lo, max(day) AS hi
          FROM daily GROUP BY 1
        ), grid AS (
          SELECT user_id,
                 unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
          FROM span
        ), j AS (
          SELECT g.user_id, g.day, d.obs
          FROM grid g LEFT JOIN daily d
            ON g.user_id = d.user_id AND g.day = d.day
        )
        SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
               last_value(obs IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v,
               (obs IS NULL) AS was_gap
        FROM j
    """,
    "q63_reaggregatable_partials": """
        WITH daily AS (
          SELECT user_id, date_trunc('day', ts) AS day,
                 sum(value) AS psum, count(*) AS pcnt
          FROM events GROUP BY 1, 2
        )
        SELECT user_id, strftime(day, '%Y-%m') AS month,
               round(sum(psum) / sum(pcnt) + 1e-9, 4) AS mean_value,
               CAST(sum(pcnt) AS BIGINT) AS n_events
        FROM daily GROUP BY 1, 2
    """,
    "q64_funnel_conversion": """
        WITH u AS (
          SELECT user_id,
                 min(epoch_us(ts)) FILTER (event_type = 'signup') AS s,
                 min(epoch_us(ts)) FILTER (event_type = 'purchase') AS p
          FROM events GROUP BY 1
        )
        SELECT CAST(count(*) AS INTEGER) AS n_users,
               CAST(count(*) FILTER (s IS NOT NULL) AS INTEGER) AS n_signup,
               CAST(count(*) FILTER (s IS NOT NULL AND p > s)
                    AS INTEGER) AS n_converted,
               round(100.0 * count(*) FILTER (s IS NOT NULL AND p > s)
                     / count(*) FILTER (s IS NOT NULL), 2) AS conv_pct
        FROM u
    """,
    "q65_retention_cohorts": """
        WITH e AS (
          SELECT user_id, date_trunc('day', ts) AS day FROM events
        ), c AS (
          SELECT user_id, day,
                 min(day) OVER (PARTITION BY user_id) AS cday
          FROM e
        )
        SELECT strftime(cday, '%Y-%m-%d') AS cohort_day,
               CAST(date_diff('day', cday, day) AS INTEGER) AS day_offset,
               CAST(count(DISTINCT user_id) AS INTEGER) AS n_users
        FROM c GROUP BY 1, 2
    """,
    "q66_hopping_window": """
        WITH e AS (
          SELECT date_trunc('day', ts) AS day, event_type, value
          FROM events
        ), x AS (
          SELECT day - unnest(generate_series(0, 6)) * INTERVAL 1 DAY
                   AS win_start,
                 event_type, value
          FROM e
        )
        SELECT strftime(win_start, '%Y-%m-%d') AS win_start, event_type,
               CAST(count(*) AS INTEGER) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM x GROUP BY 1, 2
    """,
    "q67_period_over_period": """
        WITH daily AS (
          SELECT event_type, date_trunc('day', ts) AS day,
                 round(sum(value), 2) AS v
          FROM events GROUP BY 1, 2
        )
        SELECT event_type, strftime(day, '%Y-%m-%d') AS day, v,
               round(100.0 * (v - lag(v, 7) OVER w) / lag(v, 7) OVER w, 2)
                 AS wow_pct
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day)
    """,
    "q68_zscore_anomaly": """
        WITH daily AS (
          SELECT user_id, date_trunc('day', ts) AS day,
                 round(avg(value) + 1e-9, 4) AS m
          FROM events GROUP BY 1, 2
        ), scored AS (
          SELECT user_id, day, m,
                 round((m - avg(m) OVER w) / stddev_samp(m) OVER w, 2) AS z
          FROM daily
          WINDOW w AS (PARTITION BY user_id ORDER BY day
                       ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
        )
        SELECT user_id, strftime(day, '%Y-%m-%d') AS day, m, z
        FROM scored WHERE abs(z) > 2.0
    """,
    "q69_label_centroids": """
        -- dims derived from the data via zipped unnests (q117's
        -- convention), matching the Spark side's posexplode — never a
        -- hardcoded embedding width
        WITH dims AS (
          SELECT label,
                 unnest(range(0, len(embedding))) AS i,
                 unnest(embedding) AS x
          FROM embeddings
        )
        SELECT label, CAST(i AS INTEGER) AS dim,
               round(avg(x) + 1e-9, 4) AS c,
               CAST(count(*) AS INTEGER) AS n_vecs
        FROM dims
        GROUP BY 1, 2
    """,
    "q70_dau_wau_stickiness": """
        WITH ud AS (
          SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
        ), dau AS (
          SELECT day, count(DISTINCT user_id) AS dau FROM ud GROUP BY 1
        ), wx AS (
          SELECT user_id,
                 day + unnest(generate_series(0, 6)) * INTERVAL 1 DAY AS day
          FROM ud
        ), wau AS (
          SELECT day, count(DISTINCT user_id) AS wau FROM wx GROUP BY 1
        )
        SELECT strftime(d.day, '%Y-%m-%d') AS day,
               CAST(d.dau AS INTEGER) AS dau,
               CAST(w.wau AS INTEGER) AS wau,
               round(CAST(d.dau AS DOUBLE) / w.wau + 1e-9, 4) AS stickiness
        FROM dau d JOIN wau w ON d.day = w.day
    """,
    "q71_transition_matrix": """
        WITH s AS (
          SELECT event_type,
                 lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS from_type
          FROM events
        )
        SELECT from_type, event_type AS to_type,
               CAST(count(*) AS INTEGER) AS n
        FROM s WHERE from_type IS NOT NULL GROUP BY 1, 2
    """,
    "q72_value_quartile_bands": """
        WITH totals AS (
          SELECT user_id, round(sum(value) + 1e-9, 2) AS total
          FROM events GROUP BY 1
        ), banded AS (
          SELECT total,
                 CAST(ntile(4) OVER (ORDER BY total DESC, user_id)
                      AS INTEGER) AS band
          FROM totals
        )
        SELECT band, CAST(count(*) AS INTEGER) AS n_users,
               round(avg(total) + 1e-9, 4) AS avg_total,
               min(total) AS min_total, max(total) AS max_total
        FROM banded GROUP BY 1
    """,
    "q73_time_to_convert": """
        WITH u AS (
          SELECT user_id,
                 min(epoch_us(ts)) FILTER (event_type = 'signup') AS s,
                 min(epoch_us(ts)) FILTER (event_type = 'purchase') AS p
          FROM events GROUP BY 1
        )
        SELECT CAST(least((p - s) // 3600000000, 24) AS INTEGER)
                 AS hours_to_convert,
               CAST(count(*) AS INTEGER) AS n_users
        FROM u WHERE s IS NOT NULL AND p > s GROUP BY 1
    """,
    "q74_tpch_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2)
                 AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                 AS sum_charge,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_extendedprice) + 1e-9, 4) AS avg_price,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q75_tpch_revenue_change": """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "q76_skew_salted_agg": """
        SELECT event_type,
               count(*) AS n_events,
               round(sum(value), 2) AS sum_value,
               round(sum(value) / count(*), 4) AS avg_value
        FROM events
        GROUP BY event_type
    """,
    "q77_scd2_intervals": """
        WITH w AS (
          SELECT user_id, ts, event_id, CAST(floor(value) AS INTEGER) AS v,
                 lag(CAST(floor(value) AS INTEGER)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS pv
          FROM events
        ), c AS (
          SELECT user_id, ts, event_id, v FROM w WHERE pv IS NULL OR v <> pv
        )
        SELECT user_id,
               epoch_us(ts) AS valid_from_us,
               epoch_us(lead(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id))
                 AS valid_to_us,
               v,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 IS NULL AS is_current
        FROM c
    """,
    "q78_full_outer_reconcile": """
        WITH daily AS (
          SELECT cast(ts AS DATE) AS date, event_type, count(*) AS n
          FROM events WHERE event_type IN ('click', 'purchase')
          GROUP BY 1, 2
        ), c AS (
          SELECT date, n AS n_clicks FROM daily WHERE event_type = 'click'
        ), p AS (
          SELECT date, n AS n_purchases FROM daily
          WHERE event_type = 'purchase'
        )
        SELECT strftime(coalesce(c.date, p.date), '%Y-%m-%d') AS date,
               coalesce(n_clicks, 0) AS n_clicks,
               coalesce(n_purchases, 0) AS n_purchases,
               CASE WHEN n_clicks IS NULL THEN 'purchases_only'
                    WHEN n_purchases IS NULL THEN 'clicks_only'
                    ELSE 'both' END AS status
        FROM c FULL OUTER JOIN p ON c.date = p.date
    """,
    "q79_grouping_sets": """
        SELECT event_type,
               strftime(cast(ts AS DATE), '%Y-%m-%d') AS day,
               CAST(grouping(event_type) * 2 + grouping(cast(ts AS DATE))
                    AS INTEGER) AS gid,
               count(*) AS n,
               round(sum(value), 2) AS sum_value
        FROM events
        GROUP BY GROUPING SETS ((event_type, cast(ts AS DATE)), (event_type),
                                (cast(ts AS DATE)))
    """,
    "q80_embedding_quantize": """
        WITH m AS (
          -- cast to DOUBLE: Spark promotes float32→float64 in arithmetic;
          -- DuckDB would otherwise stay in float32 and round() is a no-op
          SELECT vec_id, embedding,
                 CAST(list_max(list_transform(embedding, x -> abs(x)))
                      AS DOUBLE) AS m
          FROM embeddings
        ), q AS (
          SELECT vec_id, len(embedding) AS n_dims,
                 CASE WHEN m > 0 THEN round(127.0 / m, 6)
                      ELSE 0.0 END AS scale_inv,
                 CASE WHEN m > 0
                      THEN list_transform(embedding,
                             x -> round(CAST(x AS DOUBLE) * (127.0 / m), 0))
                      ELSE list_transform(embedding,
                             x -> CAST(x AS DOUBLE) * 0.0)
                 END AS qv
          FROM m
        )
        -- CASTs: list_aggregate('sum') over BIGINT yields HUGEINT →
        -- float64 via fetchdf(); len() yields BIGINT where Spark's
        -- size() is int32. Width/kind-match what Spark emits.
        SELECT vec_id, CAST(n_dims AS INTEGER) AS n_dims, scale_inv,
               CAST(list_aggregate(list_transform(qv,
                 x -> abs(CAST(x AS BIGINT))), 'sum') AS BIGINT) AS q_l1,
               CAST(list_aggregate(list_transform(qv,
                 x -> CAST(x AS BIGINT)), 'sum') AS BIGINT) AS q_sum
        FROM q
    """,
    "q81_chunk_overlap": """
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                             x -> x <> '') AS toks
          FROM documents
        ), s AS (
          SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0
        ), c AS (
          SELECT doc_id, toks, n,
                 unnest(range(1, greatest(1, n - 64 + 48) + 1, 48))
                   AS start_tok
          FROM s
        )
        SELECT doc_id,
               CAST((start_tok - 1) // 48 AS INTEGER) AS chunk_id,
               CAST(start_tok AS INTEGER) AS start_tok,
               CAST(least(64, n - start_tok + 1) AS INTEGER) AS chunk_tokens,
               substr(md5(array_to_string(
                 list_slice(toks, start_tok, least(start_tok + 63, n)), ' ')),
                 1, 8) AS chunk_fp
        FROM c
    """,
    "q82_pseudonymize": """
        SELECT md5('pepper1:' || CAST(user_id AS VARCHAR)) AS user_token,
               count(*) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM events
        GROUP BY user_id
    """,
    "q83_semantic_curation": """
        WITH RECURSIVE base AS (
          SELECT vec_id AS id, label AS bk, embedding::DOUBLE[] AS v,
                 sqrt(list_dot_product(embedding::DOUBLE[],
                                       embedding::DOUBLE[])) AS n
          FROM embeddings
        ), stride AS (
          -- fallback anchor = min VALID id (mirrors the Spark side's
          -- positive-norm guard; identical on any corpus with no
          -- null/zero embeddings, such as this table)
          SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS s,
                 min(CASE WHEN n > 0 THEN id END) AS mid
          FROM base
        ), anchors AS (
          SELECT id AS aid, v AS av, n AS an
          FROM base, stride
          WHERE ('0x' || substring(md5(CAST(id AS VARCHAR)), 1, 6))::BIGINT
                  % s = 0
             OR id = mid
        ), probes AS (
          SELECT id, bk, aid, v, n FROM (
            SELECT b.id, b.bk, a.aid, b.v, b.n,
                   row_number() OVER (
                     PARTITION BY b.id
                     ORDER BY round(list_dot_product(b.v, a.av)
                                    / (b.n * a.an) + 1e-9, 4) DESC,
                              a.aid ASC) AS p
            FROM base b CROSS JOIN anchors a)
          WHERE p <= 6
        ), pairs AS (
          SELECT DISTINCT pa.id AS id_a, pb.id AS id_b,
                 round(list_dot_product(pa.v, pb.v) / (pa.n * pb.n), 6)
                   AS sim
          FROM probes pa JOIN probes pb
            ON pa.bk = pb.bk AND pa.aid = pb.aid AND pa.id < pb.id
          WHERE round(list_dot_product(pa.v, pb.v) / (pa.n * pb.n), 6)
                  >= 0.35
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
        ), quality AS (
          SELECT doc_id,
                 round(least(1.0, len(list_filter(
                           string_split_regex(trim(lower(text)), '\\s+'),
                           x -> x <> '')) / 120.0)
                       * (1.0 - length(regexp_replace(lower(text),
                                                      '[a-z0-9 ]', '', 'g'))
                              * 1.0 / length(text)), 4) AS quality
          FROM documents
        ), members AS (
          SELECT c.cluster_id, c.node, q.quality,
                 cast(count(*) OVER (PARTITION BY c.cluster_id) AS INTEGER)
                   AS cluster_size,
                 row_number() OVER (PARTITION BY c.cluster_id
                                    ORDER BY q.quality DESC, c.node ASC)
                   AS rk
          FROM comp c JOIN quality q ON c.node = q.doc_id
        )
        SELECT cluster_id, node AS kept_doc_id, quality AS kept_quality,
               cluster_size
        FROM members WHERE rk = 1
    """,
    "q84_inverted_index": """
        WITH toks AS (
          SELECT DISTINCT doc_id,
                 unnest(list_filter(
                   string_split_regex(trim(lower(text)), '\\s+'),
                   x -> x <> '')) AS token
          FROM documents
        )
        SELECT token,
               array_to_string(list_sort(list(doc_id)), ',') AS postings,
               CAST(count(*) AS INTEGER) AS df
        FROM toks GROUP BY token HAVING count(*) >= 20
    """,
    "q85_winsorize": """
        WITH b AS (
          SELECT event_type,
                 quantile_cont(value, 0.05) AS lo,
                 quantile_cont(value, 0.99) AS hi
          FROM events GROUP BY 1
        )
        SELECT e.event_type,
               count(*) AS n,
               count(*) FILTER (value < lo) AS n_clipped_low,
               count(*) FILTER (value > hi) AS n_clipped_high,
               round(avg(value), 4) AS mean_raw,
               round(avg(least(greatest(value, lo), hi)), 4)
                 AS mean_winsorized
        FROM events e JOIN b USING (event_type)
        GROUP BY e.event_type
    """,
    "q86_cdc_upsert_apply": """
        WITH o AS (
          SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        ), changes AS (
          SELECT o_orderkey,
                 CASE WHEN o_orderkey % 10 = 0 THEN 'U' ELSE 'D' END AS op,
                 round(o_totalprice * 1.1 + 1e-9, 2) AS new_price
          FROM o WHERE o_orderkey % 10 < 2
          UNION ALL
          SELECT o_orderkey + 10000000000, 'I', round(o_totalprice, 2)
          FROM o WHERE o_orderkey % 1000 = 2
        )
        SELECT coalesce(o.o_orderkey, c.o_orderkey) AS o_orderkey,
               CASE WHEN c.op IN ('U', 'I') THEN c.new_price
                    ELSE round(o.o_totalprice, 2) END AS o_totalprice,
               coalesce(o.o_orderstatus, 'N') AS o_orderstatus
        FROM o FULL OUTER JOIN changes c ON o.o_orderkey = c.o_orderkey
        WHERE coalesce(c.op, 'keep') <> 'D'
    """,
    "q87_distribution_windows": """
        WITH per_nation AS (
          SELECT c_nationkey, round(avg(c_acctbal), 4) AS avg_acctbal
          FROM customer GROUP BY 1
        )
        SELECT n_name, avg_acctbal,
               CAST(dense_rank() OVER w AS INTEGER) AS rk,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume
        FROM per_nation JOIN nation ON c_nationkey = n_nationkey
        WINDOW w AS (ORDER BY avg_acctbal DESC)
    """,
    "q88_frame_sample": """
        -- documents.text is pure printable ASCII (verified both SFs),
        -- so utf-8 payload bytes == characters and substr == slicing
        WITH f AS (
          SELECT doc_id, text,
                 least(greatest(1, length(text) // 64), 8) AS n
          FROM documents
        ), e AS (
          SELECT doc_id, text, unnest(range(0, n)) AS frame_idx FROM f
        )
        SELECT doc_id,
               CAST(frame_idx AS INTEGER) AS frame_idx,
               md5(substr(text, CAST(frame_idx * 64 + 1 AS INTEGER), 64))
                 AS frame_md5,
               CAST(length(substr(text, CAST(frame_idx * 64 + 1 AS INTEGER),
                                  64)) AS INTEGER) AS frame_len
        FROM e
    """,
    "q89_byte_histogram": """
        WITH chars AS (
          SELECT doc_id, text,
                 unnest(range(1, length(text) + 1)) AS i
          FROM documents
        )
        SELECT doc_id,
               CAST(ord(substr(text, CAST(i AS INTEGER), 1)) // 4
                    AS INTEGER) AS bin,
               count(*) AS n
        FROM chars
        GROUP BY 1, 2
    """,
    "q90_pandas_udf_scalar": """
        SELECT event_type,
               round(avg(sqrt(abs(value))), 4) AS mean_sqrt_value,
               count(*) AS n
        FROM events
        GROUP BY event_type
    """,
    "q91_stream_static_join": """
        WITH dim(event_type, stage) AS (
          VALUES ('view', 'awareness'), ('click', 'engagement'),
                 ('signup', 'conversion'), ('purchase', 'conversion'),
                 ('error', 'ops')
        )
        SELECT cast(date_trunc('day', ts) AS DATE) AS date, stage,
               count(*) AS n, round(avg(value) + 1e-9, 4) AS avg_value
        FROM events JOIN dim USING (event_type)
        GROUP BY 1, 2
    """,
    "q28_stream_sessionize": """
        WITH e AS (
          SELECT event_id, user_id, value,
                 epoch_ns(ts) // 1000000000 AS ts_s
          FROM events
        ), flagged AS (
          SELECT user_id, event_id, value, ts_s,
                 CASE WHEN lag(ts_s) OVER w IS NULL
                           OR ts_s - lag(ts_s) OVER w > 1800
                      THEN 1 ELSE 0 END AS b
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)
        ), sess AS (
          -- CAST: HUGEINT sum would fetch as float64 (driver hash bomb)
          SELECT user_id, value, ts_s,
                 CAST(sum(b) OVER (PARTITION BY user_id
                                   ORDER BY ts_s, event_id
                                   ROWS UNBOUNDED PRECEDING)
                      AS BIGINT) AS session_id
          FROM flagged
        ), s AS (
          SELECT user_id, session_id, count(*) AS n_events,
                 min(ts_s) AS start_s, max(ts_s) AS end_s,
                 sum(CAST(round(value * 1e4) AS BIGINT)) / 1e4 AS sum_value,
                 max(session_id) OVER (PARTITION BY user_id) AS last_sid
          FROM sess GROUP BY 1, 2
        ), wm AS (
          -- final watermark: max event time, truncated to ms (0s delay)
          SELECT max(epoch_us(ts)) // 1000 AS wm_ms FROM events
        )
        SELECT user_id, session_id, n_events, start_s, end_s, sum_value
        FROM s, wm
        WHERE session_id < last_sid
           OR (end_s + 1800) * 1000 < wm_ms
    """,
    "q92_stream_stream_join": """
        WITH c AS (
          SELECT event_id AS click_id, user_id, epoch_us(ts) AS c_us
          FROM events WHERE event_type = 'click'
        ), e AS (
          SELECT event_id AS error_id, user_id, epoch_us(ts) AS e_us
          FROM events WHERE event_type = 'error'
        )
        SELECT c.click_id, e.error_id, c.user_id,
               e.e_us - c.c_us AS delta_us
        FROM c JOIN e ON c.user_id = e.user_id
                     AND e.e_us >= c.c_us
                     AND e.e_us <= c.c_us + CAST(3600000000 AS BIGINT)
    """,
    "q93_tpch_promo_revenue": """
        SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0.0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 4)
                 AS promo_revenue_pct,
               count(*) AS n_lineitems
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01'
          AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
    "q94_price_batch_status": _SALTED_SERVING_ORACLE,
    # q98: stream-static serving — availableNow emission over a finite
    # landing dir equals the batch scorer exactly; ONE shared oracle.
    "q98_stream_price_status": _SALTED_SERVING_ORACLE,
    # q95/q97: the Spark side routes through a real sink+source
    # roundtrip (CSV / materialized parquet artifact); the oracle
    # computes the same aggregate straight from the source tables —
    # value parity proves the connector roundtrip is lossless.
    "q95_csv_roundtrip": """
        SELECT r_name, count(*) AS n_nations, min(n_name) AS first_nation
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1
    """,
    "q96_json_relational": """
        SELECT event_type,
               count(cast(json_extract_string(props, '$.k') AS INTEGER))
                 AS n_parsed,
               CAST(sum(cast(json_extract_string(props, '$.k') AS INTEGER))
                    AS BIGINT) AS sum_k,
               min(cast(json_extract_string(props, '$.k') AS INTEGER))
                 AS min_k,
               max(cast(json_extract_string(props, '$.k') AS INTEGER))
                 AS max_k
        FROM events GROUP BY 1
    """,
    "q97_materialize_cache": """
        WITH daily AS (
          SELECT cast(ts AS DATE) AS date, event_type, count(*) AS n
          FROM events GROUP BY 1, 2
        )
        SELECT event_type, CAST(sum(n) AS BIGINT) AS n_events,
               count(*) AS n_days
        FROM daily GROUP BY 1
    """,
    "q99_bucketed_join": """
        SELECT c_nationkey, count(*) AS n_orders,
               sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) / 100.0
                 AS sum_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1
    """,
    "q100_salted_join": """
        WITH user_dim AS (
          SELECT user_id,
                 CASE WHEN count(*) >= 100 THEN 'heavy' ELSE 'light' END
                   AS tier
          FROM events GROUP BY 1
        )
        SELECT tier, count(*) AS n_clicks,
               sum(CAST(round(value * 1e4) AS BIGINT)) / 1e4 AS sum_value
        FROM events e JOIN user_dim USING (user_id)
        WHERE event_type = 'click'
        GROUP BY tier
    """,
    "q101_line_dedup": """
        WITH src AS (
          SELECT doc_id, string_split(text, '.') AS parts FROM documents
        ), exploded AS (
          SELECT doc_id,
                 unnest(range(len(parts))) AS pos,
                 unnest(parts) AS rawline
          FROM src
        ), lines AS (
          SELECT doc_id, pos, trim(rawline) AS line
          FROM exploded WHERE trim(rawline) <> ''
        ), bp AS (
          SELECT line FROM (SELECT DISTINCT doc_id, line FROM lines)
          GROUP BY line HAVING count(*) >= 10
        ), kept AS (
          SELECT l.* FROM lines l ANTI JOIN bp USING (line)
        ), rebuilt AS (
          SELECT doc_id, count(*) AS n_kept,
                 md5(string_agg(line, '. ' ORDER BY pos)) AS text_md5
          FROM kept GROUP BY doc_id
        ), totals AS (
          SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id
        )
        SELECT t.doc_id, t.n_lines, coalesce(r.n_kept, 0) AS n_kept,
               r.text_md5
        FROM totals t LEFT JOIN rebuilt r USING (doc_id)
    """,
    "q102_export_manifest": """
        WITH per_doc AS (
          SELECT CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6))
                        ::BIGINT % 16 AS INTEGER) AS shard,
                 length(text) AS n_chars,
                 md5(text) AS doc_md5
          FROM documents
        )
        SELECT shard, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               md5(string_agg(doc_md5, '' ORDER BY doc_md5)) AS content_md5
        FROM per_doc GROUP BY shard
    """,
    "q103_dataset_card": """
        WITH dup AS (
          SELECT text, count(*) AS n FROM documents GROUP BY text
        ), langs AS (
          SELECT string_agg(e, ',' ORDER BY e) AS langs FROM (
            SELECT lang || ':' || CAST(count(*) AS VARCHAR) AS e
            FROM documents GROUP BY lang)
        ), s AS (
          -- list_filter(x <> ''): a blank/whitespace-only doc splits to
          -- [''] (1 token) in DuckDB where Spark's token_count yields 0
          SELECT count(*) AS n_docs,
                 CAST(sum(length(text)) AS BIGINT) AS total_chars,
                 CAST(sum(len(list_filter(
                        string_split_regex(trim(text), '\\s+'),
                        x -> x <> ''))) AS BIGINT) AS total_tokens,
                 count(DISTINCT source) AS n_sources
          FROM documents
        ), d AS (
          SELECT CAST(((sum(n) - count(*)) * 10000) // sum(n) AS BIGINT)
                   AS dup_permyriad
          FROM dup
        )
        SELECT * FROM s, d, langs
    """,
    "q104_robust_outliers": """
        WITH med AS (
          SELECT event_type, quantile_cont(value, 0.5) AS m
          FROM events GROUP BY 1
        ), mad AS (
          SELECT event_type, quantile_cont(abs(value - m), 0.5) AS d,
                 any_value(m) AS m
          FROM events JOIN med USING (event_type) GROUP BY event_type
        )
        SELECT event_type, count(*) AS n,
               CAST(sum(CASE WHEN 0.6745 * abs(value - m) / d > 3.5
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               round(any_value(m), 4) AS median,
               round(any_value(d), 4) AS mad
        FROM events JOIN mad USING (event_type)
        GROUP BY event_type
    """,
    "q105_session_funnel": """
        WITH e AS (
          SELECT event_id, user_id, event_type,
                 epoch_ns(ts) // 1000000000 AS ts_s
          FROM events
        ), flagged AS (
          SELECT user_id, event_id, event_type, ts_s,
                 CASE WHEN lag(ts_s) OVER w IS NULL
                           OR ts_s - lag(ts_s) OVER w > 1800
                      THEN 1 ELSE 0 END AS b
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)
        ), sess AS (
          SELECT user_id, event_type, ts_s,
                 sum(b) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
          FROM flagged
        ), per_session AS (
          SELECT user_id, session_id,
                 min(CASE WHEN event_type = 'click' THEN ts_s END)
                   AS first_click,
                 max(CASE WHEN event_type = 'purchase' THEN ts_s END)
                   AS last_purchase
          FROM sess GROUP BY 1, 2
        )
        SELECT count(*) AS n_sessions,
               CAST(sum(CASE WHEN first_click IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_with_click,
               CAST(sum(CASE WHEN first_click IS NOT NULL
                              AND last_purchase IS NOT NULL
                              AND last_purchase >= first_click
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
        FROM per_session
    """,
    "q106_pii_scrub": """
        WITH salted AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 13 = 0
                      THEN text || ' contact user' ||
                           CAST(doc_id AS VARCHAR) || '@example.com now'
                      ELSE text END AS text
          FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(text,
                 '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}'))
                 AS INTEGER) AS n_emails,
               md5(regexp_replace(text,
                 '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}',
                 '<EMAIL>', 'g')) AS masked_md5
        FROM salted
    """,
    "q108_rest_ingest": """
        SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
               count(*) AS n_nations, min(n_name) AS first_nation
        FROM nation GROUP BY 1
    """,
    "q107_equidepth_histogram": """
        WITH edges AS (
          SELECT event_type,
                 quantile_cont(value, 0.2) AS p2,
                 quantile_cont(value, 0.4) AS p4,
                 quantile_cont(value, 0.6) AS p6,
                 quantile_cont(value, 0.8) AS p8
          FROM events GROUP BY 1
        )
        SELECT event_type,
               CAST(CASE WHEN value < p2 THEN 0
                         WHEN value < p4 THEN 1
                         WHEN value < p6 THEN 2
                         WHEN value < p8 THEN 3
                         ELSE 4 END AS INTEGER) AS bin,
               count(*) AS n,
               round(min(p2), 4) AS p20,
               round(min(p8), 4) AS p80
        FROM events JOIN edges USING (event_type)
        GROUP BY 1, 2
    """,
    "q109_unigram_lm_score": """
        WITH toks AS (
          SELECT doc_id, tok FROM (
            SELECT doc_id,
                   unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
            FROM documents) t
          WHERE tok <> ''
        ), lm_counts AS (
          SELECT tok, count(*) AS c
          FROM toks
          WHERE ('0x' || substr(md5(cast(doc_id AS VARCHAR)), 1, 8))::BIGINT
                  % 100 < 80
          GROUP BY 1
        ), consts AS (
          SELECT sum(c) AS n, count(*) AS v FROM lm_counts
        ), lm AS (
          SELECT tok,
                 cast(round(-ln((c + 1.0) / (n + v)) * 1000000) AS BIGINT)
                   AS nll_s
          FROM lm_counts CROSS JOIN consts
        ), oov AS (
          SELECT cast(round(-ln(1.0 / (n + v)) * 1000000) AS BIGINT)
                   AS oov_s
          FROM consts
        ), doc_toks AS (
          SELECT doc_id, tok, count(*) AS cnt FROM toks GROUP BY 1, 2
        )
        SELECT doc_id, cast(sum(cnt) AS BIGINT) AS n_tokens,
               round(cast(sum(cnt * coalesce(nll_s, oov_s)) AS DOUBLE)
                     / sum(cnt) / 1000000, 4) AS avg_nll
        FROM doc_toks LEFT JOIN lm USING (tok) CROSS JOIN oov
        GROUP BY doc_id
    """,
    "q110_leakage_safe_split": """
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
          WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.5
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
        ), keyed AS (
          SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS group_key
          FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
        )
        SELECT doc_id, group_key,
               CASE WHEN ('0x' || substr(md5(cast(group_key AS VARCHAR)),
                          1, 8))::BIGINT % 100 < 80 THEN 'train'
                    WHEN ('0x' || substr(md5(cast(group_key AS VARCHAR)),
                          1, 8))::BIGINT % 100 < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM keyed
    """,
    "q111_bloom_semi_join": """
        WITH keys AS (
          SELECT o_orderkey FROM orders
          WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 200000
        )
        SELECT l_returnflag, count(*) AS n_items,
               cast(sum(cast(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) / 100.0 AS sum_price,
               cast(sum(cast(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM keys)
        GROUP BY 1
    """,
    "q112_epoch_upsample": """
        WITH c AS (
          SELECT doc_id, lang,
                 CASE lang WHEN 'fr' THEN 2.5 WHEN 'de' THEN 3.2
                           WHEN 'es' THEN 0.5 ELSE 1.0 END AS e
          FROM documents
        ), n AS (
          SELECT doc_id, lang,
                 cast(floor(e) AS INT) +
                 CASE WHEN ('0x' || substr(md5('ep' ||
                            cast(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
                        < cast(round((e - floor(e)) * 100) AS INT)
                      THEN 1 ELSE 0 END AS n_copies
          FROM c
        )
        SELECT doc_id, lang,
               cast(unnest(range(1, n_copies + 1)) AS INT) AS copy_idx
        FROM n WHERE n_copies > 0
    """,
    "q113_tpch_large_orders": """
        WITH big AS (
          SELECT l_orderkey,
                 cast(sum(cast(l_quantity AS BIGINT)) AS BIGINT)
                   AS total_qty
          FROM lineitem GROUP BY 1 HAVING total_qty > 250
        )
        SELECT c_name, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date,
               round(o_totalprice, 2) AS o_totalprice, total_qty
        FROM big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
    """,
    "q114_tpch_churned_customers": """
        SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                           WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= date '1998-01-01')
    """,
    "q115_pq_topk": """
        SELECT CAST(5 AS INTEGER) AS n_queries, CAST(10 AS INTEGER) AS k,
               true AS recall_ge_50pct
    """,
    "q116_stream_upsert": """
        SELECT user_id, last_event_id, last_value, last_ts_us FROM (
          SELECT user_id, event_id AS last_event_id, value AS last_value,
                 epoch_ns(ts) // 1000 AS last_ts_us,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) t
        WHERE rn = 1
    """,
    "q117_embedding_standardize": """
        WITH dims AS (
          SELECT label, vec_id,
                 unnest(range(1, len(embedding) + 1)) AS pos,
                 unnest(embedding) AS x
          FROM embeddings
        ), stats AS (
          SELECT label, pos,
                 round(avg(x) * 1000000) / 1000000 AS mu,
                 round(coalesce(stddev(x), 0) * 1000000) / 1000000 AS sigma
          FROM dims GROUP BY 1, 2
        ), z AS (
          SELECT d.vec_id, d.label,
                 CASE WHEN s.sigma > 0 THEN (d.x - s.mu) / s.sigma
                      ELSE 0.0 END AS zd
          FROM dims d JOIN stats s ON d.label = s.label AND d.pos = s.pos
        )
        SELECT vec_id, label,
               cast(sum(cast(round(zd * 10000) AS BIGINT)) AS BIGINT)
                 / 10000.0 AS zsum
        FROM z GROUP BY 1, 2
    """,
    "q118_backfill_range": """
        WITH daily AS (
          SELECT r_name AS libelle_region, cast(ts AS DATE) AS date,
                 round(avg(value) * 100, 4) AS conso_mwh
          FROM events JOIN region ON cast(user_id % 5 AS INTEGER) = r_regionkey
          GROUP BY 1, 2
        ), idx AS (
          SELECT date, row_number() OVER (ORDER BY date) - 1 AS rn,
                 count(*) OVER () AS n
          FROM (SELECT DISTINCT date FROM daily)
        ), picks AS (
          SELECT max(CASE WHEN rn = (n * 6) // 10 THEN date END) AS split_d,
                 max(CASE WHEN rn = (n * 4) // 10 THEN date END) AS bf_start,
                 max(CASE WHEN rn = least(n - 1, (n * 8) // 10) THEN date END)
                   AS bf_end
          FROM idx
        )
        SELECT libelle_region, strftime(date, '%Y-%m-%d') AS date, conso_mwh
        FROM daily, picks
        WHERE date < split_d OR date BETWEEN bf_start AND bf_end
    """,
    "q119_incremental_view": """
        WITH new_orders AS (
          SELECT o_orderkey, o_custkey,
                 CASE WHEN o_orderkey % 7 = 3
                      THEN round(o_totalprice * 1.05 + 1e-9, 2)
                      ELSE o_totalprice END AS o_totalprice
          FROM orders
        ), new_customer AS (
          SELECT c_custkey,
                 CASE WHEN c_custkey % 11 = 2 THEN 'CHURNED'
                      ELSE c_mktsegment END AS c_mktsegment
          FROM customer
        )
        SELECT c_mktsegment, count(*) AS n_orders,
               cast(sum(cast(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) / 100.0 AS sum_price
        FROM new_orders JOIN new_customer ON o_custkey = c_custkey
        GROUP BY 1
    """,
    "q120_cogroup_conversion": """
        WITH e AS (
          SELECT user_id, event_type, epoch_ns(ts) // 1000 AS ts_us
          FROM events
        ), c AS (
          SELECT user_id, count(*) AS n_clicks, min(ts_us) AS first_click
          FROM e WHERE event_type = 'click' GROUP BY 1
        ), p AS (
          SELECT user_id, count(*) AS n_purchases
          FROM e WHERE event_type = 'purchase' GROUP BY 1
        ), conv AS (
          SELECT e.user_id,
                 min(e.ts_us) - c.first_click AS convert_us
          FROM e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts_us >= c.first_click
          GROUP BY e.user_id, c.first_click
        )
        SELECT coalesce(c.user_id, p.user_id) AS user_id,
               coalesce(n_clicks, 0) AS n_clicks,
               coalesce(n_purchases, 0) AS n_purchases,
               conv.convert_us
        FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
        LEFT JOIN conv ON coalesce(c.user_id, p.user_id) = conv.user_id
    """,
    "q121_tpch_order_priority": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate < TIMESTAMP '1996-10-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_returnflag = 'R')
        GROUP BY 1
    """,
    "q122_tpch_volume_shipping": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               cast(year(l_shipdate) AS INTEGER) AS l_year,
               round(cast(sum(cast(round(l_extendedprice
                       * (1 - l_discount) * 1e4) AS BIGINT)) AS BIGINT)
                     / 1e4, 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
            OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1, 2, 3
    """,
    "q123_tpch_market_share": """
        SELECT cast(year(o_orderdate) AS INTEGER) AS o_year,
               round(
                 cast(sum(CASE WHEN sn.n_name = 'NATION_5'
                        THEN cast(round(l_extendedprice
                               * (1 - l_discount) * 1e4) AS BIGINT)
                        ELSE 0 END) AS DOUBLE)
                 / cast(sum(cast(round(l_extendedprice
                        * (1 - l_discount) * 1e4) AS BIGINT)) AS DOUBLE),
                 6) AS mkt_share
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        GROUP BY 1
    """,
    "q124_tpch_product_profit": """
        SELECT n_name AS nation,
               cast(year(o_orderdate) AS INTEGER) AS o_year,
               round(cast(sum(
                   cast(round(l_extendedprice * (1 - l_discount) * 1e4)
                        AS BIGINT)
                 - cast(round(p_retailprice * l_quantity * 1e3)
                        AS BIGINT)) AS BIGINT) / 1e4, 2) AS profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
        GROUP BY 1, 2
    """,
    "q125_tpch_customer_distribution": """
        SELECT c_count, count(*) AS custdist FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer
          LEFT JOIN orders ON c_custkey = o_custkey
                          AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey)
        GROUP BY 1
    """,
    "q126_tpch_top_supplier": """
        WITH revenue AS (
          SELECT l_suppkey,
                 cast(sum(cast(round(l_extendedprice * (1 - l_discount)
                                     * 1e4) AS BIGINT)) AS BIGINT)
                   AS rev_e4
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY 1
        )
        SELECT s_suppkey, s_name, round(rev_e4 / 1e4, 2) AS total_revenue
        FROM revenue JOIN supplier ON l_suppkey = s_suppkey
        WHERE rev_e4 = (SELECT max(rev_e4) FROM revenue)
    """,
    "q127_tpch_small_quantity_revenue": """
        WITH branded AS (
          SELECT l_partkey, l_quantity, l_extendedprice
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_brand = 'Brand#23'
        ), thr AS (
          SELECT l_partkey,
                 round(avg(l_quantity) * 0.2 * 1e6) / 1e6 AS thr
          FROM branded GROUP BY 1
        )
        SELECT round(cast(sum(cast(round(l_extendedprice * 1e2) AS BIGINT))
                          AS BIGINT) / 1e2 / 7.0, 2) AS avg_yearly
        FROM branded JOIN thr USING (l_partkey)
        WHERE l_quantity < thr
    """,
    "q128_tpch_disjunctive_revenue": """
        SELECT round(coalesce(cast(sum(cast(round(l_extendedprice
                 * (1 - l_discount) * 1e4) AS BIGINT)) AS BIGINT), 0)
               / 1e4, 2) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "q129_tpch_sole_returning_supplier": """
        WITH n_supp AS (
          SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp
          FROM lineitem GROUP BY 1
        ), ret AS (
          SELECT DISTINCT l_orderkey, l_suppkey
          FROM lineitem WHERE l_returnflag = 'R'
        ), n_ret AS (
          SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_ret
          FROM ret GROUP BY 1
        )
        SELECT s_suppkey, s_name, count(*) AS numwait
        FROM ret
        JOIN n_supp USING (l_orderkey)
        JOIN n_ret USING (l_orderkey)
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE n_supp > 1 AND n_ret = 1
        GROUP BY 1, 2
    """,
    "q130_bm25_topk": """
        WITH docs AS (
          SELECT doc_id, trim(lower(text)) AS t FROM documents
        ), lens AS (
          SELECT doc_id,
                 cast(len(list_filter(string_split_regex(t, '\\s+'),
                                      x -> x <> '')) AS BIGINT) AS dl
          FROM docs
        ), qt AS (
          SELECT doc_id,
                 unnest(list_filter(string_split_regex(t, '\\s+'),
                                    x -> x <> '')) AS tok
          FROM docs
        ), hits AS (
          SELECT doc_id, tok FROM qt
          WHERE tok IN ('spark', 'hash', 'window')
        ), tf AS (
          SELECT doc_id,
            cast(sum(CASE WHEN tok='spark' THEN 1 ELSE 0 END) AS BIGINT)
              AS tf_spark,
            cast(sum(CASE WHEN tok='hash' THEN 1 ELSE 0 END) AS BIGINT)
              AS tf_hash,
            cast(sum(CASE WHEN tok='window' THEN 1 ELSE 0 END) AS BIGINT)
              AS tf_window
          FROM hits GROUP BY 1
        ), stats AS (
          SELECT cast(count(*) AS BIGINT) AS n,
                 cast(sum(dl) AS BIGINT) AS sumdl
          FROM lens
        ), dfs AS (
          SELECT
            cast(sum(CASE WHEN tok='spark' THEN 1 ELSE 0 END) AS BIGINT)
              AS df_spark,
            cast(sum(CASE WHEN tok='hash' THEN 1 ELSE 0 END) AS BIGINT)
              AS df_hash,
            cast(sum(CASE WHEN tok='window' THEN 1 ELSE 0 END) AS BIGINT)
              AS df_window
          FROM (SELECT DISTINCT doc_id, tok FROM hits)
        ), scored AS (
          SELECT tf.doc_id,
            cast(round((
              ((cast(n AS DOUBLE) - cast(df_spark AS DOUBLE) + 0.5)
                 / (cast(df_spark AS DOUBLE) + 0.5))
                * (cast(tf_spark AS DOUBLE) * (1.2 + 1))
                / (cast(tf_spark AS DOUBLE)
                   + 1.2 * (0.25 + 0.75 * (cast(dl AS DOUBLE)
                       / (cast(sumdl AS DOUBLE) / cast(n AS DOUBLE)))))
              + ((cast(n AS DOUBLE) - cast(df_hash AS DOUBLE) + 0.5)
                 / (cast(df_hash AS DOUBLE) + 0.5))
                * (cast(tf_hash AS DOUBLE) * (1.2 + 1))
                / (cast(tf_hash AS DOUBLE)
                   + 1.2 * (0.25 + 0.75 * (cast(dl AS DOUBLE)
                       / (cast(sumdl AS DOUBLE) / cast(n AS DOUBLE)))))
              + ((cast(n AS DOUBLE) - cast(df_window AS DOUBLE) + 0.5)
                 / (cast(df_window AS DOUBLE) + 0.5))
                * (cast(tf_window AS DOUBLE) * (1.2 + 1))
                / (cast(tf_window AS DOUBLE)
                   + 1.2 * (0.25 + 0.75 * (cast(dl AS DOUBLE)
                       / (cast(sumdl AS DOUBLE) / cast(n AS DOUBLE)))))
            ) * 1e4) AS BIGINT) AS s_e4
          FROM tf JOIN lens ON tf.doc_id = lens.doc_id, stats, dfs
        )
        SELECT doc_id, cast(rank AS INTEGER) AS rank,
               round(s_e4 / 1e4, 4) AS score
        FROM (SELECT doc_id, s_e4,
                     row_number() OVER (ORDER BY s_e4 DESC, doc_id)
                       AS rank
              FROM scored) r
        WHERE rank <= 20
    """,
    "q131_containment_dedup": """
        WITH toks AS (
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
        )
        SELECT id_a, id_b,
               round(inter * 1.0 / sa.n, 4) AS containment_a,
               round(inter * 1.0 / sb.n, 4) AS containment_b
        FROM inter
        JOIN sizes sa ON id_a = sa.doc_id
        JOIN sizes sb ON id_b = sb.doc_id
        WHERE inter * 1.0 / sa.n >= 0.6 OR inter * 1.0 / sb.n >= 0.6
    """,
    "q132_mixture_temperature": """
        WITH g AS (
          SELECT lang, source, cast(count(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY 1, 2
        ), w AS (
          SELECT lang, source, n_docs,
                 cast(round(sqrt(cast(n_docs AS DOUBLE)) * 1e6) AS BIGINT)
                   AS s
          FROM g
        ), t AS (
          SELECT cast(sum(s) AS BIGINT) AS tot_s,
                 cast(sum(n_docs) AS BIGINT) AS tot_n
          FROM w
        )
        SELECT lang, source, n_docs,
               round(cast(s AS DOUBLE) / cast(tot_s AS DOUBLE), 6)
                 AS weight,
               cast(round(cast(s AS DOUBLE) / cast(tot_s AS DOUBLE)
                          * cast(tot_n AS DOUBLE)) AS BIGINT)
                 AS target_docs
        FROM w, t
    """,
    "q133_arrow_byte_stats": """
        SELECT doc_id,
               cast(strlen(text) AS BIGINT) AS n_bytes,
               cast(len(text) - len(replace(text, ' ', '')) AS BIGINT)
                 AS n_spaces
        FROM documents
    """,
    "q134_pagerank_fixed": """
        WITH pairs AS (
          SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ), edges AS (
          SELECT src, dst FROM pairs
          UNION ALL
          SELECT dst AS src, src AS dst FROM pairs
        ), deg AS (
          SELECT src AS node, cast(count(*) AS BIGINT) AS deg
          FROM edges GROUP BY 1
        ), nn AS (
          SELECT cast(count(*) AS BIGINT) AS n FROM deg
        ), r0 AS (
          SELECT node, deg,
                 cast(round(1e9 / cast(n AS DOUBLE)) AS BIGINT) AS r
          FROM deg, nn
        ), c1 AS (
          SELECT e.dst AS node,
                 cast(sum(cast(round(cast(r AS DOUBLE)
                       / cast(deg AS DOUBLE)) AS BIGINT)) AS BIGINT) AS i
          FROM r0 JOIN edges e ON r0.node = e.src GROUP BY 1
        ), r1 AS (
          SELECT d.node, d.deg,
                 cast(round(((1 - 0.85) * 1e9) / cast(n AS DOUBLE))
                      AS BIGINT)
                 + cast(round(0.85 * cast(coalesce(i, 0) AS DOUBLE))
                        AS BIGINT) AS r
          FROM deg d LEFT JOIN c1 ON d.node = c1.node, nn
        ), c2 AS (
          SELECT e.dst AS node,
                 cast(sum(cast(round(cast(r AS DOUBLE)
                       / cast(deg AS DOUBLE)) AS BIGINT)) AS BIGINT) AS i
          FROM r1 JOIN edges e ON r1.node = e.src GROUP BY 1
        ), r2 AS (
          SELECT d.node, d.deg,
                 cast(round(((1 - 0.85) * 1e9) / cast(n AS DOUBLE))
                      AS BIGINT)
                 + cast(round(0.85 * cast(coalesce(i, 0) AS DOUBLE))
                        AS BIGINT) AS r
          FROM deg d LEFT JOIN c2 ON d.node = c2.node, nn
        ), c3 AS (
          SELECT e.dst AS node,
                 cast(sum(cast(round(cast(r AS DOUBLE)
                       / cast(deg AS DOUBLE)) AS BIGINT)) AS BIGINT) AS i
          FROM r2 JOIN edges e ON r2.node = e.src GROUP BY 1
        ), r3 AS (
          SELECT d.node, d.deg,
                 cast(round(((1 - 0.85) * 1e9) / cast(n AS DOUBLE))
                      AS BIGINT)
                 + cast(round(0.85 * cast(coalesce(i, 0) AS DOUBLE))
                        AS BIGINT) AS r
          FROM deg d LEFT JOIN c3 ON d.node = c3.node, nn
        )
        SELECT node, round(r / 1e9, 9) AS rank FROM r3
    """,
    "q135_observed_metrics": """
        SELECT cast(count(*) AS BIGINT) AS n_rows,
               cast(sum(cast(round(value * 1e2) AS BIGINT)) AS BIGINT)
                 AS value_sum_e2,
               cast(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_null_value
        FROM events
    """,
    "q136_schema_evolution": """
        SELECT lang, count(*) AS n_docs,
               cast(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_v1_rows,
               cast(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars % 100
                             ELSE 0 END) AS BIGINT) AS score_sum
        FROM documents GROUP BY 1
    """,
    "q137_ngram_novelty": """
        WITH toks AS (
          SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
          FROM documents
        ), sh AS (
          SELECT DISTINCT doc_id, unnest(
            CASE WHEN len(t) >= 3
                 THEN list_transform(range(1, len(t) - 1),
                                     i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
                 ELSE [array_to_string(t, ' ')] END) AS sh
          FROM toks
        ), first_seen AS (
          SELECT sh, min(doc_id) AS first FROM sh GROUP BY 1
        )
        SELECT doc_id, count(*) AS n_shingles,
               cast(sum(CASE WHEN first = doc_id THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_novel,
               round(sum(CASE WHEN first = doc_id THEN 1 ELSE 0 END)
                     * 1.0 / count(*), 4) AS novelty
        FROM sh JOIN first_seen USING (sh)
        GROUP BY doc_id
    """,
    "q138_unpivot_daily": """
        WITH wide AS (
          SELECT cast(ts AS DATE) AS d,
                 cast(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                      AS BIGINT) AS click,
                 cast(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                      AS BIGINT) AS view,
                 cast(sum(CASE WHEN event_type = 'purchase' THEN 1
                               ELSE 0 END) AS BIGINT) AS purchase
          FROM events GROUP BY 1
        )
        SELECT strftime(d, '%Y-%m-%d') AS day, event_type, n
        FROM wide
        UNPIVOT (n FOR event_type IN (click, view, purchase))
    """,
    "q139_table_checksum": """
        WITH h AS (
          SELECT l_returnflag, l_linestatus,
                 ('0x' || substring(md5(concat_ws('|',
                     cast(l_orderkey AS VARCHAR),
                     cast(l_partkey AS VARCHAR),
                     cast(l_suppkey AS VARCHAR),
                     cast(l_linenumber AS VARCHAR),
                     l_returnflag, l_linestatus)), 1, 12))::BIGINT AS d48
          FROM lineitem
        )
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_rows,
               cast(sum(d48 % 1000000007) % 1000000007 AS BIGINT)
                 AS sum_mod,
               bit_xor(d48) AS xor48
        FROM h GROUP BY 1, 2
    """,
    "q140_set_ops_all": """
        WITH e AS (
          SELECT user_id, event_type, cast(ts AS DATE) AS d FROM events
        ), early AS (
          SELECT user_id, event_type FROM e WHERE d < DATE '2024-01-16'
        ), late AS (
          SELECT user_id, event_type FROM e WHERE d >= DATE '2024-01-16'
        ), surv AS (
          SELECT * FROM early EXCEPT ALL SELECT * FROM late
        ), comm AS (
          SELECT * FROM early INTERSECT ALL SELECT * FROM late
        ), s AS (
          SELECT user_id, event_type, count(*) AS n_survive
          FROM surv GROUP BY 1, 2
        ), c AS (
          SELECT user_id, event_type, count(*) AS n_common
          FROM comm GROUP BY 1, 2
        )
        SELECT coalesce(s.user_id, c.user_id) AS user_id,
               coalesce(s.event_type, c.event_type) AS event_type,
               coalesce(n_survive, 0) AS n_survive,
               coalesce(n_common, 0) AS n_common
        FROM s FULL OUTER JOIN c
          ON s.user_id = c.user_id AND s.event_type = c.event_type
    """,
    "q141_lateral_topk": """
        SELECT n.n_name, top.c_custkey, top.c_name,
               round(top.c_acctbal, 2) AS c_acctbal
        FROM nation n,
        LATERAL (
          SELECT c_custkey, c_name, c_acctbal
          FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey
          LIMIT 3
        ) AS top
    """,
    "q142_time_range_frame": """
        WITH e AS (
          SELECT event_id, user_id,
                 epoch_ns(ts) // 1000000000 AS sec,
                 cast(round(value * 1e2) AS BIGINT) AS v_e2
          FROM events
        )
        SELECT event_id, user_id,
               count(*) OVER w AS n_trailing_1h,
               cast(sum(v_e2) OVER w AS BIGINT) AS sum_e2_trailing_1h
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY sec
                     RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
    """,
    "q143_window_funcs_complete": """
        SELECT event_id, user_id,
               lag(event_type, 1) OVER w AS prev_type,
               lead(event_type, 1) OVER w AS next_type,
               first_value(event_id) OVER wf AS first_event,
               last_value(event_id) OVER wf AS last_event,
               nth_value(event_id, 2) OVER wf AS second_event,
               cast(rank() OVER w AS INTEGER) AS rnk,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY epoch_ns(ts) // 1000, event_id),
               wf AS (PARTITION BY user_id
                      ORDER BY epoch_ns(ts) // 1000, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND UNBOUNDED FOLLOWING)
    """,
    "q144_nullsafe_join": """
        WITH k AS (
          SELECT CASE WHEN user_id % 7 = 0 THEN NULL
                      ELSE user_id % 7 END AS bucket,
                 event_type
          FROM events
        ), a AS (
          SELECT bucket, count(*) AS n_all FROM k GROUP BY 1
        ), p AS (
          SELECT bucket AS pb, count(*) AS n_purchase
          FROM k WHERE event_type = 'purchase' GROUP BY 1
        )
        SELECT bucket, n_all, n_purchase
        FROM a JOIN p ON a.bucket IS NOT DISTINCT FROM p.pb
    """,
    "q145_bpe_pair_counts": """
        WITH vocab AS (
          SELECT tok, cast(count(*) AS BIGINT) AS cnt
          FROM (
            SELECT unnest(list_filter(
              string_split_regex(trim(lower(text)), '\\s+'),
              x -> x <> '')) AS tok
            FROM documents)
          GROUP BY 1 HAVING length(tok) >= 2
        ), pairs AS (
          SELECT unnest(list_transform(range(1, length(tok)),
                        i -> tok[i : i + 1])) AS pair,
                 cnt
          FROM vocab
        ), counted AS (
          SELECT pair, cast(sum(cnt) AS BIGINT) AS n
          FROM pairs GROUP BY 1
        )
        SELECT cast(row_number() OVER (ORDER BY n DESC, pair)
                    AS INTEGER) AS merge_rank,
               pair, n
        FROM counted
        ORDER BY n DESC, pair LIMIT 20
    """,
    "q146_market_basket": """
        WITH baskets AS (
          SELECT DISTINCT user_id, event_type FROM events
        ), nu AS (
          SELECT cast(count(DISTINCT user_id) AS BIGINT) AS n FROM baskets
        ), tc AS (
          SELECT event_type, cast(count(*) AS BIGINT) AS n_t
          FROM baskets GROUP BY 1
        ), pc AS (
          SELECT a.event_type AS type_a, b.event_type AS type_b,
                 cast(count(*) AS BIGINT) AS n_ab
          FROM baskets a JOIN baskets b ON a.user_id = b.user_id
          WHERE a.event_type < b.event_type
          GROUP BY 1, 2
        )
        SELECT type_a, type_b, n_ab AS n_both,
               round(n_ab * 1.0 / n, 6) AS support,
               round(n_ab * 1.0 / ta.n_t, 6) AS conf_a_to_b,
               round(n_ab * 1.0 / tb.n_t, 6) AS conf_b_to_a,
               round((n_ab * n) * 1.0 / (ta.n_t * tb.n_t), 6) AS lift
        FROM pc
        JOIN tc ta ON pc.type_a = ta.event_type
        JOIN tc tb ON pc.type_b = tb.event_type, nu
    """,
    "q147_python_datasource": """
        WITH r AS (
          SELECT unnest(range(0, 800)) AS rid
        )
        SELECT 'cat' || cast(rid % 5 AS VARCHAR) AS category,
               count(*) AS n,
               cast(count(DISTINCT rid // 100) AS BIGINT) AS n_pages,
               sum((rid % 997) * 0.25) AS total_amount
        FROM r GROUP BY 1
    """,
    "q148_variant_json": """
        WITH k AS (
          SELECT event_type,
                 cast(json_extract(props, '$.k') AS BIGINT) AS kk
          FROM events
        )
        SELECT event_type, count(*) AS n,
               min(kk) AS k_min, max(kk) AS k_max,
               cast(sum(kk) AS BIGINT) AS k_sum,
               round(cast(sum(kk) AS DOUBLE) / cast(count(*) AS DOUBLE), 6)
                 AS k_mean
        FROM k GROUP BY 1
    """,
    "q149_bootstrap_ci": """
        WITH grp AS (
          SELECT event_type,
                 cast(round(value * 1e2) AS BIGINT) AS v_e2,
                 event_id,
                 unnest(range(0, 13)) AS g
          FROM events
        ), dig AS (
          SELECT event_type, v_e2, g,
                 md5(cast(g AS VARCHAR) || ':' ||
                     cast(event_id AS VARCHAR)) AS d
          FROM grp
        ), withu AS (
          SELECT event_type, v_e2, g * 4 + j AS b,
                 ('0x' || substring(d, 1 + 8 * cast(j AS INT), 8))::BIGINT
                   / 4294967296.0 AS u
          FROM dig CROSS JOIN (SELECT unnest(range(0, 4)) AS j) js
          WHERE g * 4 + j < 50
        ), mults AS (
          SELECT event_type, v_e2, b,
                 cast(CASE WHEN u < 0.367879441 THEN 0
                           WHEN u < 0.735758882 THEN 1
                           WHEN u < 0.919698603 THEN 2
                           WHEN u < 0.981011843 THEN 3
                           WHEN u < 0.996340153 THEN 4
                           WHEN u < 0.999405815 THEN 5
                           ELSE 6 END AS BIGINT) AS m
          FROM withu
        ), means AS (
          SELECT event_type, b,
                 cast(sum(v_e2 * m) AS DOUBLE)
                   / cast(sum(m) AS DOUBLE) / 100.0 AS mean
          FROM mults GROUP BY 1, 2
          HAVING sum(m) > 0
        )
        SELECT event_type, count(*) AS n_replicates,
               round(quantile_cont(mean, 0.05), 6) AS mean_lo,
               round(quantile_cont(mean, 0.95), 6) AS mean_hi
        FROM means GROUP BY 1
    """,
    "q150_skew_diagnostics": """
        WITH pk AS (
          SELECT l_orderkey, cast(count(*) AS BIGINT) AS n
          FROM lineitem GROUP BY 1
        ), tot AS (
          SELECT cast(sum(n) AS BIGINT) AS total,
                 cast(max(n) AS BIGINT) AS mx
          FROM pk
        )
        SELECT n AS rows_per_key, count(*) AS n_keys,
               mx AS max_rows_per_key,
               round(mx * 1.0 / total, 6) AS hot_key_share
        FROM pk, tot GROUP BY 1, 3, 4
    """,
    "q151_filtered_ann": """
        WITH q AS (
          SELECT vec_id AS query_id, label AS q_label,
                 embedding::DOUBLE[] AS qe
          FROM embeddings WHERE vec_id < 5
        ), c AS (
          SELECT vec_id, label, embedding::DOUBLE[] AS ce FROM embeddings
        ), sims AS (
          SELECT q.query_id, c.vec_id,
                 round(list_dot_product(qe, ce)
                       / (sqrt(list_dot_product(qe, qe))
                          * sqrt(list_dot_product(ce, ce))), 6) AS sim
          FROM q JOIN c ON c.label = q.q_label
        ), ranked AS (
          SELECT query_id, vec_id, sim,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY sim DESC, vec_id ASC) AS rank
          FROM sims
        )
        SELECT query_id, vec_id, sim, cast(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 5
    """,
    "q153_fk_integrity": """
        SELECT 'lineitem.l_orderkey->orders' AS fk_edge,
               count(*) AS n_rows,
               cast(sum(CASE WHEN c.l_orderkey IS NOT NULL AND p.o_orderkey IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
               cast(sum(CASE WHEN c.l_orderkey IS NOT NULL AND p.o_orderkey IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) = 0 AS intact
        FROM lineitem c LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) p
          ON c.l_orderkey = p.o_orderkey
        UNION ALL
        SELECT 'lineitem.l_partkey->part' AS fk_edge,
               count(*) AS n_rows,
               cast(sum(CASE WHEN c.l_partkey IS NOT NULL AND p.p_partkey IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
               cast(sum(CASE WHEN c.l_partkey IS NOT NULL AND p.p_partkey IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) = 0 AS intact
        FROM lineitem c LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p
          ON c.l_partkey = p.p_partkey
        UNION ALL
        SELECT 'lineitem.l_suppkey->supplier' AS fk_edge,
               count(*) AS n_rows,
               cast(sum(CASE WHEN c.l_suppkey IS NOT NULL AND p.s_suppkey IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
               cast(sum(CASE WHEN c.l_suppkey IS NOT NULL AND p.s_suppkey IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) = 0 AS intact
        FROM lineitem c LEFT JOIN (SELECT DISTINCT s_suppkey FROM supplier) p
          ON c.l_suppkey = p.s_suppkey
        UNION ALL
        SELECT 'orders.o_custkey->customer' AS fk_edge,
               count(*) AS n_rows,
               cast(sum(CASE WHEN c.o_custkey IS NOT NULL AND p.c_custkey IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
               cast(sum(CASE WHEN c.o_custkey IS NOT NULL AND p.c_custkey IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) = 0 AS intact
        FROM orders c LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) p
          ON c.o_custkey = p.c_custkey
        UNION ALL
        SELECT 'customer.c_nationkey->nation' AS fk_edge,
               count(*) AS n_rows,
               cast(sum(CASE WHEN c.c_nationkey IS NOT NULL AND p.n_nationkey IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
               cast(sum(CASE WHEN c.c_nationkey IS NOT NULL AND p.n_nationkey IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) = 0 AS intact
        FROM customer c LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) p
          ON c.c_nationkey = p.n_nationkey
        UNION ALL
        SELECT 'nation.n_regionkey->region' AS fk_edge,
               count(*) AS n_rows,
               cast(sum(CASE WHEN c.n_regionkey IS NOT NULL AND p.r_regionkey IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
               cast(sum(CASE WHEN c.n_regionkey IS NOT NULL AND p.r_regionkey IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) = 0 AS intact
        FROM nation c LEFT JOIN (SELECT DISTINCT r_regionkey FROM region) p
          ON c.n_regionkey = p.r_regionkey
    """,
}
