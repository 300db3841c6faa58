"""DuckDB oracle SQL — standalone entries (q100-band).

Verbatim extraction from plans/registry.py (round 11); see core.py
for the parity contract. ORACLE_SQL here is module-local and merged
by plans/oracles/__init__.
"""

ORACLE_SQL: dict[str, str] = {}

ORACLE_SQL["q154_sorted_shards"] = """
    WITH ranked AS (
      SELECT doc_id, n_chars,
             row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) AS rn
      FROM documents
    )
    SELECT CAST((rn - 1) // 100 AS INTEGER) AS shard_id,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           arg_min(doc_id, rn) AS first_doc_id,
           arg_max(doc_id, rn) AS last_doc_id
    FROM ranked GROUP BY 1
"""

ORACLE_SQL["q155_weighted_sample"] = """
    WITH keyed AS (
      SELECT lang, doc_id, n_chars,
             ln((('0x' || substr(md5('ws' || CAST(doc_id AS VARCHAR)), 1, 15))
                   ::BIGINT + 0.5) / 1152921504606846976.0)
               / CAST(n_chars AS DOUBLE) AS sample_key
      FROM documents WHERE n_chars > 0
    ), ranked AS (
      SELECT lang, doc_id, n_chars,
             row_number() OVER (PARTITION BY lang
                                ORDER BY sample_key DESC, doc_id ASC)
               AS sample_rank
      FROM keyed
    )
    SELECT lang, doc_id, n_chars, CAST(sample_rank AS INTEGER) AS sample_rank
    FROM ranked WHERE sample_rank <= 20
"""

ORACLE_SQL["q156_corpus_diff"] = """
    WITH v1 AS (
      SELECT doc_id, lang, md5(text) AS h,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % 100 AS b
      FROM documents
    ), kept AS (
      SELECT doc_id, lang,
             CASE WHEN b < 30 THEN md5('edit:' || h) ELSE h END AS h
      FROM v1 WHERE b >= 10
    ), clones AS (
      SELECT doc_id + 10000000000 AS doc_id, lang,
             md5('clone:' || h) AS h
      FROM v1 WHERE b % 20 = 0
    ), v2 AS (
      SELECT * FROM kept UNION ALL SELECT * FROM clones
    ), joined AS (
      SELECT coalesce(v1.lang, v2.lang) AS lang,
             CASE WHEN v1.doc_id IS NULL THEN 'added'
                  WHEN v2.doc_id IS NULL THEN 'removed'
                  WHEN v1.h IS NOT DISTINCT FROM v2.h THEN 'unchanged'
                  ELSE 'changed' END AS change
      FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
    )
    SELECT change, lang, count(*) AS n_docs
    FROM joined GROUP BY 1, 2
"""

ORACLE_SQL["q158_dup_spans"] = """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id, unnest(
        CASE WHEN len(t) >= 4
             THEN list_transform(range(1, len(t) - 2),
                 i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3]))
             ELSE [array_to_string(t, ' ')] END) AS sh
      FROM toks
    ), pairs AS (
      SELECT doc_id,
             ('0x' || substring(md5(sh), 1, 15))::BIGINT AS key,
             count(*) AS n_occ
      FROM sh GROUP BY 1, 2
    ), dup AS (
      SELECT key FROM pairs GROUP BY key HAVING count(*) >= 2
    )
    SELECT p.doc_id,
           CAST(sum(p.n_occ) AS BIGINT) AS n_spans,
           CAST(sum(CASE WHEN d.key IS NOT NULL THEN p.n_occ
                         ELSE 0 END) AS BIGINT) AS n_dup_spans,
           round(sum(CASE WHEN d.key IS NOT NULL THEN p.n_occ
                          ELSE 0 END) * 1.0 / sum(p.n_occ) + 1e-9, 4)
             AS dup_ratio
    FROM pairs p LEFT JOIN dup d ON p.key = d.key
    GROUP BY 1
"""

ORACLE_SQL["q159_importance_weights"] = """
    WITH tok AS (
      SELECT doc_id, lang = 'en' AS tgt,
             unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
      FROM documents
    ), bucketed AS (
      SELECT doc_id, tgt,
             ('0x' || substring(md5(tok), 1, 8))::BIGINT % 512 AS bk
      FROM tok WHERE tok <> ''
    ), counts AS (
      SELECT bk, count(*) AS cs,
             sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct
      FROM bucketed GROUP BY 1
    ), consts AS (
      SELECT sum(cs) AS ns, sum(ct) AS nt FROM counts
    ), ratio AS (
      SELECT bk,
             CAST(round(ln(((ct + 1.0) / (nt + 512))
                          / ((cs + 1.0) / (ns + 512))) * 1000000, 0)
                  AS BIGINT) AS r
      FROM counts, consts
    )
    SELECT b.doc_id, count(*) AS n_tokens,
           round(sum(r) * 1.0 / count(*) / 1000000 + 1e-9, 6) AS imp
    FROM bucketed b JOIN ratio USING (bk)
    GROUP BY 1
"""

ORACLE_SQL["q157_byte_shards"] = """
    WITH summed AS (
      SELECT doc_id, n_chars,
             sum(n_chars) OVER (ORDER BY n_chars DESC, doc_id ASC
                                ROWS UNBOUNDED PRECEDING) AS running_bytes
      FROM documents
    )
    SELECT CAST((running_bytes - n_chars) // 50000 AS INTEGER) AS shard_id,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           struct_extract(min({'rb': running_bytes, 'id': doc_id}), 'id')
             AS first_doc_id,
           struct_extract(max({'rb': running_bytes, 'id': doc_id}), 'id')
             AS last_doc_id
    FROM summed GROUP BY 1
"""

ORACLE_SQL["q160_entity_resolution"] = """
    WITH dirty AS (
      SELECT c_custkey AS record_id, c_nationkey AS nationkey,
             lower(replace(translate(c_name, '0', 'O'), '#', ''))
               AS raw_name
      FROM customer WHERE c_custkey % 7 = 3
    ), dn AS (
      SELECT record_id, nationkey,
             translate(upper(raw_name), 'O', '0') AS norm_d
      FROM dirty
    ), cn AS (
      SELECT c_custkey, c_nationkey,
             translate(upper(c_name), 'O', '0') AS norm_c
      FROM customer
    ), cand AS (
      SELECT dn.record_id, cn.c_custkey,
             levenshtein(norm_d, norm_c) AS dist
      FROM dn JOIN cn
        ON dn.nationkey = cn.c_nationkey
       AND right(norm_d, 3) = right(norm_c, 3)
    ), ranked AS (
      SELECT record_id, c_custkey, dist,
             row_number() OVER (PARTITION BY record_id
                                ORDER BY dist, c_custkey) AS rn
      FROM cand
    )
    SELECT record_id, c_custkey AS matched_custkey, dist AS lev_distance
    FROM ranked WHERE rn = 1 AND dist <= 2
"""

ORACLE_SQL["q161_heavy_hitters"] = """
    WITH tk AS (
      SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
      FROM documents
    ), t AS (
      SELECT token FROM tk WHERE token <> ''
    ), tot AS (
      SELECT count(*) AS n FROM t
    ), f AS (
      SELECT token, count(*) AS freq FROM t GROUP BY token
    )
    SELECT token, freq FROM f, tot WHERE freq * 50 >= n
"""

ORACLE_SQL["q162_centroid_assign"] = """
    WITH v AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS ve
      FROM embeddings
      WHERE embedding IS NOT NULL
        AND sqrt(list_dot_product(embedding::DOUBLE[],
                                  embedding::DOUBLE[])) > 0
    ), comp AS (
      SELECT label, unnest(range(len(ve))) AS pos, unnest(ve) AS val
      FROM v
    ), cent AS (
      SELECT label AS cl, pos, round(avg(val), 6) AS cv
      FROM comp GROUP BY 1, 2
    ), cvecs AS (
      SELECT cl, list(cv ORDER BY pos) AS cvec
      FROM cent GROUP BY 1
    ), scored AS (
      SELECT v.vec_id, v.label, c.cl,
             round(list_dot_product(ve, cvec)
                   / (sqrt(list_dot_product(ve, ve))
                      * sqrt(list_dot_product(cvec, cvec))), 6) AS sim
      FROM v CROSS JOIN cvecs c
    ), assigned AS (
      SELECT vec_id, label, cl AS assigned_label,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY sim DESC, cl ASC) AS rn
      FROM scored
    )
    SELECT label, cast(assigned_label AS INTEGER) AS assigned_label,
           cast(count(*) AS BIGINT) AS n
    FROM assigned WHERE rn = 1 GROUP BY 1, 2
"""

ORACLE_SQL["q163_token_fertility"] = """
    WITH per_doc AS (
      SELECT lang, source,
             len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                             x -> x <> '')) AS ws,
             len(regexp_extract_all(lower(text),
                 ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s]+|\\s+')) AS bpe,
             octet_length(encode(text)) AS nb,
             length(text) AS nc
      FROM documents
    ), agg AS (
      SELECT lang, source,
             cast(count(*) AS BIGINT) AS n_docs,
             cast(sum(ws) AS BIGINT) AS ws_tokens,
             cast(sum(bpe) AS BIGINT) AS bpe_tokens,
             cast(sum(nb) AS BIGINT) AS n_bytes,
             cast(sum(nc) AS BIGINT) AS n_chars
      FROM per_doc GROUP BY 1, 2
    )
    SELECT lang, source, n_docs, ws_tokens, bpe_tokens,
           CASE WHEN ws_tokens > 0
                THEN round(bpe_tokens * 1.0 / ws_tokens, 4) END AS fertility,
           CASE WHEN bpe_tokens > 0
                THEN round(n_bytes * 1.0 / bpe_tokens, 4) END
             AS bytes_per_token,
           CASE WHEN bpe_tokens > 0
                THEN round(n_chars * 1.0 / bpe_tokens, 4) END
             AS chars_per_token
    FROM agg
"""

ORACLE_SQL["q165_incremental_dedup"] = """
    WITH newd AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 10 = 7
    ), corp AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 7
    ), nfp AS (
      SELECT doc_id, md5(lower(trim(text))) AS fp FROM newd
    ), cfp AS (
      SELECT DISTINCT md5(lower(trim(text))) AS fp FROM corp
    ), exact AS (
      SELECT doc_id FROM nfp JOIN cfp USING (fp)
    ), ntoks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
      FROM newd
    ), ctoks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
      FROM corp
    ), nsh AS (
      SELECT DISTINCT doc_id AS new_id, unnest(
        CASE WHEN len(t) >= 3
             THEN list_transform(range(1, len(t) - 1),
                                 i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
             ELSE [array_to_string(t, ' ')] END) AS sh
      FROM ntoks
    ), csh AS (
      SELECT DISTINCT doc_id AS corp_id, unnest(
        CASE WHEN len(t) >= 3
             THEN list_transform(range(1, len(t) - 1),
                                 i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
             ELSE [array_to_string(t, ' ')] END) AS sh
      FROM ctoks
    ), hot AS (
      SELECT sh FROM csh GROUP BY sh HAVING count(*) > 100
    ), nsh2 AS (
      SELECT * FROM nsh WHERE sh NOT IN (SELECT sh FROM hot)
    ), csh2 AS (
      SELECT * FROM csh WHERE sh NOT IN (SELECT sh FROM hot)
    ), szn AS (
      SELECT new_id, count(*) AS _na FROM nsh2 GROUP BY 1
    ), szc AS (
      SELECT corp_id, count(*) AS _nb FROM csh2 GROUP BY 1
    ), inter AS (
      SELECT new_id, corp_id, count(*) AS _i
      FROM nsh2 JOIN csh2 USING (sh) GROUP BY 1, 2
    ), near AS (
      SELECT DISTINCT new_id AS doc_id
      FROM inter JOIN szn USING (new_id) JOIN szc USING (corp_id)
      WHERE _i * 1.0 / (_na + _nb - _i) >= 0.2
    )
    SELECT d.doc_id,
           CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
                WHEN nr.doc_id IS NOT NULL THEN 'near_dup'
                ELSE 'keep' END AS status
    FROM newd d
    LEFT JOIN exact e USING (doc_id)
    LEFT JOIN near nr USING (doc_id)
"""

ORACLE_SQL["q166_int8_quant_error"] = """
    WITH v AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS ve
      FROM embeddings WHERE embedding IS NOT NULL
    ), s AS (
      SELECT vec_id, label, ve,
             list_aggregate(list_transform(ve, x -> abs(x)), 'max')
               / 127.0 AS scale
      FROM v
    ), r AS (
      SELECT vec_id, label, ve,
             list_transform(ve, x -> round(x / scale) * scale) AS rv
      FROM s WHERE scale > 0
    ), comp AS (
      SELECT vec_id, unnest(ve) AS a, unnest(rv) AS b FROM r
    ), err AS (
      SELECT vec_id, round(max(abs(a - b)), 6) AS _err
      FROM comp GROUP BY 1
    ), cosv AS (
      SELECT vec_id, label,
             round(list_dot_product(ve, rv)
                   / (sqrt(list_dot_product(ve, ve))
                      * sqrt(list_dot_product(rv, rv))), 6) AS _cos
      FROM r
    )
    SELECT label,
           cast(count(*) AS BIGINT) AS n_vectors,
           max(_err) AS max_abs_err,
           round(sum(cast(round(_cos * 1000000) AS BIGINT))
                 / (count(*) * 1000000.0), 6) AS mean_cos,
           cast(sum(CASE WHEN _cos >= 0.999 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_high_fidelity
    FROM cosv JOIN err USING (vec_id)
    GROUP BY 1
"""

ORACLE_SQL["q167_column_profile"] = """
    SELECT 'o_orderkey' AS col_name,
           cast(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nulls,
           cast(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           min(o_orderkey)::VARCHAR AS min_val,
           max(o_orderkey)::VARCHAR AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_custkey',
           cast(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           cast(count(DISTINCT o_custkey) AS BIGINT),
           min(o_custkey)::VARCHAR, max(o_custkey)::VARCHAR
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus',
           cast(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           cast(count(DISTINCT o_orderstatus) AS BIGINT),
           min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice',
           cast(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           cast(count(DISTINCT o_totalprice) AS BIGINT),
           round(min(o_totalprice), 2)::VARCHAR,
           round(max(o_totalprice), 2)::VARCHAR
    FROM orders
    UNION ALL
    SELECT 'o_orderdate',
           cast(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           cast(count(DISTINCT o_orderdate) AS BIGINT),
           strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S'),
           strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S')
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority',
           cast(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           cast(count(DISTINCT o_orderpriority) AS BIGINT),
           min(o_orderpriority), max(o_orderpriority)
    FROM orders
"""

ORACLE_SQL["q168_phrase_search"] = """
    WITH post0 AS (
      SELECT doc_id, unnest(t) AS token, unnest(range(len(t))) AS pos
      FROM (SELECT doc_id,
                   string_split_regex(trim(lower(text)), '\\s+') AS t
            FROM documents)
    ), p AS (
      SELECT * FROM post0 WHERE token <> ''
    ), w0 AS (
      SELECT doc_id, pos AS strt FROM p WHERE token = 'big'
    ), w1 AS (
      SELECT doc_id, pos - 1 AS strt FROM p WHERE token = 'order'
    ), w2 AS (
      SELECT doc_id, pos - 2 AS strt FROM p WHERE token = 'scan'
    ), hits AS (
      SELECT doc_id, strt
      FROM w0 JOIN w1 USING (doc_id, strt) JOIN w2 USING (doc_id, strt)
    )
    SELECT doc_id, cast(count(*) AS BIGINT) AS n_occurrences
    FROM hits GROUP BY 1
"""

ORACLE_SQL["q169_pmi_collocations"] = """
    WITH arr AS (
      SELECT list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         x -> x <> '') AS t
      FROM documents
    ), unic AS (
      SELECT tok, cast(count(*) AS BIGINT) AS f
      FROM (SELECT unnest(t) AS tok FROM arr) GROUP BY 1
    ), tot AS (
      SELECT cast(sum(f) AS BIGINT) AS n FROM unic
    ), bic AS (
      SELECT tok_a, tok_b, cast(count(*) AS BIGINT) AS joint
      FROM (SELECT unnest(t[1:-2]) AS tok_a, unnest(t[2:-1]) AS tok_b
            FROM arr WHERE len(t) >= 2)
      GROUP BY 1, 2 HAVING count(*) >= 5
    )
    SELECT tok_a, tok_b, joint,
           round(joint::DOUBLE * n::DOUBLE
                 / (fa.f::DOUBLE * fb.f::DOUBLE), 4) AS lift
    FROM bic
    CROSS JOIN tot
    JOIN unic fa ON bic.tok_a = fa.tok
    JOIN unic fb ON bic.tok_b = fb.tok
    ORDER BY lift DESC, tok_a ASC, tok_b ASC
    LIMIT 20
"""

ORACLE_SQL["q172_stratified_split"] = """
    WITH r AS (
      SELECT lang, source, doc_id,
             row_number() OVER (
               PARTITION BY lang, source
               ORDER BY md5('strat' || cast(doc_id AS VARCHAR)) ASC,
                        doc_id ASC) AS rn,
             count(*) OVER (PARTITION BY lang, source) AS n
      FROM documents
    )
    SELECT lang, source,
           CASE WHEN rn * 100 <= n * 80 THEN 'train'
                WHEN rn * 100 <= n * 90 THEN 'val'
                ELSE 'test' END AS split,
           cast(count(*) AS BIGINT) AS n_docs,
           cast(sum(doc_id) AS BIGINT) AS sum_doc_id
    FROM r GROUP BY 1, 2, 3
"""

ORACLE_SQL["q173_knn_graph"] = """
    WITH v AS (
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
    ), edges AS (
      SELECT src, dst, sim, cast(rank AS INTEGER) AS rank
      FROM ranked WHERE rank <= 5
    )
    SELECT e.src, e.dst, e.sim, e.rank,
           (r.src IS NOT NULL) AS mutual
    FROM edges e
    LEFT JOIN edges r ON r.src = e.dst AND r.dst = e.src
"""

ORACLE_SQL["q175_token_budget"] = """
    WITH t AS (
      SELECT source AS g, doc_id,
             len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                             x -> x <> '')) AS tok
      FROM documents
    ), r AS (
      SELECT g, doc_id, tok,
             cast(sum(tok) OVER (PARTITION BY g
                                 ORDER BY tok DESC, doc_id ASC
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS BIGINT) AS cum
      FROM t
    )
    SELECT g AS source,
           cast(sum(CASE WHEN cum <= 20000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_selected,
           cast(count(*) AS BIGINT) AS n_candidates,
           cast(max(CASE WHEN cum <= 20000 THEN cum END) AS BIGINT)
             AS tokens_used,
           cast(20000 AS BIGINT) AS budget_tokens
    FROM r GROUP BY 1
"""

ORACLE_SQL["q171_triangle_count"] = """
    WITH v AS (
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
      SELECT src, dst,
             row_number() OVER (PARTITION BY src
                                ORDER BY sim DESC, dst ASC) AS rank
      FROM scored
    ), edges AS (
      SELECT src, dst FROM ranked WHERE rank <= 5
    ), mut AS (
      SELECT e.src, e.dst
      FROM edges e JOIN edges r ON r.src = e.dst AND r.dst = e.src
    ), und AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM mut
    ), undl AS (
      SELECT l.label AS part, u.a, u.b
      FROM und u JOIN embeddings l ON l.vec_id = u.a
    ), deg AS (
      SELECT part, vtx, cast(count(*) AS BIGINT) AS d
      FROM (SELECT part, a AS vtx FROM undl
            UNION ALL SELECT part, b AS vtx FROM undl)
      GROUP BY 1, 2
    ), tri AS (
      SELECT e1.part, cast(count(*) AS BIGINT) AS t
      FROM undl e1
      JOIN undl e2 ON e2.part = e1.part AND e2.a = e1.a AND e1.b < e2.b
      JOIN undl e3 ON e3.part = e1.part AND e3.a = e1.b AND e3.b = e2.b
      GROUP BY 1
    ), nodes AS (
      SELECT part, cast(count(*) AS BIGINT) AS n_nodes,
             cast(sum(d * (d - 1)) AS BIGINT) AS dd
      FROM deg GROUP BY 1
    ), es AS (
      SELECT part, cast(count(*) AS BIGINT) AS n_edges
      FROM undl GROUP BY 1
    )
    SELECT es.part, n_nodes, n_edges,
           cast(coalesce(t, 0) AS BIGINT) AS n_triangles,
           cast(dd // 2 AS BIGINT) AS n_wedges,
           CASE WHEN dd > 0
                THEN round(coalesce(t, 0) * 6.0 / cast(dd AS DOUBLE), 6)
           END AS clustering_coeff
    FROM es JOIN nodes USING (part) LEFT JOIN tri USING (part)
"""

ORACLE_SQL["q174_multitouch_attribution"] = """
    WITH conv AS (
      SELECT user_id AS u, event_id AS cid, epoch_us(ts) AS cts
      FROM events WHERE event_type = 'purchase'
    ), touch AS (
      SELECT user_id AS u, event_id AS tid, epoch_us(ts) AS tts,
             'ch' || cast(cast(json_extract_string(props, '$.k') AS BIGINT)
                          % 5 AS VARCHAR) AS chan
      FROM events WHERE event_type IN ('click', 'view')
    ), j AS (
      SELECT chan, cid, tts, tid
      FROM conv JOIN touch USING (u)
      WHERE tts < cts AND tts >= cts - 86400000000
    ), r AS (
      SELECT chan, cid,
             count(*) OVER (PARTITION BY cid) AS n,
             row_number() OVER (PARTITION BY cid
                                ORDER BY tts ASC, tid ASC) AS rk
      FROM j
    ), c AS (
      SELECT chan, cid,
             cast(1000000 // n AS BIGINT)
             + CASE WHEN rk = 1 THEN cast(1000000 % n AS BIGINT)
                    ELSE 0 END AS credit
      FROM r
    )
    SELECT chan AS channel, cast(count(*) AS BIGINT) AS n_touches,
           cast(sum(credit) AS BIGINT) AS credit_micro
    FROM c GROUP BY 1
    UNION ALL
    SELECT '_total', cast(count(DISTINCT cid) AS BIGINT),
           cast(sum(credit) AS BIGINT)
    FROM c
"""

ORACLE_SQL["q176_ks_test"] = """
    WITH cells AS (
      SELECT round(value + 1e-9, 2) AS x,
             sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ca,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS cb
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY 1
    ), cum AS (
      SELECT sum(ca) OVER (ORDER BY x
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS cuma,
             sum(cb) OVER (ORDER BY x
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS cumb
      FROM cells
    ), tot AS (
      SELECT cast(max(cuma) AS BIGINT) AS n_a,
             cast(max(cumb) AS BIGINT) AS n_b
      FROM cum
    ), dnum AS (
      SELECT cast(max(abs(cuma * n_b - cumb * n_a)) AS BIGINT) AS d_numerator
      FROM cum, tot
    )
    SELECT n_a, n_b, d_numerator,
           round(d_numerator / (n_a::DOUBLE * n_b::DOUBLE), 6) AS ks_distance
    FROM tot, dnum
"""

ORACLE_SQL["q177_zone_map"] = """
    WITH r AS (
      SELECT cast(o_orderdate AS VARCHAR) AS k, o_orderkey AS tb,
             row_number() OVER (ORDER BY cast(o_orderdate AS VARCHAR) ASC,
                                         o_orderkey ASC) AS rn
      FROM orders
    )
    SELECT cast((rn - 1) // 1000 AS INT) AS shard_id,
           cast(count(*) AS BIGINT) AS n_rows,
           min(k) AS min_key, max(k) AS max_key,
           (min(k) <= '1995-12-31' AND max(k) >= '1995-01-01')
             AS overlaps_predicate
    FROM r GROUP BY 1
"""

ORACLE_SQL["q179_path_trigrams"] = """
    WITH s AS (
      SELECT user_id, epoch_us(ts) AS us, event_id, event_type FROM events
    ), tri AS (
      SELECT lag(event_type, 2) OVER w AS t1,
             lag(event_type, 1) OVER w AS t2,
             event_type AS t3
      FROM s
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    )
    SELECT t1, t2, t3, cast(count(*) AS BIGINT) AS n
    FROM tri WHERE t1 IS NOT NULL
    GROUP BY 1, 2, 3
    ORDER BY n DESC, t1 ASC, t2 ASC, t3 ASC
    LIMIT 10
"""

ORACLE_SQL["q180_chi2_ab"] = """
    WITH u AS (
      SELECT user_id, (user_id % 2 = 0) AS variant,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 1
               AS outcome
      FROM events GROUP BY 1, 2
    ), cells AS (
      SELECT
        cast(sum(CASE WHEN variant AND outcome THEN 1 ELSE 0 END)
             AS BIGINT) AS a,
        cast(sum(CASE WHEN variant AND NOT outcome THEN 1 ELSE 0 END)
             AS BIGINT) AS b,
        cast(sum(CASE WHEN NOT variant AND outcome THEN 1 ELSE 0 END)
             AS BIGINT) AS c,
        cast(sum(CASE WHEN NOT variant AND NOT outcome THEN 1 ELSE 0 END)
             AS BIGINT) AS d
      FROM u
    )
    SELECT a, b, c, d,
           round(a::DOUBLE / (a::DOUBLE + b::DOUBLE), 6) AS rate_variant,
           round(c::DOUBLE / (c::DOUBLE + d::DOUBLE), 6) AS rate_control,
           CASE WHEN (a::DOUBLE + b::DOUBLE) * (c::DOUBLE + d::DOUBLE)
                     * (a::DOUBLE + c::DOUBLE) * (b::DOUBLE + d::DOUBLE) > 0
                THEN round(
                  (a::DOUBLE + b::DOUBLE + c::DOUBLE + d::DOUBLE)
                  * (a::DOUBLE * d::DOUBLE - b::DOUBLE * c::DOUBLE)
                  * (a::DOUBLE * d::DOUBLE - b::DOUBLE * c::DOUBLE)
                  / ((a::DOUBLE + b::DOUBLE) * (c::DOUBLE + d::DOUBLE)
                     * (a::DOUBLE + c::DOUBLE) * (b::DOUBLE + d::DOUBLE)), 6)
           END AS chi2
    FROM cells
"""

ORACLE_SQL["q181_rfm_segments"] = """
    WITH conv AS (
      SELECT * FROM events WHERE event_type = 'purchase'
    ), pu AS (
      SELECT user_id AS u, max(cast(ts AS DATE)) AS last_d,
             count(*) AS freq,
             cast(sum(cast(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM conv GROUP BY 1
    ), anchor AS (
      SELECT max(last_d) AS a FROM pu
    ), sc AS (
      SELECT u, date_diff('day', last_d, a) AS rec, freq, cents
      FROM pu, anchor
    ), tiled AS (
      SELECT u, cents,
             ntile(5) OVER (ORDER BY rec ASC, u ASC) AS r,
             ntile(5) OVER (ORDER BY freq DESC, u ASC) AS f,
             ntile(5) OVER (ORDER BY cents DESC, u ASC) AS m
      FROM sc
    )
    SELECT cast(r AS VARCHAR) || '-' || cast(f AS VARCHAR) || '-'
             || cast(m AS VARCHAR) AS segment,
           cast(count(*) AS BIGINT) AS n_users,
           cast(sum(cents) AS BIGINT) AS total_cents
    FROM tiled GROUP BY 1
"""

ORACLE_SQL["q182_mrl_audit"] = """
    WITH dimsv AS (
      SELECT * FROM (VALUES (0), (16), (32)) t(dims)
    ), base AS (
      SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
    ), sl AS (
      SELECT dims, id,
             list_slice(v, 1, CASE WHEN dims = 0 THEN 100000
                                   ELSE dims END) AS s
      FROM dimsv CROSS JOIN base
    ), nn AS (
      SELECT dims, id, s, sqrt(list_dot_product(s, s)) AS n FROM sl
    ), q AS (
      SELECT dims, id AS qid, s AS qs, n AS qn FROM nn WHERE id < 10
    ), sc AS (
      SELECT q.dims, q.qid, c.id,
             round(list_dot_product(q.qs, c.s) / (q.qn * c.n), 6) AS sim
      FROM q JOIN nn c ON c.dims = q.dims AND c.id <> q.qid
      WHERE q.qn > 0 AND c.n > 0
    ), rk AS (
      SELECT dims, qid, id,
             row_number() OVER (PARTITION BY dims, qid
                                ORDER BY sim DESC, id ASC) AS rk
      FROM sc
    ), top AS (
      SELECT * FROM rk WHERE rk <= 3
    ), fullt AS (
      SELECT qid, id AS fid, rk AS frk FROM top WHERE dims = 0
    ), ov AS (
      SELECT t.dims, t.qid, count(*) AS ovl,
             sum(CASE WHEN t.rk = 1 AND f.frk = 1 THEN 1 ELSE 0 END) AS t1
      FROM top t JOIN fullt f ON f.qid = t.qid AND f.fid = t.id
      WHERE t.dims <> 0 GROUP BY 1, 2
    )
    SELECT dims, cast(count(*) AS BIGINT) AS n_queries,
           cast(sum(ovl) AS BIGINT) AS sum_topk_overlap,
           cast(sum(t1) AS BIGINT) AS n_top1_match
    FROM ov GROUP BY 1
"""

ORACLE_SQL["q183_vocab_oov"] = """
    WITH toks AS (
      SELECT lang AS g,
             unnest(list_filter(string_split_regex(trim(lower(text)),
                                                   '\\s+'),
                    x -> x <> '')) AS tok
      FROM documents
    ), freq AS (
      SELECT tok, count(*) AS f FROM toks GROUP BY 1
    ), vocab AS (
      SELECT tok FROM (
        SELECT tok, row_number() OVER (ORDER BY f DESC, tok ASC) AS rk
        FROM freq
      ) WHERE rk <= 1000
    ), flagged AS (
      SELECT g, t.tok, (v.tok IS NOT NULL) AS in_vocab
      FROM toks t LEFT JOIN vocab v ON v.tok = t.tok
    )
    SELECT g AS lang, cast(count(*) AS BIGINT) AS n_tokens,
           cast(sum(CASE WHEN NOT in_vocab THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           round(sum(CASE WHEN NOT in_vocab THEN 1 ELSE 0 END)
                 / count(*)::DOUBLE, 6) AS oov_rate
    FROM flagged GROUP BY 1
"""

ORACLE_SQL["q184_centroid_drift"] = """
    WITH e AS (
      SELECT label AS l, (vec_id % 2 = 0) AS ha,
             unnest(range(0, len(embedding))) AS dim,
             unnest(embedding) AS x
      FROM embeddings
    ), cent AS (
      SELECT l, dim, ha,
             cast(round(round(avg(x) + 1e-9, 4) * 10000) AS BIGINT) AS mi,
             count(*) AS cnt
      FROM e GROUP BY 1, 2, 3
    ), a AS (
      SELECT l, dim, mi AS ma, cnt AS ca FROM cent WHERE ha
    ), b AS (
      SELECT l, dim, mi AS mb, cnt AS cb FROM cent WHERE NOT ha
    ), folded AS (
      SELECT l, max(ca) AS vca, max(cb) AS vcb,
             cast(sum(ma * mb) AS BIGINT) AS dot,
             cast(sum(ma * ma) AS BIGINT) AS nna,
             cast(sum(mb * mb) AS BIGINT) AS nnb
      FROM a JOIN b USING (l, dim) GROUP BY 1
    )
    SELECT l AS label, cast(vca AS BIGINT) AS n_a,
           cast(vcb AS BIGINT) AS n_b,
           CASE WHEN nna > 0 AND nnb > 0
                THEN round(dot / (sqrt(nna::DOUBLE) * sqrt(nnb::DOUBLE)), 6)
           END AS drift_cos
    FROM folded
"""

ORACLE_SQL["q185_activity_streaks"] = """
    WITH days AS (
      SELECT DISTINCT user_id AS u,
             date_diff('day', DATE '2024-01-01', cast(ts AS DATE)) AS d
      FROM events
    ), isl AS (
      SELECT u, d - row_number() OVER (PARTITION BY u ORDER BY d) AS g
      FROM days
    ), runs AS (
      SELECT u, g, count(*) AS len FROM isl GROUP BY 1, 2
    ), best AS (
      SELECT u, max(len) AS streak_days FROM runs GROUP BY 1
    )
    SELECT cast(streak_days AS INT) AS streak_days,
           cast(count(*) AS BIGINT) AS n_users
    FROM best GROUP BY 1
"""

ORACLE_SQL["q186_hard_negatives"] = """
    WITH base AS (
      SELECT vec_id AS id, label AS lbl, embedding::DOUBLE[] AS v
      FROM embeddings
    ), n AS (
      SELECT id, lbl, v, sqrt(list_dot_product(v, v)) AS nn FROM base
    ), a AS (
      SELECT id AS aid, lbl AS albl, v AS av, nn AS an
      FROM n WHERE id < 10
    ), p AS (
      SELECT a.aid AS anchor_id, c.id AS neighbor_id,
             c.lbl AS neighbor_label,
             round(list_dot_product(a.av, c.v) / (a.an * c.nn), 6) AS sim
      FROM a JOIN n c ON c.lbl <> a.albl
      WHERE a.an > 0 AND c.nn > 0
    ), r AS (
      SELECT *, row_number() OVER (PARTITION BY anchor_id
                                   ORDER BY sim DESC, neighbor_id ASC)
                AS rk
      FROM p
    )
    SELECT anchor_id, neighbor_id, neighbor_label, sim,
           cast(rk AS INTEGER) AS rank
    FROM r WHERE rk <= 5
"""

ORACLE_SQL["q187_cohort_retention"] = """
    WITH weeks AS (
      SELECT DISTINCT user_id AS u,
             date_diff('day', DATE '2024-01-01', cast(ts AS DATE)) // 7
               AS w
      FROM events
    ), cohorted AS (
      SELECT u, w, min(w) OVER (PARTITION BY u) AS cw FROM weeks
    )
    SELECT cast(cw AS INTEGER) AS cohort_week,
           cast(w - cw AS INTEGER) AS week_offset,
           cast(count(*) AS BIGINT) AS n_users
    FROM cohorted GROUP BY 1, 2
"""

ORACLE_SQL["q188_calibration_bins"] = """
    WITH snapped AS (
      SELECT cast(round(((user_id * 2654435761) % 10001) / 10000.0
                        * 10000) AS BIGINT) AS g,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ), binned AS (
      SELECT least(g * 10 // 10000, 9) AS bin, g, y FROM snapped
    )
    SELECT cast(bin AS INTEGER) AS bin,
           cast(count(*) AS BIGINT) AS n,
           round(sum(g) / (10000.0 * count(*)), 6) AS mean_score,
           round(sum(y) / cast(count(*) AS DOUBLE), 6) AS pos_rate
    FROM binned GROUP BY 1
"""

ORACLE_SQL["q189_knn_label_agreement"] = """
    WITH base AS (
      SELECT vec_id AS id, label AS lbl, embedding::DOUBLE[] AS v
      FROM embeddings
    ), n AS (
      SELECT id, lbl, v, sqrt(list_dot_product(v, v)) AS nn FROM base
    ), a AS (
      SELECT id AS aid, lbl AS albl, v AS av, nn AS an
      FROM n WHERE id < 20
    ), sims AS (
      SELECT a.aid, a.albl, c.id AS nid, c.lbl AS nlbl,
             round(list_dot_product(a.av, c.v) / (a.an * c.nn), 6) AS sim
      FROM a JOIN n c ON c.id <> a.aid
      WHERE a.an > 0 AND c.nn > 0
    ), nbrs AS (
      SELECT * FROM (
        SELECT aid, albl, nid, nlbl,
               row_number() OVER (PARTITION BY aid
                                  ORDER BY sim DESC, nid ASC) AS rk
        FROM sims
      ) WHERE rk <= 5
    ), votes AS (
      SELECT aid, albl, nlbl, count(*) AS nv
      FROM nbrs GROUP BY 1, 2, 3
    ), pred AS (
      SELECT aid, albl, nlbl,
             row_number() OVER (PARTITION BY aid
                                ORDER BY nv DESC, nlbl ASC) AS vr
      FROM votes
    )
    SELECT albl AS label, cast(count(*) AS BIGINT) AS n_anchors,
           cast(sum(CASE WHEN nlbl = albl THEN 1 ELSE 0 END) AS BIGINT)
             AS n_agree
    FROM pred WHERE vr = 1 GROUP BY 1
"""

ORACLE_SQL["q190_normalized_dedup"] = """
    WITH g AS (
      SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
               AS k,
             count(*) AS size, count(DISTINCT text) AS variants
      FROM documents GROUP BY 1
    )
    SELECT cast(size AS INTEGER) AS group_size,
           cast(variants AS INTEGER) AS n_raw_variants,
           cast(count(*) AS BIGINT) AS n_groups
    FROM g GROUP BY 1, 2
"""

ORACLE_SQL["q191_nucleus_vocab"] = """
    WITH toks AS (
      SELECT lang AS g,
             unnest(list_filter(string_split_regex(trim(lower(text)),
                                                   '\\s+'),
                    x -> x <> '')) AS tok
      FROM documents
    ), freq AS (
      SELECT g, tok, count(*) AS f FROM toks GROUP BY 1, 2
    ), levels AS (
      SELECT g, f, count(*) AS n_at_f, f * count(*) AS mass
      FROM freq GROUP BY 1, 2
    ), cum AS (
      SELECT g, f, n_at_f, mass,
             sum(mass) OVER (PARTITION BY g ORDER BY f DESC
                             ROWS UNBOUNDED PRECEDING) AS cum_mass,
             sum(n_at_f) OVER (PARTITION BY g ORDER BY f DESC
                               ROWS UNBOUNDED PRECEDING) AS cum_toks,
             sum(mass) OVER (PARTITION BY g) AS total,
             sum(n_at_f) OVER (PARTITION BY g) AS n_distinct
      FROM levels
    )
    SELECT g AS lang, cast(total AS BIGINT) AS total_tokens,
           cast(n_distinct AS BIGINT) AS distinct_tokens,
           cast(cum_toks - n_at_f
                + (90 * total - 100 * (cum_mass - mass) + 100 * f - 1)
                  // (100 * f) AS BIGINT) AS nucleus_vocab
    FROM cum
    WHERE 100 * cum_mass >= 90 * total
      AND 100 * (cum_mass - mass) < 90 * total
"""

ORACLE_SQL["q192_prefix_paths"] = """
    WITH ranked AS (
      SELECT user_id AS u, event_type AS et,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts ASC, event_id ASC) AS rn
      FROM events
    ), paths AS (
      SELECT u, string_agg(et, '>' ORDER BY rn) AS path
      FROM ranked WHERE rn <= 3 GROUP BY 1
    )
    SELECT path, cast(count(*) AS BIGINT) AS n_users
    FROM paths GROUP BY 1
"""

ORACLE_SQL["q194_char_entropy"] = """
    WITH chars AS (
      SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents
    ), counts AS (
      SELECT doc_id, c, count(*) AS n
      FROM chars WHERE c <> '' GROUP BY 1, 2
    ), per_doc AS (
      SELECT doc_id, sum(n) AS tot, sum(n * log2(n)) AS s
      FROM counts GROUP BY 1
    )
    SELECT doc_id, cast(tot AS BIGINT) AS n_chars,
           round(log2(tot) - s / tot + 1e-9, 4) AS entropy
    FROM per_doc
"""

ORACLE_SQL["q196_degree_histogram"] = """
    WITH pairs AS (
      SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ), sym AS (
      SELECT src AS n FROM pairs UNION ALL SELECT dst FROM pairs
    ), deg AS (
      SELECT n, count(*) AS d FROM sym GROUP BY 1
    )
    SELECT cast(length(bin(d)) AS INTEGER) AS degree_bucket,
           cast(min(d) AS BIGINT) AS min_degree,
           cast(max(d) AS BIGINT) AS max_degree,
           cast(count(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY 1
"""

ORACLE_SQL["q197_bitmap_distinct"] = """
    SELECT cast(ts AS DATE) AS date,
           cast(count(DISTINCT user_id) AS BIGINT) AS n_distinct
    FROM events GROUP BY 1
"""

ORACLE_SQL["q198_cross_source_overlap"] = """
    WITH keyed AS (
      SELECT DISTINCT md5(text) AS h, source AS s FROM documents
    )
    SELECT a.s AS source_a, b.s AS source_b,
           cast(count(*) AS BIGINT) AS n_shared_texts
    FROM keyed a JOIN keyed b ON a.h = b.h AND a.s < b.s
    GROUP BY 1, 2
"""

ORACLE_SQL["q199_char_trigram_profile"] = """
    WITH grams AS (
      SELECT lang AS g,
             unnest(CASE WHEN length(lower(text)) >= 3
                    THEN list_transform(
                           range(1, length(lower(text)) - 1),
                           i -> substr(lower(text), i, 3))
                    ELSE []::VARCHAR[] END) AS tri
      FROM documents
    ), counts AS (
      SELECT g, tri, count(*) AS n FROM grams GROUP BY 1, 2
    ), ranked AS (
      SELECT g, tri, n,
             row_number() OVER (PARTITION BY g
                                ORDER BY n DESC, tri ASC) AS rk
      FROM counts
    )
    SELECT g AS lang, tri AS trigram, cast(n AS BIGINT) AS n,
           cast(rk AS INTEGER) AS rank
    FROM ranked WHERE rk <= 10
"""
