"""Distributed cardinality sketches (extension surface).

The reference's warehouse (reference:api.py + BigQuery tables) has no
sketch layer; at 100 TB `COUNT(DISTINCT)` over a high-cardinality key
is exactly the query that stops fitting (a full shuffle of every
distinct value). The standard fix is HyperLogLog: a fixed 2^p-register
sketch per group that merges with `max` — the aggregation becomes one
map-side-combined hash agg over (group, register), constant state per
group, mergeable across partitions/days/files by construction.

Engine pinning: Spark ships `approx_count_distinct` (HLL++), but its
register hashing is JVM-private — no external engine can reproduce the
estimate bit-for-bit, so it can only get a rows-only gate. This module
instead derives registers from md5 (the repo-wide cross-engine hash):
register index = first 2 hex chars (p=8, 256 registers), the rho
sub-hash = next 13 hex chars (52 bits), so DuckDB computes the
IDENTICAL registers and the IDENTICAL estimate. The harmonic-mean sum
is kept as an exact INTEGER (sum of 2^(53-Mj) — every term a power of
two <= 2^52, 256 terms < 2^61, no float-summation order dependence);
the single float division happens once, identically, in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: alpha_256 = 0.7213 / (1 + 1.079/256), pinned as a literal — an
#: expression would be evaluated by two different runtimes.
_ALPHA_256 = 0.718273
_P = 8
_M = 256  # 2^p registers
_WBITS = 52  # 13 hex chars of rho sub-hash
_SCALE = float(1 << (_WBITS + 1))  # 2^53, the integer-sum scale


def hll_registers(
    df: DataFrame, key_col: str, group_col: str
) -> DataFrame:
    """(group, register, max_rho) — the mergeable sketch state.

    One projection + one (group, reg) hash agg; at most 256 rows per
    group survive regardless of input size, and partial `max` combines
    map-side, so the shuffle carries <= |groups|·256 rows total. This
    IS the scale win: re-aggregating a month of daily sketches is a
    `max` over 256-row states, never a re-scan of the raw keys.
    """
    digest = F.md5(F.col(key_col).cast("string"))
    reg = F.conv(F.substring(digest, 1, 2), 16, 10).cast("int")
    w = F.conv(F.substring(digest, 3, 13), 16, 10).cast("long")
    # rho = leading zeros of the 52-bit w, + 1 = 53 - bit_length(w).
    # bin() drops leading zeros in both engines; w = 0 (all 52 bits
    # zero) is special-cased because bin(0) = '0' has length 1.
    rho = F.when(w == 0, F.lit(_WBITS + 1)).otherwise(
        F.lit(_WBITS + 1) - F.length(F.bin(w))
    )
    return (
        df.select(
            F.col(group_col).alias("g"),
            reg.alias("reg"),
            rho.alias("rho"),
        )
        .groupBy("g", "reg")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_distinct(
    df: DataFrame, key_col: str, group_col: str
) -> DataFrame:
    """Per-group HLL cardinality estimate next to the exact count.

    Output: (g, n_registers, est_distinct, exact_distinct, rel_err).
    The raw HLL estimate (no small/large-range correction — the
    corrections need ln(), a libm call that is not bit-stable across
    engines; the audit column `rel_err` shows the resulting bias
    honestly instead of hiding it).

    exact_distinct is a second hash agg over the same scan — it exists
    as the audit twin; a production caller at 100 TB would drop it and
    keep only the sketch path.
    """
    regs = hll_registers(df, key_col, group_col)
    # Integer harmonic sum: present register Mj contributes 2^(53-Mj)
    # (Mj >= 1 so each term <= 2^52); each of the (256 - V) missing
    # registers contributes 2^-0 = 1 -> 2^53 scaled.
    sketch = regs.groupBy("g").agg(
        F.count("*").cast("int").alias("n_registers"),
        # SQL-expr shift: pyspark's F.shiftleft only takes a literal
        # bit count; the per-register count must be an expression.
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_WBITS + 1} - max_rho)")
        ).alias("_s_present"),
    )
    s_int = F.col("_s_present") + (
        (F.lit(_M) - F.col("n_registers")).cast("long")
        * F.lit(1 << (_WBITS + 1)).cast("long")
    )
    est = F.round(
        F.lit(_ALPHA_256 * _M * _M) * F.lit(_SCALE) / s_int.cast("double"), 2
    )
    exact = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count_distinct(F.col(key_col)).alias("exact_distinct")
    )
    return (
        sketch.join(exact, on="g")
        .select(
            "g",
            "n_registers",
            est.alias("est_distinct"),
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
            F.round(
                F.abs(est - F.col("exact_distinct"))
                / F.col("exact_distinct").cast("double"),
                4,
            ).alias("rel_err"),
        )
    )


def hll_oracle_sql(table: str, key_sql: str, group_sql: str) -> str:
    """DuckDB twin of hll_distinct — identical registers, identical
    integer harmonic sum, identical single division."""
    return f"""
        WITH h AS (
          SELECT {group_sql} AS g,
                 ('0x' || substr(md5(cast({key_sql} AS VARCHAR)), 1, 2))::INT
                   AS reg,
                 ('0x' || substr(md5(cast({key_sql} AS VARCHAR)), 3, 13))::BIGINT
                   AS w
          FROM {table}
        ), regs AS (
          SELECT g, reg,
                 max(CASE WHEN w = 0 THEN {_WBITS + 1}
                          ELSE {_WBITS + 1} - length(bin(w)) END) AS max_rho
          FROM h GROUP BY 1, 2
        ), sk AS (
          SELECT g, cast(count(*) AS INT) AS n_registers,
                 cast(sum(1::BIGINT << ({_WBITS + 1} - max_rho)) AS BIGINT)
                   AS s_present
          FROM regs GROUP BY 1
        ), ex AS (
          SELECT {group_sql} AS g,
                 cast(count(DISTINCT {key_sql}) AS BIGINT) AS exact_distinct
          FROM {table} GROUP BY 1
        )
        SELECT sk.g, n_registers,
               round(({_ALPHA_256 * _M * _M}::DOUBLE * {_SCALE!r}::DOUBLE)
                     / cast(s_present + (256 - n_registers)::BIGINT
                            * {1 << (_WBITS + 1)}::BIGINT AS DOUBLE), 2)
                 AS est_distinct,
               exact_distinct,
               round(abs(round(({_ALPHA_256 * _M * _M}::DOUBLE
                                * {_SCALE!r}::DOUBLE)
                     / cast(s_present + (256 - n_registers)::BIGINT
                            * {1 << (_WBITS + 1)}::BIGINT AS DOUBLE), 2)
                         - exact_distinct)
                     / cast(exact_distinct AS DOUBLE), 4) AS rel_err
        FROM sk JOIN ex USING (g)
    """


_CMS_DEPTH = 4
_CMS_WIDTH = 256  # 2 hex chars per slice


def cms_cells(df: DataFrame, key_col: str) -> DataFrame:
    """(d, pos, c) Count-Min sketch cells — depth 4 × width 256,
    positions from four 2-hex-char slices of ONE md5 per row (the
    bloom.py slicing idiom: one digest, k derived positions).

    Like the HLL registers, the sketch is the aggregation state: at
    most 1024 cells regardless of input size, mergeable by cell-wise
    SUM — a day of traffic compresses to 1024 longs, and re-totaling a
    month is a sum over 1024-row states.
    """
    digest = F.md5(F.col(key_col).cast("string"))
    rows = df.select(
        *[
            F.conv(F.substring(digest, 1 + 2 * d, 2), 16, 10)
            .cast("int")
            .alias(f"_p{d}")
            for d in range(_CMS_DEPTH)
        ]
    )
    stacked = rows.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), F.col(f"_p{d}").alias("pos")
                    )
                    for d in range(_CMS_DEPTH)
                ]
            )
        ).alias("_c")
    ).select("_c.d", "_c.pos")
    return stacked.groupBy("d", "pos").agg(F.count("*").alias("c"))


def cms_point_estimates(
    df: DataFrame, key_col: str, query_keys: list[int]
) -> DataFrame:
    """Count-Min point-frequency estimates for ``query_keys`` next to
    their exact counts. CMS guarantees est ≥ exact (one-sided error);
    the output's `overestimate` audit column witnesses it per key.

    The probe side computes each query key's 4 (d, pos) coordinates
    and equi-joins the 1024-cell sketch (broadcast — the sketch is a
    constant-size dimension); `min` over the 4 depths is the estimate.

    Output: (key, est_count, exact_count, overestimate).
    """
    if not query_keys:
        raise ValueError("query_keys must be non-empty")
    cells = cms_cells(df, key_col)
    spark = df.sparkSession
    q = spark.createDataFrame(
        [(int(k),) for k in query_keys], ["key"]
    )
    digest = F.md5(F.col("key").cast("string"))
    probes = q.select(
        "key",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.conv(F.substring(digest, 1 + 2 * d, 2), 16, 10)
                        .cast("int")
                        .alias("pos"),
                    )
                    for d in range(_CMS_DEPTH)
                ]
            )
        ).alias("_c"),
    ).select("key", "_c.d", "_c.pos")
    est = (
        probes.join(F.broadcast(cells), on=["d", "pos"], how="left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est_count"))
    )
    exact = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("_n")
    )
    return (
        est.join(exact, on="key", how="left")
        .select(
            "key",
            F.col("est_count").cast("long").alias("est_count"),
            F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("exact_count"),
            (F.col("est_count") >= F.coalesce(F.col("_n"), F.lit(0))).alias(
                "overestimate"
            ),
        )
    )


def cms_oracle_sql(table: str, key_sql: str, query_keys: list[int]) -> str:
    """DuckDB twin of cms_point_estimates — identical digests,
    identical cells, identical min-over-depths."""
    keys_list = ", ".join(f"({int(k)})" for k in query_keys)
    slices = " UNION ALL ".join(
        f"SELECT {d} AS d, ('0x' || substr(h, {1 + 2 * d}, 2))::INT AS pos,"
        " 1 AS one FROM hashed"
        for d in range(_CMS_DEPTH)
    )
    qslices = " UNION ALL ".join(
        f"SELECT key, {d} AS d,"
        f" ('0x' || substr(md5(cast(key AS VARCHAR)), {1 + 2 * d}, 2))::INT"
        " AS pos FROM qk"
        for d in range(_CMS_DEPTH)
    )
    return f"""
        WITH hashed AS (
          SELECT md5(cast({key_sql} AS VARCHAR)) AS h FROM {table}
        ), cells AS (
          SELECT d, pos, cast(count(*) AS BIGINT) AS c
          FROM ({slices}) GROUP BY 1, 2
        ), qk AS (
          SELECT * FROM (VALUES {keys_list}) t(key)
        ), probes AS (
          {qslices}
        ), est AS (
          SELECT key, cast(min(coalesce(c, 0)) AS BIGINT) AS est_count
          FROM probes LEFT JOIN cells USING (d, pos)
          GROUP BY 1
        ), ex AS (
          SELECT {key_sql} AS key, cast(count(*) AS BIGINT) AS n
          FROM {table} GROUP BY 1
        )
        SELECT cast(est.key AS BIGINT) AS key, est_count,
               cast(coalesce(n, 0) AS BIGINT) AS exact_count,
               est_count >= coalesce(n, 0) AS overestimate
        FROM est LEFT JOIN ex ON est.key = ex.key
    """


def bitmap_distinct_daily(
    events: DataFrame, key_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """EXACT per-day distinct keys via Spark's bitmap-index aggregate
    family (bitmap_bucket_number / bitmap_bit_position /
    bitmap_construct_agg / bitmap_count) — the rollup-friendly
    alternative to count(distinct): per-(day, bucket) bitmaps OR
    together across any re-grouping (day→week→month) WITHOUT
    re-scanning the fact table, which count(distinct) cannot do.
    HLL (``hll_distinct``) trades that exactness for fixed size; this
    is the exact tier of the same architecture.

    Plan shape: one (day, bucket) hash agg builds the bitmaps —
    map-side partial bitmap_construct_agg collapses each partition to
    one bitmap per group before the exchange; the per-day bit-count
    sum is then a tiny second agg. Keys spread over buckets
    (bucket = key div 32768), so one hot day never concentrates into
    one task. Output: (date, n_distinct).
    """
    day = F.to_date(F.col(ts_col))
    per_bucket = (
        events.select(
            day.alias("date"),
            F.expr(f"bitmap_bucket_number({key_col})").alias("_bk"),
            F.expr(f"bitmap_bit_position({key_col})").alias("_pos"),
        )
        .groupBy("date", "_bk")
        .agg(F.expr("bitmap_construct_agg(_pos)").alias("_bm"))
    )
    return per_bucket.groupBy("date").agg(
        F.sum(F.expr("bitmap_count(_bm)")).cast("long").alias("n_distinct")
    )


#: Source-similarity MinHash parameters (shared by the Spark plan and
#: the DuckDB twin below — one definition site). The 16 hash functions
#: are 16 DISJOINT 32-bit slices of 4 md5 digests (seed slot 4g+j =
#: hex chars [1+8j, 8+8j] of md5(g ':' shingle)) — md5 dominates the
#: scan CPU, so 4 digests instead of 16 quarters the hashing cost
#: (the q149 bootstrap trick). 32-bit values can collide at large
#: shingle cardinalities; a collision only perturbs the ESTIMATE, and
#: both engines compute the identical perturbed value.
_MH_HASHES = 16
_MH_DIGESTS = 4
_MH_SLICE_HEX = 8  # 32-bit slices


def source_minhash_similarity(
    docs: DataFrame,
    k: int = 3,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-grain MinHash: one 16-slot signature PER SOURCE over its
    distinct word-k-gram shingles, pairwise signature agreement as the
    Jaccard estimate, with the exact Jaccard alongside as the audit
    column.

    This is the sketch at a different grain than document dedup: "how
    much do two crawl snapshots / two vendors / two dumps overlap?" is
    a pre-purchase / pre-mixing question asked of whole corpora. The
    signature is a MERGEABLE aggregate (min per (source, seed)) — at
    100 TB each ingestion batch computes its own 16 mins map-side, and
    corpus signatures are a `min` over batch signatures, never a
    re-scan; the pairwise comparison touches |sources|² signatures of
    16 longs, independent of corpus size. The exact-Jaccard column is
    the sf-scale audit that would be DROPPED at 100 TB (it joins the
    distinct-shingle sets); the estimate column is the product.

    Hash 4g+j of shingle s = hex chars [1+8j, 8+8j] of
    md5(g || ':' || s) as a 32-bit BIGINT — the repo-wide portable
    hash, sliced so the scan pays 4 md5s per shingle, not 16; DuckDB
    computes the identical signatures, match counts, and estimates.
    The 16 mins are computed as 16 parallel `min` aggregates over the
    un-exploded shingle rows (no ×16 row blow-up anywhere).

    Output: (src_a, src_b, sig_matches, est_jaccard, exact_jaccard)
    for every unordered source pair, both estimates 4 dp.
    """
    from ..functions.text import word_shingles
    from .util import ensure_parallelism

    sh = (
        ensure_parallelism(docs)
        .select(
            F.col(group_col).alias("g"),
            F.explode(
                F.array_distinct(word_shingles(F.col(text_col), k))
            ).alias("sh"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    # projection boundary so each digest is computed ONCE per row and
    # the 4 slice-convs below reuse it, instead of 16 md5 calls
    digests = sh.select(
        "g",
        *[
            F.md5(
                F.concat(F.lit(f"{d}:"), F.col("sh"))
            ).alias(f"_d{d}")
            for d in range(_MH_DIGESTS)
        ],
    )

    def _slice(d: int, j: int):
        return F.conv(
            F.substring(
                F.col(f"_d{d}"), 1 + _MH_SLICE_HEX * j, _MH_SLICE_HEX
            ),
            16,
            10,
        ).cast("long")

    slots = [
        (d * (_MH_HASHES // _MH_DIGESTS) + j, d, j)
        for d in range(_MH_DIGESTS)
        for j in range(_MH_HASHES // _MH_DIGESTS)
    ]
    sig_wide = digests.groupBy("g").agg(
        *[F.min(_slice(d, j)).alias(f"mh{s}") for s, d, j in slots]
    )
    sig = sig_wide.select(
        "g",
        F.posexplode(
            F.array(*[F.col(f"mh{s}") for s, _, _ in slots])
        ).alias("seed", "mh"),
    )
    a = sig.select(
        F.col("g").alias("src_a"), "seed", F.col("mh").alias("mh_a")
    )
    b = sig.select(
        F.col("g").alias("src_b"), "seed", F.col("mh").alias("mh_b")
    )
    matches = (
        a.join(b, on="seed")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(
            F.sum(
                (F.col("mh_a") == F.col("mh_b")).cast("long")
            ).alias("sig_matches")
        )
    )
    sizes = sh.groupBy("g").agg(F.count("*").alias("n"))
    inter = (
        sh.select(F.col("g").alias("src_a"), "sh")
        .join(sh.select(F.col("g").alias("src_b"), "sh"), on="sh")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        matches.join(inter, on=["src_a", "src_b"], how="left")
        .join(
            sizes.select(F.col("g").alias("src_a"), F.col("n").alias("na")),
            on="src_a",
        )
        .join(
            sizes.select(F.col("g").alias("src_b"), F.col("n").alias("nb")),
            on="src_b",
        )
        .select(
            "src_a",
            "src_b",
            F.col("sig_matches").cast("int").alias("sig_matches"),
            F.round(F.col("sig_matches") / float(_MH_HASHES), 4).alias(
                "est_jaccard"
            ),
            F.round(
                F.coalesce(F.col("inter"), F.lit(0))
                / (F.col("na") + F.col("nb") - F.coalesce(F.col("inter"), F.lit(0))),
                4,
            ).alias("exact_jaccard"),
        )
    )


def source_minhash_oracle_sql(table: str = "documents", k: int = 3) -> str:
    """DuckDB twin of source_minhash_similarity — identical shingles,
    identical digest-sliced 32-bit hashes (seed 4g+j = hex chars
    [1+8j, 8+8j] of md5(g ':' shingle)), min-signatures, divisions.
    The k-gram concat is GENERATED from ``k`` (one ``t[i+j]`` term per
    offset), so a non-default k can never silently produce a 3-gram
    oracle against a k-gram Spark plan."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    per_digest = _MH_HASHES // _MH_DIGESTS
    gram = ", ".join(f"t[i+{j}]" for j in range(k))
    return f"""
        WITH toks AS (
          SELECT source AS g, string_split_regex(trim(lower(text)), '\\s+') AS t
          FROM {table}
        ), sh AS (
          SELECT DISTINCT g, unnest(
            CASE WHEN len(t) >= {k}
                 THEN list_transform(range(1, len(t) - {k - 2}),
                                     i -> concat_ws(' ', {gram}))
                 ELSE [array_to_string(t, ' ')] END) AS sh
          FROM toks
        ), seeded AS (
          SELECT g, sh, unnest(range({_MH_HASHES})) AS seed FROM sh
        ), sig AS (
          SELECT g, seed,
                 min(('0x' || substr(
                        md5((seed // {per_digest})::VARCHAR || ':' || sh),
                        1 + {_MH_SLICE_HEX} * (seed % {per_digest}),
                        {_MH_SLICE_HEX}))::BIGINT) AS mh
          FROM seeded GROUP BY 1, 2
        ), matches AS (
          SELECT a.g AS src_a, b.g AS src_b,
                 cast(sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS INT)
                   AS sig_matches
          FROM sig a JOIN sig b ON a.seed = b.seed AND a.g < b.g
          GROUP BY 1, 2
        ), sizes AS (
          SELECT g, cast(count(*) AS BIGINT) AS n FROM sh GROUP BY 1
        ), inter AS (
          SELECT a.g AS src_a, b.g AS src_b,
                 cast(count(*) AS BIGINT) AS inter
          FROM sh a JOIN sh b ON a.sh = b.sh AND a.g < b.g
          GROUP BY 1, 2
        )
        SELECT m.src_a, m.src_b, m.sig_matches,
               round(m.sig_matches / {float(_MH_HASHES)!r}, 4) AS est_jaccard,
               round(coalesce(i.inter, 0) * 1.0
                     / (sa.n + sb.n - coalesce(i.inter, 0)), 4)
                 AS exact_jaccard
        FROM matches m
        LEFT JOIN inter i ON m.src_a = i.src_a AND m.src_b = i.src_b
        JOIN sizes sa ON m.src_a = sa.g
        JOIN sizes sb ON m.src_b = sb.g
    """


def kmv_set_ops(
    df: DataFrame,
    key_col: str,
    set_col: str,
    set_a: str,
    set_b: str,
    k: int = 256,
) -> DataFrame:
    """KMV (k-minimum-values) sketches for two keyed sets, with the
    SET ALGEBRA an HLL register bank cannot do: distinct estimates for
    A, B, A∪B, and A∩B from three k-row sketches.

    KMV keeps the k smallest 52-bit hash values of each set; with
    hashes uniform on [0, M), D ≈ (k−1)·M / h_(k). The union sketch is
    the k smallest of A∪B directly; the intersection uses the standard
    ratio estimator ρ = |KMV(A∪B) ∩ A ∩ B| / k scaled by the union
    estimate. Sets smaller than k are estimated EXACTLY (the sketch is
    the whole set) — the CASE both engines spell identically.

    Scale design: one distinct (set, hash) hash agg over the scan is
    the only full-data work; each sketch is then a TakeOrdered(k) —
    Spark's built-in distributed top-k (per-partition partial top-k,
    k-row merge), never a window over the set. Membership tests
    broadcast the 256-row union sketch against the distinct table.
    The exact intersection ground truth (one more agg over distinct
    hashes) is computed alongside, q164-style, so the output audits
    the estimator against truth in the same row.

    Hash = 13 hex chars of md5 (the repo-wide cross-engine hash,
    sketches.py:14) → uniform 52-bit integers; every estimate is the
    same double-op sequence on both engines over exact integer inputs.

    Output: 4 rows (metric, est, exact), metric ∈ {distinct_a,
    distinct_b, union, intersection}.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    m_double = float(1 << 52)
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 3, 13), 16, 10
    ).cast("long")
    # pairs fans out 8 ways (3 sketches × (sketch, exact) + the two
    # intersection branches) and the union hash set 3 ways — lazy
    # checkpoints stop each branch re-running the scan + md5 +
    # distinct shuffle (46 Exchange nodes in the r12-before plan).
    pairs = (
        df.filter(F.col(set_col).isin(set_a, set_b))
        .select(F.col(set_col).alias("s"), h.alias("h"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    hashes_a = pairs.filter(F.col("s") == set_a).select("h")
    hashes_b = pairs.filter(F.col("s") == set_b).select("h")
    hashes_u = pairs.select("h").distinct().localCheckpoint(eager=False)

    def _estimate(hashes: DataFrame) -> DataFrame:
        """1-row (est, exact): TakeOrdered(k) sketch + exact count."""
        sk = hashes.orderBy("h").limit(k)
        stats = sk.agg(
            F.count("*").alias("n_sk"), F.max("h").alias("h_k")
        )
        exact = hashes.agg(F.count("*").cast("long").alias("exact"))
        return stats.crossJoin(exact).select(
            F.round(
                F.when(
                    F.col("n_sk") < k, F.col("exact").cast("double")
                ).otherwise(
                    (F.lit(float(k - 1)) * F.lit(m_double))
                    / F.col("h_k").cast("double")
                )
                + 1e-9,
                2,
            ).alias("est"),
            "exact",
        )

    est_a = _estimate(hashes_a).select(
        F.lit("distinct_a").alias("metric"), "est", "exact"
    )
    est_b = _estimate(hashes_b).select(
        F.lit("distinct_b").alias("metric"), "est", "exact"
    )
    est_u = _estimate(hashes_u).select(
        F.lit("union").alias("metric"), "est", "exact"
    )

    # intersection: members of the union sketch present in BOTH sets.
    # (consumed by the membership join AND the h_k stats row)
    sk_u = hashes_u.orderBy("h").limit(k).localCheckpoint(eager=False)
    both = (
        pairs.join(F.broadcast(sk_u), "h")
        .groupBy("h")
        .agg(F.countDistinct("s").alias("ns"))
        .filter(F.col("ns") == 2)
        .agg(F.count("*").alias("matches"))
    )
    u_stats = sk_u.agg(F.count("*").alias("n_sk"), F.max("h").alias("h_k"))
    exact_i = (
        pairs.groupBy("h")
        .agg(F.countDistinct("s").alias("ns"))
        .filter(F.col("ns") == 2)
        .agg(F.count("*").cast("long").alias("exact"))
    )
    est_i = (
        both.crossJoin(u_stats)
        .crossJoin(exact_i)
        .select(
            F.lit("intersection").alias("metric"),
            F.round(
                F.when(
                    F.col("n_sk") < k, F.col("exact").cast("double")
                ).otherwise(
                    F.col("matches").cast("double")
                    * F.lit(float(k - 1))
                    * F.lit(m_double)
                    / (F.lit(k).cast("long") * F.col("h_k")).cast("double")
                )
                + 1e-9,
                2,
            ).alias("est"),
            "exact",
        )
    )
    return est_a.unionAll(est_b).unionAll(est_u).unionAll(est_i)


def hll_rolling_distinct(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """Trailing-``window_days`` distinct-key estimate per day from
    MERGED daily HLL sketches — the query that justifies keeping
    sketches at all: a 7-day rolling COUNT(DISTINCT) over raw events
    re-scans 7 days of corpus per day, while merging 7 daily 256-row
    register states is a windowed ``max`` over a calendar-bounded
    table (at 100 TB the daily sketches are the only thing retained;
    this is the Theta/HLL rollup pattern every metrics store ships).

    Construction: daily registers via :func:`hll_registers` (md5
    slices — engine-portable); a (day × register) SPINE (distinct
    days crossed with the registers observed anywhere, ≤ days·256
    rows) left-joins the daily states so absent registers still
    window correctly; the trailing merge is ``max(max_rho)`` over a
    register-partitioned RANGE window on the day index (bounded,
    key-partitioned — never a data-shaped single partition). The
    estimate is the module's exact integer harmonic sum and one
    double division; the exact twin re-counts distinct keys over the
    same trailing window from the (day, key) level table — the audit
    column a production caller drops.

    Output: (day 'yyyy-MM-dd', n_registers, est_distinct,
    exact_distinct, rel_err), one row per observed day.
    """
    base = events.filter(
        F.col(key_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.datediff(F.to_date(ts_col), F.lit("1970-01-01")).alias("d"),
        F.col(key_col).alias("k"),
    )
    regs = hll_registers(base, "k", "d").withColumnRenamed("g", "d")
    days = regs.select("d").distinct()
    all_regs = regs.select("reg").distinct()
    spine = days.crossJoin(all_regs)
    joined = spine.join(regs, ["d", "reg"], "left")
    w = (
        Window.partitionBy("reg")
        .orderBy("d")
        .rangeBetween(-(window_days - 1), 0)
    )
    rolled = joined.select(
        "d", "reg", F.max("max_rho").over(w).alias("roll_rho")
    )
    sketch = rolled.filter(F.col("roll_rho").isNotNull()).groupBy("d").agg(
        F.count("*").cast("int").alias("n_registers"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_WBITS + 1} - roll_rho)")
        ).alias("_s_present"),
    )
    s_int = F.col("_s_present") + (
        (F.lit(_M) - F.col("n_registers")).cast("long")
        * F.lit(1 << (_WBITS + 1)).cast("long")
    )
    est = F.round(
        F.lit(_ALPHA_256 * _M * _M) * F.lit(_SCALE) / s_int.cast("double"), 2
    )
    # exact twin: trailing-window distinct from the (day, key) level
    # table — a banded range join of the day spine onto day-distinct
    # pairs (both calendar/key-bounded), never a raw-event self-join
    pairs = base.distinct()
    exact = (
        days.select(F.col("d").alias("td"))
        .join(
            pairs,
            (F.col("d") <= F.col("td"))
            & (F.col("d") > F.col("td") - window_days),
        )
        .groupBy("td")
        .agg(F.count_distinct("k").alias("exact_distinct"))
    )
    return (
        sketch.join(exact, sketch.d == exact.td)
        .select(
            F.date_format(
                F.date_add(F.lit("1970-01-01"), F.col("d")), "yyyy-MM-dd"
            ).alias("day"),
            "n_registers",
            est.alias("est_distinct"),
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
            F.round(
                F.abs(est - F.col("exact_distinct"))
                / F.col("exact_distinct").cast("double"),
                4,
            ).alias("rel_err"),
        )
    )
