"""Portable Bloom-filter semi-join pruning.

The explicit form of Spark's runtime row-level filtering
(``spark.sql.optimizer.runtime.bloomFilter.enabled``): when the build
side of a semi-join is too large to broadcast as an exact key set but
its *bit signature* is not, ship a Bloom bitmap to the probe side and
filter map-side BEFORE the join's exchange. At 100 TB this is the
difference between shuffling the full fact table and shuffling only
the ~selectivity fraction that can possibly match; false positives are
removed by the real join afterwards, so results are exact regardless
of FP rate.

Hashing is md5-derived (not xxhash64) so an external engine — or the
DuckDB oracle — can reproduce the bitmap bit-for-bit.

Plan shape:
- build: k bit positions per key (a codegen'd projection), partial
  ``bit_or`` per map task collapses to ≤ n_words rows before the one
  tiny exchange, then one row carrying ``array<long>``.
- probe: the 1-row bitmap cross-joins (broadcast) onto the fact scan;
  the membership test is k ``element_at``/bitwise-AND expressions —
  map-side, whole-stage codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_positions(
    df: DataFrame, key_col: str, m_bits: int, k: int
) -> DataFrame:
    """Add k hash positions (mod m_bits) as columns _p0.._p{k-1}.

    All k positions come from ONE md5 digest per row: the 128-bit hex
    digest is split into k disjoint slices (classic digest-slicing; the
    slices are independent for Bloom purposes). One digest instead of k
    matters on the PROBE side, where this expression runs over the full
    fact scan — md5 dominates the per-row cost, `conv` on a short
    slice is noise. Slice width is capped at 15 hex chars (60 bits):
    a 16-char slice can exceed Long.MAX and the BIGINT cast would
    crash under ANSI (or NULL out positions with ANSI off, dropping
    TRUE matches). Every slice is ≥ 8 hex chars = 32 bits ≫ any
    broadcastable m_bits, so modulo bias is nil.
    """
    # Real exception, not assert: this is a public-API bound and must
    # survive `python -O` — a silent k=5+ would slice narrower than the
    # documented >= 8 hex chars and quietly degrade hash independence.
    if not 1 <= k <= 4:
        raise ValueError(
            f"digest slicing supports 1 <= k <= 4 (32 hex chars / 8), got k={k}"
        )
    width = min(32 // k, 15)
    df = df.withColumn("_digest", F.md5(F.col(key_col).cast("string")))
    for i in range(k):
        df = df.withColumn(
            f"_p{i}",
            F.conv(
                F.substring(F.col("_digest"), 1 + i * width, width), 16, 10
            ).cast("long")
            % m_bits,
        )
    return df.drop("_digest")


def bloom_build(
    keys: DataFrame, key_col: str, m_bits: int = 32768, k: int = 4
) -> DataFrame:
    """Aggregate a key set into a 1-row Bloom bitmap (array<long>).

    ``m_bits`` must be a multiple of 64. Size it from the expected key
    count: FP ≈ (1 − e^(−k·n/m))^k; m = 16·n bits with k = 4 gives
    ~0.2 %. The bitmap is m/64 longs — 1 MB covers 8M bits / ~500k
    keys, comfortably broadcastable.
    """
    if m_bits % 64 != 0:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    n_words = m_bits // 64
    # Null build keys can never equi-join anyway, and a null position
    # would abort the build as a NULL_MAP_KEY — drop them, mirroring
    # the probe side where null keys simply fail the membership test.
    pos = _with_positions(
        keys.select(key_col).filter(F.col(key_col).isNotNull()),
        key_col,
        m_bits,
        k,
    )
    pos_structs = F.array(
        *[
            F.struct(
                F.expr(f"cast(_p{i} div 64 as int)").alias("word"),
                F.expr(f"shiftleft(1L, cast(_p{i} % 64 as int))").alias(
                    "mask"
                ),
            )
            for i in range(k)
        ]
    )
    words = (
        pos.select(F.explode(pos_structs).alias("pm"))
        .select(F.col("pm.word").alias("word"), F.col("pm.mask").alias("mask"))
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    entries = F.map_from_entries(
        F.collect_list(F.struct(F.col("word"), F.col("bits")))
    )
    return words.agg(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda w: F.coalesce(
                F.try_element_at(entries, w), F.lit(0).cast("long")
            ),
        ).alias("bloom_bits"),
        # carried so bloom_prefilter can FAIL LOUDLY on a parameter
        # mismatch instead of silently dropping true matches
        F.lit(m_bits).alias("bloom_m"),
        F.lit(k).alias("bloom_k"),
    )


def bloom_prefilter(
    fact: DataFrame,
    key_col: str,
    bitmap: DataFrame,
    m_bits: int = 32768,
    k: int = 4,
) -> DataFrame:
    """Keep only fact rows whose key passes the Bloom membership test.

    ``bitmap`` is the 1-row output of :func:`bloom_build` with the SAME
    (m_bits, k) — validated at runtime against the bloom_m/bloom_k the
    bitmap carries, because positions are computed mod m_bits and a
    mismatch would silently drop TRUE matches (breaking the exactness
    contract) rather than merely admitting false positives. Map-side
    only: the bitmap broadcasts, the test stays in codegen, nothing
    shuffles. Passing rows are a superset of true matches — follow
    with the exact join.
    """
    probed = _with_positions(
        fact.crossJoin(F.broadcast(bitmap)), key_col, m_bits, k
    )
    params_ok = F.assert_true(
        (F.col("bloom_m") == F.lit(m_bits))
        & (F.col("bloom_k") == F.lit(k)),
        F.lit(
            f"bloom_prefilter(m_bits={m_bits}, k={k}) does not match the "
            "bitmap's build parameters — true matches would be dropped"
        ),
    )
    test = params_ok.isNull()  # assert_true: null when ok, raises when not
    for i in range(k):
        hit = F.expr(
            f"(element_at(bloom_bits, cast(_p{i} div 64 as int) + 1)"
            f" & shiftleft(1L, cast(_p{i} % 64 as int)))"
            f" = shiftleft(1L, cast(_p{i} % 64 as int))"
        )
        test = test & hit
    return probed.filter(test).drop(
        "bloom_bits", "bloom_m", "bloom_k", *[f"_p{i}" for i in range(k)]
    )
