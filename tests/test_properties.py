"""Property-based tests (hypothesis): each property generates MANY cases
but runs ONE Spark job — examples become rows of a single DataFrame, and
the assertion compares against a plain-Python model row-wise. (A
per-example Spark job would make hypothesis unusably slow.)"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from public_projet_data_engineering_tarification_electrique_spark.functions.pricing import (
    alpha_clamped,
    annual_price,
    monthly_price,
)
from public_projet_data_engineering_tarification_electrique_spark.functions.text import (
    _RK_BASE,
    _RK_MOD,
    rolling_fingerprint,
    word_shingles,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.sessions import (
    sessionize,
)

# printable ASCII without the surrogate/control issues Spark<->Arrow
# transfer would mask
ascii_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60
)


def _rk_model(s: str) -> int:
    acc = 0
    for ch in s.lower().strip():
        acc = (acc * _RK_BASE + ord(ch)) % _RK_MOD
    return acc


@settings(max_examples=5, deadline=None)
@given(st.lists(ascii_text, min_size=1, max_size=40))
def test_rolling_fingerprint_matches_python_model(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "id long, text string")
    got = {
        r.id: r.fp
        for r in df.select("id", rolling_fingerprint(F.col("text")).alias("fp")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _rk_model(t), repr(t)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.floats(min_value=0.01, max_value=100.0, allow_nan=False),
        min_size=1,
        max_size=40,
    )
)
def test_alpha_clamp_range_and_identity(spark, ratios):
    df = spark.createDataFrame([(i, float(r)) for i, r in enumerate(ratios)],
                               "id long, ratio double")
    got = {
        r.id: r.a
        for r in df.select("id", alpha_clamped(F.col("ratio")).alias("a")).collect()
    }
    for i, r in enumerate(ratios):
        assert 1.0 <= got[i] <= 1.3
        if 1.0 <= r <= 1.3:
            assert got[i] == r  # identity inside the band


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=1.0, max_value=1.3, allow_nan=False),   # alpha
            st.floats(min_value=0.0, max_value=0.05, allow_nan=False),  # M
            st.floats(min_value=0.0, max_value=50000, allow_nan=False), # kWh
        ),
        min_size=1,
        max_size=30,
    )
)
def test_annual_is_twelve_times_monthly(spark, cases):
    """SURVEY.md §2.8 semantics decision: the annual formula (C=72) must
    equal 12× the documented monthly formula (C=6) exactly, pre-round."""
    df = spark.createDataFrame(
        [(i, a, m, x) for i, (a, m, x) in enumerate(cases)],
        "id long, alpha double, m double, x double",
    )
    rows = df.select(
        "id",
        annual_price(F.col("alpha"), F.col("m"), F.col("x"), rounded=False).alias("an"),
        monthly_price(F.col("alpha"), F.col("m"), F.col("x"), rounded=False).alias("mo"),
    ).collect()
    for r in rows:
        assert abs(r.an - 12.0 * r.mo) < 1e-6


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=100_000),  # event times (seconds)
        min_size=1,
        max_size=60,
        unique=True,
    ),
    st.integers(min_value=1, max_value=5000),  # gap
)
def test_sessionize_invariants(spark, times, gap):
    rows = [(i, 1, int(t), 1.0) for i, t in enumerate(sorted(times))]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts_s long, value double")
    sessions = sorted(
        sessionize(df, gap_seconds=gap).collect(), key=lambda r: r.session_id
    )
    # partition: every event in exactly one session
    assert sum(s.n_events for s in sessions) == len(times)
    # sessions are numbered 1..k and ordered in time with gaps > gap between
    for j, s in enumerate(sessions):
        assert s.session_id == j + 1
        assert s.start_s <= s.end_s
        if j:
            assert s.start_s - sessions[j - 1].end_s > gap
    # model: number of sessions == 1 + number of over-gap deltas
    ts = sorted(times)
    expected = 1 + sum(1 for a, b in zip(ts, ts[1:]) if b - a > gap)
    assert len(sessions) == expected


@settings(max_examples=5, deadline=None)
@given(st.lists(ascii_text, min_size=1, max_size=30), st.integers(2, 4))
def test_word_shingles_count(spark, texts, k):
    df = spark.createDataFrame(list(enumerate(texts)), "id long, text string")
    got = {
        r.id: r.n
        for r in df.select(
            "id", F.size(word_shingles(F.col("text"), k)).alias("n")
        ).collect()
    }
    for i, t in enumerate(texts):
        n_tokens = len(t.lower().split())
        # Spark split on \s+ of a trimmed empty string yields [""] → 1 token
        n_tokens = max(n_tokens, 1)
        assert got[i] == max(1, n_tokens - k + 1), repr(t)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(ascii_text, min_size=1, max_size=25),
    st.integers(min_value=1, max_value=10),
    st.integers(min_value=1, max_value=10),
)
def test_chunk_with_overlap_invariants(spark, texts, size, stride):
    """Chunks tile the document: starts advance by exactly stride, every
    chunk is non-empty and ≤ size tokens, the last chunk reaches the
    document end, and per-doc chunk ids are dense from 0."""
    from public_projet_data_engineering_tarification_electrique_spark.operators.packing import (
        chunk_with_overlap,
    )

    if stride > size:
        stride, size = size, stride
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rows = chunk_with_overlap(df, size=size, stride=stride).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, text in enumerate(texts):
        n = len([t for t in text.strip().lower().split() if t])
        got = sorted(by_doc.get(doc_id, []), key=lambda r: r.chunk_id)
        if n == 0:
            assert not got
            continue
        # mirror the operator's subset-window rule: the start grid stops
        # once a window reaches the document end (bound n − size +
        # stride), so no trailing window fully contained in the previous
        # one is emitted (operators/packing.py chunk_with_overlap)
        expected_starts = list(range(1, max(1, n - size + stride) + 1, stride))
        assert [r.start_tok for r in got] == expected_starts
        assert [r.chunk_id for r in got] == list(range(len(expected_starts)))
        for r in got:
            assert 1 <= r.chunk_tokens <= size
            assert r.chunk_tokens == min(size, n - r.start_tok + 1)
        assert got[-1].start_tok + got[-1].chunk_tokens - 1 == n


def test_salted_agg_equals_plain_groupby(spark):
    """The two-phase salted aggregate is a pure physical rewrite: its
    output must equal the plain single-exchange GROUP BY bit-for-bit."""
    from public_projet_data_engineering_tarification_electrique_spark.plans.registry import (
        q76_skew_salted_agg,
    )
    from public_projet_data_engineering_tarification_electrique_spark.sources.tables import (
        load_table,
    )

    sf_dir = "/root/testdata/sf0.001"
    salted = {r.event_type: r for r in q76_skew_salted_agg(spark, sf_dir).collect()}
    plain = (
        load_table(spark, sf_dir, "events", raw=True)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.sum("value") / F.count("*"), 4).alias("avg_value"),
        )
        .collect()
    )
    assert len(salted) == len(plain) > 0
    for r in plain:
        s = salted[r.event_type]
        assert s.n_events == r.n_events
        assert s.sum_value == r.sum_value
        assert s.avg_value == r.avg_value


def test_scd2_intervals_partition_time(spark):
    """Per user: intervals are disjoint, contiguous (valid_to == next
    valid_from), exactly one open (current) interval, and the value
    changes at every boundary."""
    from public_projet_data_engineering_tarification_electrique_spark.plans.registry import (
        q77_scd2_intervals,
    )

    rows = q77_scd2_intervals(spark, "/root/testdata/sf0.001").collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for user, ivs in by_user.items():
        ivs.sort(key=lambda r: r.valid_from_us)
        assert sum(1 for r in ivs if r.is_current) == 1
        assert ivs[-1].is_current and ivs[-1].valid_to_us is None
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to_us == b.valid_from_us, user
            assert a.v != b.v, user


def _ulp_near_half(n: int) -> float:
    """One ulp below/above/on a half-way grid point — the class where a
    naive +0.5 rounding kernel diverges from engine round()."""
    import math

    h = (2 * (n // 3) + 1) / 2e4
    return [h, math.nextafter(h, -math.inf), math.nextafter(h, math.inf)][
        n % 3
    ]


@given(
    st.lists(
        st.one_of(
            # adversarial: values ON and NEAR the 1e-4 half-way grid
            st.integers(min_value=-10_000_000, max_value=10_000_000).map(
                lambda n: n / 2e4  # exact multiples of 0.00005
            ),
            st.integers(min_value=0, max_value=3_000_000).map(_ulp_near_half),
            st.floats(
                min_value=-1e6, max_value=1e6,
                allow_nan=False, allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=30, deadline=None)
def test_grid4_three_way_engine_agreement(spark, duck, values):
    """The 1e-4 exact-grid kernel must agree bit-for-bit across the
    Python streaming state (_grid4), Spark round(x*1e4, 0), and DuckDB
    round(x*1e4) — including ON half-way points, where engine rounding
    rules usually diverge. This is what makes q22/q28 sessionize sums
    order- and engine-independent."""
    from public_projet_data_engineering_tarification_electrique_spark.streaming.sessions import (
        _grid4,
    )

    py = [_grid4(v) for v in values]
    sp = (
        spark.createDataFrame([(v,) for v in values], "v double")
        .selectExpr("cast(round(v * 1e4, 0) as long) AS g")
        .collect()
    )
    dk = duck.execute(
        "SELECT CAST(round(v * 1e4) AS BIGINT) FROM (SELECT unnest(?) AS v)",
        [values],
    ).fetchall()
    assert py == [r.g for r in sp] == [r[0] for r in dk]


def test_leakage_safe_split_invariants(spark):
    """Every near-dup pair lands in ONE split (the invariant the split
    exists for), every doc is assigned, and members of a cluster share
    the cluster's group key."""
    from public_projet_data_engineering_tarification_electrique_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from public_projet_data_engineering_tarification_electrique_spark.plans import (
        registry,
    )
    from public_projet_data_engineering_tarification_electrique_spark.sources.tables import (
        load_table,
    )

    sf = "/root/testdata/sf0.001"
    out = registry.QUERIES()["q110_leakage_safe_split"](spark, sf)
    docs = load_table(spark, sf, "documents")
    assert out.count() == docs.count()

    split_of = {r["doc_id"]: r["split"] for r in out.collect()}
    pairs = ngram_jaccard_pairs(
        docs, k=3, threshold=0.5, max_df=100
    ).collect()
    assert pairs, "fixture should contain near-dup pairs"
    straddling = [
        (p["id_a"], p["id_b"])
        for p in pairs
        if split_of[p["id_a"]] != split_of[p["id_b"]]
    ]
    assert straddling == []


def test_unigram_lm_score_semantics(spark):
    """Docs of common tokens score low NLL; a doc of rare tokens scores
    strictly higher; n_tokens matches the whitespace token count."""
    from public_projet_data_engineering_tarification_electrique_spark.operators.textstats import (
        unigram_lm_scores,
    )

    rows = [(i, "the cat sat on the mat") for i in range(40)]
    rows.append((1000, "zyx qwv jjk"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in unigram_lm_scores(docs).collect()}
    assert got[0]["n_tokens"] == 6
    assert got[1000]["n_tokens"] == 3
    common_nll = got[0]["avg_nll"]
    rare_nll = got[1000]["avg_nll"]
    assert rare_nll > common_nll > 0


def test_q109_nll_grid_margins(duck):
    """q109 snaps per-token NLLs to a 1e-6 integer grid; parity needs
    every vocab token's ln(p)·1e6 to sit away from a .5 boundary by
    more than cross-engine ln() ulp divergence (~2e-9 grid units).
    Guard at 1e-4 so a pathological testdata regen fails HERE with a
    readable message, not as a driver hash mismatch."""
    from .conftest import SF_ORACLE

    (min_dist, vocab) = duck.execute(
        f"""
        WITH toks AS (
          SELECT doc_id, tok FROM (
            SELECT doc_id,
                   unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
            FROM read_parquet('{SF_ORACLE}/documents.parquet')) t
          WHERE tok <> ''
        ), lm_counts AS (
          SELECT tok, count(*) AS c FROM toks
          WHERE ('0x' || substr(md5(cast(doc_id AS VARCHAR)), 1, 8))::BIGINT
                  % 100 < 80
          GROUP BY 1
        ), consts AS (SELECT sum(c) AS n, count(*) AS v FROM lm_counts),
        g AS (
          SELECT -ln((c + 1.0) / (n + v)) * 1000000 AS x
          FROM lm_counts CROSS JOIN consts
          UNION ALL
          SELECT -ln(1.0 / (n + v)) * 1000000 FROM consts
        )
        SELECT min(abs(x - floor(x) - 0.5)), count(*) FROM g
        """
    ).fetchone()
    assert vocab > 0
    assert min_dist > 1e-4, (
        f"a vocab token's scaled NLL sits {min_dist} grid units from a "
        "rounding boundary — inside cross-engine ln() divergence risk; "
        "nudge q109's grid or rescale nll_scale"
    )


def test_q117_stat_grid_margins(duck):
    """q117 snaps per-(label, dim) mean/stddev to a 1e-6 grid before
    normalizing; cross-engine (and within-Spark partial-order) float
    divergence is ~1e-9 grid units, so demand >= 1e-6 margin from every
    .5 boundary at the oracle SF — fails readably on a bad regen."""
    from .conftest import SF_ORACLE

    (min_dist,) = duck.execute(
        f"""
        WITH dims AS (
          SELECT label, unnest(range(1, len(embedding) + 1)) AS pos,
                 unnest(embedding) AS x
          FROM read_parquet('{SF_ORACLE}/embeddings.parquet')
        ), g AS (
          SELECT avg(x) * 1000000 AS v FROM dims GROUP BY label, pos
          UNION ALL
          SELECT coalesce(stddev(x), 0) * 1000000 FROM dims GROUP BY label, pos
        )
        SELECT min(abs(v - floor(v) - 0.5)) FROM g
        """
    ).fetchone()
    assert min_dist > 1e-6, (
        f"a q117 stat sits {min_dist} grid units from a rounding boundary"
    )


def test_blank_docs_count_zero_tokens(spark):
    """token_count/quality must treat blank and whitespace-only docs as
    0 tokens (split-of-empty yields ['']) so they can never outrank
    real text in quality-based curation."""
    from public_projet_data_engineering_tarification_electrique_spark.functions.text import (
        token_count,
    )
    from public_projet_data_engineering_tarification_electrique_spark.operators.textstats import (
        quality_scores,
    )

    docs = spark.createDataFrame(
        [(1, "", "en"), (2, "   ", "en"), (3, "real text here", "en")],
        "doc_id long, text string, lang string",
    )
    counts = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", token_count(F.col("text")).alias("n")
        ).collect()
    }
    assert counts == {1: 0, 2: 0, 3: 3}
    quality = {
        r["doc_id"]: r["quality"] for r in quality_scores(docs).collect()
    }
    assert quality[1] == 0.0 and quality[2] == 0.0
    assert quality[3] > 0.0


def test_chunk_overlap_no_subset_windows(spark):
    """The start grid must stop once a window reaches the document end:
    no chunk may be fully contained in the previous one, and coverage
    must still reach the last token."""
    from public_projet_data_engineering_tarification_electrique_spark.operators.packing import (
        chunk_with_overlap,
    )

    n = 64  # doc of exactly `size` tokens — the old grid emitted [1, 49]
    text = " ".join(f"t{i}" for i in range(n))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_with_overlap(docs, size=64, stride=48).collect(),
        key=lambda r: r["start_tok"],
    )
    assert [r["start_tok"] for r in rows] == [1]
    assert rows[-1]["start_tok"] + rows[-1]["chunk_tokens"] - 1 == n
    # a 100-token doc still gets a truncated tail window covering token 100
    text2 = " ".join(f"t{i}" for i in range(100))
    docs2 = spark.createDataFrame([(1, text2)], "doc_id long, text string")
    rows2 = sorted(
        chunk_with_overlap(docs2, size=64, stride=48).collect(),
        key=lambda r: r["start_tok"],
    )
    assert [r["start_tok"] for r in rows2] == [1, 49]
    assert rows2[-1]["start_tok"] + rows2[-1]["chunk_tokens"] - 1 == 100


def test_pagerank_ranks_sum_to_one(spark):
    """Fixed-iteration PageRank: ranks stay a probability-ish vector
    (positive, summing to ~1 — grid snapping loses at most 1e-9 per
    node per iteration)."""
    from public_projet_data_engineering_tarification_electrique_spark.plans.registry import (
        q134_pagerank_fixed,
    )

    rows = q134_pagerank_fixed(spark, "/root/testdata/sf0.001").collect()
    assert rows and all(r["rank"] > 0 for r in rows)
    total = sum(r["rank"] for r in rows)
    assert abs(total - 1.0) < 1e-4, total


def test_arrow_byte_stats_multibyte(spark):
    """mapInArrow byte stats: n_bytes is BYTES (utf-8), not characters."""
    from public_projet_data_engineering_tarification_electrique_spark.plans.registry import (
        q133_arrow_byte_stats,
    )
    import os, tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(1, "héllo wörld"), (2, "a b")],
            "doc_id long, text string",
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = {
            r["doc_id"]: (r["n_bytes"], r["n_spaces"])
            for r in q133_arrow_byte_stats(spark, d).collect()
        }
    assert out[1] == (13, 1)  # 11 chars, 2 two-byte
    assert out[2] == (3, 1)


def test_bm25_ranking_invariants(spark):
    """BM25 top-k: ranks dense 1..k, scores non-increasing with rank,
    and every score non-negative (rational idf is positive)."""
    from public_projet_data_engineering_tarification_electrique_spark.plans.registry import (
        q130_bm25_topk,
    )

    rows = sorted(
        q130_bm25_topk(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["rank"],
    )
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    scores = [r["score"] for r in rows]
    assert all(a >= b for a, b in zip(scores, scores[1:]))
    assert all(s >= 0 for s in scores)


def test_bootstrap_ci_invariants(spark):
    """Poisson bootstrap: exactly B replicates per type and lo ≤ hi."""
    from public_projet_data_engineering_tarification_electrique_spark.plans.registry import (
        q149_bootstrap_ci,
    )

    rows = q149_bootstrap_ci(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r["n_replicates"] == 50
        assert r["mean_lo"] <= r["mean_hi"]


def test_skew_diagnostics_invariants(spark):
    """Skew report: bucket histogram accounts for every key, and the
    hot-key share is a valid fraction matching max/total."""
    from public_projet_data_engineering_tarification_electrique_spark.plans.registry import (
        q150_skew_diagnostics,
    )
    from public_projet_data_engineering_tarification_electrique_spark.sources.tables import (
        load_table,
    )

    sf = "/root/testdata/sf0.001"
    rows = q150_skew_diagnostics(spark, sf).collect()
    li = load_table(spark, sf, "lineitem")
    total_rows = li.count()
    n_keys = li.select("l_orderkey").distinct().count()
    assert sum(r["n_keys"] for r in rows) == n_keys
    assert sum(r["rows_per_key"] * r["n_keys"] for r in rows) == total_rows
    share = rows[0]["hot_key_share"]
    mx = rows[0]["max_rows_per_key"]
    assert 0 < share <= 1
    assert share == round(mx / total_rows, 6)


def test_entity_resolution_exact_recovery(spark):
    """Every dirty record links back to the customer it was derived
    from, at edit distance exactly 1 (the dropped '#'), and the match
    set covers every modulus-residue customer — the blocking key never
    loses the true pair."""
    from public_projet_data_engineering_tarification_electrique_spark.operators.linkage import (
        best_matches,
    )
    from public_projet_data_engineering_tarification_electrique_spark.sources.tables import (
        load_table,
    )

    customer = load_table(spark, "/root/testdata/sf0.001", "customer")
    rows = best_matches(customer).collect()
    expected = customer.filter(F.col("c_custkey") % 7 == 3).count()
    assert len(rows) == expected
    for r in rows:
        assert r["matched_custkey"] == r["record_id"]
        assert r["lev_distance"] == 1


def test_entity_resolution_validates_modulus(spark):
    import pytest

    from public_projet_data_engineering_tarification_electrique_spark.operators.linkage import (
        best_matches,
    )
    from public_projet_data_engineering_tarification_electrique_spark.sources.tables import (
        load_table,
    )

    customer = load_table(spark, "/root/testdata/sf0.001", "customer")
    with pytest.raises(ValueError, match="modulus"):
        best_matches(customer, modulus=1)


def test_heavy_hitters_partitioning_independent(spark):
    """The two-pass MG result equals the exact full-vocabulary answer
    under an adversarial repartition (many tiny partitions stress the
    per-partition candidate guarantee); capacity below denom is
    rejected up front."""
    import pytest

    from public_projet_data_engineering_tarification_electrique_spark.functions.text import (
        tokens,
    )
    from public_projet_data_engineering_tarification_electrique_spark.operators.textstats import (
        heavy_hitters,
    )
    from public_projet_data_engineering_tarification_electrique_spark.sources.tables import (
        load_table,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    toks = (
        docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("t"))
        .filter(F.col("t") != "")
    )
    n = toks.count()
    exact = {
        (r["t"], r["freq"])
        for r in toks.groupBy("t")
        .agg(F.count("*").alias("freq"))
        .filter(F.col("freq") * 50 >= F.lit(n))
        .collect()
    }
    assert exact, "fixture corpus should have at least one 2% token"
    for n_parts in (1, 7, 64):
        got = {
            (r["token"], r["freq"])
            for r in heavy_hitters(docs.repartition(n_parts), denom=50).collect()
        }
        assert got == exact, f"mismatch at {n_parts} partitions"
    with pytest.raises(ValueError, match="capacity"):
        heavy_hitters(docs, denom=50, capacity=10)


def test_token_fertility_exact_integer_arithmetic(spark):
    """Hand-computable fixture: fertility/bytes-per-token derive from
    exact integer sums; a blank doc contributes zero tokens (not the
    split('')→[''] artifact); a slice with zero BPE tokens yields NULL
    ratios instead of a divide-by-zero."""
    from public_projet_data_engineering_tarification_electrique_spark.operators.textstats import (
        token_fertility,
    )

    rows = [
        (1, "ab cd", "en", "s1"),   # ws=2, bpe=2 ('ab',' cd'), bytes=5
        (2, "x9!", "en", "s1"),     # ws=1, bpe=3 ('x','9','!'), bytes=3
        (3, "   ", "fr", "s2"),     # blank: ws=0, bpe counts the ws run
        (4, "", "de", "s3"),        # empty: everything 0 → NULL ratios
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = {
        (r["lang"], r["source"]): r for r in token_fertility(df).collect()
    }
    en = out[("en", "s1")]
    assert (en["n_docs"], en["ws_tokens"], en["bpe_tokens"]) == (2, 3, 5)
    assert en["fertility"] == round(5 / 3, 4)
    assert en["bytes_per_token"] == round(8 / 5, 4)
    de = out[("de", "s3")]
    assert de["ws_tokens"] == 0 and de["bpe_tokens"] == 0
    assert de["fertility"] is None and de["bytes_per_token"] is None


def test_column_profile_counts(spark):
    """Hand-checkable frame: nulls / distinct / min / max per column,
    with the pinned double and timestamp renderings."""
    import datetime as dt

    from public_projet_data_engineering_tarification_electrique_spark.operators.audit import (
        column_profile,
    )

    rows = [
        (1, 10.125, dt.datetime(2024, 1, 2, 3, 4, 5), "b"),
        (2, None, dt.datetime(2024, 1, 1, 0, 0, 0), "a"),
        (2, 3.5, None, None),
    ]
    df = spark.createDataFrame(rows, "k long, x double, ts timestamp, s string")
    out = {r["col_name"]: r for r in column_profile(df).collect()}
    assert out["k"]["n_nulls"] == 0 and out["k"]["n_distinct"] == 2
    assert out["x"]["n_nulls"] == 1 and out["x"]["min_val"] == "3.5"
    assert out["x"]["max_val"] == "10.13"  # typed max, THEN 2 dp render
    assert out["ts"]["min_val"] == "2024-01-01 00:00:00"
    assert out["s"]["n_distinct"] == 2 and out["s"]["n_nulls"] == 1


def test_phrase_search_counts_overlaps(spark):
    """Hand-checkable: overlapping and repeated occurrences are each
    counted; gapped near-misses are not; single-word phrases work."""
    from public_projet_data_engineering_tarification_electrique_spark.operators.search import (
        phrase_search,
    )

    rows = [
        (1, "a b a b a"),       # 'a b' twice, overlapping 'b a' twice
        (2, "a x b a b"),       # 'a b' once (gapped first pair misses)
        (3, "nothing here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["n_occurrences"]
           for r in phrase_search(df, ("a", "b")).collect()}
    assert got == {1: 2, 2: 1}
    solo = {r["doc_id"]: r["n_occurrences"]
            for r in phrase_search(df, ("a",)).collect()}
    assert solo == {1: 3, 2: 2}


def test_pmi_collocations_ranks_exclusive_pairs_first(spark):
    """A pair that ALWAYS co-occurs outranks frequent-but-independent
    pairs; lift is the exact integer-ratio value."""
    from public_projet_data_engineering_tarification_electrique_spark.operators.search import (
        pmi_collocations,
    )

    # 'x y' appears 5 times exclusively; filler tokens are common.
    rows = [(i, "x y the of the of") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pmi_collocations(df, min_count=5, k=3).collect()
    top = out[0]
    assert (top["tok_a"], top["tok_b"]) == ("x", "y")
    # N=30 tokens, joint=5, fx=fy=5 → lift = 5*30/25 = 6.0
    assert top["joint"] == 5 and top["lift"] == 6.0
