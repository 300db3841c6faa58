"""Round-11 property tests: each new operator vs a plain-Python model
on adversarial hypothesis inputs (the registry oracle gate is the
cross-engine check; these pin the SEMANTICS — boundary crossings on
day one, empty overlaps, all-relevant runs, rank-1 spectra)."""

from __future__ import annotations

import datetime as dt
import math

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from public_projet_data_engineering_tarification_electrique_spark.operators.ranking_eval import (
    _DCG_GAIN_U,
    _IDCG_U,
    _RBO_DIV,
    _RBO_W,
    ndcg_binary_at_k,
    rbo_min_overlap,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.spectral import (
    top_principal_component,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.stats import (
    sprt_daily_monitor,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.textstats import (
    lexical_diversity,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.timeseries import (
    acf_daily,
)

# ---------------------------------------------------------------- nDCG


def test_dcg_grid_constants():
    # the committed millionths grid: spot-pin the endpoints so a
    # regeneration with a different formula cannot slip through
    assert _DCG_GAIN_U[0] == 1_000_000  # 1/log2(2)
    assert _DCG_GAIN_U[1] == round(1e6 / math.log2(3))
    assert _IDCG_U[1] == 1_000_000
    assert _IDCG_U[10] == sum(_DCG_GAIN_U)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # query
            st.integers(min_value=1, max_value=10),  # rank
            st.integers(min_value=0, max_value=1),  # rel
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda r: (r[0], r[1]),
    ),
    st.lists(
        st.integers(min_value=0, max_value=30), min_size=3, max_size=3
    ),
)
def test_ndcg_matches_python_model(spark, run_rows, pools):
    run = spark.createDataFrame(
        run_rows, "query_id int, rank int, rel int"
    )
    pool = spark.createDataFrame(
        [(q, n) for q, n in enumerate(pools)],
        "query_id int, n_rel_pool int",
    )
    got = {
        r["query_id"]: (r["n_rel_pool"], r["dcg_u"], r["idcg_u"], r["ndcg"])
        for r in ndcg_binary_at_k(run, pool).collect()
    }
    for q, n_pool in enumerate(pools):
        dcg = sum(
            _DCG_GAIN_U[rank - 1]
            for qq, rank, rel in run_rows
            if qq == q and rel
        )
        idcg = _IDCG_U[min(n_pool, 10)] if n_pool > 0 else None
        ndcg = (
            round(dcg / idcg + 1e-9, 6) if idcg else None
        )
        assert got[q] == (n_pool, dcg, idcg, ndcg)


# ----------------------------------------------------------------- RBO


def _rbo_model(perm_a, perm_b):
    """perm_a/b: ranked item lists (index = rank-1)."""
    ra = {x: i + 1 for i, x in enumerate(perm_a[:10])}
    rb = {x: i + 1 for i, x in enumerate(perm_b[:10])}
    common = {x: max(ra[x], rb[x]) for x in ra if x in rb}
    s = sum(
        _RBO_W[d - 1]
        for x, d0 in common.items()
        for d in range(d0, 11)
    )
    return len(common), round(s / _RBO_DIV + 1e-9, 6)


@settings(max_examples=6, deadline=None)
@given(st.permutations(list(range(14))), st.permutations(list(range(14))))
def test_rbo_matches_python_model(spark, perm_a, perm_b):
    run_a = spark.createDataFrame(
        [(0, x, i + 1) for i, x in enumerate(perm_a[:10])],
        "query_id int, vec_id int, rank int",
    )
    run_b = spark.createDataFrame(
        [(0, x, i + 1) for i, x in enumerate(perm_b[:10])],
        "query_id int, vec_id int, rank int",
    )
    row = rbo_min_overlap(run_a, run_b).collect()[0]
    ov, rbo = _rbo_model(list(perm_a), list(perm_b))
    assert (row["overlap_at_k"], row["rbo_min"]) == (ov, rbo)


def test_rbo_identical_rankings_closed_form(spark):
    # identical lists: overlap_d = d, so RBO_min = (1/9)·Σ(9/10)^d
    run = spark.createDataFrame(
        [(0, i, i + 1) for i in range(10)],
        "query_id int, vec_id int, rank int",
    )
    row = rbo_min_overlap(run, run).collect()[0]
    expected = round(
        sum(0.9**d for d in range(1, 11)) / 9 + 1e-9, 6
    )
    assert row["overlap_at_k"] == 10
    assert abs(row["rbo_min"] - expected) < 2e-6


# ---------------------------------------------------------------- SPRT


def _sprt_model(rows, cents=50, boundary=8):
    """rows: (key, day_off, value). Returns per-key
    (n_obs, k_obs, n_days, d_final, decision, cross_day_off)."""
    daily = {}
    for k, d, v in rows:
        n, kk = daily.get((k, d), (0, 0))
        daily[(k, d)] = (n + 1, kk + (1 if round(v * 100) >= cents else 0))
    out = {}
    for key in sorted({k for k, _ in daily}):
        days = sorted(d for k, d in daily if k == key)
        tot_n = tot_k = walk = 0
        cross = None
        for d in days:
            n, kk = daily[(key, d)]
            tot_n += n
            tot_k += kk
            walk += 2 * kk - n
            if cross is None and abs(walk) >= boundary:
                cross = (d, "accept_high" if walk >= boundary else "accept_low")
        out[key] = (
            tot_n,
            tot_k,
            len(days),
            walk,
            cross[1] if cross else "continue",
            cross[0] if cross else None,
        )
    return out


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=0, max_value=15),
            st.floats(
                min_value=0.0,
                max_value=2.0,
                allow_nan=False,
                allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_sprt_matches_python_model(spark, rows):
    base = dt.date(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (f"k{k}", dt.datetime(2024, 1, 1, 12) + dt.timedelta(days=d), v)
            for k, d, v in rows
        ],
        "event_type string, ts timestamp, value double",
    ).repartition(5)
    got = {
        r["event_type"]: (
            r["n_obs"],
            r["k_obs"],
            r["n_days"],
            r["d_final"],
            r["decision"],
            r["cross_day"],
        )
        for r in sprt_daily_monitor(df).collect()
    }
    model = _sprt_model(rows)
    assert set(got) == {f"k{k}" for k in model}
    for key, (n, kk, nd, df_, dec, cd) in model.items():
        cds = (
            (base + dt.timedelta(days=cd)).strftime("%Y-%m-%d")
            if cd is not None
            else None
        )
        assert got[f"k{key}"] == (n, kk, nd, df_, dec, cds)


def test_sprt_boundary_validation(spark):
    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1), 1.0)],
        "event_type string, ts timestamp, value double",
    )
    with pytest.raises(ValueError, match="boundary"):
        sprt_daily_monitor(df, boundary=0)


# ----------------------------------------------------------------- ACF


def test_acf_linear_series_perfect_lag_correlation(spark):
    # value(day t) = t: every lagged overlap is a perfect line, r = 1
    df = spark.createDataFrame(
        [
            ("a", dt.datetime(2024, 1, 1) + dt.timedelta(days=t), float(t))
            for t in range(1, 15)
        ],
        "event_type string, ts timestamp, value double",
    )
    rows = {(r["event_type"], r["lag"]): r for r in acf_daily(df, max_lag=3).collect()}
    for lag in (1, 2, 3):
        r = rows[("a", lag)]
        assert r["n_days"] == 14 - lag
        assert r["r"] == 1.0


def _pearson(pairs):
    n = len(pairs)
    sa = sum(a for a, _ in pairs)
    sb = sum(b for _, b in pairs)
    saa = sum(a * a for a, _ in pairs)
    sbb = sum(b * b for _, b in pairs)
    sab = sum(a * b for a, b in pairs)
    va = n * saa - sa * sa
    vb = n * sbb - sb * sb
    if va <= 0 or vb <= 0:
        return None
    return round(
        (n * sab - sa * sb) / (math.sqrt(va) * math.sqrt(vb)) + 1e-9, 6
    )


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.floats(
                min_value=-50,
                max_value=50,
                allow_nan=False,
                allow_infinity=False,
            ),
        ),
        min_size=2,
        max_size=30,
        unique_by=lambda r: r[0],
    )
)
def test_acf_matches_python_model(spark, rows):
    df = spark.createDataFrame(
        [
            ("a", dt.datetime(2024, 1, 1) + dt.timedelta(days=d), v)
            for d, v in rows
        ],
        "event_type string, ts timestamp, value double",
    ).repartition(3)
    got = {
        r["lag"]: (r["n_days"], r["r"])
        for r in acf_daily(df, max_lag=4).collect()
    }
    cents = {d: round(v * 100) for d, v in rows}
    for lag in (1, 2, 3, 4):
        pairs = [
            (cents[d], cents[d + lag]) for d in cents if d + lag in cents
        ]
        if not pairs:
            assert lag not in got
        else:
            assert got[lag] == (len(pairs), _pearson(pairs))


# ---------------------------------------------- lexical diversity


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.lists(
                st.sampled_from(["a", "bb", "ccc", "Dd", "e"]),
                min_size=0,
                max_size=8,
            ),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_lexical_diversity_matches_python_model(spark, docs):
    df = spark.createDataFrame(
        [(f"s{g}", " ".join(toks)) for g, toks in docs],
        "source string, text string",
    ).repartition(3)
    got = {
        r["source"]: (
            r["n_tokens"],
            r["n_types"],
            r["n_hapax"],
            r["ttr"],
            r["hapax_ratio"],
            r["herdan_c"],
        )
        for r in lexical_diversity(df).collect()
    }
    freq: dict[tuple[str, str], int] = {}
    for g, toks in docs:
        for t in toks:
            kk = (f"s{g}", t.lower())
            freq[kk] = freq.get(kk, 0) + 1
    for src in {f"s{g}" for g, _ in docs}:
        fs = {t: c for (s, t), c in freq.items() if s == src}
        if not fs:
            assert src not in got  # all-blank source emits no row
            continue
        n_tok = sum(fs.values())
        n_typ = len(fs)
        n_hap = sum(1 for c in fs.values() if c == 1)
        herdan = (
            round(math.log(n_typ) / math.log(n_tok) + 1e-9, 6)
            if n_tok > 1
            else None
        )
        assert got[src] == (
            n_tok,
            n_typ,
            n_hap,
            round(n_typ / n_tok + 1e-9, 6),
            round(n_hap / n_typ + 1e-9, 6),
            herdan,
        )


# ------------------------------------------------- power iteration


def test_top_pc_rank_one_spectrum(spark):
    # all vectors parallel to w: G = (Σ aᵢ²)·ŵŵᵀ exactly rank-1, so
    # one step already lands on ŵ; loadings = ±ŵ with first nonzero
    # positive, eigenvalue = Σ|aᵢ·w|² (on the 1e-4 grid)
    w = [3.0, 0.0, -4.0]
    scales = [1.0, -2.0, 0.5]
    df = spark.createDataFrame(
        [(i, [a * x for x in w]) for i, a in enumerate(scales)],
        "vec_id int, embedding array<double>",
    )
    rows = {
        r["i"]: r for r in top_principal_component(df, iters=4).collect()
    }
    norm = math.sqrt(sum(x * x for x in w))
    expect = [x / norm for x in w]  # first nonzero (3.0) positive
    for i, e in enumerate(expect, start=1):
        assert abs(rows[i]["loading"] - e) < 1e-5
    lam = sum(a * a for a in scales) * sum(x * x for x in w)
    assert abs(rows[1]["eigenvalue"] - lam) < 1e-3


def test_top_pc_sign_convention_flips_negative_lead(spark):
    # dominant axis with a NEGATIVE first nonzero component gets
    # flipped positive
    df = spark.createDataFrame(
        [(0, [-2.0, 1.0]), (1, [-4.0, 2.0]), (2, [-2.0, 1.0])],
        "vec_id int, embedding array<double>",
    )
    rows = {
        r["i"]: r["loading"]
        for r in top_principal_component(df, iters=3).collect()
    }
    assert rows[1] > 0  # flipped
    assert abs(rows[1] - 2 / math.sqrt(5)) < 1e-5
    assert abs(rows[2] - (-1 / math.sqrt(5))) < 1e-5


def test_top_pc_iters_validation(spark):
    df = spark.createDataFrame(
        [(0, [1.0])], "vec_id int, embedding array<double>"
    )
    with pytest.raises(ValueError, match="iters"):
        top_principal_component(df, iters=0)


def test_gram_impls_identical(spark):
    # the Arrow partial-XᵀX path and the built-in explode/join twin
    # re-associate the SAME exact integer sum — must agree cell-exactly
    from public_projet_data_engineering_tarification_electrique_spark.operators.spectral import (
        gram_long,
    )

    df = spark.createDataFrame(
        [
            (i, [((i * 7 + j * 3) % 11 - 5) / 7.0 for j in range(5)])
            for i in range(40)
        ],
        "vec_id int, embedding array<double>",
    ).repartition(4)
    a = {(r["i"], r["j"]): int(r["g"]) for r in gram_long(df).collect()}
    b = {
        (r["i"], r["j"]): int(r["g"])
        for r in gram_long(df, impl="explode").collect()
    }
    assert a == b
    assert len(a) == 25


def test_gram_impl_validation(spark):
    from public_projet_data_engineering_tarification_electrique_spark.operators.spectral import (
        gram_long,
    )

    df = spark.createDataFrame(
        [(0, [1.0])], "vec_id int, embedding array<double>"
    )
    with pytest.raises(ValueError, match="impl"):
        gram_long(df, impl="nope")


# ---------------------------------------------------------------- MASE

from public_projet_data_engineering_tarification_electrique_spark.operators.timeseries import (  # noqa: E402
    seasonal_naive_mase,
)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),
            st.floats(
                min_value=-40,
                max_value=40,
                allow_nan=False,
                allow_infinity=False,
            ),
        ),
        min_size=2,
        max_size=30,
        unique_by=lambda r: r[0],
    )
)
def test_mase_matches_python_model(spark, rows):
    df = spark.createDataFrame(
        [
            ("a", dt.datetime(2024, 1, 1) + dt.timedelta(days=d), v)
            for d, v in rows
        ],
        "event_type string, ts timestamp, value double",
    ).repartition(3)
    got = seasonal_naive_mase(df, season=3).collect()
    cents = {d: round(v * 100) for d, v in rows}

    def lag_stats(lag):
        pairs = [
            abs(cents[d + lag] - cents[d]) for d in cents if d + lag in cents
        ]
        return len(pairs), sum(pairs)

    n1, sad1 = lag_stats(1)
    ns, sads = lag_stats(3)
    mase = (
        round(sad1 * ns / (sads * n1) + 1e-9, 6)
        if n1 > 0 and ns > 0 and sads > 0
        else None
    )
    assert len(got) == 1
    r = got[0]
    assert (
        r["n1"],
        r["sad1_cents"],
        r["n_s"],
        r["sad_s_cents"],
        r["mase"],
    ) == (n1 or None, sad1 if n1 else None, ns or None,
          sads if ns else None, mase)


def test_mase_season_validation(spark):
    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1), 1.0)],
        "event_type string, ts timestamp, value double",
    )
    with pytest.raises(ValueError, match="season"):
        seasonal_naive_mase(df, season=1)


# ------------------------------------------------- whitening audit


def test_whitening_audit_orthogonal_and_duplicated_dims(spark):
    from public_projet_data_engineering_tarification_electrique_spark.operators.spectral import (
        whitening_audit,
    )

    # dims 1 and 2 perfectly correlated (duplicated), dim 3 orthogonal
    df = spark.createDataFrame(
        [
            (0, [1.0, 1.0, 0.0]),
            (1, [-2.0, -2.0, 0.0]),
            (2, [0.0, 0.0, 3.0]),
        ],
        "vec_id int, embedding array<double>",
    )
    r = whitening_audit(df).collect()[0]
    assert r["n_dims"] == 3
    assert r["n_pairs"] == 3
    assert (r["max_i"], r["max_j"]) == (1, 2)
    assert r["max_abs_corr"] == 1.0
    assert r["n_corr_ge_floor"] == 1  # only the duplicated pair


# ----------------------------------------------------------- Huber


def test_huber_no_outliers_equals_ols(spark):
    from public_projet_data_engineering_tarification_electrique_spark.operators.stats import (
        grouped_huber_irls,
    )

    # exact line: residuals are all 0 <= delta, so weights stay 1e6
    # and the weighted refit IS the OLS fit
    df = spark.createDataFrame(
        [
            ("a", dt.datetime(2024, 1, 1) + dt.timedelta(days=t), 10.0 + 2.0 * t)
            for t in range(12)
        ],
        "event_type string, ts timestamp, value double",
    )
    r = grouped_huber_irls(df).collect()[0]
    assert r["n_downweighted"] == 0
    assert r["slope_huber"] == r["slope_ols"] == 2.0


def test_huber_downweights_single_outlier(spark):
    from public_projet_data_engineering_tarification_electrique_spark.operators.stats import (
        grouped_huber_irls,
    )

    rows = [
        ("a", dt.datetime(2024, 1, 1) + dt.timedelta(days=t), 10.0 + 2.0 * t)
        for t in range(20)
    ]
    rows[10] = ("a", rows[10][1], 100000.0)  # one wild day
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )
    r = grouped_huber_irls(df).collect()[0]
    assert r["n_downweighted"] >= 1
    # the robust slope is closer to the true 2.0 than OLS is
    assert abs(r["slope_huber"] - 2.0) < abs(r["slope_ols"] - 2.0)


def test_huber_delta_validation(spark):
    from public_projet_data_engineering_tarification_electrique_spark.operators.stats import (
        grouped_huber_irls,
    )

    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1), 1.0)],
        "event_type string, ts timestamp, value double",
    )
    with pytest.raises(ValueError, match="delta"):
        grouped_huber_irls(df, delta_cents=0)


# ---------------------------------------------------- Mann-Kendall

from public_projet_data_engineering_tarification_electrique_spark.operators.stats import (  # noqa: E402
    mann_kendall_daily,
)


def test_mann_kendall_monotone_and_constant(spark):
    rows = [
        ("up", dt.datetime(2024, 1, 1) + dt.timedelta(days=t), float(t + 1))
        for t in range(12)
    ] + [
        ("flat", dt.datetime(2024, 1, 1) + dt.timedelta(days=t), 5.0)
        for t in range(12)
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )
    got = {r["event_type"]: r for r in mann_kendall_daily(df).collect()}
    up = got["up"]
    assert up["s_stat"] == 12 * 11 // 2  # every pair concordant
    assert up["trend"] == "increasing"
    flat = got["flat"]
    assert flat["s_stat"] == 0
    assert flat["var18"] == 0  # the tie term swallows everything
    assert flat["z"] is None
    assert flat["trend"] == "no_trend"


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),
            st.integers(min_value=-3, max_value=3),
        ),
        min_size=2,
        max_size=20,
        unique_by=lambda r: r[0],
    )
)
def test_mann_kendall_matches_python_model(spark, rows):
    df = spark.createDataFrame(
        [
            ("a", dt.datetime(2024, 1, 1) + dt.timedelta(days=d), float(v))
            for d, v in rows
        ],
        "event_type string, ts timestamp, value double",
    ).repartition(3)
    r = mann_kendall_daily(df).collect()[0]
    pts = sorted((d, v * 100) for d, v in rows)
    n = len(pts)
    s = sum(
        (0 < pts[j][1] - pts[i][1]) - (pts[j][1] - pts[i][1] < 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    tie18 = sum(
        t * (t - 1) * (2 * t + 5)
        for t in Counter(v for _, v in pts).values()
    )
    var18 = n * (n - 1) * (2 * n + 5) - tie18
    if var18 > 0:
        z = round(
            ((s - 1) if s > 0 else (s + 1) if s < 0 else 0)
            / math.sqrt(var18 / 18.0)
            * (1 if s != 0 else 0)
            + 1e-9,
            6,
        ) if s != 0 else 0.0
    else:
        z = None
    assert (r["n_days"], r["s_stat"], r["var18"], r["z"]) == (
        n,
        s,
        var18,
        z,
    )


# ----------------------------------------------------------- CUPED

from public_projet_data_engineering_tarification_electrique_spark.operators.stats import (  # noqa: E402
    cuped_variance_reduction,
    dispersion_index,
    srm_daily_check,
)


def test_cuped_perfectly_predictive_pre_period(spark):
    # post = 2·pre exactly → corr² = 1, θ = 2
    rows = []
    for u in range(8):
        rows.append(("a", u, dt.datetime(2024, 1, 5), float(u + 1)))
        rows.append(("a", u, dt.datetime(2024, 1, 20), 2.0 * (u + 1)))
    df = spark.createDataFrame(
        rows, "event_type string, user_id long, ts timestamp, value double"
    )
    r = cuped_variance_reduction(df).collect()[0]
    assert r["n_users"] == 8
    assert r["theta"] == 2.0
    assert r["var_reduction_pct"] == 100.0


def test_cuped_constant_pre_period_null_theta(spark):
    rows = []
    for u in range(5):
        rows.append(("a", u, dt.datetime(2024, 1, 5), 3.0))  # constant pre
        rows.append(("a", u, dt.datetime(2024, 1, 20), float(u)))
    df = spark.createDataFrame(
        rows, "event_type string, user_id long, ts timestamp, value double"
    )
    r = cuped_variance_reduction(df).collect()[0]
    assert r["theta"] is None
    assert r["var_reduction_pct"] is None


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),  # user
            st.integers(min_value=1, max_value=28),  # day
            st.floats(
                min_value=-20,
                max_value=20,
                allow_nan=False,
                allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_cuped_matches_python_model(spark, rows):
    df = spark.createDataFrame(
        [
            ("a", u, dt.datetime(2024, 1, d, 9), v)
            for u, d, v in rows
        ],
        "event_type string, user_id long, ts timestamp, value double",
    ).repartition(4)
    r = cuped_variance_reduction(df).collect()[0]
    per = {}
    for u, d, v in rows:
        x, y = per.get(u, (0, 0))
        if d < 16:
            x += round(v * 100)
        else:
            y += round(v * 100)
        per[u] = (x, y)
    n = len(per)
    sx = sum(x for x, _ in per.values())
    sy = sum(y for _, y in per.values())
    sxx = sum(x * x for x, _ in per.values())
    syy = sum(y * y for _, y in per.values())
    sxy = sum(x * y for x, y in per.values())
    cov = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    theta = round(cov / vx + 1e-9, 6) if vx > 0 else None
    vr = (
        round(cov * cov / (vx * vy) * 100.0 + 1e-9, 4)
        if vx > 0 and vy > 0
        else None
    )
    assert (r["n_users"], r["theta"], r["var_reduction_pct"]) == (
        n,
        theta,
        vr,
    )


# ------------------------------------------------------------- SRM


def test_srm_counts_distinct_units_and_flags(spark):
    # 40 users on day 1 (hash-split arms), the same 40 duplicated
    # 3× (events, not units — must not change counts); day 2 gets
    # only arm-a users (forced mismatch → flag)
    import hashlib

    def arm(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2

    d1 = [
        ("e", u, dt.datetime(2024, 1, 1, h), 1.0)
        for u in range(40)
        for h in (1, 2, 3)
    ]
    d2 = [
        ("e", u, dt.datetime(2024, 1, 2), 1.0)
        for u in range(200)
        if arm(u) == 0
    ]
    df = spark.createDataFrame(
        d1 + d2, "event_type string, user_id long, ts timestamp, value double"
    )
    got = {r["day"]: r for r in srm_daily_check(df).collect()}
    n_a1 = sum(1 for u in range(40) if arm(u) == 0)
    assert (got["2024-01-01"]["n_a"], got["2024-01-01"]["n_b"]) == (
        n_a1,
        40 - n_a1,
    )
    assert got["2024-01-02"]["n_b"] == 0
    assert bool(got["2024-01-02"]["srm_flag"]) is True


# ------------------------------------------------------ dispersion


def test_dispersion_poisson_vs_bursty(spark):
    # constant 5 events/day → variance 0 → index 0 (not overdispersed);
    # alternating 1/19 → strongly overdispersed
    rows = []
    for d in range(10):
        for i in range(5):
            rows.append(("flat", dt.datetime(2024, 1, d + 1, i + 1), 1.0))
        burst = 19 if d % 2 == 0 else 1
        for i in range(burst):
            rows.append(
                ("bursty", dt.datetime(2024, 1, d + 1, (i % 23) + 1, i), 1.0)
            )
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )
    got = {r["event_type"]: r for r in dispersion_index(df).collect()}
    assert got["flat"]["dispersion"] == 0.0
    assert bool(got["flat"]["overdispersed"]) is False
    assert got["bursty"]["mean_per_day"] == 10.0
    # var of {19,1}×5 = (10·(5·361+5·1)−100²)/(10·9) = 9
    assert got["bursty"]["dispersion"] == 9.0
    assert bool(got["bursty"]["overdispersed"]) is True


# ---------------------------------------------------- MDE / ratio CI

from public_projet_data_engineering_tarification_electrique_spark.operators.stats import (  # noqa: E402
    Z_ALPHA_2,
    Z_BETA_80,
    mde_power_table,
    ratio_metric_ci,
)


def test_mde_closed_form_two_point_metric(spark):
    # users alternate 10.00 / 20.00 → mean 15, var = 25.something
    rows = [
        ("a", u, dt.datetime(2024, 1, 5), 10.0 if u % 2 == 0 else 20.0)
        for u in range(10)
    ]
    df = spark.createDataFrame(
        rows, "event_type string, user_id long, ts timestamp, value double"
    )
    r = mde_power_table(df).collect()[0]
    assert r["n_users"] == 10
    assert r["mean_per_user"] == 15.0
    # sample var of five 1000s and five 2000s (cents)
    var = (10 * (5 * 1000**2 + 5 * 2000**2) - 15000**2) / (10 * 9)
    mde = (Z_ALPHA_2 + Z_BETA_80) * math.sqrt(var) * math.sqrt(2 / 5)
    assert abs(r["mde_abs"] - round(mde / 100 + 1e-9, 6)) < 1e-9
    assert r["mde_rel_pct"] == round(
        mde / (15000 / 10) / 10 * 100.0 + 1e-9, 4
    ) or r["mde_rel_pct"] is not None  # closed-form spot below
    # exact recompute of the rel form used by the operator
    mean_c = 15000 / 10
    assert r["mde_rel_pct"] == round(mde / mean_c * 100.0 + 1e-9, 4)


def test_mde_single_user_null(spark):
    df = spark.createDataFrame(
        [("a", 1, dt.datetime(2024, 1, 5), 3.0)],
        "event_type string, user_id long, ts timestamp, value double",
    )
    r = mde_power_table(df).collect()[0]
    assert r["mde_abs"] is None and r["sd_per_user"] is None


def test_ratio_ci_constant_per_user_ratio(spark):
    # every user: 3 events of 2.00 → R = 2.00 exactly; per-user
    # (y, n) all equal → zero delta variance → CI collapses to R
    rows = [
        ("a", u, dt.datetime(2024, 1, 5, h), 2.0)
        for u in range(6)
        for h in (1, 2, 3)
    ]
    df = spark.createDataFrame(
        rows, "event_type string, user_id long, ts timestamp, value double"
    )
    r = ratio_metric_ci(df).collect()[0]
    assert (r["n_users"], r["n_events"]) == (6, 18)
    assert r["ratio"] == 2.0
    assert r["se"] == 0.0
    assert r["ci_lo"] == r["ci_hi"] == 2.0


# ------------------------------------------------------------- ESS

from public_projet_data_engineering_tarification_electrique_spark.operators.sampling import (  # noqa: E402
    effective_sample_size,
)


def test_ess_uniform_and_concentrated(spark):
    uni = spark.createDataFrame(
        [(1_000_000,)] * 8, "w long"
    )
    r = effective_sample_size(uni, "w").collect()[0]
    assert (r["n_rows"], r["ess"], r["ess_ratio"]) == (8, 8.0, 1.0)
    conc = spark.createDataFrame(
        [(1_000_000,)] + [(0,)] * 7, "w long"
    )
    r2 = effective_sample_size(conc, "w").collect()[0]
    assert (r2["n_rows"], r2["ess"]) == (8, 1.0)


# ----------------------------------------------------- Page-Hinkley

from public_projet_data_engineering_tarification_electrique_spark.operators.timeseries import (  # noqa: E402
    page_hinkley_daily,
)


def test_page_hinkley_detects_level_shift(spark):
    # 10 days at 100.00 then 10 days at 400.00: the running-mean
    # deviation accumulates ~300·k/2 cents — crosses λ=100.00 fast
    rows = [
        ("a", dt.datetime(2024, 1, d + 1), 100.0 if d < 10 else 400.0)
        for d in range(20)
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )
    r = page_hinkley_daily(df).collect()[0]
    assert bool(r["alarmed"]) is True
    assert r["alarm_day"] >= "2024-01-11"  # can only fire post-shift
    assert r["ph_max_cents"] > 10000


def test_page_hinkley_flat_series_silent(spark):
    rows = [
        ("a", dt.datetime(2024, 1, d + 1), 50.0) for d in range(20)
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )
    r = page_hinkley_daily(df).collect()[0]
    assert bool(r["alarmed"]) is False
    assert r["alarm_day"] is None
    assert r["ph_max_cents"] == 0  # dev = -delta every day, min tracks


def test_page_hinkley_lambda_validation(spark):
    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1), 1.0)],
        "event_type string, ts timestamp, value double",
    )
    with pytest.raises(ValueError, match="lambda"):
        page_hinkley_daily(df, lambda_cents=0)


# ------------------------------------------------------------- WAV

from public_projet_data_engineering_tarification_electrique_spark.operators.multimodal import (  # noqa: E402
    decode_wav_stats,
    synth_wav_corpus,
)


def test_wav_roundtrip_matches_closed_form(spark):
    docs = spark.createDataFrame(
        [(d,) for d in (0, 5, 123, 96)], "doc_id long"
    )
    got = {
        r["doc_id"]: r
        for r in decode_wav_stats(synth_wav_corpus(docs)).collect()
    }
    for d in (0, 5, 123, 96):
        n = 32 + d % 97
        s = [((1234 * t + 57 * d) % 4096) - 2048 for t in range(n)]
        r = got[d]
        assert r["n_samples"] == n
        assert r["sample_rate"] == 8000
        assert r["sum_samples"] == sum(s)
        assert r["sum_abs"] == sum(abs(v) for v in s)
        assert r["peak_abs"] == max(abs(v) for v in s)
        assert r["energy"] == sum(v * v for v in s)
        assert r["n_frames"] == (1 + (n - 16) // 8 if n >= 16 else 0)


def test_wav_decode_rejects_garbage_and_stereo(spark):
    import io
    import wave as _wave

    bad = spark.createDataFrame(
        [(1, bytearray(b"not a riff container"))],
        "doc_id long, payload binary",
    )
    # the worker-side wave.Error surfaces as a PySpark-wrapped
    # exception; match the specific parser message so this is not a
    # vacuous any-exception assertion
    with pytest.raises(Exception, match="RIFF"):
        decode_wav_stats(bad).collect()

    buf = io.BytesIO()
    w = _wave.open(buf, "wb")
    w.setnchannels(2)
    w.setsampwidth(2)
    w.setframerate(8000)
    w.writeframes(b"\x00\x00\x00\x00" * 4)
    w.close()
    stereo = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="16-bit mono"):
        decode_wav_stats(stereo).collect()


def test_wav_frame_params_validation(spark):
    df = spark.createDataFrame([(1, bytearray(b""))], "doc_id long, payload binary")
    with pytest.raises(ValueError, match="frame_len"):
        decode_wav_stats(df, frame_len=0)


# ----------------------------------------------------- bigram LM

from public_projet_data_engineering_tarification_electrique_spark.operators.sampling import (  # noqa: E402
    hash_bucket,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.textstats import (  # noqa: E402
    bigram_lm_lang_scores,
)


def test_bigram_lm_matches_python_model(spark):
    import hashlib

    docs = [
        (0, "en", "a b a b c"),
        (1, "en", "a b"),
        (2, "fr", "c c c a"),
        (3, "fr", "b a b"),
        (4, "en", "solo"),  # no bigrams — excluded from n_docs
        (5, "fr", ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    got = {
        r["lang"]: (r["n_docs"], r["n_bigrams"], r["sum_nll6"], r["avg_nll"])
        for r in bigram_lm_lang_scores(df).collect()
    }

    def train(d):
        return int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) % 100 < 80

    import math as _m

    pairs = []
    for d, lang, text in docs:
        toks = [t for t in text.lower().split() if t]
        for i in range(len(toks) - 1):
            pairs.append((d, lang, train(d), toks[i], toks[i + 1]))
    c2: dict = {}
    vocab = set()
    for d, lang, tr, a, b in pairs:
        if tr:
            c2[(a, b)] = c2.get((a, b), 0) + 1
            vocab |= {a, b}
    c1: dict = {}
    for (a, _), c in c2.items():
        c1[a] = c1.get(a, 0) + c
    v = len(vocab)
    model: dict = {}
    for lang in ("en", "fr"):
        lp = [p for p in pairs if p[1] == lang]
        if not lp:
            continue
        # per-distinct-bigram grid NLL, occurrence-weighted
        from collections import Counter

        n_by_bg = Counter((a, b) for _, _, _, a, b in lp)
        s = sum(
            n
            * round(
                _m.log((c1.get(a, 0) + v) / (c2.get((a, b), 0) + 1)) * 1e6
            )
            for (a, b), n in n_by_bg.items()
        )
        nb = sum(n_by_bg.values())
        nd = len({d for d, l, *_ in lp if l == lang})
        model[lang] = (nd, nb, s, round(s / nb / 1e6 + 1e-9, 6))
    assert got == model


# -------------------------------------------------- streaming SRM


def test_stream_srm_equals_batch_with_duplicates_and_cutoff(
    spark, tmp_path
):
    import hashlib

    from public_projet_data_engineering_tarification_electrique_spark.streaming.dedup import (
        stream_srm_daily,
    )

    # 6 days of users; day 3's users delivered TWICE (duplicate
    # deliveries must not move unit counts); watermark 1 day holds
    # back the last day's window
    rows = []
    eid = 0
    for d in range(6):
        for u in range(10 + d):
            for rep in range(2 if d == 2 else 1):
                rows.append(
                    (
                        eid,
                        dt.datetime(2024, 3, 1 + d, 10 + rep),
                        u,
                        "click",
                        1.0,
                    )
                )
                eid += 1
    src = str(tmp_path / "events.parquet")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    ).write.parquet(src)
    got = {
        r["day"]: (r["n_a"], r["n_b"])
        for r in stream_srm_daily(spark, src).collect()
    }

    def arm(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2

    # max ts = Mar 6 10:00; watermark cutoff = Mar 5 10:00; emitted
    # windows end <= cutoff → days Mar 1..4 only
    expect = {}
    for d in range(4):
        us = list(range(10 + d))
        na = sum(1 for u in us if arm(u) == 0)
        expect[f"2024-03-0{1 + d}"] = (na, len(us) - na)
    assert got == expect


# ------------------------------------- review-fix regression pins


def test_whitening_zero_variance_dim_not_counted(spark):
    from public_projet_data_engineering_tarification_electrique_spark.operators.spectral import (
        whitening_audit,
    )

    # dim 3 is all-zero: its pairs have undefined correlation (0/0)
    # and must be EXCLUDED from the floor count and the argmax, not
    # reported as "heavily correlated" via NaN ordering
    df = spark.createDataFrame(
        [(0, [1.0, 1.0, 0.0]), (1, [2.0, -1.0, 0.0]), (2, [1.0, 0.5, 0.0])],
        "vec_id int, embedding array<double>",
    )
    r = whitening_audit(df).collect()[0]
    assert r["n_pairs"] == 3  # all pairs counted
    assert (r["max_i"], r["max_j"]) == (1, 2)  # only the defined pair
    assert r["max_abs_corr"] is not None
    assert r["max_abs_corr"] == r["max_abs_corr"]  # not NaN


def test_gram_null_embedding_both_impls_skip(spark):
    from public_projet_data_engineering_tarification_electrique_spark.operators.spectral import (
        gram_long,
    )

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, None), (2, [3.0, 4.0])],
        "vec_id int, embedding array<double>",
    )
    a = {(r["i"], r["j"]): int(r["g"]) for r in gram_long(df).collect()}
    b = {
        (r["i"], r["j"]): int(r["g"])
        for r in gram_long(df, impl="explode").collect()
    }
    assert a == b
    # only rows 0 and 2 contribute
    assert a[(1, 1)] == 10000**2 + 30000**2


def test_top_pc_all_zero_gram_raises(spark):
    df = spark.createDataFrame(
        [(0, [1e-9, -1e-9]), (1, [2e-9, 0.0])],
        "vec_id int, embedding array<double>",
    )
    with pytest.raises(Exception, match="all zeros"):
        top_principal_component(df, iters=2).collect()


def test_bigram_lm_empty_train_split_raises(spark):
    df = spark.createDataFrame(
        [(0, "en", "a b c")], "doc_id long, lang string, text string"
    )
    with pytest.raises(Exception, match="train split is empty"):
        bigram_lm_lang_scores(df, train_pct=0).collect()
