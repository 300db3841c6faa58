"""Round-10 property tests: each new operator vs a plain-Python model
(the registry oracle gate is the cross-engine check; these pin the
SEMANTICS against an independent implementation on adversarial
hypothesis inputs — ties, single days, constant margins)."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from public_projet_data_engineering_tarification_electrique_spark.operators.stats import (
    kendall_tau,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.timeseries import (
    theil_sen_daily,
)


def _median(vals):
    s = sorted(vals)
    n = len(s)
    lo, hi = s[(n - 1) // 2], s[n // 2]
    return (lo + hi) / 2.0


def _theil_sen_model(rows):
    """rows: (key, day_offset, value_float). Daily totals in exact
    cents; slopes via single double division; medians with (lo+hi)/2."""
    daily = {}
    for k, d, v in rows:
        daily[(k, d)] = daily.get((k, d), 0) + round(v * 100)
    out = {}
    for key in sorted({k for k, _ in daily}):
        pts = sorted((d, c) for (k, d), c in daily.items() if k == key)
        slopes = [
            (float(c2 - c1) / float(t2 - t1)) / 100.0
            for i, (t1, c1) in enumerate(pts)
            for (t2, c2) in pts[i + 1 :]
        ]
        slope = _median(slopes) if slopes else None
        icept = (
            _median([c / 100.0 - slope * t for t, c in pts])
            if slope is not None
            else None
        )
        out[key] = (len(pts), len(slopes), slope, icept)
    return out


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=0, max_value=20),
            st.floats(
                min_value=-50,
                max_value=50,
                allow_nan=False,
                allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_theil_sen_matches_python_model(spark, rows):
    base = dt.datetime(2024, 1, 1, 9, 0, 0)
    data = [
        (k, base + dt.timedelta(days=d), v) for k, d, v in rows
    ]
    df = spark.createDataFrame(
        data, "event_type string, ts timestamp, value double"
    ).repartition(5)
    got = {
        r["event_type"]: (
            r["n_days"],
            r["n_pairs"],
            r["slope_med"],
            r["intercept_med"],
        )
        for r in theil_sen_daily(df).collect()
    }
    t0 = (base.date() - dt.date(1970, 1, 1)).days
    exp = _theil_sen_model([(k, t0 + d, v) for k, d, v in rows])
    assert set(got) == set(exp)
    for k, (nd, np_, sl, ic) in exp.items():
        gnd, gnp, gsl, gic = got[k]
        assert (gnd, gnp) == (nd, np_), k
        if sl is None:
            assert gsl is None and gic is None, k
        else:
            assert gsl == pytest.approx(round(sl + 1e-9, 6), abs=2e-6), k
            assert gic == pytest.approx(round(ic + 1e-9, 6), abs=2e-6), k


def _kendall_model(pairs):
    n = len(pairs)
    conc = disc = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = pairs[j][0] - pairs[i][0]
            dy = pairs[j][1] - pairs[i][1]
            if dx * dy > 0:
                conc += 1
            elif dx * dy < 0:
                disc += 1
    n0 = n * (n - 1) // 2
    from collections import Counter

    n1 = sum(t * (t - 1) // 2 for t in Counter(x for x, _ in pairs).values())
    n2 = sum(t * (t - 1) // 2 for t in Counter(y for _, y in pairs).values())
    tau = None
    if n0 - n1 > 0 and n0 - n2 > 0:
        tau = (conc - disc) / ((n0 - n1) ** 0.5 * (n0 - n2) ** 0.5)
    return n, conc, disc, tau


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=0, max_value=6),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_kendall_tau_matches_python_model(spark, pairs):
    df = spark.createDataFrame(pairs, "vx long, vy long").repartition(5)
    r = kendall_tau(df, "vx", "vy").collect()[0]
    n, conc, disc, tau = _kendall_model(pairs)
    assert (r["n"], r["concordant"], r["discordant"]) == (n, conc, disc)
    if tau is None:
        assert r["tau_b"] is None
    else:
        assert r["tau_b"] == pytest.approx(round(tau + 1e-9, 6), abs=2e-6)


def test_stream_outer_join_watermark_gate(spark, tmp_path):
    """Hand-staged corpus pinning the outer-emission cutoff: a click
    with no error emits NULLs iff its window closed strictly before
    the final watermark min(max c, max e) − delay."""
    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = [
        # (event_id, ts_offset_s, user, type)
        (1, 0, 10, "click"),        # no error; window closes t=3600
        (2, 1000, 11, "click"),     # matched by error at 1500
        (3, 1500, 11, "error"),
        (4, 30000, 12, "click"),    # no error; window closes t=33600
        (5, 42000, 13, "error"),    # advances error-side max
        (6, 41000, 14, "click"),    # advances click-side max
    ]
    df = spark.createDataFrame(
        [
            (eid, base + dt.timedelta(seconds=s), u, t, 1.0, None)
            for eid, s, u, t in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    src = str(tmp_path / "ev")
    df.coalesce(1).write.parquet(src)

    from public_projet_data_engineering_tarification_electrique_spark.streaming.daily import (
        stream_stream_click_error_outer_join,
    )

    out = {
        (r["click_id"], r["error_id"])
        for r in stream_stream_click_error_outer_join(spark, src).collect()
    }
    # final wm = min(41000, 42000) − 3600 = 37400.
    # click 1 window closes at 3600 < 37400 → NULL row emitted.
    # click 4 closes at 33600 < 37400 → NULL row emitted.
    # click 6 closes at 44600 > wm → stays in state, absent.
    assert out == {(2, 3), (1, None), (4, None)}


from public_projet_data_engineering_tarification_electrique_spark.operators.timeseries import (
    lag_cross_correlation,
    time_weighted_avg,
)


def _twa_model(rows):
    """rows: (user, us_offset, event_id, value). Exact trapezoid sums
    in cents·µs, the identical terminal double sequence."""
    byu = {}
    for u, us, eid, v in rows:
        byu.setdefault(u, []).append((us, eid, round(v * 100)))
    out = {}
    for u, pts in byu.items():
        pts.sort()
        n = len(pts)
        span = sum(
            pts[i + 1][0] - pts[i][0] for i in range(n - 1)
        )
        num = sum(
            (pts[i][2] + pts[i + 1][2]) * (pts[i + 1][0] - pts[i][0])
            for i in range(n - 1)
        )
        twa = (
            round(float(num) / (2.0 * float(span)) / 100.0 + 1e-9, 6)
            if span > 0
            else None
        )
        out[u] = (n, span, twa)
    return out


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=10**7),
            st.floats(
                min_value=-100,
                max_value=100,
                allow_nan=False,
                allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda r: (r[0], r[1]),
    )
)
def test_time_weighted_avg_matches_python_model(spark, rows):
    base_us = 1_700_000_000_000_000
    data = [
        (eid, (base_us + us) // 1_000_000, u, v)
        for eid, (u, us, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id long, sec long, user_id long, value double"
    ).select(
        "event_id",
        F.timestamp_seconds(F.col("sec")).cast("timestamp_ntz").alias("ts"),
        "user_id",
        "value",
    ).repartition(5)
    got = {
        r["user_id"]: (r["n_events"], r["span_us"], r["twa"])
        for r in time_weighted_avg(df).collect()
    }
    # the model runs on second-truncated offsets like the frame does
    exp = _twa_model(
        [
            (u, ((base_us + us) // 1_000_000) * 1_000_000, eid, v)
            for eid, (u, us, v) in enumerate(rows)
        ]
    )
    assert set(got) == set(exp)
    for u, (n, span, twa) in exp.items():
        gn, gspan, gtwa = got[u]
        assert (gn, gspan) == (n, span), u
        if twa is None:
            assert gtwa is None, u
        else:
            assert gtwa == pytest.approx(twa, abs=2e-6), u


import pyspark.sql.functions as F


def test_lag_cross_correlation_perfect_lead(spark):
    """error daily total = click daily total shifted by +2 days →
    r = 1.0 exactly at lag +2 over the overlap."""
    base = dt.datetime(2024, 5, 1, 12, 0, 0)
    rows = []
    eid = 0
    vals = [3, 1, 4, 1, 5, 9, 2, 6]
    for d, v in enumerate(vals):
        rows.append((eid, base + dt.timedelta(days=d), 1, "click", float(v)))
        eid += 1
        rows.append(
            (eid, base + dt.timedelta(days=d + 2), 2, "error", float(v))
        )
        eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    )
    out = {r["lag"]: r for r in lag_cross_correlation(df, "click", "error").collect()}
    assert set(out) == set(range(-3, 4))
    assert out[2]["n_days"] == 8
    assert out[2]["r"] == pytest.approx(1.0, abs=1e-6)
    # at lag 0 the overlap is days 2..7 of clicks vs days 0..5 of the
    # shifted copy — not perfectly correlated
    assert out[0]["n_days"] == 6


from public_projet_data_engineering_tarification_electrique_spark.operators.stats import (
    wasserstein_1d,
)


def _w1_model(a_vals, b_vals, dp=2):
    """Exact-integer W1 on the grid: per-interval |FA−FB| mass."""
    ga = sorted(round(v * 10**dp) for v in a_vals)
    gb = sorted(round(v * 10**dp) for v in b_vals)
    xs = sorted(set(ga) | set(gb))
    na, nb = len(ga), len(gb)
    s = 0
    for i in range(len(xs) - 1):
        cuma = sum(1 for v in ga if v <= xs[i])
        cumb = sum(1 for v in gb if v <= xs[i])
        s += abs(cuma * nb - cumb * na) * (xs[i + 1] - xs[i])
    if na == 0 or nb == 0:
        return na, nb, len(xs), None
    return (
        na,
        nb,
        len(xs),
        round(float(s) / (float(na) * float(nb)) / float(10**dp) + 1e-9, 6),
    )


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.floats(
                min_value=-20,
                max_value=20,
                allow_nan=False,
                allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_wasserstein_matches_python_model(spark, rows):
    df = spark.createDataFrame(rows, "grp string, v double").repartition(5)
    out = wasserstein_1d(df, "v", "grp", "a", "b").collect()
    a_vals = [v for g, v in rows if g == "a"]
    b_vals = [v for g, v in rows if g == "b"]
    na, nb, nl, w1 = _w1_model(a_vals, b_vals)
    assert len(out) == 1
    r = out[0]
    assert (r["n_a"], r["n_b"], r["n_levels"]) == (na, nb, nl)
    if w1 is None:
        assert r["w1"] is None
    else:
        assert r["w1"] == pytest.approx(w1, abs=2e-6)


import hashlib

from public_projet_data_engineering_tarification_electrique_spark.operators.sketches import (
    hll_rolling_distinct,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.timeseries import (
    changepoint_daily,
)


def _hll_rolling_model(day_keys, window=7):
    """Python HLL replay with the identical md5 register law."""
    regs_by_day = {}
    for d, k in day_keys:
        h = hashlib.md5(str(k).encode()).hexdigest()
        reg = int(h[:2], 16)
        w = int(h[2:15], 16)
        rho = 53 if w == 0 else 53 - len(bin(w)[2:])
        cur = regs_by_day.setdefault(d, {})
        cur[reg] = max(cur.get(reg, 0), rho)
    out = {}
    days = sorted(regs_by_day)
    for d in days:
        merged = {}
        for d2 in days:
            if d - window < d2 <= d:
                for r, rho in regs_by_day[d2].items():
                    merged[r] = max(merged.get(r, 0), rho)
        npresent = len(merged)
        s = sum(1 << (53 - rho) for rho in merged.values()) + (
            256 - npresent
        ) * (1 << 53)
        est = round(0.718273 * 256 * 256 * float(1 << 53) / float(s), 2)
        exact = len(
            {k for d2, k in day_keys if d - window < d2 <= d}
        )
        out[d] = (npresent, est, exact)
    return out


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),
            st.integers(min_value=0, max_value=400),
        ),
        min_size=1,
        max_size=80,
    )
)
def test_hll_rolling_matches_python_model(spark, day_keys):
    base = dt.date(2024, 1, 1)
    t0 = (base - dt.date(1970, 1, 1)).days
    data = [
        (i, dt.datetime(2024, 1, 1 + d, 6, 0, 0), k)
        for i, (d, k) in enumerate(day_keys)
    ]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long"
    ).repartition(5)
    got = {
        r["day"]: (r["n_registers"], r["est_distinct"], r["exact_distinct"])
        for r in hll_rolling_distinct(df, "user_id", "ts").collect()
    }
    exp = _hll_rolling_model([(t0 + d, k) for d, k in day_keys])
    assert {dt.date.fromisoformat(d).toordinal() - dt.date(1970, 1, 1).toordinal() for d in got} == set(exp)
    for day_s, (nreg, est, exact) in got.items():
        d = dt.date.fromisoformat(day_s).toordinal() - dt.date(1970, 1, 1).toordinal()
        enreg, eest, eexact = exp[d]
        assert (nreg, exact) == (enreg, eexact), day_s
        assert est == pytest.approx(eest, abs=0.02), day_s


def _changepoint_model(rows):
    """rows: (key, day_off, value). Grid means -> exact prefix sums ->
    SSE argmin with (sse, b) tie-break."""
    daily = {}
    for k, d, v in rows:
        daily.setdefault((k, d), []).append(round(v * 1e4))
    series = {}
    for (k, d), snaps in daily.items():
        vg = round(sum(snaps) / len(snaps) + 1e-9)
        series.setdefault(k, []).append((d, vg))
    out = {}
    for k, pts in series.items():
        pts.sort()
        n = len(pts)
        S = sum(v for _, v in pts)
        Q = sum(v * v for _, v in pts)
        sse_total = float(Q) - float(S) * float(S) / float(n)
        best = None
        cs = cq = 0
        for b in range(1, n):
            cs += pts[b - 1][1]
            cq += pts[b - 1][1] ** 2
            sse = (float(cq) - float(cs) * float(cs) / float(b)) + (
                (float(Q) - float(cq))
                - (float(S) - float(cs)) * (float(S) - float(cs))
                / (float(n) - float(b))
            )
            if best is None or sse < best[0]:
                best = (sse, b, pts[b - 1][0])
        out[k] = (
            n,
            None if best is None else best[2],
            round(sse_total / 1e8 + 1e-9, 4),
            None if best is None else round(best[0] / 1e8 + 1e-9, 4),
            None
            if best is None
            else round((sse_total - best[0]) / 1e8 + 1e-9, 4),
        )
    return out


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=0, max_value=15),
            st.floats(
                min_value=-80,
                max_value=80,
                allow_nan=False,
                allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_changepoint_matches_python_model(spark, rows):
    base = dt.date(2024, 1, 1)
    t0 = base.toordinal() - dt.date(1970, 1, 1).toordinal()
    data = [
        (k, dt.datetime(2024, 1, 1 + d, 15, 0, 0), v) for k, d, v in rows
    ]
    df = spark.createDataFrame(
        data, "event_type string, ts timestamp, value double"
    ).repartition(5)
    got = {
        r["event_type"]: (
            r["n_days"],
            None
            if r["break_day"] is None
            else dt.date.fromisoformat(r["break_day"]).toordinal()
            - dt.date(1970, 1, 1).toordinal(),
            r["sse_total"],
            r["sse_best"],
            r["gain"],
        )
        for r in changepoint_daily(df).collect()
    }
    exp = _changepoint_model([(k, t0 + d, v) for k, d, v in rows])
    assert set(got) == set(exp)
    for k in exp:
        gn, gb, gt, gbest, ggain = got[k]
        en, eb, et, ebest, egain = exp[k]
        assert (gn, gb) == (en, eb), k
        assert gt == pytest.approx(et, abs=2e-4), k
        if ebest is None:
            assert gbest is None and ggain is None, k
        else:
            assert gbest == pytest.approx(ebest, abs=2e-4), k
            assert ggain == pytest.approx(egain, abs=2e-4), k


from public_projet_data_engineering_tarification_electrique_spark.operators.timeseries import (
    burst_detection,
)


def _burst_model(rows, window=60):
    """rows: (user, sec). Per-event trailing count; per-user max with
    earliest peak second."""
    byu = {}
    for u, s in rows:
        byu.setdefault(u, []).append(s)
    out = {}
    for u, secs in byu.items():
        secs.sort()
        best = None
        for s in secs:
            burst = sum(1 for t in secs if s - window < t <= s)
            if best is None or burst > best[0] or (
                burst == best[0] and s < best[1]
            ):
                best = (burst, s)
        out[u] = (len(secs), best[0], best[1])
    return out


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=300),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_burst_detection_matches_python_model(spark, rows):
    base = 1_700_000_000
    data = [
        (i, (base + s) * 1_000_000, u) for i, (u, s) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id long, us long, user_id long"
    ).select(
        "event_id",
        F.timestamp_micros(F.col("us")).cast("timestamp_ntz").alias("ts"),
        "user_id",
    ).repartition(5)
    got = {
        r["user_id"]: (r["n_events"], r["max_burst"], r["peak_second"])
        for r in burst_detection(df).collect()
    }
    exp = _burst_model([(u, base + s) for u, s in rows])
    assert got == exp


from public_projet_data_engineering_tarification_electrique_spark.operators.sampling import (
    water_fill_allocation,
)


def _water_model(counts, num=3, den=5):
    items = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))
    total = sum(counts.values())
    n = len(items)
    b = (total * num) // den
    p = 0
    k = None
    for i, (s, c) in enumerate(items, start=1):
        p += c
        if not (p + (n - i) * c <= b):
            k = i
            p_before = p - c
            break
    alloc = {}
    if k is None:
        for s, c in items:
            alloc[s] = (c, False)
    else:
        lam = (b - p_before) // (n - k + 1)
        rem = (b - p_before) % (n - k + 1)
        for i, (s, c) in enumerate(items, start=1):
            if i < k:
                alloc[s] = (c, False)
            else:
                alloc[s] = (lam + (1 if i - k + 1 <= rem else 0), True)
    return alloc, b, total


@settings(max_examples=8, deadline=None)
@given(
    st.dictionaries(
        st.sampled_from([f"s{i}" for i in range(8)]),
        st.integers(min_value=1, max_value=500),
        min_size=1,
        max_size=8,
    )
)
def test_water_filling_matches_model_and_invariants(spark, counts):
    rows = [
        (f"{s}_{j}", s) for s, c in counts.items() for j in range(c)
    ]
    df = spark.createDataFrame(rows, "doc_id string, source string")
    got = {
        r["source"]: (r["n_docs"], r["alloc"], r["capped"])
        for r in water_fill_allocation(df, "source", 3, 5).collect()
    }
    exp, b, total = _water_model(counts)
    assert set(got) == set(exp)
    for s, (ea, ecap) in exp.items():
        nd, ga, gcap = got[s]
        assert nd == counts[s]
        assert (ga, gcap) == (ea, ecap), s
    # the budget invariant: sum == B when B <= total, == total otherwise
    ssum = sum(a for _, a, _ in got.values())
    assert ssum == min(b, total)
    assert all(a <= nd for nd, a, _ in got.values())


def test_water_filling_rejects_improper_budget(spark):
    df = spark.createDataFrame(
        [("d1", "a"), ("d2", "b")], "doc_id string, source string"
    )
    with pytest.raises(ValueError, match="budget_den"):
        water_fill_allocation(df, "source", 1, 0)
    with pytest.raises(ValueError, match="budget_den"):
        water_fill_allocation(df, "source", 1, -3)
    with pytest.raises(ValueError, match="budget_num"):
        water_fill_allocation(df, "source", -1, 5)
    with pytest.raises(ValueError, match="budget_num"):
        water_fill_allocation(df, "source", 7, 5)


from public_projet_data_engineering_tarification_electrique_spark.operators.timeseries import (
    stl_lite_weekly,
)


def _stl_model(rows):
    """rows: (key, day_ordinal, value). Grid daily means, ±3-row
    window over observed days, per-isodow mean of exact 7v−S7."""
    daily = {}
    for k, d, v in rows:
        daily.setdefault((k, d), []).append(round(v * 1e4))
    series = {}
    for (k, d), snaps in daily.items():
        vg = round(sum(snaps) / len(snaps) + 1e-9)
        series.setdefault(k, []).append((d, vg))
    out = {}
    for k, pts in series.items():
        pts.sort()
        n = len(pts)
        cells = {}
        for i in range(n):
            if i - 3 < 0 or i + 3 >= n:
                continue
            s7 = sum(v for _, v in pts[i - 3 : i + 4])
            d, v = pts[i]
            isodow = dt.date.fromordinal(
                d + dt.date(1970, 1, 1).toordinal()
            ).isoweekday()
            cells.setdefault(isodow, []).append(7 * v - s7)
        for dow, terms in cells.items():
            out[(k, dow)] = (
                len(terms),
                round(
                    float(sum(terms)) / (7.0 * len(terms)) / 1e4 + 1e-9, 4
                ),
            )
    return out


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=0, max_value=25),
            st.floats(
                min_value=-90,
                max_value=90,
                allow_nan=False,
                allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_stl_lite_matches_python_model(spark, rows):
    base = dt.date(2024, 1, 1)
    t0 = base.toordinal() - dt.date(1970, 1, 1).toordinal()
    data = [
        (k, dt.datetime(2024, 1, 1 + d, 10, 0, 0), v) for k, d, v in rows
    ]
    df = spark.createDataFrame(
        data, "event_type string, ts timestamp, value double"
    ).repartition(5)
    got = {
        (r["event_type"], r["dow"]): (r["n_days"], r["seasonal"])
        for r in stl_lite_weekly(df).collect()
    }
    exp = _stl_model([(k, t0 + d, v) for k, d, v in rows])
    assert set(got) == set(exp)
    for kd, (n, seas) in exp.items():
        gn, gs = got[kd]
        assert gn == n, kd
        assert gs == pytest.approx(seas, abs=2e-4), kd


from public_projet_data_engineering_tarification_electrique_spark.operators.timeseries import (
    lttb_downsample,
)


def _lttb_model(rows, nb=32):
    """rows: (key, t_sec, v_cents, eid). Parallel centroid-anchored
    LTTB with the identical area law and tie-breaks."""
    byk = {}
    for k, t, v, e in rows:
        byk.setdefault(k, []).append((t, v, e))
    out = {}
    for k, pts in byk.items():
        pts.sort()
        n = len(pts)
        if n <= nb:
            # identity pass-through: each point owns its own bucket
            out[k] = {
                ((i - 1) * nb) // n: (t, v)
                for i, (t, v, _e) in enumerate(pts, start=1)
            }
            continue
        buckets = {}
        for i, (t, v, e) in enumerate(pts, start=1):
            b = ((i - 1) * nb) // n
            buckets.setdefault(b, []).append((i, t, v))
        stats = {
            b: (
                len(ps),
                sum(t for _, t, _ in ps),
                sum(v for _, _, v in ps),
            )
            for b, ps in buckets.items()
        }
        sel = {}
        for b, ps in buckets.items():
            if (b - 1) not in stats or (b + 1) not in stats:
                continue
            n1, t1, v1 = stats[b - 1]
            n2, t2, v2 = stats[b + 1]
            best = None
            for i, t, v in ps:
                area = abs(
                    (float(t) * float(n1) - float(t1))
                    * (float(v2) * float(n1) - float(v1) * float(n2))
                    - (float(v) * float(n1) - float(v1))
                    * (float(t2) * float(n1) - float(t1) * float(n2))
                )
                if best is None or area > best[0] or (
                    area == best[0] and i < best[1]
                ):
                    best = (area, i, t, v)
            sel[b] = (best[2], best[3])
        first = pts[0]
        last = pts[-1]
        sel[0] = (first[0], first[1])
        lb = ((n - 1) * nb) // n
        if lb != 0:
            sel[lb] = (last[0], last[1])
        out[k] = sel
    return out


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=0, max_value=10**6),
            st.integers(min_value=-10**4, max_value=10**4),
        ),
        min_size=1,
        max_size=120,
    )
)
def test_lttb_matches_python_model(spark, rows):
    base = 1_700_000_000
    data = [
        (i, (base + t) * 1_000_000, k, v / 100.0)
        for i, (k, t, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id long, us long, event_type string, value double"
    ).select(
        "event_id",
        F.timestamp_micros(F.col("us")).cast("timestamp_ntz").alias("ts"),
        "event_type",
        "value",
    ).repartition(5)
    got = {
        (r["event_type"], r["bucket"]): (r["t_sec"], r["v_cents"])
        for r in lttb_downsample(df, n_buckets=32).collect()
    }
    exp_raw = _lttb_model(
        [(k, base + t, v, i) for i, (k, t, v) in enumerate(rows)]
    )
    exp = {
        (k, b): tv for k, sel in exp_raw.items() for b, tv in sel.items()
    }
    assert got == exp


from public_projet_data_engineering_tarification_electrique_spark.operators.forecast import (
    conformal_interval,
)


def test_conformal_interval_known_cases(spark):
    """Deterministic cases: a perfectly linear series calibrates to a
    0.0 halfwidth; a too-short series reports NULL (k > m); the order
    statistic picks the ceil((m+1)(1-alpha))-th smallest residual."""
    rows = []
    # series A: y = 2x -> every one-step-ahead residual is 0
    for x in range(2000, 2010):
        rows.append(("A", x, 2.0 * x))
    # series B: linear then one +5.0 outlier year, then linear again
    for i, x in enumerate(range(2000, 2010)):
        y = 10.0 + 1.0 * i + (5.0 if x == 2006 else 0.0)
        rows.append(("B", x, y))
    # series C: only 3 points -> m = 1 fold, k = ceil(2*0.8) = 2 > 1
    for x in (2000, 2001, 2002):
        rows.append(("C", x, float(x)))
    df = spark.createDataFrame(rows, "g string, x int, y double")
    got = {
        r["g"]: (r["n_folds"], r["q_halfwidth"])
        for r in conformal_interval(
            df, ("g",), "x", "y", alpha=0.2
        ).collect()
    }
    assert got["A"] == (8, 0.0)
    assert got["C"][0] == 1 and got["C"][1] is None
    # B: 8 folds; k = ceil(9*0.8) = 8 -> the LARGEST residual, which is
    # the outlier year's miss (5.0-ish)
    nb, qb = got["B"]
    assert nb == 8
    assert qb is not None and qb > 3.0
