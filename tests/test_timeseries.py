"""Semantic tests for the time-series family (queries/timeseries.py)
— independent recomputation in plain Python over collected sf0.001
rows."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

from wire_spark.catalog import load_registry
from wire_spark.engine import load_table

REG = load_registry()


def _run(spark, sf_dir, name):
    return REG[name].fn(spark, sf_dir).collect()


def _md5_60(s):
    return int(hashlib.md5(str(s).encode()).hexdigest()[:15], 16)


def _daily_counts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("ts").collect()
    per = {}
    for r in ev:
        d = r.ts.strftime("%Y-%m-%d")
        per[d] = per.get(d, 0) + 1
    return [per[d] for d in sorted(per)]


def test_acf_matches_direct_pearson(spark, sf_dir):
    y = _daily_counts(spark, sf_dir)
    rows = {r.lag: r for r in _run(spark, sf_dir, "events_acf_daily")}
    assert set(rows) == set(range(1, 8))
    for lag in range(1, 8):
        xs = y[:-lag]
        zs = y[lag:]
        n = len(xs)
        sx, sz = sum(xs), sum(zs)
        sxx = sum(v * v for v in xs)
        szz = sum(v * v for v in zs)
        sxz = sum(a * b for a, b in zip(xs, zs))
        r = rows[lag]
        assert r.n_pairs == n
        vx, vz = n * sxx - sx * sx, n * szz - sz * sz
        if vx > 0 and vz > 0:
            rr = (n * sxz - sx * sz) / math.sqrt(float(vx) * float(vz))
            assert r.r_1e6 == math.floor(rr * 1000000.0)
        else:
            assert r.r_1e6 == 0


def test_ses_matches_direct_recursion(spark, sf_dir):
    """The integer bit-shift unrolling must equal the literal
    s_t = (y_t + s_{t-1})/2 recursion in exact rational arithmetic
    (Fraction), floored to 1e-4."""
    from fractions import Fraction

    y = _daily_counts(spark, sf_dir)
    assert len(y) <= 31  # the 30-day horizon truncates nothing here
    rows = {r.look: r for r in _run(spark, sf_dir, "events_ses_forecast")}
    assert set(rows) == set(range(2, len(y) + 1))
    s = Fraction(y[0])
    for t in range(2, len(y) + 1):
        r = rows[t]
        yhat = s  # forecast for look t is s_{t-1}
        assert r.y == y[t - 1]
        assert r.yhat_1e4 == (yhat.numerator * 10000) // yhat.denominator
        assert r.abs_err_1e4 == abs(r.yhat_1e4 - y[t - 1] * 10000)
        s = (Fraction(y[t - 1]) + s) / 2


def test_ses_forecast_tracks_series(spark, sf_dir):
    """Sanity invariants that hold for ANY series: each forecast is
    a convex combination of the history (so it lies within the
    running min/max), and the first forecast equals y_1 exactly."""
    y = _daily_counts(spark, sf_dir)
    rows = {r.look: r for r in _run(spark, sf_dir, "events_ses_forecast")}
    assert rows[2].yhat_1e4 == y[0] * 10000
    for t in range(2, len(y) + 1):
        hist = y[:t - 1]
        # the 2^-30 flooring can undershoot the exact value by <1e-4
        assert min(hist) * 10000 - 1 <= rows[t].yhat_1e4
        assert rows[t].yhat_1e4 <= max(hist) * 10000


def test_cate_matches_direct_cells(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts").collect()
    boundary = dt.datetime(2024, 1, 8)
    pre = {}
    conv = {}
    for r in ev:
        pre.setdefault(r.user_id, 0)
        conv.setdefault(r.user_id, 0)
        if r.ts < boundary:
            pre[r.user_id] += 1
        if r.event_type == "purchase" and r.ts >= boundary:
            conv[r.user_id] = 1

    def seg(x):
        if x == 0:
            return "0_none"
        if x <= 2:
            return "1_low"
        if x <= 7:
            return "2_mid"
        if x <= 20:
            return "3_high"
        return "4_power"

    cells = {}
    for u in pre:
        key = (seg(pre[u]), _md5_60(u) % 2)
        a = cells.setdefault(key, [0, 0])
        a[0] += 1
        a[1] += conv[u]
    segs = sorted({s for s, _ in cells})
    rows = {r.segment: r for r in _run(spark, sf_dir,
                                       "events_cate_by_segment")}
    assert set(rows) == set(segs)
    for s in segs:
        n1, c1 = cells.get((s, 0), [0, 0])
        n2, c2 = cells.get((s, 1), [0, 0])
        r = rows[s]
        assert (r.n_control, r.n_treatment) == (n1, n2)
        assert (r.conv_control, r.conv_treatment) == (c1, c2)
        if n1 > 0 and n2 > 0:
            lift = c2 / n2 - c1 / n1
            assert r.lift_1e4 == math.floor(lift * 10000.0)
            pool = (c1 + c2) / (n1 + n2)
            if 0 < c1 + c2 < n1 + n2:
                z = lift / math.sqrt(pool * (1 - pool) * (1 / n1 + 1 / n2))
                assert r.z_1e4 == math.floor(z * 10000.0)
        else:
            assert (r.lift_1e4, r.z_1e4) == (0, 0)


def test_acf_and_ses_shuffle_only_day_grain(spark, sf_dir):
    """Both queries' only data-sized exchange is the day-grain
    aggregation; every join below it is broadcast (the day relation
    is calendar-bounded)."""
    for name in ("events_acf_daily", "events_ses_forecast"):
        df = REG[name].fn(spark, sf_dir)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert final.count("FileScan parquet") == 1, name
        assert "SortMergeJoin" not in final, name
        assert "CartesianProduct" not in final, name


def test_forecast_baselines_replay(spark, sf_dir):
    """Replay the four baseline backtests; the drift slope divides
    with TRUNCATION toward zero (what Spark div and DuckDB integer
    // both do), so the Python // (which floors) is adjusted on
    negative numerators."""
    y = _daily_counts(spark, sf_dir)
    rows = {r.method: r for r in _run(spark, sf_dir,
                                      "events_forecast_baselines")}
    errs = {"naive": [], "seasonal_naive_7": [], "drift": [],
            "expanding_mean": []}
    for t in range(1, len(y)):          # 0-based; t>=1 is ix>=2
        errs["naive"].append(abs(y[t] - y[t - 1]) * 1000000)
        if t >= 7:
            errs["seasonal_naive_7"].append(abs(y[t] - y[t - 7]) * 1000000)
        if t >= 2:
            num = (y[t - 1] - y[0]) * 1000000
            slope = -((-num) // (t - 1)) if num < 0 else num // (t - 1)
            pred = y[t - 1] * 1000000 + slope
            errs["drift"].append(abs(y[t] * 1000000 - pred))
        errs["expanding_mean"].append(
            abs(y[t] * 1000000 - sum(y[:t]) * 1000000 // t))
    assert set(rows) == set(errs)
    for m, es in errs.items():
        r = rows[m]
        assert (r.n_evals, r.mae_1e6) == (len(es), sum(es) // max(len(es), 1))
    # the drift/naive relation: both evaluate all but the warmup days
    assert rows["naive"].n_evals == len(y) - 1
    assert rows["drift"].n_evals == len(y) - 2
