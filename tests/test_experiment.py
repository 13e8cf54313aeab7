"""Semantic tests for the experimentation-decision family
(queries/experiment.py) — independent recomputation in plain Python
over collected sf0.001 rows.  The cross-engine value gate is
tests/test_catalog_oracle.py; these check the STATISTICS are the
right numbers, not merely engine-consistent."""

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


def test_anova_matches_direct_moments(spark, sf_dir):
    """Replay the whole-unit-scaled sums of squares and F exactly."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value").collect()
    groups = {}
    for r in ev:
        v4 = math.floor(r.value * 10000.0)
        g = groups.setdefault(r.event_type, [0, 0, 0])
        g[0] += 1
        g[1] += v4
        g[2] += v4 * v4
    k = len(groups)
    n = sum(g[0] for g in groups.values())
    s_all = sum(g[1] for g in groups.values())
    a = sum((g[1] * g[1]) // (g[0] * 100000000) for g in groups.values())
    t = (s_all * s_all) // (n * 100000000)
    ssq = sum(g[2] for g in groups.values()) // 100000000
    ssb, ssw = max(a - t, 0), max(ssq - a, 0)
    row = _run(spark, sf_dir, "events_anova_f")[0]
    assert (row.k_groups, row.n_total) == (k, n)
    assert (row.ssb_units, row.ssw_units) == (ssb, ssw)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert row.f_1e4 == math.floor(f * 10000.0)


def test_fdr_bh_matches_direct_stepup(spark, sf_dir):
    """Recompute all 5 permutation p-values and the BH step-up."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type").collect()
    per = {}
    users = set()
    for r in ev:
        users.add(r.user_id)
        per[(r.user_id, r.event_type)] = per.get(
            (r.user_id, r.event_type), 0) + 1
    types = sorted({t for _, t in per})

    def arm(u, b):
        return (_md5_60(u) if b == 0 else _md5_60(f"{u}#{b}")) % 2

    def stat(m, b):
        n = [0, 0]
        for u in users:
            n[arm(u, b)] += 1
        s = [0, 0]
        for (u, t), c in per.items():
            if t == m:
                s[arm(u, b)] += c
        if n[0] > 0 and n[1] > 0:
            return abs(s[0] / n[0] - s[1] / n[1])
        return 0.0

    ps = {}
    for m in types:
        obs = stat(m, 0)
        extreme = sum(1 for b in range(1, 33) if stat(m, b) >= obs)
        ps[m] = (1 + extreme) * 10000 // 33
    ranked = sorted(types, key=lambda m: (ps[m], m))
    mcount = len(types)
    kstar = 0
    for i, m in enumerate(ranked, 1):
        if ps[m] * mcount <= i * 500:
            kstar = i
    rows = {r.event_type: r for r in _run(spark, sf_dir, "events_fdr_bh")}
    assert set(rows) == set(types)
    for i, m in enumerate(ranked, 1):
        assert rows[m].p_1e4 == ps[m]
        assert rows[m].bh_rank == i
        assert rows[m].reject == (1 if i <= kstar else 0)


def test_power_mde_matches_direct_formula(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type").collect()
    n = [0, 0]
    c = [0, 0]
    for r in ev:
        i = _md5_60(r.user_id) % 2
        n[i] += 1
        if r.event_type == "purchase":
            c[i] += 1
    p1, p2 = c[0] / n[0], c[1] / n[1]
    zz = 1.959964 + 0.841621
    mde = zz * math.sqrt(p1 * (1 - p1) / n[0] + p2 * (1 - p2) / n[1])
    row = _run(spark, sf_dir, "events_ab_power_mde")[0]
    assert (row.n_control, row.n_treatment) == (n[0], n[1])
    assert row.mde_1e6 == math.floor(mde * 1000000.0)
    if p1 == p2:
        # zero observed effect -> the sentinel, not a formula value
        assert (row.n_required_per_arm, row.powered) == (-1, 0)
    else:
        nreq = math.ceil(zz * zz * (p1 * (1 - p1) + p2 * (1 - p2))
                         / ((p1 - p2) * (p1 - p2)))
        if nreq <= 1e15:
            assert row.n_required_per_arm == nreq
            assert row.powered == (1 if min(n) >= nreq else 0)
        else:
            assert (row.n_required_per_arm, row.powered) == (-1, 0)


def test_group_sequential_matches_direct_cumulation(spark, sf_dir):
    """Replay every daily look: cumulative counters, z, boundary."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts").collect()
    per_day = {}
    for r in ev:
        d = r.ts.strftime("%Y-%m-%d")
        a = per_day.setdefault(d, [0, 0, 0, 0])
        i = _md5_60(r.user_id) % 2
        a[i] += 1
        if r.event_type == "purchase":
            a[2 + i] += 1
    days = sorted(per_day)
    K = len(days)
    rows = {r.day: r for r in _run(spark, sf_dir, "events_group_sequential")}
    assert set(rows) == set(days)
    cum = [0, 0, 0, 0]
    crossed_any = False
    for i, d in enumerate(days, 1):
        for j in range(4):
            cum[j] += per_day[d][j]
        nc, nt, cc, ct = cum
        r = rows[d]
        assert (r.look, r.nc_cum, r.nt_cum, r.cc_cum, r.ct_cum) == (
            i, nc, nt, cc, ct)
        pool = (cc + ct) / (nc + nt)
        if nc > 0 and nt > 0 and 0 < cc + ct < nc + nt:
            z = (cc / nc - ct / nt) / math.sqrt(
                pool * (1 - pool) * (1 / nc + 1 / nt))
        else:
            z = 0.0
        bound = 1.959964 * math.sqrt(K / i)
        assert r.z_1e4 == math.floor(z * 10000.0)
        assert r.bound_1e4 == math.floor(bound * 10000.0)
        assert r.crossed == (1 if abs(z) > bound else 0)
        crossed_any = crossed_any or r.crossed == 1
    # boundary must be monotone decreasing toward the final look
    bounds = [rows[d].bound_1e4 for d in days]
    assert bounds == sorted(bounds, reverse=True)
    assert bounds[-1] == 19599  # final look at the fixed-horizon z


def test_qte_matches_direct_quantiles(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value").collect()
    spend = {}
    for r in ev:
        if r.event_type == "purchase":
            spend[r.user_id] = spend.get(r.user_id, 0) + math.floor(
                r.value * 10000.0)
    arms = {0: [], 1: []}
    for u, v in spend.items():
        arms[_md5_60(u) % 2].append(v)
    for a in arms.values():
        a.sort()
    rows = {r.decile: r for r in _run(
        spark, sf_dir, "events_quantile_treatment_effect")}
    assert set(rows) == set(range(1, 10))
    for q in range(1, 10):
        vc = arms[0][(q * len(arms[0]) + 9) // 10 - 1]
        vt = arms[1][(q * len(arms[1]) + 9) // 10 - 1]
        r = rows[q]
        assert (r.v_control, r.v_treatment, r.qte_v4) == (vc, vt, vt - vc)


def test_did_matches_direct_cells(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "value").collect()
    boundary = dt.datetime(2024, 1, 16)
    cells = {}
    for r in ev:
        if r.event_type != "purchase":
            continue
        key = (_md5_60(r.user_id) % 2, r.ts >= boundary)
        a = cells.setdefault(key, [0, 0])
        a[0] += 1
        a[1] += math.floor(r.value * 10000.0)
    row = _run(spark, sf_dir, "events_did_lift")[0]
    n_c_pre, s_c_pre = cells.get((0, False), [0, 0])
    n_c_post, s_c_post = cells.get((0, True), [0, 0])
    n_t_pre, s_t_pre = cells.get((1, False), [0, 0])
    n_t_post, s_t_post = cells.get((1, True), [0, 0])
    assert (row.n_c_pre, row.n_c_post, row.n_t_pre, row.n_t_post) == (
        n_c_pre, n_c_post, n_t_pre, n_t_post)
    assert row.mean_t_post_v4 == s_t_post // max(n_t_post, 1)
    assert row.degenerate == 0  # sf0.001 must populate all four cells
    did = (s_t_post / n_t_post - s_t_pre / n_t_pre) - (
        s_c_post / n_c_post - s_c_pre / n_c_pre)
    assert row.did_v4 == math.floor(did)


def test_qte_uses_hist_prefix_not_global_window(spark, sf_dir):
    """The per-arm cumulative counts must run through the two-pass
    bucketed form: the only SinglePartition exchanges allowed are the
    bucket-offset pass and final tiny aggregations, and the
    within-bucket window must be keyed by (_bkt)."""
    df = REG["events_quantile_treatment_effect"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(treat" in plan and "_bkt" in plan


def test_fdr_single_scan_and_user_grain_explode(spark, sf_dir):
    """Plan assertions that actually falsify the scale claims: the
    final plan reads events exactly ONCE (the user list derives from
    the cached user x metric relation, not a second scan), and every
    explode (Generate) sits ABOVE an aggregate — i.e. on a grouped
    user-grain relation, never on the raw event scan."""
    df = REG["events_fdr_bh"].fn(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 1
    # the one scan feeds the cached user x metric relation (AQE may
    # fold reuses, so require presence, not a count)
    assert "InMemoryTableScan" in final
    n_types = load_table(spark, sf_dir, "events") \
        .select("event_type").distinct().count()
    assert len(_run(spark, sf_dir, "events_fdr_bh")) == n_types


def test_ipw_ate_matches_direct_standardization(spark, sf_dir):
    """Replay the whole IPW readout: user-grain counters, power-of-two
    activity strata, within-stratum propensities, positivity trimming,
    and the direct-standardization identity ATE = sum(N_s * d_s) / N
    (truncated toward zero), plus the naive row — arbitrary-precision
    Python ints, so this is the DECIMAL(38,0)/HUGEINT arithmetic
    exactly."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type").collect()
    users = {}
    for r in ev:
        if r.user_id is None:
            continue
        u = users.setdefault(r.user_id, [0, 0, 0, 0])  # n, clicks, views, y
        u[0] += 1
        if r.event_type == "click":
            u[1] += 1
        elif r.event_type == "view":
            u[2] += 1
        elif r.event_type == "purchase":
            u[3] += 1

    def band(n):
        for i, hi in enumerate((2, 4, 8, 16, 32, 64, 128, 256)):
            if n < hi:
                return f"b{i}"
        return "b8"

    strata = {}
    for n, c, v, y in users.values():
        s = strata.setdefault(band(n), [0, 0, 0, 0])  # N, T, sy1, sy0
        treated = c > v
        s[0] += 1
        s[1] += 1 if treated else 0
        s[2 if treated else 3] += y

    def trunc_div(a, b):
        q = abs(a) // abs(b)
        return -q if (a < 0) != (b < 0) else q

    want = {}
    for name, (N, T, sy1, sy0) in strata.items():
        p = T * 10 ** 6 // N
        y1 = sy1 * 10 ** 6 // T if T else None
        y0 = sy0 * 10 ** 6 // (N - T) if N - T else None
        d = y1 - y0 if (y1 is not None and y0 is not None) else None
        want[name] = (N, T, p, y1, y0, d)
    NU = sum(s[0] for s in strata.values())
    NT = sum(s[1] for s in strata.values())
    S1 = sum(s[2] for s in strata.values())
    S0 = sum(s[3] for s in strata.values())
    want["ALL_NAIVE"] = (
        NU, NT, NT * 10 ** 6 // NU,
        S1 * 10 ** 6 // NT, S0 * 10 ** 6 // (NU - NT),
        S1 * 10 ** 6 // NT - S0 * 10 ** 6 // (NU - NT))
    ok = {k: v for k, v in strata.items() if 0 < v[1] < v[0]}
    num = sum(v[0] * (want[k][5]) for k, v in ok.items())
    den = sum(v[0] for v in ok.values())
    want["ALL_IPW"] = (
        den, sum(v[1] for v in ok.values()), None, None, None,
        trunc_div(num, den) if den else None)

    rows = _run(spark, sf_dir, "experiment_ipw_ate")
    assert len(rows) == len(want)
    for r in rows:
        assert want[r.stratum] == (
            r.n_users, r.n_treated, r.propensity_1e6,
            r.y_treated_1e6, r.y_control_1e6, r.ate_1e6), r.stratum
    # the adjusted estimate must differ from the naive one whenever
    # propensities vary across strata (the correction is real)
    by = {r.stratum: r for r in rows}
    props = {r.propensity_1e6 for r in rows
             if r.stratum.startswith("b") and 0 < r.n_treated < r.n_users}
    if len(props) > 1:
        assert by["ALL_IPW"].ate_1e6 != by["ALL_NAIVE"].ate_1e6
