"""Semantic tests for the hypothesis-testing family (stats.py) —
independent recomputation in plain Python over collected sf0.001
rows, plus the scale-shape plan guards.  The cross-engine value gate
is tests/test_catalog_oracle.py; these tests check the STATISTICS are
the right numbers, not merely engine-consistent."""

from __future__ import annotations

import math

from wire_spark.catalog import load_registry
from wire_spark.engine import load_table

REG = load_registry()


def _run(spark, sf_dir, name):
    return REG[name].fn(spark, sf_dir).collect()


def test_ab_arms_partition_events(spark, sf_dir):
    row = _run(spark, sf_dir, "events_ab_ztest")[0]
    total = load_table(spark, sf_dir, "events").count()
    assert row.n_control + row.n_treatment == total
    assert 0 <= row.conv_control <= row.n_control
    assert 0 <= row.conv_treatment <= row.n_treatment
    # z's sign must agree with the rate difference direction
    if row.rate_control != row.rate_treatment:
        assert (row.z_1e4 > 0) == (row.rate_control > row.rate_treatment)


def test_mannwhitney_matches_direct_midranks(spark, sf_dir):
    """Recompute U from scratch: pool both groups, assign tie
    midranks by explicit counting, and compare the doubled rank-sum
    identity — the engine must reproduce the textbook statistic
    exactly, not just match its own oracle."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).collect()
    g1 = sorted(r.o_totalprice for r in orders
                if r.o_orderpriority == "1-URGENT")
    g2 = sorted(r.o_totalprice for r in orders
                if r.o_orderpriority == "5-LOW")
    pooled = sorted(g1 + g2)
    # doubled midrank of value v: 2*(count strictly below) + ties + 1
    from collections import Counter

    cnt = Counter(pooled)
    below = {}
    run = 0
    for v in sorted(cnt):
        below[v] = run
        run += cnt[v]
    r1x2 = sum(2 * below[v] + cnt[v] + 1 for v in g1)
    ux2 = r1x2 - len(g1) * (len(g1) + 1)
    row = _run(spark, sf_dir, "orders_mannwhitney_u")[0]
    assert row.n_urgent == len(g1) and row.n_low == len(g2)
    assert row.u_x2 == ux2
    # effect size: prob_superiority = U / (n1*n2), 4dp floor
    want = math.floor(ux2 / (2.0 * len(g1) * len(g2)) * 10000.0) / 10000.0
    assert row.prob_superiority == want


def test_welch_t_matches_direct_moments(spark, sf_dir):
    """Replay the truncated-moment formula in Python (exact integer
    moments, then the same IEEE op tree) — equality, not tolerance."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value"
    ).collect()
    groups = {"click": [], "view": []}
    for r in ev:
        if r.event_type in groups and r.value is not None:
            groups[r.event_type].append(r.value)
    stats = {}
    for k, vs in groups.items():
        n = len(vs)
        s = sum(math.floor(v * 10000.0) for v in vs)
        q = sum(math.floor(v * v * 100.0) for v in vs)
        m = s / 10000.0 / n
        x = q / 100.0 / n
        var = (x - m * m) * n / (n - 1.0)
        stats[k] = (n, m, var)
    n1, m1, v1 = stats["click"]
    n2, m2, v2 = stats["view"]
    t = (m1 - m2) / math.sqrt(v1 / n1 + v2 / n2)
    row = _run(spark, sf_dir, "events_welch_ttest")[0]
    assert (row.n_click, row.n_view) == (n1, n2)
    assert row.t_1e4 == math.floor(t * 10000.0)
    assert row.mean_click == math.floor(m1 * 10000.0) / 10000.0


def test_chi2_matches_direct_contingency(spark, sf_dir):
    from collections import Counter
    import hashlib

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id"
    ).collect()

    def cohort(uid):
        return int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16) % 4

    cells = Counter((r.event_type, cohort(r.user_id)) for r in ev)
    rt = Counter()
    ct = Counter()
    for (t, c), o in cells.items():
        rt[t] += o
        ct[c] += o
    n = sum(cells.values())
    chi6 = sum(
        math.floor((o * n - rt[t] * ct[c]) ** 2 / (rt[t] * ct[c] * n) * 1e6)
        for (t, c), o in cells.items()
    )
    row = _run(spark, sf_dir, "events_chi2_independence")[0]
    assert row.n_cells == len(cells)
    assert row.dof == (len(rt) - 1) * (len(ct) - 1)
    assert row.chi2_1e6 == chi6


def test_dp_counts_noise_bounded_and_raw_count_absent(spark, sf_dir):
    rows = _run(spark, sf_dir, "governance_dp_counts")
    true = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type").count()
        .withColumnRenamed("count", "n").collect()
    }
    # Laplace(b=2) from u in [5e-7, 1-5e-7]: |noise| <= 2*ln(1e6) < 28
    for r in rows:
        assert abs(r.noisy_1e4 / 10000.0 - true[r.event_type]) < 28.0
        assert r.eps_1e2 == 50
    # the release must not carry the raw count column
    cols = REG["governance_dp_counts"].fn(spark, sf_dir).columns
    assert "n" not in cols and len(rows) == len(true)


def test_naive_bayes_confusion_covers_holdout(spark, sf_dir):
    rows = _run(spark, sf_dir, "quality_naive_bayes_confusion")
    langs = {"de", "en", "es", "fr", "zh"}
    assert {r.lang_true for r in rows} <= langs
    assert {r.lang_pred for r in rows} <= langs
    # every holdout doc gets exactly one prediction
    import hashlib

    docs = load_table(spark, sf_dir, "documents").select("doc_id").collect()
    holdout = sum(
        1 for r in docs
        if int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:15], 16)
        % 100 >= 80
    )
    assert sum(r.n_docs for r in rows) == holdout
    # the majority class's diagonal must be the single largest cell
    # (the classifier recovers the dominant language even on the
    # word-salad synthetic corpus where lang signal is weak)
    top = max(rows, key=lambda r: r.n_docs)
    assert top.lang_true == top.lang_pred == "en"


def test_mannwhitney_no_global_histogram_window(spark, sf_dir):
    """The rank prefix must run through _hist_prefix's two-pass form:
    at most the one bucket-grain SinglePartition exchange, with the
    value-grain window partitioned by bucket — a histogram-wide
    one-task window is the 100 TB killer (quality_gini_stump guard)."""
    from wire_spark.plans import formatted_plan

    df = REG["orders_mannwhitney_u"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert plan.count("Exchange SinglePartition") <= 2  # offsets + final 1-row agg
    assert "windowspecdefinition(_bkt" in plan


def _md5_60(s):
    import hashlib

    return int(hashlib.md5(str(s).encode()).hexdigest()[:15], 16)


def test_srm_matches_direct_user_counts(spark, sf_dir):
    users = [r.user_id for r in load_table(spark, sf_dir, "events")
             .select("user_id").distinct().collect()]
    n1 = sum(1 for u in users if _md5_60(u) % 2 == 0)
    n2 = len(users) - n1
    row = _run(spark, sf_dir, "events_srm_check")[0]
    assert (row.nu_control, row.nu_treatment) == (n1, n2)
    assert row.srm_chi2_1e6 == (n1 - n2) ** 2 * 1000000 // (n1 + n2)
    assert row.srm_flag == (1 if row.srm_chi2_1e6 > 3841459 else 0)


def test_ks_matches_direct_ecdf(spark, sf_dir):
    """Exact integer ECDF distance recomputed from raw values —
    the statistic itself, not just engine agreement."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).collect()
    g1 = [r.o_totalprice for r in orders if r.o_orderpriority == "1-URGENT"]
    g2 = [r.o_totalprice for r in orders if r.o_orderpriority == "5-LOW"]
    n1, n2 = len(g1), len(g2)
    values = sorted(set(g1 + g2))
    from bisect import bisect_right

    s1, s2 = sorted(g1), sorted(g2)
    dnum = max(
        abs(bisect_right(s1, v) * n2 - bisect_right(s2, v) * n1)
        for v in values
    )
    row = _run(spark, sf_dir, "orders_ks_test")[0]
    assert (row.n_urgent, row.n_low) == (n1, n2)
    assert row.d_num == dnum
    assert row.d_1e6 == dnum * 1000000 // (n1 * n2)


def test_cuped_matches_direct_moments(spark, sf_dir):
    """Replay CUPED end-to-end in Python: per-user integer covariate
    and metric, pooled moments, theta, adjusted lift — exact."""
    import datetime as dt

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "value"
    ).collect()
    boundary = dt.datetime(2024, 1, 8)
    per = {}
    for r in ev:
        a = per.setdefault(r.user_id, [0, 0])
        if r.event_type == "view" and r.ts < boundary:
            a[0] += 1
        if r.event_type == "purchase" and r.ts >= boundary:
            a[1] += math.floor(r.value * 10000.0)
    n = len(per)
    xs = [v[0] for v in per.values()]
    ys = [v[1] for v in per.values()]
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    covn = float(n) * float(sxy) - float(sx) * float(sy)
    varxn = float(n) * float(sxx) - float(sx) * float(sx)
    theta4 = covn / varxn if varxn > 0 else 0.0
    arm = {u: _md5_60(u) % 2 for u in per}
    n1 = sum(1 for u in per if arm[u] == 0)
    n2 = n - n1
    sy1 = sum(per[u][1] for u in per if arm[u] == 0)
    sy2 = sum(per[u][1] for u in per if arm[u] == 1)
    sx1 = sum(per[u][0] for u in per if arm[u] == 0)
    sx2 = sum(per[u][0] for u in per if arm[u] == 1)
    row = _run(spark, sf_dir, "events_ab_cuped")[0]
    assert (row.n_users, row.n_control, row.n_treatment) == (n, n1, n2)
    assert row.theta_1e4 == math.floor(theta4)
    assert row.diff_raw_1e4 == math.floor(sy1 / n1 - sy2 / n2)
    assert row.diff_cuped_1e4 == math.floor(
        sy1 / n1 - sy2 / n2 - theta4 * (sx1 / n1 - sx2 / n2)
    )


def test_permutation_test_matches_direct_reassignment(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type"
    ).collect()
    per = {}
    for r in ev:
        a = per.setdefault(r.user_id, [0, 0])
        a[0] += 1
        if r.event_type == "purchase":
            a[1] += 1

    def stat(assign):
        e = [0, 0]
        c = [0, 0]
        for u, (ne, nc) in per.items():
            i = assign(u)
            e[i] += ne
            c[i] += nc
        if e[0] > 0 and e[1] > 0:
            return abs(c[0] / e[0] - c[1] / e[1])
        return 0.0

    obs = stat(lambda u: _md5_60(u) % 2)
    extreme = sum(
        1 for b in range(1, 33)
        if stat(lambda u, b=b: _md5_60(f"{u}#{b}") % 2) >= obs
    )
    row = _run(spark, sf_dir, "events_permutation_test")[0]
    assert row.n_perms == 32
    assert row.n_extreme == extreme
    assert row.p_1e4 == (1 + extreme) * 10000 // 33
    assert row.stat_obs_1e6 == math.floor(obs * 1000000.0)


def test_ks_single_scan_cached_histogram(spark, sf_dir):
    """The group-total branch must read the CACHED histogram, not
    re-derive the orders scan: exactly one FileScan in the final
    plan (the silent-second-scan regression guard)."""
    df = REG["orders_ks_test"].fn(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 1
    assert "InMemoryTableScan" in final


def test_srm_sequential_matches_direct_cumulation(spark, sf_dir):
    """Replay the first-seen-day cumulation, integer chi-squared,
    and the integer OBF-shaped boundary at every look."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts").collect()
    first = {}
    for r in ev:
        d = r.ts.strftime("%Y-%m-%d")
        if r.user_id not in first or d < first[r.user_id]:
            first[r.user_id] = d
    per_day = {}
    for u, d in first.items():
        a = per_day.setdefault(d, [0, 0])
        a[_md5_60(u) % 2] += 1
    days = sorted(per_day)
    K = len(days)
    rows = {r.day: r for r in _run(spark, sf_dir, "events_srm_sequential")}
    assert set(rows) == set(days)
    nc = nt = 0
    for i, d in enumerate(days, 1):
        nc += per_day[d][0]
        nt += per_day[d][1]
        r = rows[d]
        chi = (nc - nt) ** 2 * 1000000 // (nc + nt)
        bound = 3841459 * K // i
        assert (r.look, r.nu_control_cum, r.nu_treatment_cum) == (i, nc, nt)
        assert (r.srm_chi2_1e6, r.bound_1e6) == (chi, bound)
        assert r.flag == (1 if chi > bound else 0)
    # the boundary must be monotone non-increasing to the nominal
    # critical value at the final look
    bs = [rows[d].bound_1e6 for d in days]
    assert bs == sorted(bs, reverse=True) and bs[-1] == 3841459


def test_benford_audit_replay(spark, sf_dir):
    """Replay digit counts, exact expectations, and the 128-bit
    chi-squared contributions; the nine rounded Benford constants
    must partition n exactly."""
    import math
    rows = {r.digit: r for r in _run(spark, sf_dir, "orders_benford_audit")}
    od = load_table(spark, sf_dir, "orders").select("o_totalprice").collect()
    cnt = {}
    for r in od:
        d = int(str(int(math.floor(r.o_totalprice)))[0])
        cnt[d] = cnt.get(d, 0) + 1
    n = sum(cnt.values())
    P = {1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
         6: 66947, 7: 57992, 8: 51153, 9: 45757}
    assert set(rows) == set(range(1, 10))
    assert sum(r.expected_1e6 for r in rows.values()) == n * 1000000
    for d in range(1, 10):
        r, o, e = rows[d], cnt.get(d, 0), n * P[d]
        assert (r.n_obs, r.expected_1e6) == (o, e)
        assert r.chi2_contrib_1e6 == (o * 1000000 - e) ** 2 // max(e, 1)
