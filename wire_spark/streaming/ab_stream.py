"""Streaming experimentation monitor: per-window two-proportion
z-test — the streaming sibling of the batch ``events_ab_ztest``
(queries/stats.py), completing batch/stream parity for the
hypothesis-testing family the same way windowed_calibration_bins
mirrors model_calibration_bins.

Why it exists: a nightly A/B readout catches yesterday's regression.
Run the SAME fixed-point z over watermarked event-time windows on the
ingest path and a broken arm (conversion collapse after a bad deploy
to one variant) raises within one window of landing — the live
guardrail-metric shape every experimentation platform ships.

Shape: ONE windowed aggregation (four conditional counters per
window), then closed-form per-row arithmetic on the window-grain
aggregate.  State is live-windows x 1 row — bounded by the watermark
horizon, never stream length.  Append mode emits only closed windows,
so every row is final and bit-comparable against the batch query on
the same slice (identical integer counters, identical IEEE op tree,
identical 1e-4 floor; degenerate pools report z = 0 on both paths).

Reference behavioral anchor: stateful window transforms on the ingest
path (tarungka/wire ROADMAP.md:100, SURVEY §2.6); the test surface
itself is a training-data/experimentation extension beyond the
reference.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from wire_spark.queries._util import md5_long

_Z_EXPR = (
    "CAST(CASE WHEN n_control > 0 AND n_treatment > 0 "
    "AND pp > 0.0e0 AND pp < 1.0e0 THEN "
    "floor((p1 - p2) / sqrt(pp * (1.0e0 - pp) "
    "* (1.0e0 / CAST(n_control AS DOUBLE) "
    "+ 1.0e0 / CAST(n_treatment AS DOUBLE))) * 10000.0e0) "
    "ELSE 0 END AS BIGINT)"
)


def windowed_ab_ztest(
    stream: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    success_value: str = "purchase",
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per closed window: (w_start, w_end, n_control, n_treatment,
    conv_control, conv_treatment, z_1e4) — the guardrail z-score of
    the deterministic md5(user) arm split on the success-event rate.

    Arms are the same hash arithmetic as the batch query, so a user
    keeps one arm across batch readouts and the live monitor alike;
    windows with an empty or saturated arm (a 0/0 would be NaN, not
    an error — double division never raises) report z = 0 via the
    explicit n > 0 and 0 < pp < 1 gates rather than emitting NaN.
    """
    treat = md5_long(F.col(user_col).cast("string")) % 2 == 1
    conv = F.col(type_col) == success_value
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"))
        .agg(
            F.count(F.when(~treat, 1)).alias("n_control"),
            F.count(F.when(treat, 1)).alias("n_treatment"),
            F.count(F.when(~treat & conv, 1)).alias("conv_control"),
            F.count(F.when(treat & conv, 1)).alias("conv_treatment"),
        )
    )
    p = agg.select(
        "*",
        F.expr("CAST(conv_control AS DOUBLE) / CAST(n_control AS DOUBLE)")
        .alias("p1"),
        F.expr("CAST(conv_treatment AS DOUBLE) / CAST(n_treatment AS DOUBLE)")
        .alias("p2"),
        F.expr("CAST(conv_control + conv_treatment AS DOUBLE)"
               " / CAST(n_control + n_treatment AS DOUBLE)").alias("pp"),
    )
    return p.select(
        F.col("w.start").alias("w_start"),
        F.col("w.end").alias("w_end"),
        "n_control", "n_treatment", "conv_control", "conv_treatment",
        F.expr(_Z_EXPR).alias("z_1e4"),
    )


def windowed_srm_check(
    stream: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per closed window: (w_start, w_end, nu_control, nu_treatment,
    srm_chi2_1e6, srm_flag) — the live sample-ratio-mismatch alarm at
    the randomization-unit grain, streaming sibling of the batch
    ``events_srm_check``.

    Why windowed SRM: assignment bugs are usually DEPLOY artifacts —
    a bot filter or logging change that silently starves one arm from
    some moment on.  The cumulative batch chi-squared dilutes a
    recent break across the whole experiment; per-window counts
    localize it to the hour it started.

    Shape: the chained-windowed-aggregation pattern
    (windowed_kanonymity's) — agg-1 distincts (window, user) with the
    arm carried in the group key (it is a FUNCTION of the user, so
    this adds no cardinality); agg-2 rolls windows up to the two arm
    counters and the integer chi-squared ``(n1-n2)^2 * 1e6 //
    (n1+n2)`` against the 5% critical value 3.841459.  State is
    live-windows x distinct users — the same bound any exact
    per-window distinct carries; beyond that scale the batch query is
    the audit and a sketch (HLL) the monitor.
    """
    treat = md5_long(F.col(user_col).cast("string")) % 2 == 1
    per_user = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(ts_col, window).alias("w"),
            F.col(user_col).alias("u"),
            treat.alias("treat"),
        )
        .agg(F.count(F.lit(1)).alias("n_ev"))
    )
    counts = per_user.groupBy(
        F.window(F.window_time("w"), window).alias("w2")
    ).agg(
        F.count(F.when(~F.col("treat"), 1)).alias("nu_control"),
        F.count(F.when(F.col("treat"), 1)).alias("nu_treatment"),
    )
    return counts.select(
        F.col("w2.start").alias("w_start"),
        F.col("w2.end").alias("w_end"),
        "nu_control", "nu_treatment",
        F.expr(
            "CAST(CAST((nu_control - nu_treatment) AS DECIMAL(38,0))"
            " * (nu_control - nu_treatment) * 1000000"
            " div (nu_control + nu_treatment) AS BIGINT)"
        ).alias("srm_chi2_1e6"),
        F.expr(
            "CAST(CASE WHEN CAST((nu_control - nu_treatment) AS DECIMAL(38,0))"
            " * (nu_control - nu_treatment) * 1000000"
            " div (nu_control + nu_treatment) > 3841459"
            " THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("srm_flag"),
    )


def windowed_welch_ttest(
    stream: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per closed window: (w_start, w_end, n_control, n_treatment,
    mean_control, mean_treatment, t_1e4) — Welch's unequal-variance t
    between the arms' value distributions, the continuous-metric
    guardrail that pairs with ``windowed_ab_ztest``'s rate z (a
    latency or revenue regression moves the MEAN long before it moves
    any conversion rate).

    Same moment discipline as the batch ``events_welch_ttest``
    (queries/stats.py): each row contributes the integers
    floor(v*1e4) and floor(v*v*1e2), summed order-free per window
    (second moment in DECIMAL(38,0) — outgrows int64 around sf3000),
    then mean/variance/t replay the batch query's exact IEEE op tree
    on the window-grain aggregate.  Rows with NULL value are excluded
    (observed-values semantics, the NULL-sweep rule).  Degenerate
    windows (an empty arm, or both arms constant so the pooled SE is
    zero) report t = 0 via explicit gates rather than NaN.

    Shape: ONE watermarked windowed aggregation (six conditional
    counters), closed-form per-row arithmetic after it.  State is
    live-windows x 1 row — bounded by the watermark horizon.  Append
    mode emits only closed windows, so every row is final.
    """
    treat = md5_long(F.col(user_col).cast("string")) % 2 == 1
    agg = (
        # NULL event times would form a NULL window group that append
        # mode can never close (its end never passes the watermark) —
        # an unevictable state row per query lifetime; NULL users
        # belong to neither arm.  Observed-rows semantics on all three
        # columns, mirroring the batch family's NULL-sweep rule.
        stream.filter(
            F.col(value_col).isNotNull()
            & F.col(ts_col).isNotNull()
            & F.col(user_col).isNotNull()
        )
        .select(
            F.col(ts_col).alias("ts"),
            treat.alias("g2"),
            F.col(value_col).alias("v"),
        )
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(
            F.count(F.when(~F.col("g2"), 1)).alias("n1"),
            F.count(F.when(F.col("g2"), 1)).alias("n2"),
            F.sum(F.when(~F.col("g2"),
                         F.expr("CAST(floor(v * 10000.0e0) AS BIGINT)")))
            .alias("s1"),
            F.sum(F.when(F.col("g2"),
                         F.expr("CAST(floor(v * 10000.0e0) AS BIGINT)")))
            .alias("s2"),
            F.sum(F.when(~F.col("g2"),
                         F.expr("CAST(floor(v * v * 100.0e0)"
                                " AS DECIMAL(38,0))"))).alias("q1"),
            F.sum(F.when(F.col("g2"),
                         F.expr("CAST(floor(v * v * 100.0e0)"
                                " AS DECIMAL(38,0))"))).alias("q2"),
        )
    )
    d = agg.select(
        "*",
        F.expr("CAST(s1 AS DOUBLE) / 10000.0e0 / CAST(n1 AS DOUBLE)")
        .alias("m1"),
        F.expr("CAST(s2 AS DOUBLE) / 10000.0e0 / CAST(n2 AS DOUBLE)")
        .alias("m2"),
        F.expr("CAST(q1 AS DOUBLE) / 100.0e0 / CAST(n1 AS DOUBLE)")
        .alias("x1"),
        F.expr("CAST(q2 AS DOUBLE) / 100.0e0 / CAST(n2 AS DOUBLE)")
        .alias("x2"),
    )
    v = d.select(
        "*",
        F.expr(
            "CASE WHEN n1 > 1 THEN (x1 - m1 * m1) * CAST(n1 AS DOUBLE)"
            " / (CAST(n1 AS DOUBLE) - 1.0e0) ELSE 0.0e0 END"
        ).alias("v1"),
        F.expr(
            "CASE WHEN n2 > 1 THEN (x2 - m2 * m2) * CAST(n2 AS DOUBLE)"
            " / (CAST(n2 AS DOUBLE) - 1.0e0) ELSE 0.0e0 END"
        ).alias("v2"),
    )
    return v.select(
        F.col("w.start").alias("w_start"),
        F.col("w.end").alias("w_end"),
        F.col("n1").alias("n_control"),
        F.col("n2").alias("n_treatment"),
        F.expr(
            "CASE WHEN n1 > 0 THEN floor(m1 * 10000.0e0) / 10000.0e0"
            " ELSE 0.0e0 END"
        ).alias("mean_control"),
        F.expr(
            "CASE WHEN n2 > 0 THEN floor(m2 * 10000.0e0) / 10000.0e0"
            " ELSE 0.0e0 END"
        ).alias("mean_treatment"),
        F.expr(
            "CAST(CASE WHEN n1 > 1 AND n2 > 1 AND"
            " v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE) > 0.0e0"
            " THEN floor((m1 - m2) / sqrt(v1 / CAST(n1 AS DOUBLE)"
            " + v2 / CAST(n2 AS DOUBLE)) * 10000.0e0)"
            " ELSE 0 END AS BIGINT)"
        ).alias("t_1e4"),
    )


# --------------------------------------------------------------------
# sequential SRM monitor: cumulative daily looks with an OBF boundary
# --------------------------------------------------------------------

SRM_SEQ_SCHEMA = T.StructType(
    [
        T.StructField("experiment", T.StringType()),
        T.StructField("day", T.StringType()),
        T.StructField("look", T.LongType()),
        T.StructField("nu_control_cum", T.LongType()),
        T.StructField("nu_treatment_cum", T.LongType()),
        T.StructField("srm_chi2_1e6", T.LongType()),
        T.StructField("bound_1e6", T.LongType()),
        T.StructField("flag", T.LongType()),
    ]
)

_SRM_SEQ_STATE = "look LONG, cum_c LONG, cum_t LONG"


def _srm_seq_fold(k_planned: int):
    def fold(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        look, cum_c, cum_t = state.get if state.exists else (0, 0, 0)
        days: dict[str, list[int]] = {}
        for pdf in pdfs:
            for day, treat in zip(pdf["day"], pdf["treat"]):
                d = days.setdefault(day, [0, 0])
                d[1 if treat else 0] += 1
        out: dict[str, list] = {f.name: [] for f in SRM_SEQ_SCHEMA.fields}
        for day in sorted(days):
            dc, dt_ = days[day]
            cum_c += dc
            cum_t += dt_
            look += 1
            # Python ints are arbitrary precision, so the squared
            # difference matches the batch query's DECIMAL(38,0) exactly
            chi2 = (cum_c - cum_t) ** 2 * 1000000 // (cum_c + cum_t)
            bound = max(3841459 * k_planned // look, 3841459)
            out["experiment"].append(key[0])
            out["day"].append(day)
            out["look"].append(look)
            out["nu_control_cum"].append(cum_c)
            out["nu_treatment_cum"].append(cum_t)
            out["srm_chi2_1e6"].append(chi2)
            out["bound_1e6"].append(bound)
            out["flag"].append(1 if chi2 > bound else 0)
        state.update((look, cum_c, cum_t))
        yield pd.DataFrame(out)

    return fold


def srm_sequential_monitor(
    exposures: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    exp_col: str | None = None,
    k_planned: int = 14,
) -> DataFrame:
    """Live sequential SRM: per closed day, (experiment, day, look,
    nu_control_cum, nu_treatment_cum, srm_chi2_1e6, bound_1e6, flag)
    — the cumulative chi-squared on per-arm exposure counts against
    the O'Brien-Fleming-shaped boundary ``3841459 * k_planned div
    look``.  Streaming sibling of the batch ``events_srm_sequential``
    (queries/stats.py): the batch query is the retrospective audit
    (K = observed days); this monitor is the live form, where K is
    the PLANNED number of daily looks fixed at design time — exactly
    how group-sequential monitoring is specified in practice.  Looks
    past ``k_planned`` clamp the boundary at the final nominal value
    3841459 (1e-6 units of the 5% chi-squared critical value).

    Input contract: an EXPOSURE stream — one row per user at first
    exposure (an assignment-service feed, or an upstream watermarked
    ``dropDuplicates([user])`` query writing to this monitor's
    source; Spark disallows chaining that dedup in front of
    ``applyInPandasWithState`` in one query — two stateful
    operators).  Feeding raw events instead counts a user once per
    day-batch they appear in, overstating n; the arm SPLIT stays
    unbiased, so the monitor degrades conservative, but the batch
    query is the audit of record.

    Arm assignment is the same ``md5_long(user) % 2`` arithmetic as
    every batch experiment query — computed Spark-side (JVM codegen)
    before the stateful shuffle, so a user holds one arm across the
    whole family.

    Within one micro-batch, days fold in ascending order; a day split
    across micro-batches contributes one look per batch (the
    ses_monitor convention — streaming semantics; the batch query is
    the one-look-per-day exact form).  Use file-per-trigger or an
    upstream daily aggregation to align batches with days.

    Scale shape: state is THREE integers per experiment (look,
    cum_c, cum_t); the stateful shuffle keys on the experiment id.
    One task per experiment is the right grain for an exposure-rate
    stream (users/day, not events/day); thousands of concurrent
    experiments spread across tasks by key.

    Reference behavioral anchor: stateful transforms on the ingest
    path (tarungka/wire ROADMAP.md:100, SURVEY §2.6); the sequential
    boundary itself is a training-pipeline extension.
    """
    exp = (
        F.col(exp_col).cast("string")
        if exp_col is not None
        else F.lit("default")
    )
    # NULL ts would put a None day key into the Python fold (sorted()
    # raises on None-vs-str and kills the query); NULL user_id would
    # fold as falsy treat — i.e. silently count as CONTROL — where
    # the batch query's conditional counts skip NULL arms entirely.
    # Filter both at input: observed-exposures semantics.
    rows = exposures.filter(
        F.col(ts_col).isNotNull() & F.col(user_col).isNotNull()
    ).select(
        exp.alias("experiment"),
        F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("day"),
        (md5_long(F.col(user_col).cast("string")) % 2 == 1).alias("treat"),
    )
    return rows.groupBy("experiment").applyInPandasWithState(
        _srm_seq_fold(k_planned),
        outputStructType=SRM_SEQ_SCHEMA,
        stateStructType=_SRM_SEQ_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


from wire_spark.queries.experiment import IPW_BAND_CUTPOINTS

# (band index, exclusive upper cutpoint) — the batch query's stratum
# domain, shared so the monitor can never drift from it
_IPW_BANDS = tuple(enumerate(IPW_BAND_CUTPOINTS)) + (
    (len(IPW_BAND_CUTPOINTS), None),)


def windowed_ipw_ate(
    stream: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    treat_type: str = "click",
    control_type: str = "view",
    outcome_type: str = "purchase",
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per closed window: (w_start, w_end, n_users, n_treated,
    naive_ate_1e6, ipw_ate_1e6, n_strata_ok) — the live
    confounding-corrected treatment-effect readout, streaming sibling
    of the batch ``experiment_ipw_ate`` (queries/experiment.py).

    Why windowed IPW: the naive treated-vs-control gap drifts
    whenever the ACTIVITY MIX shifts (a bot wave, a traffic spike
    from one surface) even with no real effect change; the
    within-stratum standardized estimate is invariant to that mix by
    construction, so naive moving while IPW holds still is itself the
    diagnosis — composition drift, not effect drift.

    Shape: two chained windowed aggregations (the windowed_srm_check
    pattern) — agg-1 to (window, user) counters (n/clicks/views/
    purchases per user per window), agg-2 rolls windows up over the
    NINE fixed powers-of-two activity strata as conditional counters
    (36 integer cells per window), then the whole estimator — per-
    stratum fixed-point means, positivity trimming, the
    direct-standardization sum — is closed-form scalar arithmetic on
    that one window row, the EXACT op tree of the batch query
    (``div`` floors on non-negative dividends; the final signed
    quotient truncates toward zero identically on replay).  State is
    live-windows x users for agg-1 (watermark-bounded) and
    live-windows x 1 for agg-2; append mode emits closed windows
    only, so every row is final.
    """
    per_user = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), F.col(user_col))
        .agg(
            F.count(F.lit(1)).alias("n_u"),
            F.count(F.when(F.col(type_col) == treat_type, 1))
            .alias("clicks_u"),
            F.count(F.when(F.col(type_col) == control_type, 1))
            .alias("views_u"),
            F.count(F.when(F.col(type_col) == outcome_type, 1))
            .alias("y_u"),
        )
    )
    band = "CASE " + " ".join(
        f"WHEN n_u < {hi} THEN {i}" for i, hi in _IPW_BANDS if hi
    ) + f" ELSE {len(IPW_BAND_CUTPOINTS)} END"
    su = per_user.select(
        "w",
        F.expr(band).alias("sb"),
        (F.col("clicks_u") > F.col("views_u")).alias("treated"),
        "y_u",
    )
    cells = []
    for i, _ in _IPW_BANDS:
        cells += [
            F.count(F.when(F.col("sb") == i, 1)).alias(f"n_s{i}"),
            F.count(F.when((F.col("sb") == i) & F.col("treated"), 1))
            .alias(f"t_s{i}"),
            F.coalesce(F.sum(F.when((F.col("sb") == i) & F.col("treated"),
                                    F.col("y_u"))), F.lit(0))
            .alias(f"y1_s{i}"),
            F.coalesce(F.sum(F.when((F.col("sb") == i) & ~F.col("treated"),
                                    F.col("y_u"))), F.lit(0))
            .alias(f"y0_s{i}"),
        ]
    agg = su.groupBy("w").agg(*cells)

    def _d(i: int) -> str:
        # per-stratum effect in 1e-6 units, NULL unless positivity
        return (
            f"(CAST(CAST(y1_s{i} AS DECIMAL(38,0)) * 1000000"
            f" div nullif(t_s{i}, 0) AS BIGINT)"
            f" - CAST(CAST(y0_s{i} AS DECIMAL(38,0)) * 1000000"
            f" div nullif(n_s{i} - t_s{i}, 0) AS BIGINT))"
        )

    ok = [f"(t_s{i} >= 1 AND t_s{i} < n_s{i})" for i, _ in _IPW_BANDS]
    nu = " + ".join(f"n_s{i}" for i, _ in _IPW_BANDS)
    nt = " + ".join(f"t_s{i}" for i, _ in _IPW_BANDS)
    y1 = " + ".join(f"y1_s{i}" for i, _ in _IPW_BANDS)
    y0 = " + ".join(f"y0_s{i}" for i, _ in _IPW_BANDS)
    num = " + ".join(
        f"CASE WHEN {ok[i]} THEN CAST(n_s{i} AS DECIMAL(38,0)) * {_d(i)}"
        f" ELSE CAST(0 AS DECIMAL(38,0)) END"
        for i, _ in _IPW_BANDS
    )
    den = " + ".join(
        f"CASE WHEN {ok[i]} THEN n_s{i} ELSE 0 END" for i, _ in _IPW_BANDS
    )
    n_ok = " + ".join(
        f"CASE WHEN {ok[i]} THEN 1 ELSE 0 END" for i, _ in _IPW_BANDS
    )
    return agg.select(
        F.col("w.start").alias("w_start"),
        F.col("w.end").alias("w_end"),
        F.expr(f"CAST({nu} AS BIGINT)").alias("n_users"),
        F.expr(f"CAST({nt} AS BIGINT)").alias("n_treated"),
        F.expr(
            f"CAST(CAST({y1} AS DECIMAL(38,0)) * 1000000"
            f" div nullif({nt}, 0)"
            f" - CAST({y0} AS DECIMAL(38,0)) * 1000000"
            f" div nullif(({nu}) - ({nt}), 0) AS BIGINT)"
        ).alias("naive_ate_1e6"),
        F.expr(
            f"CAST(({num}) div nullif(CAST({den} AS DECIMAL(38,0)), 0)"
            f" AS BIGINT)"
        ).alias("ipw_ate_1e6"),
        F.expr(f"CAST({n_ok} AS BIGINT)").alias("n_strata_ok"),
    )
