"""Hypothesis-testing / experimentation family (round 9, wave 3).

The engine had drift monitors, bootstrap CIs and calibration audits but
no classical inference surface — the tests an experimentation platform
runs on every metric before a ship decision.  This module adds the four
canonical ones (two-proportion z, Welch's t, Mann-Whitney U,
chi-squared independence), a differentially-private release of grouped
counts, and a naive-Bayes holdout confusion matrix (the textbook
generative classifier the quality_logreg/gini_stump discriminative
loop lacked).

Reference anchor: tarungka/wire declares aggregation/analytics intent
only (ROADMAP.md:96-107; internal/pipeline/pipeline.go:93-159 executes
generic transforms) — this family is the training-data-pipeline
extension the brief asks for beyond the reference surface.

Cross-engine exactness follows the NOTES.md parity rules:

- Integer counts cross engines raw; every float statistic is built
  from the SAME IEEE op sequence on integer-derived doubles in both
  engines (cast-to-double of identical integers is deterministic,
  each +,*,/,sqrt,ln is a single correctly-rounded IEEE op), then
  floor-truncated into fixed-point BIGINT (1e4 for z/t scores after
  the NOTES ln()-at-4dp rule, 1e6 for chi-squared addends that are
  summed afterwards — per-addend floors make the sum order-free).
- Products that outgrow int64 by ~sf3000 (rank sums, chi-squared
  cell numerators) widen to DECIMAL(38,0) in Spark mirrored by
  HUGEINT in DuckDB (the model_auc_rank / supplier_return_pchart
  discipline), and every output column is cast to BIGINT or DOUBLE.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wire_spark.catalog import register
from wire_spark.queries._util import T, md5_long
from wire_spark.queries.features import _hist_prefix

# --------------------------------------------------------------------
# two-proportion z-test: deterministic A/B arms over events
# --------------------------------------------------------------------

_AB_ORACLE = """
WITH e AS (
  SELECT CAST(CONCAT('0x', SUBSTRING(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) % 2 = 1 AS treat,
         event_type = 'purchase' AS conv
  FROM events
), s AS (
  SELECT CAST(count(*) FILTER (WHERE NOT treat) AS BIGINT) AS n_control,
         CAST(count(*) FILTER (WHERE treat) AS BIGINT) AS n_treatment,
         CAST(count(*) FILTER (WHERE NOT treat AND conv) AS BIGINT)
           AS conv_control,
         CAST(count(*) FILTER (WHERE treat AND conv) AS BIGINT)
           AS conv_treatment
  FROM e
), p AS (
  SELECT *,
         CAST(conv_control AS DOUBLE) / CAST(n_control AS DOUBLE) AS p1,
         CAST(conv_treatment AS DOUBLE) / CAST(n_treatment AS DOUBLE) AS p2,
         CAST(conv_control + conv_treatment AS DOUBLE)
           / CAST(n_control + n_treatment AS DOUBLE) AS pp
  FROM s
)
SELECT n_control, n_treatment, conv_control, conv_treatment,
       floor(p1 * 10000.0e0) / 10000.0e0 AS rate_control,
       floor(p2 * 10000.0e0) / 10000.0e0 AS rate_treatment,
       CAST(CASE WHEN pp > 0.0e0 AND pp < 1.0e0 THEN
         floor((p1 - p2) / sqrt(pp * (1.0e0 - pp)
               * (1.0e0 / CAST(n_control AS DOUBLE)
                  + 1.0e0 / CAST(n_treatment AS DOUBLE))) * 10000.0e0)
       ELSE 0 END AS BIGINT) AS z_1e4
FROM p
"""


@register("events_ab_ztest", oracle=_AB_ORACLE,
          doc="two-proportion z-test between deterministic hash-"
              "assigned A/B arms on the purchase-conversion rate — "
              "the ship/no-ship primitive of an experimentation "
              "platform, one scan, fixed-point z")
def events_ab_ztest(spark, sf_dir):
    """Deterministic A/B readout: arm = md5(user_id) parity (a row's
    arm never changes as the corpus grows — the split_group_aware
    stability property), success = the event is a purchase, then the
    pooled two-proportion z in closed form.

    Exactness: the four counts are integers; p1/p2/pooled-p are the
    identical cast-divide in both engines, the z expression is the
    same IEEE op tree, and the result is floor-truncated to 1e-4
    (NOTES ln/sqrt 4dp rule).  Degenerate pools (every event converts
    or none do) would divide by zero — ANSI mode errors, non-ANSI
    NULL-bands — so both sides gate on 0 < pp < 1 and report z = 0,
    agreeing exactly on degenerate input.

    Scale shape: one scan, map-side partial aggregation into a single
    global row — no shuffle wider than the 4-counter partials; the
    per-user md5 is JVM codegen.  At 100 TB this is the cheapest
    query in the family.
    """
    e = T(spark, sf_dir, "events").select(
        (md5_long(F.col("user_id").cast("string")) % 2 == 1).alias("treat"),
        (F.col("event_type") == "purchase").alias("conv"),
    )
    s = e.agg(
        F.count(F.when(~F.col("treat"), 1)).alias("n_control"),
        F.count(F.when(F.col("treat"), 1)).alias("n_treatment"),
        F.count(F.when(~F.col("treat") & F.col("conv"), 1)).alias("conv_control"),
        F.count(F.when(F.col("treat") & F.col("conv"), 1)).alias("conv_treatment"),
    )
    p = s.select(
        "*",
        F.expr("CAST(conv_control AS DOUBLE) / CAST(n_control AS DOUBLE)")
        .alias("p1"),
        F.expr("CAST(conv_treatment AS DOUBLE) / CAST(n_treatment AS DOUBLE)")
        .alias("p2"),
        F.expr("CAST(conv_control + conv_treatment AS DOUBLE)"
               " / CAST(n_control + n_treatment AS DOUBLE)").alias("pp"),
    )
    return p.select(
        "n_control", "n_treatment", "conv_control", "conv_treatment",
        F.expr("floor(p1 * 10000.0e0) / 10000.0e0").alias("rate_control"),
        F.expr("floor(p2 * 10000.0e0) / 10000.0e0").alias("rate_treatment"),
        F.expr(
            "CAST(CASE WHEN pp > 0.0e0 AND pp < 1.0e0 THEN "
            "floor((p1 - p2) / sqrt(pp * (1.0e0 - pp) "
            "* (1.0e0 / CAST(n_control AS DOUBLE) "
            "+ 1.0e0 / CAST(n_treatment AS DOUBLE))) * 10000.0e0) "
            "ELSE 0 END AS BIGINT)"
        ).alias("z_1e4"),
    )


# --------------------------------------------------------------------
# Welch's t-test: unequal-variance mean comparison from integer moments
# --------------------------------------------------------------------

_WELCH_ORACLE = """
WITH e AS (
  SELECT event_type = 'click' AS g1, value AS v FROM events
  WHERE event_type IN ('click', 'view') AND value IS NOT NULL
), m AS (
  SELECT CAST(count(*) FILTER (WHERE g1) AS BIGINT) AS n1,
         CAST(count(*) FILTER (WHERE NOT g1) AS BIGINT) AS n2,
         CAST(sum(CAST(floor(v * 10000.0e0) AS BIGINT))
              FILTER (WHERE g1) AS BIGINT) AS s1,
         CAST(sum(CAST(floor(v * 10000.0e0) AS BIGINT))
              FILTER (WHERE NOT g1) AS BIGINT) AS s2,
         CAST(sum(CAST(floor(v * v * 100.0e0) AS HUGEINT))
              FILTER (WHERE g1) AS HUGEINT) AS q1,
         CAST(sum(CAST(floor(v * v * 100.0e0) AS HUGEINT))
              FILTER (WHERE NOT g1) AS HUGEINT) AS q2
  FROM e
), d AS (
  SELECT n1, n2,
         CAST(s1 AS DOUBLE) / 10000.0e0 / CAST(n1 AS DOUBLE) AS m1,
         CAST(s2 AS DOUBLE) / 10000.0e0 / CAST(n2 AS DOUBLE) AS m2,
         CAST(q1 AS DOUBLE) / 100.0e0 / CAST(n1 AS DOUBLE) AS x1,
         CAST(q2 AS DOUBLE) / 100.0e0 / CAST(n2 AS DOUBLE) AS x2
  FROM m
), v AS (
  SELECT n1, n2, m1, m2,
         (x1 - m1 * m1) * CAST(n1 AS DOUBLE) / (CAST(n1 AS DOUBLE) - 1.0e0)
           AS v1,
         (x2 - m2 * m2) * CAST(n2 AS DOUBLE) / (CAST(n2 AS DOUBLE) - 1.0e0)
           AS v2
  FROM d
)
SELECT n1 AS n_click, n2 AS n_view,
       floor(m1 * 10000.0e0) / 10000.0e0 AS mean_click,
       floor(m2 * 10000.0e0) / 10000.0e0 AS mean_view,
       CAST(CASE WHEN v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE)
                      > 0.0e0 THEN
         floor((m1 - m2) / sqrt(v1 / CAST(n1 AS DOUBLE)
               + v2 / CAST(n2 AS DOUBLE)) * 10000.0e0)
       ELSE 0 END AS BIGINT) AS t_1e4
FROM v
"""


@register("events_welch_ttest", oracle=_WELCH_ORACLE,
          doc="Welch's unequal-variance t on event value between "
              "click and view — means/variances from order-free "
              "integer moment sums, one scan")
def events_welch_ttest(spark, sf_dir):
    """Welch's t between the 'click' and 'view' value distributions,
    with both group moments taken in ONE scan as order-independent
    integer sums: each row contributes floor(v*1e4) (first moment,
    1e-4 resolution) and floor(v*v*1e2) (second moment) — identical
    integers in both engines, summed exactly in any order.  Mean,
    sample variance ((E[x^2] - m^2) * n/(n-1) on the truncated
    moments) and the t statistic then replay the same IEEE op tree on
    both sides, floored to 1e-4.

    The second-moment summand is ~2.4e9 per row (value <= 490), so
    the sum outgrows int64 around sf3000 — it accumulates in
    DECIMAL(38,0)/HUGEINT per the model_auc_rank discipline.

    Scale shape: single scan, map-side combine into one row; no
    shuffle beyond the six-counter partials.  A zero pooled standard
    error (both groups constant) reports t = 0 on both sides rather
    than dividing by zero.
    """
    e = T(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view") & F.col("value").isNotNull()
    ).select((F.col("event_type") == "click").alias("g1"), F.col("value").alias("v"))
    m = e.agg(
        F.count(F.when(F.col("g1"), 1)).alias("n1"),
        F.count(F.when(~F.col("g1"), 1)).alias("n2"),
        F.sum(F.when(F.col("g1"),
                     F.expr("CAST(floor(v * 10000.0e0) AS BIGINT)"))).alias("s1"),
        F.sum(F.when(~F.col("g1"),
                     F.expr("CAST(floor(v * 10000.0e0) AS BIGINT)"))).alias("s2"),
        F.sum(F.when(F.col("g1"),
                     F.expr("CAST(floor(v * v * 100.0e0) AS DECIMAL(38,0))")))
        .alias("q1"),
        F.sum(F.when(~F.col("g1"),
                     F.expr("CAST(floor(v * v * 100.0e0) AS DECIMAL(38,0))")))
        .alias("q2"),
    )
    d = m.select(
        "n1", "n2",
        F.expr("CAST(s1 AS DOUBLE) / 10000.0e0 / CAST(n1 AS DOUBLE)").alias("m1"),
        F.expr("CAST(s2 AS DOUBLE) / 10000.0e0 / CAST(n2 AS DOUBLE)").alias("m2"),
        F.expr("CAST(q1 AS DOUBLE) / 100.0e0 / CAST(n1 AS DOUBLE)").alias("x1"),
        F.expr("CAST(q2 AS DOUBLE) / 100.0e0 / CAST(n2 AS DOUBLE)").alias("x2"),
    )
    v = d.select(
        "n1", "n2", "m1", "m2",
        F.expr("(x1 - m1 * m1) * CAST(n1 AS DOUBLE)"
               " / (CAST(n1 AS DOUBLE) - 1.0e0)").alias("v1"),
        F.expr("(x2 - m2 * m2) * CAST(n2 AS DOUBLE)"
               " / (CAST(n2 AS DOUBLE) - 1.0e0)").alias("v2"),
    )
    return v.select(
        F.col("n1").alias("n_click"), F.col("n2").alias("n_view"),
        F.expr("floor(m1 * 10000.0e0) / 10000.0e0").alias("mean_click"),
        F.expr("floor(m2 * 10000.0e0) / 10000.0e0").alias("mean_view"),
        F.expr(
            "CAST(CASE WHEN v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE)"
            " > 0.0e0 THEN "
            "floor((m1 - m2) / sqrt(v1 / CAST(n1 AS DOUBLE)"
            " + v2 / CAST(n2 AS DOUBLE)) * 10000.0e0) ELSE 0 END AS BIGINT)"
        ).alias("t_1e4"),
    )


# --------------------------------------------------------------------
# Mann-Whitney U: rank test on a continuous column, distributed ranks
# --------------------------------------------------------------------

_MWU_ORACLE = """
WITH f AS (
  SELECT o_totalprice AS v, o_orderpriority = '1-URGENT' AS g1
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
), h AS (
  SELECT v, CAST(count(*) FILTER (WHERE g1) AS BIGINT) AS c1,
         CAST(count(*) AS BIGINT) AS call
  FROM f GROUP BY v
), p AS (
  SELECT v, c1, call,
         CAST(COALESCE(sum(call) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS below
  FROM h
), s AS (
  SELECT CAST(sum(CAST(c1 AS HUGEINT) * (2 * below + call + 1))
              AS HUGEINT) AS r1x2,
         CAST(sum(c1) AS BIGINT) AS n1,
         CAST(sum(call) AS BIGINT) AS nall
  FROM p
), u AS (
  SELECT n1, nall - n1 AS n2, nall,
         r1x2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS ux2
  FROM s
)
SELECT n1 AS n_urgent, n2 AS n_low, CAST(ux2 AS BIGINT) AS u_x2,
       floor(CAST(ux2 AS DOUBLE)
             / (2.0e0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
             * 10000.0e0) / 10000.0e0 AS prob_superiority,
       CAST(floor((CAST(ux2 AS DOUBLE)
                   - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
            / (2.0e0 * sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
               * (CAST(nall AS DOUBLE) + 1.0e0) / 12.0e0))
            * 10000.0e0) AS BIGINT) AS z_1e4
FROM u
"""


@register("orders_mannwhitney_u", oracle=_MWU_ORACLE, bench=True,
          doc="Mann-Whitney U between URGENT and LOW order prices — "
              "tie-midrank-exact rank sums from a value-grain "
              "histogram with distributed two-pass prefix counts, "
              "no row-grain sort")
def orders_mannwhitney_u(spark, sf_dir):
    """Two-sample rank test (does URGENT price stochastically
    dominate LOW?) without ever sorting rows: ranks come from the
    VALUE-grain histogram.  For each distinct price, the doubled tie
    midrank is ``2*below + count_at_value + 1`` (doubling keeps
    half-integer midranks in BIGINT), the group-1 rank sum is
    ``sum(c1 * midrank2)``, and ``U1 = R1 - n1(n1+1)/2`` follows in
    x2 units.  ``prob_superiority`` is U/(n1*n2) — the same
    Mann-Whitney/AUC identity model_auc_rank exploits at score grain,
    here as a hypothesis test with the normal-approximation z (plain
    sigma, no tie correction: prices are near-unique; the doubled-U
    arithmetic stays exact regardless).

    Exactness: every rank quantity is an integer (rank sums widen to
    DECIMAL(38,0)/HUGEINT — R1 can reach ~2*n1*N, past int64 by
    ~sf3000); the z/effect-size doubles replay one IEEE op tree and
    floor at 1e-4.

    Scale shape: histogram groupBy(value) bounds everything at
    distinct-value grain; the strictly-below cumulative count runs
    through ``_hist_prefix``'s two-pass bucketed form, so no task
    ever holds the whole histogram (the quality_gini_stump guard) —
    the plan has no row-grain sort, window or collect.
    """
    f = T(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).select(
        F.col("o_totalprice").alias("v"),
        (F.col("o_orderpriority") == "1-URGENT").alias("g1"),
    )
    h = f.groupBy("v").agg(
        F.count(F.when(F.col("g1"), 1)).alias("c1"),
        F.count(F.lit(1)).alias("call"),
    )
    p = _hist_prefix(h, "v", {"below": "call"}, inclusive=False)
    s = p.agg(
        F.sum(F.expr("CAST(c1 AS DECIMAL(38,0)) * (2 * below + call + 1)"))
        .alias("r1x2"),
        F.sum("c1").alias("n1"),
        F.sum("call").alias("nall"),
    )
    u = s.select(
        "n1", F.expr("nall - n1").alias("n2"), F.col("nall"),
        F.expr("r1x2 - CAST(n1 AS DECIMAL(38,0)) * (n1 + 1)").alias("ux2"),
    )
    return u.select(
        F.col("n1").alias("n_urgent"), F.col("n2").alias("n_low"),
        F.expr("CAST(ux2 AS BIGINT)").alias("u_x2"),
        F.expr("floor(CAST(ux2 AS DOUBLE)"
               " / (2.0e0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))"
               " * 10000.0e0) / 10000.0e0").alias("prob_superiority"),
        F.expr(
            "CAST(floor((CAST(ux2 AS DOUBLE)"
            " - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))"
            " / (2.0e0 * sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)"
            " * (CAST(nall AS DOUBLE) + 1.0e0) / 12.0e0))"
            " * 10000.0e0) AS BIGINT)"
        ).alias("z_1e4"),
    )


# --------------------------------------------------------------------
# chi-squared independence: event_type x user-cohort contingency
# --------------------------------------------------------------------

_CHI2_ORACLE = """
WITH e AS (
  SELECT event_type,
         CAST(CONCAT('0x', SUBSTRING(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) % 4 AS cohort
  FROM events
), cells AS (
  SELECT event_type, cohort, CAST(count(*) AS BIGINT) AS o
  FROM e GROUP BY 1, 2
), rt AS (
  SELECT event_type, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1
), ct AS (
  SELECT cohort, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1
), nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
a AS (
  SELECT CAST(floor(
           CAST((CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
                * (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
                AS DOUBLE)
           / CAST(CAST(r AS HUGEINT) * c * n AS DOUBLE)
           * 1000000.0e0) AS BIGINT) AS add6
  FROM cells JOIN rt USING (event_type) JOIN ct USING (cohort)
  CROSS JOIN nn
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM cells) AS n_cells,
       (SELECT CAST((count(DISTINCT event_type) - 1)
                    * (count(DISTINCT cohort) - 1) AS BIGINT) FROM e) AS dof,
       CAST(sum(add6) AS BIGINT) AS chi2_1e6
FROM a
"""


@register("events_chi2_independence", oracle=_CHI2_ORACLE,
          doc="chi-squared independence of event_type vs hash-cohort "
              "on the contingency table — per-cell fixed-point "
              "addends, 128-bit-exact numerators")
def events_chi2_independence(spark, sf_dir):
    """Pearson chi-squared of event_type x user cohort (cohort =
    md5(user_id) % 4 — for a sound hash split the expected answer is
    'independent', making this the A/A sanity check an
    experimentation platform runs before trusting its assignment).

    Each cell's addend (O-E)^2/E is computed as
    ``(o*N - r*c)^2 / (r*c*N)`` so numerator and denominator stay
    integers: o*N reaches ~4.5e18 by sf3000 and its square ~2e37, so
    the products run in DECIMAL(38,0)/HUGEINT (128-bit class) before
    one deterministic cast to DOUBLE, a single division, and a 1e6
    fixed-point floor; the addend sum is then order-free.

    Scale shape: contingency cells are bounded (types x cohorts = 20
    rows) — one scan with map-side combine, margins derived from the
    CELL relation (never a second scan), broadcast margin joins.
    """
    e = T(spark, sf_dir, "events").select(
        "event_type",
        (md5_long(F.col("user_id").cast("string")) % 4).alias("cohort"),
    )
    cells = e.groupBy("event_type", "cohort").agg(
        F.count(F.lit(1)).alias("o")
    )
    from wire_spark.queries._util import tracked_cache

    cells = tracked_cache(cells)
    rt = cells.groupBy("event_type").agg(F.sum("o").alias("r"))
    ct = cells.groupBy("cohort").agg(F.sum("o").alias("c"))
    nn = cells.agg(F.sum("o").alias("n"))
    dims = cells.agg(
        F.count(F.lit(1)).alias("n_cells"),
        ((F.countDistinct("event_type") - 1)
         * (F.countDistinct("cohort") - 1)).alias("dof"),
    )
    a = (
        cells.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "cohort")
        .crossJoin(F.broadcast(nn))
        .select(
            F.expr(
                "CAST(floor("
                "CAST((CAST(o AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * c)"
                " * (CAST(o AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * c)"
                " AS DOUBLE)"
                " / CAST(CAST(r AS DECIMAL(38,0)) * c * n AS DOUBLE)"
                " * 1000000.0e0) AS BIGINT)"
            ).alias("add6")
        )
    )
    chi = a.agg(F.sum("add6").alias("chi2_1e6"))
    return dims.crossJoin(F.broadcast(chi)).select(
        "n_cells", F.col("dof").cast("long").alias("dof"),
        F.col("chi2_1e6").cast("long").alias("chi2_1e6"),
    )


# --------------------------------------------------------------------
# differentially-private count release (deterministic Laplace)
# --------------------------------------------------------------------

_DP_ORACLE = """
WITH c AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1
), u AS (
  SELECT event_type, n,
         CAST(CONCAT('0x', SUBSTRING(md5(CONCAT(event_type, '|dp-r9')), 1, 15))
              AS BIGINT) % 1000000 AS m
  FROM c
), l AS (
  SELECT event_type, n,
         ABS(2 * m + 1 - 1000000) AS d,
         CASE WHEN 2 * m + 1 >= 1000000 THEN 1 ELSE -1 END AS sg
  FROM u
)
SELECT event_type,
       CAST(n * 10000 + CAST(floor(CAST(-sg AS DOUBLE) * 2.0e0
            * ln(1.0e0 - CAST(d AS DOUBLE) / 1000000.0e0)
            * 10000.0e0) AS BIGINT) AS BIGINT) AS noisy_1e4,
       CAST(50 AS BIGINT) AS eps_1e2
FROM l
ORDER BY event_type
"""


@register("governance_dp_counts", oracle=_DP_ORACLE,
          doc="epsilon-differentially-private release of per-type "
              "event counts via inverse-CDF Laplace noise from a "
              "keyed hash — deterministic, so oracle-checkable")
def governance_dp_counts(spark, sf_dir):
    """DP count release (Laplace mechanism, eps = 0.5, L1 sensitivity
    1 for add/remove-one-event neighbors): noise = -b*sign(u-1/2)*
    ln(1-2|u-1/2|) with b = 1/eps = 2, where u comes from a keyed
    md5 instead of an RNG.  A deterministic noise seed is what makes
    the release AUDITABLE (the oracle replays it bit-for-bit) and is
    standard practice when a DP release must be reproducible across
    reruns — the privacy argument then rests on the key's secrecy,
    which this demo trades away for testability (docstring contract,
    same spirit as the stubbed multimodal codec).

    Exactness: u is the exact rational (2m+1)/2e6 from a 60-bit md5
    (the half-offset keeps u strictly inside (0,1), so the ln
    argument is >= 1e-6 — never a log-of-zero); engines share the
    integer m, the IEEE divide/ln/multiply tree, and a 1e-4 floor
    folded into integer units of the count.

    Scale shape: groupBy(event_type) with map-side combine; noise is
    per-GROUP arithmetic on the tiny aggregate relation.  The true
    count never appears in the output — only the noised fixed-point
    value and the epsilon it was released under.
    """
    c = T(spark, sf_dir, "events").groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    u = c.select(
        "event_type", "n",
        (md5_long(F.concat(F.col("event_type"), F.lit("|dp-r9"))) % 1000000)
        .alias("m"),
    )
    l = u.select(
        "event_type", "n",
        F.abs(2 * F.col("m") + 1 - 1000000).alias("d"),
        F.when(2 * F.col("m") + 1 >= 1000000, 1).otherwise(-1).alias("sg"),
    )
    return l.select(
        "event_type",
        F.expr(
            "CAST(n * 10000 + CAST(floor(CAST(-sg AS DOUBLE) * 2.0e0"
            " * ln(1.0e0 - CAST(d AS DOUBLE) / 1000000.0e0)"
            " * 10000.0e0) AS BIGINT) AS BIGINT)"
        ).alias("noisy_1e4"),
        F.lit(50).cast("long").alias("eps_1e2"),
    ).orderBy("event_type")


# --------------------------------------------------------------------
# naive Bayes: holdout confusion matrix of the generative classifier
# --------------------------------------------------------------------

_NB_ORACLE = """
WITH d AS (
  SELECT doc_id, lang, text,
         CAST(CONCAT('0x', SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) % 100 < 80 AS is_train
  FROM documents
), tok AS (
  SELECT doc_id, lang, is_train,
         unnest(string_split(lower(text), ' ')) AS t
  FROM d
), tok2 AS (SELECT * FROM tok WHERE t != ''),
tc AS (
  SELECT lang, t, CAST(count(*) AS BIGINT) AS c
  FROM tok2 WHERE is_train GROUP BY 1, 2
), tot AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS tl
  FROM tok2 WHERE is_train GROUP BY 1
), voc AS (SELECT DISTINCT t FROM tok2 WHERE is_train),
vs AS (SELECT CAST(count(*) AS BIGINT) AS v FROM voc),
tr AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM d WHERE is_train),
prior AS (
  SELECT lang,
         CAST(floor(ln(CAST(count(*) AS DOUBLE) / CAST(tr.nd AS DOUBLE))
              * 10000.0e0) AS BIGINT) AS pr4
  FROM d CROSS JOIN tr WHERE is_train GROUP BY lang, tr.nd
),
grid AS (
  SELECT voc.t, tot.lang,
         CAST(floor(ln(CAST(COALESCE(tc.c, 0) + 1 AS DOUBLE)
              / CAST(tot.tl + vs.v AS DOUBLE)) * 10000.0e0) AS BIGINT) AS lp4
  FROM voc CROSS JOIN tot CROSS JOIN vs
  LEFT JOIN tc ON tc.t = voc.t AND tc.lang = tot.lang
),
toksum AS (
  SELECT tok2.doc_id, grid.lang AS lang_hyp,
         CAST(sum(grid.lp4) AS BIGINT) AS s4
  FROM tok2 JOIN grid ON tok2.t = grid.t
  WHERE NOT tok2.is_train
  GROUP BY 1, 2
),
cand AS (
  SELECT e.doc_id, e.lang AS lang_true, p.lang AS lang_hyp,
         p.pr4 + COALESCE(ts.s4, 0) AS total4
  FROM d e CROSS JOIN prior p
  LEFT JOIN toksum ts ON ts.doc_id = e.doc_id AND ts.lang_hyp = p.lang
  WHERE NOT e.is_train
),
pred AS (
  SELECT lang_true, lang_hyp,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY total4 DESC, lang_hyp ASC) AS rn
  FROM cand
)
SELECT lang_true, lang_hyp AS lang_pred, CAST(count(*) AS BIGINT) AS n_docs
FROM pred WHERE rn = 1
GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("quality_naive_bayes_confusion", oracle=_NB_ORACLE, bench=True,
          doc="multinomial naive-Bayes lang classifier trained on the "
              "80% hash split, holdout confusion matrix — integer "
              "fixed-point log-probabilities, deterministic argmax")
def quality_naive_bayes_confusion(spark, sf_dir):
    """The generative counterpart to the quality_logreg/gini_stump
    discriminative loop: train multinomial naive Bayes (Laplace +1)
    on the stable 80% md5(doc_id) split, classify the 20% holdout,
    and emit the lang x predicted-lang confusion matrix.

    Exactness: a per-(token, class) log-likelihood
    ``floor(ln((c+1)/(tot_class+V)) * 1e4)`` is the identical BIGINT
    in both engines (same integer ratio, one IEEE divide + ln, 4dp
    floor per the NOTES ln rule); per-document scores are integer
    SUMS of those — order-free — plus the same fixed-point prior, and
    the argmax breaks ties by lang ascending, so predictions can
    never flip on summation order.  Holdout documents whose every
    token is out-of-vocabulary fall back to the prior alone (the
    LEFT join + coalesce path).

    Scale shape: the model is (vocab x 5 classes) — token-grain,
    sublinear by Heaps' law; AQE broadcasts it into the scoring join
    while it fits and degrades to a token-keyed shuffle beyond.
    Scoring is explode -> join -> groupBy(doc, class); the argmax
    window partitions BY DOCUMENT (5 rows per partition), so no task
    ever sees more than one document's candidates.
    """
    d = T(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text",
        (md5_long(F.col("doc_id").cast("string")) % 100 < 80).alias("is_train"),
    )
    tok2 = d.select(
        "doc_id", "lang", "is_train",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("t"),
    ).filter(F.col("t") != "")
    train_tok = tok2.filter(F.col("is_train"))
    tc = train_tok.groupBy("lang", "t").agg(F.count(F.lit(1)).alias("c"))
    tot = train_tok.groupBy("lang").agg(F.count(F.lit(1)).alias("tl"))
    voc = train_tok.select("t").distinct()
    vs = voc.agg(F.count(F.lit(1)).alias("v"))
    tr = d.filter(F.col("is_train")).agg(F.count(F.lit(1)).alias("nd"))
    prior = (
        d.filter(F.col("is_train"))
        .groupBy("lang").agg(F.count(F.lit(1)).alias("dl"))
        .crossJoin(F.broadcast(tr))
        .select(
            "lang",
            F.expr("CAST(floor(ln(CAST(dl AS DOUBLE) / CAST(nd AS DOUBLE))"
                   " * 10000.0e0) AS BIGINT)").alias("pr4"),
        )
    )
    grid = (
        voc.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(vs))
        .join(tc, ["t", "lang"], "left")
        .select(
            "t", "lang",
            F.expr("CAST(floor(ln(CAST(COALESCE(c, 0) + 1 AS DOUBLE)"
                   " / CAST(tl + v AS DOUBLE)) * 10000.0e0) AS BIGINT)")
            .alias("lp4"),
        )
    )
    toksum = (
        tok2.filter(~F.col("is_train"))
        .join(grid.withColumnRenamed("lang", "lang_hyp"), "t")
        .groupBy("doc_id", "lang_hyp")
        .agg(F.sum("lp4").alias("s4"))
    )
    cand = (
        d.filter(~F.col("is_train"))
        .select("doc_id", F.col("lang").alias("lang_true"))
        .crossJoin(F.broadcast(prior.withColumnRenamed("lang", "lang_hyp")))
        .join(toksum, ["doc_id", "lang_hyp"], "left")
        .select(
            "doc_id", "lang_true", "lang_hyp",
            (F.col("pr4") + F.coalesce(F.col("s4"), F.lit(0))).alias("total4"),
        )
    )
    from pyspark.sql import Window as W

    pred = cand.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("doc_id")
            .orderBy(F.col("total4").desc(), F.col("lang_hyp").asc())
        ),
    ).filter(F.col("rn") == 1)
    return (
        pred.groupBy("lang_true", F.col("lang_hyp").alias("lang_pred"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang_true", "lang_pred")
    )
