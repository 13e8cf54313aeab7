"""Group-mass overflow regression pins (r12 ``maxmass`` sweep).

Every value here individually passes the per-row SANITIZE budget
(|v| <= 1e12) — the class under test is what happens when admitted
values ACCUMULATE: int64 fixed-point sums overflow (Spark ANSI errors,
DuckDB silently widens to HUGEINT), DOUBLE sums of 4dp-floored addends
round order-dependently past 2^53, and Spark's floor(DOUBLE) -> LONG
SATURATES SILENTLY at int64 max, poisoning second moments without any
error.
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F


def test_spark_floor_saturates_silently(spark):
    """The engine fact behind the moment tier: floor(DOUBLE) returns
    LONG and clamps at int64 max with NO ANSI error — so a per-row
    fixed-point square of an admitted 1e12-scale value is silently
    wrong, not loudly failed.  If a Spark upgrade ever changes this
    to an error or a DOUBLE result, the moment tier can be revisited.
    """
    row = spark.range(1).select(
        F.expr("floor(CAST(1.0e26 AS DOUBLE))").alias("x")
    ).collect()[0]
    assert row.x == 9223372036854775807


def test_msum_exact_at_mass_beyond_double(spark):
    """msum must stay exact when the 4dp integer mass exceeds 2^53
    (where a DOUBLE-accumulating oracle starts rounding): 2000 rows of
    1e12 carry mass 2e19 in 4dp units."""
    from wire_spark.queries._util import msum

    df = spark.range(2000).select(F.lit(1.0e12).alias("v"))
    got = df.agg(msum(F.col("v")).alias("s")).collect()[0].s
    assert got == 2000 * 1.0e12
    # the HUGEINT oracle mirror agrees exactly
    con = duckdb.connect()
    oracle = con.execute(
        "SELECT sum(CAST(floor(v * 10000.0) AS HUGEINT)) / 10000.0 "
        "FROM (SELECT 1.0e12 AS v FROM range(2000))"
    ).fetchone()[0]
    assert got == oracle


def test_moment_tier_gates_value_domain(spark, sf_dir, tmp_path):
    """events_moment NULL-bands |v| > 1e8 (and non-finite values) on
    the Spark side, and the oracle CTE does the same — so quadratic
    moments never see a value whose fixed-point square saturates."""
    from wire_spark.engine import load_table
    from wire_spark.queries._util import EVENTS_MOMENT_CTE, events_moment

    ev = load_table(spark, sf_dir, "events").limit(6)
    hostile = ev.select(
        "event_id", "user_id", "event_type", "ts", "props",
        F.when(F.col("event_id") % 6 == 0, F.lit(1.0e12))
        .when(F.col("event_id") % 6 == 1, F.lit(-1.0e9))
        .when(F.col("event_id") % 6 == 2, F.lit(float("nan")))
        .when(F.col("event_id") % 6 == 3, F.lit(float("inf")))
        .when(F.col("event_id") % 6 == 4, F.lit(9.9e7))
        .otherwise(F.lit(-42.5)).alias("value"),
    )
    out = str(tmp_path / "events.parquet")
    hostile.coalesce(1).write.mode("overwrite").parquet(out)
    kept = sorted(
        r.value
        for r in events_moment(spark, str(tmp_path)).collect()
        if r.value is not None
    )
    assert kept == [-42.5, 9.9e7]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{out}/*.parquet')"
    )
    oracle_kept = sorted(
        v[0]
        for v in con.execute(
            EVENTS_MOMENT_CTE + " SELECT value FROM events"
        ).fetchall()
        if v[0] is not None
    )
    assert oracle_kept == kept


def test_welch_second_moment_not_saturated(spark, sf_dir, tmp_path):
    """End-to-end pin for the maxmass welch finding: with values at
    the old SANITIZE edge, the t statistic must come from the gated
    domain (budget values excluded identically by both engines), not
    from silently saturated Spark moments vs exact DuckDB ones."""
    from wire_spark.catalog import load_registry
    from wire_spark.engine import load_table
    from wire_spark.oracle import compare_query

    tables = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]
    for t in tables:
        df = load_table(spark, sf_dir, t)
        if t == "events":
            df = df.withColumn(
                "value",
                F.when(F.col("event_id") % 3 == 0, F.lit(1.0e12))
                .when(F.col("event_id") % 7 == 0, F.lit(-1.0e12))
                .otherwise(F.col("value")),
            )
        df.coalesce(1).write.mode("overwrite").parquet(
            f"{tmp_path}/{t}.parquet"
        )
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet/*.parquet')"
        )
    reg = load_registry()
    for name in ("events_welch_ttest", "events_anova_f",
                 "events_linear_trend", "events_type_stats"):
        q = reg[name]
        res = compare_query(spark, con, name, q.fn, q.oracle, str(tmp_path))
        assert res.ok, str(res)
