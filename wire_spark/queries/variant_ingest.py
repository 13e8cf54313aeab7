"""Schemaless (VARIANT-style) JSON ingest profiling.

The reference's job payload is dynamic JSON — "types are whatever
``encoding/json`` produces" (``internal/pipeline/pipeline.go:302-340``,
``internal/models/job.go:16``): schema is inferred per value, never
declared.  SURVEY §1.2 maps that to Spark's schema-on-read path
(``from_json`` with an explicit schema, or variant inference).  Every
other registry query reads ``props`` through a DECLARED path
(``get_json_object`` with a known key); this module is the ingest-time
complement: profile a schemaless column with NO declared schema and
emit the shredding plan — which keys are stable enough to promote to
typed columns and which must stay VARIANT.

Engine notes (probed, r12):

- Spark ``from_json(props, 'map<string, variant>')`` NULL-bands
  malformed JSON and valid non-object JSON ('42', '[1,2]'), keeps
  DUPLICATE keys, and represents a JSON null as a variant VOID.
  DuckDB's ``TRY_CAST(TRY_CAST(props AS JSON) AS MAP(VARCHAR, JSON))``
  behaves identically (dup keys kept; JSON null becomes a SQL NULL
  map value) — so both sides gate hostile payloads with the same
  expression shape and no path-string construction (a key containing
  a quote breaks '$."k"' paths in DuckDB; the map route never builds
  paths).
- Type canonicalization: Spark ``schema_of_variant`` emits BIGINT for
  int64-fitting integers and DECIMAL(p,s)/DOUBLE otherwise; DuckDB
  ``json_type`` emits BIGINT/UBIGINT for integers and DOUBLE
  otherwise.  A uint64 that fits DuckDB's UBIGINT but not int64 is
  DECIMAL(20,0) on the Spark side, so the oracle demotes
  BIGINT/UBIGINT values that fail ``TRY_CAST(.. AS BIGINT)`` to the
  'num' class — after which the label sets agree on every probed
  payload (ints, decimals, exponent forms, ±1e19-scale, strings,
  bools, nulls, arrays, objects, malformed, non-object, empty
  object, duplicate keys, quote-bearing keys).

Scale shape: one column-pruned scan of ``events(event_type, props)``
feeding two aggregations — a per-type payload rollup (rows ≈ #event
types) and the exploded per-(type, key) profile (rows ≈ #types ×
#distinct keys, i.e. the payload schema size, not the data size).
Both collapse map-side via partial aggregation; the totals join is a
broadcast of the tiny rollup.  At cluster scale the projected base
could be cached to make the two aggregates share one physical scan;
at 100 TB the second scan reads the same two columns and is the
cheaper trade against caching a multi-TB projection.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import functions as F

from wire_spark.catalog import register
from wire_spark.queries._util import T

# Canonical per-value type label.  Closed set on both engines:
# null / bool / int / num / str / array / object ('other' is a
# defensive branch no probed payload reaches on either engine — if
# one engine ever produced it the driver hash would flag the row).
# Single-sourced into the batch query below AND the streaming
# monitor (streaming/variant_stream.py) — the IPW band-CASE idiom.
SPARK_LABEL = """
CASE
  WHEN t = 'VOID' THEN 'null'
  WHEN t = 'BOOLEAN' THEN 'bool'
  WHEN t = 'BIGINT' THEN 'int'
  WHEN t = 'STRING' THEN 'str'
  WHEN t = 'DOUBLE' OR t LIKE 'DECIMAL%' THEN 'num'
  WHEN t LIKE 'ARRAY%' THEN 'array'
  WHEN t LIKE 'OBJECT%' THEN 'object'
  ELSE 'other'
END
"""

# Distinct non-null type count and the promote-vs-variant decision,
# as SQL text over the aggregated count columns (n_int … n_object,
# n_null, n_key).  Shared verbatim by the batch query, its oracle
# (inlined there with p.-qualified columns), and the streaming
# monitor, so the decision logic cannot drift between forms.
N_TYPES_EXPR = (
    "(CASE WHEN n_int > 0 THEN 1 ELSE 0 END)"
    " + (CASE WHEN n_num > 0 THEN 1 ELSE 0 END)"
    " + (CASE WHEN n_str > 0 THEN 1 ELSE 0 END)"
    " + (CASE WHEN n_bool > 0 THEN 1 ELSE 0 END)"
    " + (CASE WHEN n_array > 0 THEN 1 ELSE 0 END)"
    " + (CASE WHEN n_object > 0 THEN 1 ELSE 0 END)"
    " + (CASE WHEN n_key - n_null - n_int - n_num - n_str"
    " - n_bool - n_array - n_object > 0 THEN 1 ELSE 0 END)"
)

PROMOTED_EXPR = (
    "CASE WHEN n_key = n_null THEN 'void' "
    f"WHEN {N_TYPES_EXPR} > 1 THEN 'variant' "
    "WHEN n_int > 0 THEN 'int' "
    "WHEN n_num > 0 THEN 'num' "
    "WHEN n_str > 0 THEN 'str' "
    "WHEN n_bool > 0 THEN 'bool' "
    "WHEN n_array > 0 THEN 'array' "
    "WHEN n_object > 0 THEN 'object' "
    "ELSE 'other' END"
)

_VARIANT_PROFILE_ORACLE = """
WITH base AS (
  SELECT event_type,
         TRY_CAST(TRY_CAST(props AS JSON) AS MAP(VARCHAR, JSON)) AS m
  FROM events
), totals AS (
  SELECT event_type, count(*) AS n_payloads, count(m) AS n_obj
  FROM base GROUP BY event_type
), kv AS (
  SELECT b.event_type, u.e.key AS key, u.e.value AS v
  FROM base b, unnest(map_entries(b.m)) u(e)
  WHERE b.m IS NOT NULL
), labeled AS (
  SELECT event_type, key,
    CASE
      WHEN v IS NULL THEN 'null'
      WHEN json_type(v) = 'BOOLEAN' THEN 'bool'
      WHEN json_type(v) IN ('BIGINT','UBIGINT')
           AND TRY_CAST(v::VARCHAR AS BIGINT) IS NOT NULL THEN 'int'
      WHEN json_type(v) IN ('BIGINT','UBIGINT','DOUBLE') THEN 'num'
      WHEN json_type(v) = 'VARCHAR' THEN 'str'
      WHEN json_type(v) = 'ARRAY' THEN 'array'
      WHEN json_type(v) = 'OBJECT' THEN 'object'
      ELSE 'other'
    END AS label,
    CASE WHEN json_type(v) IN ('BIGINT','UBIGINT')
         THEN TRY_CAST(v::VARCHAR AS BIGINT) END AS iv
  FROM kv
), prof AS (
  SELECT event_type, key,
    count(*) AS n_key,
    count(*) FILTER (label = 'int')    AS n_int,
    count(*) FILTER (label = 'num')    AS n_num,
    count(*) FILTER (label = 'str')    AS n_str,
    count(*) FILTER (label = 'bool')   AS n_bool,
    count(*) FILTER (label = 'null')   AS n_null,
    count(*) FILTER (label = 'array')  AS n_array,
    count(*) FILTER (label = 'object') AS n_object,
    min(iv) AS int_min,
    max(iv) AS int_max
  FROM labeled GROUP BY event_type, key
)
SELECT
  p.event_type, p.key, t.n_payloads, t.n_obj, p.n_key,
  (p.n_key * 10000) // t.n_obj AS coverage_bp,
  p.n_int, p.n_num, p.n_str, p.n_bool, p.n_null, p.n_array, p.n_object,
  CAST(__N_TYPES__ AS BIGINT) AS n_types,
  __PROMOTED__ AS promoted,
  p.int_min, p.int_max
FROM prof p JOIN totals t USING (event_type)
ORDER BY p.event_type, p.key
""".replace(
    "__N_TYPES__", _re.sub(r"\bn_(\w+)\b", r"p.n_\1", N_TYPES_EXPR)
).replace(
    "__PROMOTED__", _re.sub(r"\bn_(\w+)\b", r"p.n_\1", PROMOTED_EXPR)
)


@register(
    "variant_schema_profile",
    oracle=_VARIANT_PROFILE_ORACLE,
    bench=True,
    doc="schemaless VARIANT ingest: per-(event_type, key) type profile "
        "+ promote-vs-variant shredding plan (SURVEY §1.2)",
)
def variant_schema_profile(spark, sf_dir):
    """Profile the schemaless ``props`` column with no declared schema.

    For every (event_type, top-level key): occurrence count, coverage
    among valid object payloads (basis points, integer floor-div),
    per-canonical-type counts, the number of distinct non-null types
    observed, the promotion decision ('void' when only nulls were
    seen, the single observed type when monomorphic, 'variant' when
    polymorphic), and min/max of int-typed values (the INT-vs-BIGINT
    width evidence for a promoted column).

    Duplicate keys inside one payload count once per occurrence on
    both engines (Spark's from_json map and DuckDB's JSON→MAP cast
    both preserve duplicates), so coverage_bp can exceed 10000 on a
    hostile payload — documented occurrence-rate semantics, not a
    bug.
    """
    base = T(spark, sf_dir, "events").select(
        "event_type",
        F.expr("from_json(props, 'map<string, variant>')").alias("m"),
    )
    totals = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_payloads"),
        F.count("m").alias("n_obj"),
    )
    labeled = (
        base.filter(F.col("m").isNotNull())
        .select("event_type", F.explode("m").alias("key", "v"))
        .select(
            "event_type",
            "key",
            F.expr("schema_of_variant(v)").alias("t"),
            F.expr(
                "CASE WHEN schema_of_variant(v) = 'BIGINT' "
                "THEN try_cast(cast(v AS string) AS bigint) END"
            ).alias("iv"),
        )
        .select(
            "event_type",
            "key",
            F.expr(SPARK_LABEL).alias("label"),
            "iv",
        )
    )
    cnt = lambda lbl: F.sum(  # noqa: E731 — local aggregation shorthand
        F.when(F.col("label") == lbl, F.lit(1)).otherwise(F.lit(0))
    ).cast("bigint")
    prof = labeled.groupBy("event_type", "key").agg(
        F.count(F.lit(1)).alias("n_key"),
        cnt("int").alias("n_int"),
        cnt("num").alias("n_num"),
        cnt("str").alias("n_str"),
        cnt("bool").alias("n_bool"),
        cnt("null").alias("n_null"),
        cnt("array").alias("n_array"),
        cnt("object").alias("n_object"),
        F.min("iv").alias("int_min"),
        F.max("iv").alias("int_max"),
    )
    return (
        prof.join(totals, "event_type")
        .select(
            "event_type",
            "key",
            "n_payloads",
            "n_obj",
            "n_key",
            F.expr("n_key * 10000 div n_obj").alias("coverage_bp"),
            "n_int",
            "n_num",
            "n_str",
            "n_bool",
            "n_null",
            "n_array",
            "n_object",
            F.expr(f"CAST({N_TYPES_EXPR} AS BIGINT)").alias("n_types"),
            F.expr(PROMOTED_EXPR).alias("promoted"),
            "int_min",
            "int_max",
        )
        .orderBy("event_type", "key")
    )
