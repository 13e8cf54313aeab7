"""JSON transforms: the reference's recursive string-uppercase and
event-time extraction.

The uppercase transform is the ONLY transform the reference actually
executes in a running pipeline (internal/pipeline/pipeline.go:282-340,
applied at :169; duplicate Beam ParDo implementation
internal/transform/transform.go:192-234): every string VALUE in the
JSON tree (maps and arrays, recursively) is upper-cased; keys and
non-strings are untouched.

Two implementations, per SURVEY.md §7.2 hard-part (3):

- ``uppercase_strings`` — schema-driven recursive column rebuild for
  TYPED columns (struct/array/map/string). Pure JVM expressions
  (upper / transform / map-ops), stays in codegen: the fast path when
  schema is known.
- ``uppercase_json_string`` — for schemaless JSON string payloads
  (the reference's actual data model: ``data any``). Arbitrary-depth
  recursion over unknown structure is not expressible with built-in
  column functions, so this is an Arrow-vectorized pandas UDF
  (json.loads -> recursive upper -> json.dumps) — the documented
  slow path, batched not per-row.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _rebuild_upper(col: Column, dtype: T.DataType) -> Column:
    if isinstance(dtype, T.StringType):
        return F.upper(col)
    if isinstance(dtype, T.StructType):
        return F.struct(
            *[
                _rebuild_upper(col.getField(f.name), f.dataType).alias(f.name)
                for f in dtype.fields
            ]
        )
    if isinstance(dtype, T.ArrayType):
        return F.transform(col, lambda x: _rebuild_upper(x, dtype.elementType))
    if isinstance(dtype, T.MapType):
        # keys untouched (pipeline.go:327 upper-cases values only)
        return F.map_from_arrays(
            F.map_keys(col),
            F.transform(F.map_values(col), lambda v: _rebuild_upper(v, dtype.valueType)),
        )
    return col


def uppercase_strings(df: DataFrame, *cols: str) -> DataFrame:
    """Recursively upper-case every string value inside the given
    typed columns (all columns when none given)."""
    targets = cols or tuple(df.columns)
    schema = {f.name: f.dataType for f in df.schema.fields}
    return df.withColumns(
        {c: _rebuild_upper(F.col(c), schema[c]) for c in targets if c in schema}
    )


def _upper_tree(node):
    # mirrors toUpperCaseJSON recursion (pipeline.go:324-340):
    # strings -> upper; dict values and list elements recurse;
    # keys/numbers/bools/null untouched
    if isinstance(node, str):
        return node.upper()
    if isinstance(node, dict):
        return {k: _upper_tree(v) for k, v in node.items()}
    if isinstance(node, list):
        return [_upper_tree(v) for v in node]
    return node


@F.pandas_udf(T.StringType())
def uppercase_json_string(s: pd.Series) -> pd.Series:
    """Arrow-batched recursive uppercase over JSON strings.

    Non-JSON input passes through unchanged (the reference logs and
    forwards raw bytes on parse failure, sources/kafka.go:130-135).
    """

    def one(v):
        if v is None:
            return None
        try:
            parsed = json.loads(v)
        except (ValueError, TypeError):
            return v
        return json.dumps(_upper_tree(parsed), separators=(",", ":"))

    return s.map(one)


def parse_event_time(df: DataFrame, json_col: str = "value") -> DataFrame:
    """Extract RFC3339 ``eventTime`` from a JSON payload into a
    timestamp column (job.go:69-81; only-one-format TODO at job.go:75
    — ``to_timestamp`` accepts full ISO-8601, a strict superset).
    Parse failure -> NULL (not zero time: NULL is watermark-safe)."""
    return df.withColumn(
        "event_time",
        # try_to_timestamp: ANSI mode (Spark 4 default) makes plain
        # to_timestamp THROW on malformed input; the reference treats
        # parse failure as a soft miss (job.go:71-80)
        F.try_to_timestamp(F.get_json_object(F.col(json_col), "$.eventTime")),
    )
