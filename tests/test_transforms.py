"""Transform semantics, mirroring the reference's only executed
transform — recursive JSON string-uppercase (pipeline.go:282-340,
transform.go:192-234) — plus envelope/event-time handling."""

from __future__ import annotations

import json

from pyspark.sql import Row
from pyspark.sql import functions as F

from wire_spark.model import with_envelope
from wire_spark.transforms import (
    parse_event_time,
    uppercase_json_string,
    uppercase_strings,
)
from wire_spark.transforms.core import Map, chain


def test_uppercase_json_string_recursive(spark):
    payloads = [
        '{"name":"alice","tags":["x","y"],"nested":{"deep":["a",{"b":"c"}]},"n":3,"ok":true,"nil":null}',
        '["plain","list",1]',
        '"bare"',
        "not json at all",
        None,
    ]
    df = spark.createDataFrame([(p,) for p in payloads], ["value"])
    out = [r.u for r in df.select(uppercase_json_string("value").alias("u")).collect()]
    assert json.loads(out[0]) == {
        "name": "ALICE",          # string value uppercased
        "tags": ["X", "Y"],       # array elements
        "nested": {"deep": ["A", {"b": "C"}]},  # recursion; keys untouched
        "n": 3, "ok": True, "nil": None,        # non-strings untouched
    }
    assert json.loads(out[1]) == ["PLAIN", "LIST", 1]
    assert json.loads(out[2]) == "BARE"
    assert out[3] == "not json at all"  # non-JSON passes through (kafka.go:130-135)
    assert out[4] is None


def test_uppercase_strings_typed(spark):
    df = spark.createDataFrame(
        [Row(s="ab", arr=["c", "d"], st=Row(x="e", n=1), m={"k": "v"})]
    )
    out = uppercase_strings(df).collect()[0]
    assert out.s == "AB"
    assert out.arr == ["C", "D"]
    assert out.st.x == "E" and out.st.n == 1
    assert out.m == {"k": "V"}  # map keys untouched, values uppercased


def test_parse_event_time_rfc3339(spark):
    df = spark.createDataFrame(
        [
            ('{"eventTime":"2024-03-01T12:30:00Z"}',),
            ('{"eventTime":"garbage"}',),
            ('{"other":1}',),
        ],
        ["value"],
    )
    out = parse_event_time(df).select("event_time").collect()
    assert out[0].event_time is not None
    assert out[0].event_time.year == 2024
    assert out[1].event_time is None  # parse failure -> NULL (job.go:71-80)
    assert out[2].event_time is None


def test_envelope_and_combinators(spark):
    df = spark.createDataFrame([('{"a":1}',), ('{"b":2}',)], ["payload"])
    env = with_envelope(df, value_col="payload")
    rows = env.collect()
    assert set(env.columns) == {"job_id", "event_time", "ingest_time", "priority", "value"}
    assert all(r.priority == 0 for r in rows)  # job.go:91
    assert len({r.job_id for r in rows}) == 2  # unique ids
    # time-ordered prefix: ids sort by creation millis
    assert all("-" in r.job_id for r in rows)

    stage = chain(
        Map(lambda d: {"value": F.upper("value")}),
        lambda d: d.filter(F.col("value").contains("A")),
    )
    out = env.transform(stage)
    assert out.count() == 1
