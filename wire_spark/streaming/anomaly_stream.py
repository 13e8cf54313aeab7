"""Streaming anomaly scoring: the stateful form of
``events_hourly_anomaly`` (queries/events.py).

Each event type carries running integer moments (n, Σx, Σx²) over the
hourly counts observed so far; every new hourly count is z-scored
against the history BEFORE being folded in — so a traffic spike is
flagged the moment its hour closes, not in a nightly batch. The
moments are exact integers (the same arithmetic as the batch oracle
query), so streaming state and a batch recomputation agree bit-for-bit
— asserted in tests/test_streaming_extras.py.

Scale notes: state is 3 integers per event type (O(#types), trivially
bounded); the stateful shuffle is on event_type. Events cross the
Python boundary in Arrow batches and fold into per-hour counts inside
the state function (Spark disallows a streaming pre-aggregation
before ``applyInPandasWithState`` — two stateful operators); at high
volume put a watermarked hourly aggregation in an upstream query and
feed its sink to this one.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ANOMALY_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("hr", T.StringType()),
        T.StructField("c", T.LongType()),
        T.StructField("z", T.DoubleType()),      # null until history >= 2 hours
        T.StructField("n_hist", T.LongType()),   # history size when scored
    ]
)

_STATE_SCHEMA = "n LONG, sx LONG, sx2 LONG"


def _score_hours(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, sx, sx2 = state.get if state.exists else (0, 0, 0)
    counts: dict[str, int] = {}
    for pdf in pdfs:
        for hr, c in zip(pdf["hr"], pdf["c"]):
            counts[hr] = counts.get(hr, 0) + int(c)
    out = {"event_type": [], "hr": [], "c": [], "z": [], "n_hist": []}
    for hr in sorted(counts):
        c = counts[hr]
        var_num = n * sx2 - sx * sx
        if n >= 2 and var_num > 0:
            z = (c - sx / n) / math.sqrt(var_num / (n * n))
        else:
            z = None  # not enough history to score against
        out["event_type"].append(key[0])
        out["hr"].append(hr)
        out["c"].append(c)
        out["z"].append(z)
        out["n_hist"].append(n)
        n, sx, sx2 = n + 1, sx + c, sx2 + c * c
    state.update((n, sx, sx2))
    yield pd.DataFrame(out)


def anomaly_scores(
    df: DataFrame, ts_col: str = "ts", type_col: str = "event_type"
) -> DataFrame:
    """Score each (event_type, hour) count against that type's running
    history. ``df`` is a streaming DataFrame of raw events; the hour
    bucket is computed JVM-side, the per-type count fold and scoring
    run in the Arrow state function.

    Within one micro-batch, hours are folded in ascending order;
    counts for an hour split across micro-batches are scored as
    separate observations per batch (streaming semantics — the batch
    query is the exact-form oracle). Use file-per-trigger or
    watermarked upstream aggregation to align batches with hours.
    """
    hourly = df.select(
        F.col(type_col).alias("event_type"),
        F.date_format(F.date_trunc("hour", F.col(ts_col)), "yyyy-MM-dd HH:mm:ss").alias("hr"),
    ).withColumn("c", F.lit(1).cast("long"))
    return hourly.groupBy("event_type").applyInPandasWithState(
        _score_hours,
        outputStructType=ANOMALY_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
