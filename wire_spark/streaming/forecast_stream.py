"""Streaming forecast monitor: the stateful form of
``events_ses_forecast`` (queries/timeseries.py).

Each event type carries one exponentially-smoothed level over its
hourly counts; every new hour is forecast from the level BEFORE it
folds in, so the emitted row is a true one-step-ahead backtest the
moment the hour closes — the live "is traffic where the smoother
expected it" feed that pairs with ``anomaly_stream``'s z-score (z
asks "is this hour far from the HISTORY AVERAGE"; this asks "is it
far from the RECENT level" — a level shift alarms here long before
it drags the global mean).

Exactness: alpha = 1/2, so the level is an exact integer in 2^-30
units — s'_t = (y_t * 2^30 + s'_{t-1}) div 2, one floor per step
(each floor loses < 2^-30, deterministically; the batch query floors
once at the end instead, which is why the BATCH oracle for the same
series is the spec there and the pinned Python replay of this exact
integer recursion is the spec here).  No floats anywhere in the
state or the forecast.

Scale notes: state is ONE integer per event type (O(#types)); the
stateful shuffle keys on event_type.  The LongType state bounds the
per-hour count at 2^33 (~8.6e9 events/hour/type — the level is
stored as y * 2^30); a hotter key must pre-aggregate upstream at a
finer grain or carry a wider fixed point.  Like anomaly_stream, raw
events fold into per-hour counts inside the Arrow state function
(Spark disallows a streaming pre-aggregation before
``applyInPandasWithState``); at high volume, put a watermarked
hourly aggregation in an upstream query and feed its sink here.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SES_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("hr", T.StringType()),
        T.StructField("y", T.LongType()),
        T.StructField("yhat_1e4", T.LongType()),      # null on the first hour
        T.StructField("abs_err_1e4", T.LongType()),   # null on the first hour
        T.StructField("n_hist", T.LongType()),
    ]
)

_STATE_SCHEMA = "s LONG, n LONG"

_W = 1 << 30  # level fixed-point scale (matches events_ses_forecast)


def _ses_hours(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    s, n = state.get if state.exists else (0, 0)
    counts: dict[str, int] = {}
    for pdf in pdfs:
        for hr, c in zip(pdf["hr"], pdf["c"]):
            counts[hr] = counts.get(hr, 0) + int(c)
    out = {"event_type": [], "hr": [], "y": [], "yhat_1e4": [],
           "abs_err_1e4": [], "n_hist": []}
    for hr in sorted(counts):
        y = counts[hr]
        if n == 0:
            yhat4 = None
            err4 = None
            s = y * _W
        else:
            yhat4 = s * 10000 // _W
            err4 = abs(yhat4 - y * 10000)
            s = (y * _W + s) // 2
        out["event_type"].append(key[0])
        out["hr"].append(hr)
        out["y"].append(y)
        out["yhat_1e4"].append(yhat4)
        out["abs_err_1e4"].append(err4)
        out["n_hist"].append(n)
        n += 1
    state.update((s, n))
    yield pd.DataFrame(out)


def ses_monitor(
    df: DataFrame, ts_col: str = "ts", type_col: str = "event_type"
) -> DataFrame:
    """One-step-ahead SES backtest per (event_type, hour): emits
    (event_type, hr, y, yhat_1e4, abs_err_1e4, n_hist) where
    yhat_1e4 is the pre-fold level — the forecast made BEFORE the
    hour's count was seen (null for a type's first-ever hour, which
    seeds the level instead).

    Within one micro-batch, hours fold in ascending order; an hour
    split across micro-batches contributes one observation per batch
    (streaming semantics — the batch ``events_ses_forecast`` is the
    once-floored exact form).  Use file-per-trigger or a watermarked
    upstream aggregation to align batches with hours.
    """
    hourly = df.select(
        F.col(type_col).alias("event_type"),
        F.date_format(F.date_trunc("hour", F.col(ts_col)),
                      "yyyy-MM-dd HH:mm:ss").alias("hr"),
    ).withColumn("c", F.lit(1).cast("long"))
    return hourly.groupBy("event_type").applyInPandasWithState(
        _ses_hours,
        outputStructType=SES_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
