"""Streaming transition tracking: the stateful form of
``events_markov_transitions`` (queries/paths.py).

Each user carries one tiny state tuple — the (ts, event_id,
event_type) of their latest event — and every arriving event emits
the (prev_type, next_type) transition it completes. Downstream, a
plain streaming count over the emitted transitions maintains the
live Markov matrix; the batch query is the exact-form oracle
(parity asserted in tests/test_streaming_extras.py).

Scale notes: state is three scalars per user (bounded by the user
population, the same key the batch window shuffles on); the stateful
shuffle is on user_id. Within a micro-batch, a user's events fold in
(ts, event_id) order — identical to the batch window's tiebreak
chain — so feeding time-ordered batches reproduces the batch
transition multiset bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TRANSITION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("prev_type", T.StringType()),
        T.StructField("next_type", T.StringType()),
        T.StructField("ts", T.StringType()),
    ]
)

_STATE_SCHEMA = "last_ts STRING, last_eid LONG, last_type STRING"


def _emit_transitions(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    last = state.get if state.exists else (None, None, None)
    rows = []
    for pdf in pdfs:
        rows.extend(zip(pdf["ts"], pdf["event_id"], pdf["event_type"]))
    # the batch window's exact ordering: (ts, event_id)
    rows.sort(key=lambda r: (r[0], int(r[1])))
    out = {"user_id": [], "prev_type": [], "next_type": [], "ts": []}
    for ts, eid, etype in rows:
        if last[2] is not None:
            out["user_id"].append(key[0])
            out["prev_type"].append(last[2])
            out["next_type"].append(etype)
            out["ts"].append(ts)
        last = (ts, int(eid), etype)
    state.update(last)
    yield pd.DataFrame(out)


def transition_stream(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Emit one (prev_type, next_type) row per completed transition
    in each user's timeline. ``df`` is a streaming DataFrame of raw
    events. Feed time-ordered micro-batches (file-per-trigger over a
    time-partitioned log, or a watermarked upstream sort) — within a
    batch the state function enforces (ts, event_id) order itself."""
    keyed = df.select(
        F.col(user_col).alias("user_id"),
        F.date_format(F.col(ts_col), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        F.col(id_col).alias("event_id"),
        F.col(type_col).alias("event_type"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _emit_transitions,
        outputStructType=TRANSITION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_transition_matrix(
    df: DataFrame,
    window: str = "1 hour",
    watermark: str = "1 hour",
    **transition_kwargs,
) -> DataFrame:
    """Live per-window Markov transition matrix: chains the stateful
    transition emitter with a watermarked tumbling-window count —
    two stateful operators in ONE streaming query, legal because both
    run in append mode (Spark supports chained stateful operators
    there; update mode would reject the pair).

    Emits ``(w_start, w_end, prev_type, next_type, n)`` once per
    CLOSED window (append semantics: a window's row appears only
    after the event-time watermark passes its end, so counts are
    final — late events inside the ``watermark`` allowance are still
    folded in; an unclosed trailing window emits nothing yet).

    Scale shape: the emitter shuffles on user_id with three scalars
    of state per user; the matrix count shuffles on (window, pair)
    with one counter per live window x observed pair — both state
    sizes bounded independently of stream length. This is the
    streaming form of bucketing ``events_markov_transitions`` by
    time; tests pin closed-window counts to the batch computation.
    """
    trans = transition_stream(df, **transition_kwargs)
    return (
        trans.withColumn("event_ts", F.to_timestamp("ts"))
        .withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", window).alias("w"),
                 "prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "prev_type", "next_type", "n",
        )
    )
