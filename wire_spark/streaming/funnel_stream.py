"""Streaming 3-step funnel: the stateful form of
``events_funnel_3step`` (queries/events.py).

Per user, the state is a two-field stage machine: (stage, anchor_ts)
with stage 0 = nothing, 1 = viewed, 2 = clicked, 3 = purchased
(terminal). Each event advances the machine only if it is the next
step in strict order AND lands within the per-step time budget of
the previous anchor — the same min-after-min chaining the batch
query computes, evaluated incrementally so a conversion is reported
the moment the purchase arrives, not in a nightly batch.

Ordering semantics: events are folded in ascending event-time within
each micro-batch; ACROSS micro-batches the machine sees arrival
order (late events older than the current anchor cannot rewind a
stage — documented at-arrival semantics; an upstream watermarked
sort would restore strict event-time order at a latency cost).

Scale notes: state is two scalars per user, the stateful shuffle is
on user_id; emitted rows are stage transitions only.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FUNNEL_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("stage", T.IntegerType()),     # stage just reached
        T.StructField("at_us", T.LongType()),        # its event time
        T.StructField("anchor_us", T.LongType()),    # previous anchor
    ]
)

_STATE_SCHEMA = "stage INT, anchor LONG"

_STEPS = ("view", "click", "purchase")


def _advance(step_budget_us: int):
    def fold(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        stage, anchor = state.get if state.exists else (0, 0)
        events = []
        for pdf in pdfs:
            events.extend(zip(pdf["event_type"], pdf["eu"]))
        events.sort(key=lambda e: e[1])  # event-time order within batch
        out = {"user_id": [], "stage": [], "at_us": [], "anchor_us": []}
        for etype, eu in events:
            eu = int(eu)
            if stage >= len(_STEPS):
                break  # terminal
            want = _STEPS[stage]
            if etype != want:
                continue
            if stage > 0 and not (anchor < eu <= anchor + step_budget_us):
                continue  # outside the step budget — not the next anchor
            out["user_id"].append(key[0])
            out["stage"].append(stage + 1)
            out["at_us"].append(eu)
            out["anchor_us"].append(anchor)
            stage, anchor = stage + 1, eu
        state.update((stage, anchor))
        yield pd.DataFrame(out)

    return fold


def funnel_stages(
    df: DataFrame, user_col: str = "user_id", type_col: str = "event_type",
    time_col: str = "eu", step_budget_us: int = 3_600_000_000,
) -> DataFrame:
    """Track each user's strict-order view -> click -> purchase
    progress over a stream, emitting a row per stage reached.

    ``df`` is a streaming DataFrame with (user_col, type_col,
    time_col as integer epoch micros).
    """
    from pyspark.sql import functions as F

    renamed = df.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("event_type"),
        F.col(time_col).cast("long").alias("eu"),
    )
    return renamed.groupBy("user_id").applyInPandasWithState(
        _advance(step_budget_us),
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
