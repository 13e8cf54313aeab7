"""Streaming conversion attribution: the stateful form of
``events_attribution_multitouch`` (queries/paths.py).

Each user carries four scalars of state — (converted, touch count,
first channel, last channel).  Touches fold in as they arrive; the
moment the user's FIRST ``purchase`` folds in, one attribution row is
emitted (first-touch / last-touch channels and the touch count —
enough to rebuild the batch query's first/last-touch per-channel
rollups; NOT its per-channel ``touches``/linear-credit columns,
which need every touch's channel and live only in the batch form),
and every later event for that user is ignored.  This is
the live "which channel just converted someone" feed; the batch
query remains the exact per-channel rollup.

Ordering semantics: within a micro-batch, a user's events fold in
(ts, event_id) order — the batch query's exact tiebreak chain — so
feeding time-ordered batches reproduces the batch per-user rows
bit-for-bit (asserted in tests).  Across batches, arrival order IS
fold order: a touch that arrives after the purchase's batch is
dropped (the stream already attributed the conversion), the standard
at-arrival trade-off of streaming attribution; re-run the batch
query for the reconciled truth.

Scale notes: state is O(1) per user (two small strings + two ints),
keyed and shuffled on user_id — the same key the batch window
shuffles on.  Converted users keep a one-flag tombstone so replayed
touches cannot re-attribute; bound total state in long-lived
deployments with a TTL timeout upstream of this module if the user
space is unbounded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ATTR_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("first_touch", T.StringType()),
        T.StructField("last_touch", T.StringType()),
        T.StructField("n_touches", T.LongType()),
    ]
)

_STATE_SCHEMA = "converted INT, k LONG, first_ch STRING, last_ch STRING"


def _fold_journey(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    converted, k, first_ch, last_ch = (
        state.get if state.exists else (0, 0, None, None)
    )
    rows: list[tuple] = []
    for pdf in pdfs:
        rows.extend(
            zip(pdf["ts"], pdf["event_id"], pdf["event_type"])
        )
    rows.sort(key=lambda r: (r[0], r[1]))  # the batch tiebreak chain
    out = {"user_id": [], "first_touch": [], "last_touch": [],
           "n_touches": []}
    for _ts, _eid, etype in rows:
        if converted:
            break
        if etype == "purchase":
            converted = 1
            if k >= 1:
                out["user_id"].append(key[0])
                out["first_touch"].append(first_ch)
                out["last_touch"].append(last_ch)
                out["n_touches"].append(k)
        else:
            k += 1
            if first_ch is None:
                first_ch = etype
            last_ch = etype
    state.update((converted, k, first_ch, last_ch))
    yield pd.DataFrame(out)


def attribution_monitor(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user conversion attribution rows, emitted at the moment of
    each user's first ``purchase``: (user_id, first_touch,
    last_touch, n_touches), suppressed for converters with zero
    prior touches (matching the batch query's per-user relation).
    """
    ev = df.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("event_type"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("event_id"),
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _fold_journey,
        outputStructType=ATTR_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
