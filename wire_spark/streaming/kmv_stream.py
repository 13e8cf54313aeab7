"""Streaming KMV (k-minimum-values) distinct-count sketch: the
stateful form of ``sketch_kmv_distinct`` (queries/sketches.py).

Per group key, the state is the set of the k smallest 48-bit hashes
seen so far. Merging a batch is "union, keep k smallest" — the KMV
merge rule — so the state after any micro-batch partitioning equals
the sketch of the union (asserted against a one-shot fold in
tests/test_streaming_extras.py). Each batch emits the group's current
estimate: (k-1) * 2^48 // h_(k) once k hashes exist, else the exact
count of hashes held (the sketch IS the distinct set below k).

The hash is the same md5-derived 48-bit value the batch query uses
(first 12 hex chars of md5(str(key))), so a streamed sketch and the
batch oracle query agree on the same data.

Scale notes: state is at most k integers per group; the stateful
shuffle is on the group key. Cross-stream union (two sources, one
estimate) is the same merge rule applied to two states.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

KMV_SCHEMA = T.StructType(
    [
        T.StructField("group", T.StringType()),
        T.StructField("n_held", T.LongType()),    # hashes in the sketch
        T.StructField("estimate", T.LongType()),  # distinct estimate
    ]
)

_STATE_SCHEMA = "hashes ARRAY<LONG>"
_DOMAIN = 1 << 48


def kmv_hash(value: str) -> int:
    """48-bit portable hash shared with the batch query: first 12 hex
    chars of md5 (mirrors ``conv(substring(md5(v), 1, 12), 16, 10)``)."""
    return int(hashlib.md5(value.encode()).hexdigest()[:12], 16)


def _fold_kmv(k: int):
    def fold(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            (hashes,) = state.get
            held = set(hashes)
        else:
            held = set()
        for pdf in pdfs:
            for v in pdf["value"]:
                held.add(kmv_hash(str(v)))
        # the KMV merge rule: union, keep the k smallest
        kept = sorted(held)[:k]
        if len(kept) >= k:
            est = (k - 1) * _DOMAIN // kept[k - 1]
        else:
            est = len(kept)
        state.update((kept,))
        yield pd.DataFrame({
            "group": [key[0]],
            "n_held": [len(kept)],
            "estimate": [est],
        })

    return fold


def kmv_distinct(
    df: DataFrame, group_col: str = "event_type", value_col: str = "user_id",
    k: int = 64,
) -> DataFrame:
    """Maintain a per-group KMV sketch over a stream and emit the
    current distinct-count estimate each micro-batch.

    ``df`` is a streaming DataFrame with (group_col, value_col).
    """
    from pyspark.sql import functions as F

    renamed = df.select(
        F.col(group_col).alias("group"),
        F.col(value_col).cast("string").alias("value"),
    )
    return renamed.groupBy("group").applyInPandasWithState(
        _fold_kmv(k),
        outputStructType=KMV_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
