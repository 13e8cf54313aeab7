"""Streaming heavy hitters: SpaceSaving (Metwally et al.) top-k token
tracking via applyInPandasWithState — the streaming counterpart to the
batch ``token_zipf`` profile.

Per key-space (e.g. language), the state holds at most ``capacity``
(token, count, overestimate) entries; an unseen token evicts the
current minimum and inherits its count as the overestimation bound.
Guarantees: every token with true frequency > N/capacity is in the
table, and each reported count overestimates by at most its recorded
bound — the standard sketch for "what's trending" over unbounded
streams where exact counting would need unbounded state.

Scale notes: state is O(capacity) per group key regardless of stream
length; the stateful shuffle is on the group key. With
capacity >= distinct-tokens the counts are EXACT — asserted against a
batch groupBy in tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

HH_SCHEMA = T.StructType(
    [
        T.StructField("group", T.StringType()),
        T.StructField("token", T.StringType()),
        T.StructField("freq", T.LongType()),
        T.StructField("err", T.LongType()),  # overestimation bound (0 = exact)
        T.StructField("rank", T.LongType()),
    ]
)

# state: parallel arrays (tokens, counts, errs) — applyInPandasWithState
# state rows must be fixed-schema; arrays keep it one row
_STATE_SCHEMA = "tokens ARRAY<STRING>, counts ARRAY<LONG>, errs ARRAY<LONG>"


def _space_saving(capacity: int, top_n: int):
    def fold(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            tokens, counts, errs = state.get
            table = {t: [c, e] for t, c, e in zip(tokens, counts, errs)}
        else:
            table = {}
        for pdf in pdfs:
            for tok in pdf["token"]:
                if tok in table:
                    table[tok][0] += 1
                elif len(table) < capacity:
                    table[tok] = [1, 0]
                else:
                    # evict the minimum (deterministic: count, then token)
                    victim = min(table.items(), key=lambda kv: (kv[1][0], kv[0]))
                    vcount = victim[1][0]
                    del table[victim[0]]
                    table[tok] = [vcount + 1, vcount]
        items = sorted(table.items(), key=lambda kv: (-kv[1][0], kv[0]))
        state.update((
            [t for t, _ in items],
            [c for _, (c, _) in items],
            [e for _, (_, e) in items],
        ))
        top = items[:top_n]
        yield pd.DataFrame({
            "group": [key[0]] * len(top),
            "token": [t for t, _ in top],
            "freq": [c for _, (c, _) in top],
            "err": [e for _, (_, e) in top],
            "rank": list(range(1, len(top) + 1)),
        })

    return fold


def heavy_hitters(
    df: DataFrame,
    group_col: str,
    token_col: str,
    capacity: int = 256,
    top_n: int = 10,
) -> DataFrame:
    """Running top-``top_n`` tokens per group over a token stream.

    Emits the current ranking after every micro-batch (update mode);
    ``err`` is each frequency's overestimation bound — 0 means the count
    is exact (the token never inherited an evicted slot).
    """
    renamed = df.select(
        F.col(group_col).cast("string").alias("group"),
        F.col(token_col).cast("string").alias("token"),
    )
    return renamed.groupBy("group").applyInPandasWithState(
        _space_saving(capacity, top_n),
        outputStructType=HH_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
