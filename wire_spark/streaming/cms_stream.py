"""Streaming count-min sketch: the stateful form of
``sketch_countmin_freq`` (queries/sketches.py).

Per group key (e.g. language), the state is one d x w integer cell
array. Every micro-batch folds its token occurrences into the cells
(increments add, so state after any batch split equals the one-shot
fold — the mergeability that makes CMS the streaming frequency
sketch), then emits the post-fold estimate for each distinct token
seen in the batch. The hash is the same md5-derived cell mapping the
batch query uses (md5("d:token") -> cell), so a streamed sketch and a
batch-built sketch over the same data are cell-for-cell identical —
asserted in tests/test_streaming_extras.py.

Scale notes: state is d*w integers per group regardless of stream
length or vocabulary; the stateful shuffle is on the group key.
Estimates never undercount (CMS guarantee); the emitted ``est`` is
the count upper bound at emission time.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CMS_SCHEMA = T.StructType(
    [
        T.StructField("group", T.StringType()),
        T.StructField("token", T.StringType()),
        T.StructField("n_batch", T.LongType()),  # occurrences in this batch
        T.StructField("est", T.LongType()),      # CMS estimate after fold
    ]
)

_STATE_SCHEMA = "cells ARRAY<LONG>"


def cms_cell(d: int, token: str, width: int) -> int:
    """The portable cell mapping shared with the batch query:
    first 15 hex chars of md5("d:token") as an integer, mod width
    (mirrors ``md5_long(concat_ws(':', d, token)) % w``)."""
    h = hashlib.md5(f"{d}:{token}".encode()).hexdigest()
    return int(h[:15], 16) % width


def _fold_tokens(depth: int, width: int):
    def fold(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            (cells,) = state.get
            cells = list(cells)
        else:
            cells = [0] * (depth * width)
        counts: dict[str, int] = {}
        for pdf in pdfs:
            for tok in pdf["token"]:
                counts[tok] = counts.get(tok, 0) + 1
        # fold the whole batch, THEN estimate: the emitted value is the
        # sketch's answer as of the end of this batch
        for tok, c in counts.items():
            for d in range(depth):
                cells[d * width + cms_cell(d, tok, width)] += c
        out = {"group": [], "token": [], "n_batch": [], "est": []}
        for tok in sorted(counts):
            est = min(cells[d * width + cms_cell(d, tok, width)]
                      for d in range(depth))
            out["group"].append(key[0])
            out["token"].append(tok)
            out["n_batch"].append(counts[tok])
            out["est"].append(est)
        state.update((cells,))
        yield pd.DataFrame(out)

    return fold


def cms_token_counts(
    df: DataFrame, group_col: str = "lang", token_col: str = "token",
    depth: int = 4, width: int = 16,
) -> DataFrame:
    """Maintain a per-group count-min sketch over a token stream and
    emit each batch's tokens with their post-fold estimates.

    ``df`` is a streaming DataFrame with (group_col, token_col).
    State is the d*w cell array; increments commute, so any
    micro-batch partitioning of the input yields the identical final
    sketch (asserted against a one-shot fold in tests).
    """
    from pyspark.sql import functions as F

    renamed = df.select(
        F.col(group_col).alias("group"), F.col(token_col).alias("token")
    )
    return renamed.groupBy("group").applyInPandasWithState(
        _fold_tokens(depth, width),
        outputStructType=CMS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
