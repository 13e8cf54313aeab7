"""Streaming near-duplicate detection: incremental MinHash-LSH.

The batch dedup family (queries/dedup.py) answers "which existing
docs are near-dups"; a training-data INGEST pipeline needs the
incremental question — "is this arriving document a near-dup of
anything seen so far" — which requires state that accumulates across
micro-batches. This operator keeps the LSH band buckets as streaming
state:

1. Per-row (stateless, JVM): word shingles -> Carter-Wegman minhash
   signature — computed with ``array_min(transform(...))`` per
   permutation, NO aggregation, so it runs on a stream without
   windows; identical arithmetic to the batch ``dedup_minhash_lsh``.
2. Per-bucket (stateful): ``applyInPandasWithState`` keyed on
   (band, band-signature) holds the doc ids previously landed in the
   bucket; each arriving doc emits how many prior occupants it
   collided with. A doc whose every band reports 0 priors is novel;
   any collision marks it a near-dup *candidate* (exact verification
   happens downstream on the tiny candidate set, same as batch LSH).

Scale notes: state is O(buckets x occupants), bounded by
``max_bucket_size`` (a hot bucket keeps only the first K ids — more
adds no discriminating power) and evictable via state timeout; the
shuffle key (band, bsig) is the same bucketing the batch join uses.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_PRIME = 1073741789


def minhash_bands(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_perm: int = 24,
    band_rows: int = 4,
) -> DataFrame:
    """(id, band, bsig) rows — one per band per document.

    Signature arithmetic is identical to queries/dedup.py's batch
    minhash (md5-derived h1/h2, (h1 + p*h2) mod prime), but expressed
    as per-row ``array_min(transform(shingles, ...))`` so no groupBy
    is needed — stream-safe and window-free. Exact equality with the
    batch band table is asserted in
    tests/test_streaming_extras.py::test_streaming_bands_agree_with_batch_lsh.

    Implementation note: every nested lambda level is built as ONE
    parser-side SQL expression with DISTINCT lambda variable names
    (i/s/p/k/m). Composing Python-built ``F.transform`` lambdas across
    aliased HOF columns mis-binds the inner variable after projection
    collapse (NOTES.md rule 8) — the original form of this function
    silently produced per-band signatures whose four slots all held
    the p=0 minhash value.
    """
    n_bands = n_perm // band_rows
    words = f"split({text_col}, ' ')"
    sh = (
        f"array_distinct(CASE WHEN size({words}) >= 3 THEN "
        f"transform(sequence(1, size({words}) - 2), "
        f"i -> concat_ws(' ', slice({words}, i, 3))) "
        f"ELSE array() END)"
    )
    mins = (
        f"transform(sequence(0, {n_perm - 1}), p -> array_min(transform({sh}, "
        f"s -> (cast(conv(substring(md5(s), 1, 12), 16, 10) AS BIGINT) "
        f"+ p * cast(conv(substring(md5(s), 13, 12), 16, 10) AS BIGINT)) "
        f"% {_PRIME})))"
    )
    sigs = df.select(F.col(id_col).alias("doc_id"), F.expr(mins).alias("__mins"))
    bands = (
        f"transform(sequence(0, {n_bands - 1}), k -> struct("
        f"cast(k AS INT) AS band, "
        f"array_join(transform(slice(__mins, k * {band_rows} + 1, {band_rows}), "
        f"m -> cast(m AS STRING)), ',') AS bsig))"
    )
    return sigs.select("doc_id", F.explode(F.expr(bands)).alias("b")).select(
        "doc_id", F.col("b.band").alias("band"), F.col("b.bsig").alias("bsig")
    )


_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("n_prior", T.IntegerType()),
        T.StructField("prior_ids", T.ArrayType(T.LongType())),
    ]
)

_STATE_SCHEMA = "ids ARRAY<LONG>"

_MAX_BUCKET = 16  # ids kept per bucket; more adds no discrimination


def _bucket_collisions(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (ids,) = state.get if state.exists else ([],)
    ids = list(ids)
    out = {"doc_id": [], "band": [], "n_prior": [], "prior_ids": []}
    band = key[0]
    for pdf in pdfs:
        for doc_id in sorted(pdf["doc_id"]):
            out["doc_id"].append(doc_id)
            out["band"].append(band)
            out["n_prior"].append(len(ids))
            out["prior_ids"].append(list(ids))
            if len(ids) < _MAX_BUCKET:
                ids.append(int(doc_id))
    state.update((ids,))
    yield pd.DataFrame(out)


def streaming_near_dup_flags(stream: DataFrame, id_col: str = "doc_id",
                             text_col: str = "text") -> DataFrame:
    """Per-(doc, band) collision report against all history.

    Downstream per-doc reduction (a doc is a near-dup candidate iff
    ANY band collided) happens in the consumer's foreachBatch — the
    stateful stage already did the cross-batch work.
    """
    bands = minhash_bands(stream, id_col=id_col, text_col=text_col)
    return bands.groupBy("band", "bsig").applyInPandasWithState(
        _bucket_collisions,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
