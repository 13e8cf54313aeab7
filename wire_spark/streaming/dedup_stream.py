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

from wire_spark.queries._util import word_shingles

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
    is needed — stream-safe and window-free.
    """
    def perm_hash(s, p: int):
        # (h1 + p*h2) mod prime over the shingle's md5 halves — the
        # exact batch-minhash arithmetic (queries/dedup.py)
        md5c = F.md5(s)
        h1 = F.conv(F.substring(md5c, 1, 12), 16, 10).cast("long")
        h2 = F.conv(F.substring(md5c, 13, 12), 16, 10).cast("long")
        return (h1 + F.lit(p) * h2) % F.lit(_PRIME)

    shingled = df.select(
        F.col(id_col).alias("doc_id"),
        word_shingles(text_col, 3).alias("__sh"),
    )
    mins = F.array(
        *[
            F.array_min(F.transform(F.col("__sh"), lambda s, p=p: perm_hash(s, p)))
            for p in range(n_perm)
        ]
    )
    n_bands = n_perm // band_rows
    sigs = shingled.select("doc_id", mins.alias("__mins"))
    bands = F.array(
        *[
            F.struct(
                F.lit(k).alias("band"),
                F.array_join(
                    F.transform(
                        F.slice("__mins", k * band_rows + 1, band_rows),
                        lambda x: x.cast("string"),
                    ),
                    ",",
                ).alias("bsig"),
            )
            for k in range(n_bands)
        ]
    )
    return sigs.select("doc_id", F.explode(bands).alias("b")).select(
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
