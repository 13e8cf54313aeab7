"""Multimodal columns: images/audio/video as opaque binary + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched operations.

North-star operator family (BASELINE.json). Design per the brief:
media decode libraries (PIL/ffmpeg/etc.) are NOT in this container,
so the decode kernels are STUBS — a clearly-marked
``NotImplementedError`` when a real decode is requested, plus a
deterministic fake used by tests — while everything Spark-side is
real: the column schema, the mapInPandas batch shape, partition
sizing, and the metadata contract.

Scale notes: media bytes travel as parquet BINARY; keep
``spark.sql.files.maxPartitionBytes`` at default so a partition holds
~128 MB of media (hundreds of images / a few videos) — one Arrow
batch per few rows is fine because mapInPandas streams batches, it
does not materialize the partition. Decoded features (dims, fps,
embeddings) belong in sibling typed columns so downstream filters
prune without touching bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: media column group: opaque payload + typed envelope
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("sha", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

_HAVE_PIL = False
try:  # decode libs are absent in this container; gate, never require
    import PIL.Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    pass


def attach_media(df: DataFrame, payload_col: str, mime: str = "application/octet-stream") -> DataFrame:
    """Wrap a payload column as a media struct (binary + mime + meta)."""
    return df.withColumn(
        "media_t",
        F.struct(
            F.encode(F.col(payload_col), "UTF-8").alias("media"),
            F.lit(mime).alias("mime"),
            F.create_map(F.lit("src"), F.lit(payload_col)).alias("meta"),
        ),
    )


def _fake_decode(blob: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image/video decode: derives
    (width, height, n_frames) from the bytes. Replace with a real
    decoder when PIL/ffmpeg are available."""
    n = len(blob)
    return (n % 640 + 1, (n * 7) % 480 + 1, n % 16 + 1)


def decode_media(df: DataFrame, id_col: str = "doc_id", strict: bool = False) -> DataFrame:
    """Decode a ``media_t`` struct column into typed features via
    mapInPandas (Arrow batches; the real-media batch shape).

    ``strict=True`` demands a real decoder and raises
    ``NotImplementedError`` when none is installed — the documented
    stub boundary.
    """
    if strict and not _HAVE_PIL:
        raise NotImplementedError(
            "real media decode requires PIL/ffmpeg, not present in this "
            "environment; use strict=False for the deterministic stub"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = pdf["media"]
            dims = [_fake_decode(b if b is not None else b"") for b in blobs]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "mime": pdf["mime"],
                    "n_bytes": [len(b or b"") for b in blobs],
                    "sha": [hashlib.md5(b or b"").hexdigest() for b in blobs],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                }
            )

    flat = df.select(F.col(id_col), F.col("media_t.media").alias("media"),
                     F.col("media_t.mime").alias("mime"))
    return flat.mapInPandas(batches, schema=DECODED_SCHEMA)


def frame_offsets(df: DataFrame, n_frames_col: str = "n_frames", every: int = 4) -> DataFrame:
    """Frame sampling plan: one row per sampled frame index — pure
    column ops (sequence + explode), no Python."""
    return df.withColumn(
        "frame_idx",
        F.explode(F.sequence(F.lit(0), F.col(n_frames_col) - 1, F.lit(every))),
    )


def resize_plan(df: DataFrame, max_side: int = 224) -> DataFrame:
    """Resize metadata (target dims preserving aspect ratio) as typed
    columns; the pixel work would live in a decode-capable kernel.

    Integer-exact: target = (side * max_side) div longest when the
    image exceeds the bound, unchanged otherwise — float scaling
    would round differently across engines at floor boundaries."""
    g = F.greatest(F.col("width"), F.col("height"))
    def tgt(side):
        return F.when(g <= max_side, F.col(side)).otherwise(
            F.expr(f"({side} * {max_side}) div greatest(width, height)")
        ).cast("int")
    return (df.withColumn("target_w", tgt("width"))
              .withColumn("target_h", tgt("height")))


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("bkt", T.IntegerType()),
        T.StructField("share_1e4", T.LongType()),
    ]
)


def extract_features(
    df: DataFrame, id_col: str = "doc_id", n_buckets: int = 16, strict: bool = False
) -> DataFrame:
    """Feature-extract kernel over a ``media_t`` column: a 16-bucket
    byte-value histogram per media blob, emitted long-form as
    (doc_id, bkt, share_1e4) with share_1e4 = floor(count * 1e4 /
    n_bytes) — exact integers, so downstream aggregation is
    partitioning-independent and hash-reproducible.

    This is the deterministic stand-in for a real content embedding
    (CLIP/mel-spectrogram/etc. — ``strict=True`` raises at the same
    documented boundary as :func:`decode_media`); the Spark-side
    plumbing it exercises is the real thing: binary Arrow batches in,
    vectorized numpy per batch, typed long-form features out, no
    per-row Python. Absent buckets emit no row (their share is 0).

    Scale notes: output is <= n_buckets rows per media item (feature
    grain, not byte grain); the kernel never materializes more than
    one Arrow batch. Join/aggregate downstream on (doc_id) or (bkt)
    — both bounded keys.
    """
    if strict and not _HAVE_PIL:
        raise NotImplementedError(
            "real media feature extraction requires a decode/embedding "
            "library, not present in this environment; use strict=False "
            "for the deterministic byte-histogram stand-in"
        )
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, bkts, shares = [], [], []
            for did, blob in zip(pdf[id_col], pdf["media"]):
                b = bytes(blob or b"")
                if not b:
                    continue
                arr = np.frombuffer(b, dtype=np.uint8) % n_buckets
                cnt = np.bincount(arr, minlength=n_buckets)
                nz = np.nonzero(cnt)[0]
                ids.extend([did] * len(nz))
                bkts.extend(int(x) for x in nz)
                shares.extend(
                    int(c) * 10_000 // len(b) for c in cnt[nz]
                )
            yield pd.DataFrame(
                {"doc_id": ids, "bkt": bkts, "share_1e4": shares}
            )

    flat = df.select(F.col(id_col), F.col("media_t.media").alias("media"))
    return flat.mapInPandas(batches, schema=FEATURE_SCHEMA)
