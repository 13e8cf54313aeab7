"""Multimodal column plumbing (binary + mapInPandas batch shape) and
the parameterized SQL facade (rqlite parameter coercion,
request_parser.go:131-229)."""

from __future__ import annotations

import hashlib

import pytest

from wire_spark.engine import load_table
from wire_spark.operators.multimodal import (
    attach_media,
    decode_media,
    frame_offsets,
    resize_plan,
)
from wire_spark.sql import ParameterError, bind, execute_sql


def test_media_attach_decode_roundtrip(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = attach_media(docs, "text", mime="image/fake")
    decoded = decode_media(media)
    rows = decoded.collect()
    assert len(rows) == 20
    src = {r.doc_id: r.text for r in docs.collect()}
    for r in rows:
        blob = src[r.doc_id].encode("utf-8")
        assert r.n_bytes == len(blob)
        assert r.sha == hashlib.md5(blob).hexdigest()  # bytes intact through Arrow
        assert r.mime == "image/fake"
        assert 1 <= r.width <= 640 and 1 <= r.height <= 480
        assert 1 <= r.n_frames <= 16


def test_media_strict_decode_raises(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(1)
    media = attach_media(docs, "text")
    with pytest.raises(NotImplementedError):
        decode_media(media, strict=True)  # no PIL in this container


def test_frame_sampling_and_resize(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(5)
    decoded = decode_media(attach_media(docs, "text"))
    frames = frame_offsets(decoded, every=4)
    for r in frames.groupBy("doc_id").count().join(decoded, "doc_id").collect():
        assert r["count"] == (r.n_frames + 3) // 4  # ceil(n/4) sampled frames
    sized = resize_plan(decoded, max_side=100).collect()
    for r in sized:
        assert max(r.target_w, r.target_h) <= 100
        assert r.target_w <= r.width and r.target_h <= r.height


def test_sql_named_and_positional_params(spark, sf_dir):
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    named = execute_sql(
        spark,
        "SELECT count(*) AS n FROM orders_v WHERE o_totalprice > :lo AND o_orderpriority = :p",
        {"lo": 100000, "p": "1-URGENT"},
    ).collect()[0]
    pos = execute_sql(
        spark,
        "SELECT count(*) AS n FROM orders_v WHERE o_totalprice > ? AND o_orderpriority = ?",
        [100000, "1-URGENT"],
    ).collect()[0]
    assert named.n == pos.n > 0


def test_param_coercion_rules(spark):
    # bytes from 0-255 int arrays (request_parser.go:197-214)
    assert bind([[104, 105]]) == [b"hi"]
    assert bind({"b": True, "i": 7, "f": 1.5, "s": "x", "z": None}) == {
        "b": True, "i": 7, "f": 1.5, "s": "x", "z": None,
    }
    with pytest.raises(ParameterError):
        bind([[1, 999]])  # not a byte array
    with pytest.raises(ParameterError):
        bind([{"nested": "dict"}])
    with pytest.raises(ParameterError):
        bind([2**64])  # out of int64 range
    row = execute_sql(spark, "SELECT :b AS blob_col", {"b": [104, 105]}).collect()[0]
    assert bytes(row.blob_col) == b"hi"


def test_feature_extract_shares_and_strict(spark, sf_dir):
    """The feature kernel's long-form output reconstructs each doc's
    exact byte histogram (shares are floor(c*1e4/n) integers that sum
    to <= 1e4), and strict mode raises at the documented stub
    boundary."""
    from collections import Counter

    from wire_spark.operators.multimodal import extract_features

    docs = load_table(spark, sf_dir, "documents").limit(10)
    media = attach_media(docs, "text")
    rows = extract_features(media).collect()
    src = {r.doc_id: r.text.encode("utf-8") for r in docs.collect()}
    by_doc: dict[int, dict[int, int]] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.bkt] = r.share_1e4
    assert set(by_doc) == set(src)
    for did, blob in src.items():
        expect = Counter(b % 16 for b in blob)
        got = by_doc[did]
        assert set(got) == set(expect)
        for bkt, c in expect.items():
            assert got[bkt] == c * 10_000 // len(blob)
        assert sum(got.values()) <= 10_000
    with pytest.raises(NotImplementedError):
        extract_features(media, strict=True)
