"""Multimodal plumbing: binary columns, mapInPandas feature extraction,
metadata-only plans. The decode kernel is the deterministic fake; the
real-codec slot raises NotImplementedError by design."""

from __future__ import annotations

import hashlib

import pytest

from ergo_uexplorer_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    _real_decode,
    extract_features,
    frame_sample_plan,
    resize_plan,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = []
    for i in range(50):
        content = f"media-blob-{i}".encode() * (i + 1)
        mtype = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                i,
                mtype,
                bytearray(content),
                (640 + i, 480 + i, 5000 + i * 100, "synthetic"),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_deterministic(media):
    out = extract_features(media).orderBy("media_id")
    rows = out.collect()
    assert len(rows) == 50
    first = rows[0]
    assert len(first["features"]) == FEATURE_DIM
    content = b"media-blob-0"
    assert first["content_sha256"] == hashlib.sha256(content).hexdigest()
    assert first["n_bytes"] == len(content)
    # stable across runs
    again = extract_features(media).orderBy("media_id").collect()
    assert [r["features"] for r in again] == [r["features"] for r in rows]


def test_real_decode_is_gated():
    with pytest.raises(NotImplementedError):
        _real_decode(b"bytes")


def test_frame_sample_plan(media):
    plan = frame_sample_plan(media, every_ms=1000)
    pdf = plan.toPandas()
    assert (pdf["frame_ts_ms"] % 1000 == 0).all()
    one = pdf[pdf["media_id"] == 2]
    assert len(one) == 6  # duration 5200ms → ts 0..5000
    assert set(pdf["media_id"]) == {i for i in range(50) if i % 3 == 2}


def test_resize_plan(media):
    pdf = resize_plan(media, max_side=512).toPandas()
    assert (pdf[["target_width", "target_height"]].max(axis=1) <= 512).all()
    # aspect ratio preserved within rounding
    ratio = pdf["width"] / pdf["height"]
    tratio = pdf["target_width"] / pdf["target_height"]
    assert ((ratio - tratio).abs() < 0.02).all()
