"""Multimodal binary-column plumbing tests (decode itself is stubbed)."""

from __future__ import annotations

import pytest

from opentelemetry_collector_contrib_spark.functions import multimodal


def test_decode_media_meta(spark, sf_dir):
    media = multimodal.synth_media(spark, sf_dir)
    meta = multimodal.decode_media_meta(media).collect()
    assert len(meta) > 0
    for r in meta[:50]:
        mid = r["media_id"]
        assert r["kind"] == ["image", "audio", "video"][mid % 3]
        assert r["width"] == mid % 640 + 16
        assert r["height"] == mid % 480 + 16
        expected_frames = mid % 120 + 1 if mid % 3 == 2 else 1
        assert r["n_frames"] == expected_frames
        assert r["payload_bytes"] > 0


def test_frame_sample(spark, sf_dir):
    media = multimodal.synth_media(spark, sf_dir)
    meta = multimodal.decode_media_meta(media)
    frames = multimodal.frame_sample(meta, every=10)
    per_media = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id").count().withColumnRenamed("count", "n").collect()
    }
    for mid, n in list(per_media.items())[:50]:
        assert mid % 3 == 2  # only videos
        n_frames = mid % 120 + 1
        assert n == (n_frames - 1) // 10 + 1


def test_decode_pixels_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_pixels(b"MM01|image|16|16|1|xx")


def test_decode_media_meta_malformed_payloads(spark):
    """Invalid-UTF8 payloads route through the pandas fallback batch-wise;
    short headers yield null metadata but keep payload_bytes."""
    from pyspark.sql import functions as F

    rows = [
        (1, b"MM01|image|32|16|1|bodybytes"),
        (2, b"\xff\xfe\x00broken"),          # not valid UTF-8
        (3, b"MM01|noheader"),                # too few fields
    ]
    df = spark.createDataFrame(rows, "media_id LONG, payload BINARY")
    out = {r["media_id"]: r for r in multimodal.decode_media_meta(df).collect()}
    assert out[1]["kind"] == "image" and out[1]["width"] == 32
    assert out[1]["body_head"] == "bodybyte"
    assert out[2]["kind"] is None and out[2]["payload_bytes"] == len(rows[1][1])
    assert out[3]["kind"] is None and out[3]["width"] is None
    assert out[3]["payload_bytes"] == len(rows[2][1])
