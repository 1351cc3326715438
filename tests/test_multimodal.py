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
