"""Multimodal columns: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries image/audio/video as ``binary``
columns next to text. This module provides the Spark-side plumbing —
schema, deterministic synthesis, Arrow-batched metadata decode, feature
extraction, frame sampling — with the actual pixel/sample decode STUBBED
(image/audio libraries are not in this container): ``decode_pixels``
raises NotImplementedError, everything else is real and tested.

Payload format (deterministic fake, self-describing):
  b"MM01|<kind>|<width>|<height>|<n_frames>|" + body bytes
so the metadata decode is a genuine byte-parse over the binary column, the
shape a real container header (PNG/WAV/MP4 box) parse would take.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_id long, kind string, width int, height int, n_frames int, "
    "payload_bytes int, body_head string"
)

FRAME_SAMPLE_SCHEMA = "media_id long, frame_index int, frame_offset long"


def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table derived from documents (no external data):
    one opaque payload per doc, kind/width/height/frames pure functions of
    doc_id, body bytes = the document text."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kind = F.expr(
        "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
    )
    w = (F.col("doc_id") % 640 + 16).cast("int")
    h = (F.col("doc_id") % 480 + 16).cast("int")
    nf = F.when(kind == "video", (F.col("doc_id") % 120 + 1).cast("int")).otherwise(F.lit(1))
    header = F.concat_ws(
        "|", F.lit("MM01"), kind, w.cast("string"), h.cast("string"), nf.cast("string")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.concat(header, F.lit("|"), F.col("text")), "UTF-8").alias("payload"),
    )


def decode_pixels(payload: bytes):  # pragma: no cover - intentional stub
    """Full media decode — requires PIL/ffmpeg, absent in this container."""
    raise NotImplementedError(
        "pixel/sample decode requires an image/audio library not present in "
        "this environment; metadata decode + feature plumbing below is real"
    )


def _decode_meta(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
    """mapInPandas worker: parse the container header out of the payload
    bytes per Arrow batch (vectorized split, no per-row Python loop)."""
    for pdf in batches:
        s = pdf["payload"].map(lambda b: bytes(b))
        parts = s.map(lambda b: b.split(b"|", 5))
        ok = parts.map(len) == 6
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "kind": parts.map(lambda p: p[1].decode("ascii", "replace")).where(ok),
                "width": pd.to_numeric(
                    parts.map(lambda p: p[2].decode() if len(p) == 6 else None),
                    errors="coerce",
                ).astype("Int32"),
                "height": pd.to_numeric(
                    parts.map(lambda p: p[3].decode() if len(p) == 6 else None),
                    errors="coerce",
                ).astype("Int32"),
                "n_frames": pd.to_numeric(
                    parts.map(lambda p: p[4].decode() if len(p) == 6 else None),
                    errors="coerce",
                ).astype("Int32"),
                "payload_bytes": s.map(len).astype("int32"),
                "body_head": parts.map(
                    lambda p: p[5][:8].decode("utf-8", "replace") if len(p) == 6 else None
                ),
            }
        )


def decode_media_meta(media: DataFrame) -> DataFrame:
    """media(media_id, payload) -> typed metadata via Arrow-batched decode."""
    return media.mapInPandas(_decode_meta, MEDIA_META_SCHEMA)


def frame_sample(meta: DataFrame, every: int = 10) -> DataFrame:
    """Video frame sampling plumbing: one row per sampled frame index with a
    byte-offset the (stubbed) decoder would seek to. Pure JVM explode —
    scales as a narrow transform, no shuffle."""
    frames = meta.filter(F.col("kind") == "video").select(
        "media_id",
        "payload_bytes",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every))
        ).alias("frame_index"),
    )
    return frames.select(
        "media_id",
        "frame_index",
        # fake fixed-size-frame offset model: header-free body split evenly
        (F.col("frame_index").cast("long") * F.col("payload_bytes")).alias("frame_offset"),
    )
