"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a typed
metadata struct; heavy per-item work (decode, resize, frame-sample,
feature-extract) runs in Arrow-batched ``mapInPandas`` — bytes never
round-trip through Python row-at-a-time.

The actual codec step is STUBBED (this environment has no image/audio
libraries): :func:`_decode_stub` raises ``NotImplementedError`` for
real codecs and provides a deterministic fake for ``raw`` payloads so
the Spark-side plumbing — schema, batch shape, UDF signature,
partitioning — is fully real and tested. Swap ``_decode_stub`` for a
PIL/ffmpeg call in production; nothing else changes.

Scale notes: mapInPandas streams Arrow batches; set
``spark.sql.execution.arrow.maxRecordsPerBatch`` to bound batch memory
for large payloads, and repartition upstream so each task holds only a
few hundred MB of media bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from async_pipes_spark.operators.partitioning import fan_out

#: Typed metadata carried alongside every media payload.
MEDIA_SCHEMA = "media STRUCT<payload: BINARY, media_type: STRING, source: STRING>"

FEATURE_FIELDS = (
    "n_bytes BIGINT, content_hash STRING, width BIGINT, height BIGINT"
)


def to_media(df: DataFrame, payload_col: str, media_type: str, source_col: str) -> DataFrame:
    """Wrap a binary column into the engine's media struct."""
    return df.withColumn(
        "media",
        F.struct(
            F.col(payload_col).alias("payload"),
            F.lit(media_type).alias("media_type"),
            F.col(source_col).alias("source"),
        ),
    )


def _decode_stub(payload: bytes, media_type: str) -> dict:
    """Deterministic fake decode for ``raw`` payloads; real codecs are
    explicitly not implemented in this environment."""
    if media_type != "raw":
        raise NotImplementedError(
            f"codec for media_type={media_type!r} not available in this environment; "
            "swap _decode_stub for a real decoder (PIL/ffmpeg) in production"
        )
    return {
        "n_bytes": len(payload),
        "content_hash": hashlib.md5(payload).hexdigest(),
        "width": len(payload) % 640,
        "height": (payload[0] if payload else 0) % 480,
    }


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-item media features via Arrow-batched mapInPandas:
    (id, n_bytes, content_hash, width, height)."""
    out_schema = f"{id_col} BIGINT, {FEATURE_FIELDS}"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _decode_stub(m["payload"], m["media_type"]) for m in pdf["media"]
            ]
            fdf = pd.DataFrame(feats)
            fdf.insert(0, id_col, pdf[id_col].values)
            yield fdf

    # media decode is per-item CPU/IO: make sure a small/few-row-group
    # source still uses every python worker
    return fan_out(df.select(id_col, "media")).mapInPandas(batches, out_schema)


def resize(df: DataFrame, width: int, height: int, id_col: str = "doc_id") -> DataFrame:
    """Resize every media item to (width, height), yielding a new media
    struct (1 → 1). For ``raw`` payloads the stub transform crops/pads
    the byte buffer to width*height bytes — deterministic plumbing with
    the exact shape of a real thumbnailer (swap the body for PIL's
    ``Image.resize`` in production)."""

    target = width * height
    out_schema = f"{id_col} BIGINT, {MEDIA_SCHEMA}, width BIGINT, height BIGINT"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, m in zip(pdf[id_col], pdf["media"]):
                if m["media_type"] != "raw":
                    raise NotImplementedError(
                        f"resize codec for {m['media_type']!r} not available; "
                        "swap the stub for PIL/ffmpeg in production"
                    )
                payload = bytes(m["payload"])[:target].ljust(target, b"\0")
                rows.append(
                    (
                        i,
                        {
                            "payload": payload,
                            "media_type": m["media_type"],
                            "source": m["source"],
                        },
                        width,
                        height,
                    )
                )
            yield pd.DataFrame(rows, columns=[id_col, "media", "width", "height"])

    return fan_out(df.select(id_col, "media")).mapInPandas(batches, out_schema)


def frame_sample(
    df: DataFrame,
    frame_bytes: int,
    every_n: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Sample every ``every_n``-th fixed-size frame from each payload
    (1 → M, the video-frame-sampling shape): (id, frame_idx, n_bytes,
    frame_hash). For ``raw`` payloads a frame is a ``frame_bytes``
    chunk; a real decoder would emit decoded frames at the same
    cardinality — the Spark-side explode/partitioning is identical."""

    out_schema = f"{id_col} BIGINT, frame_idx BIGINT, n_bytes BIGINT, frame_hash STRING"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, m in zip(pdf[id_col], pdf["media"]):
                if m["media_type"] != "raw":
                    raise NotImplementedError(
                        f"frame decoder for {m['media_type']!r} not available"
                    )
                payload = bytes(m["payload"])
                n_frames = (len(payload) + frame_bytes - 1) // frame_bytes
                for fi in range(0, n_frames, every_n):
                    chunk = payload[fi * frame_bytes : (fi + 1) * frame_bytes]
                    rows.append(
                        (i, fi, len(chunk), hashlib.md5(chunk).hexdigest())
                    )
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_idx", "n_bytes", "frame_hash"]
            )

    return fan_out(df.select(id_col, "media")).mapInPandas(batches, out_schema)
