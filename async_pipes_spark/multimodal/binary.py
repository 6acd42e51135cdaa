"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a typed
metadata struct; heavy per-item work (decode, resize, frame-sample,
feature-extract) runs in Arrow-batched ``mapInPandas`` — bytes never
round-trip through Python row-at-a-time.

Codecs: ``bmp`` is decoded FOR REAL by a pure-Python parser
(:func:`_decode_bmp`: header validation, 24bpp pixel walk with row
padding) — one image type is end-to-end with no external libraries.
Compressed codecs (png/jpeg/audio/video) are STUBBED because this
environment has no image/audio libraries: :func:`_decode_stub` raises
``NotImplementedError`` for them and provides a deterministic fake for
``raw`` payloads, so the Spark-side plumbing — schema, batch shape,
UDF signature, partitioning — is fully real and tested. Swap the stub
for a PIL/ffmpeg call in production; nothing else changes.

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
    "n_bytes BIGINT, content_hash STRING, width BIGINT, height BIGINT, "
    "mean_px_milli BIGINT"
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


def bmp_encode(width: int, height: int, pixel: int) -> bytes:
    """Build a real uncompressed 24bpp BMP (BITMAPINFOHEADER, bottom-up
    rows, 4-byte row padding) with every channel of every pixel set to
    ``pixel`` — the deterministic image generator for tests/oracles."""
    import struct

    if width <= 0 or height <= 0 or not (0 <= pixel <= 255):
        raise ValueError("width/height must be positive, pixel in [0,255]")
    stride = (3 * width + 3) // 4 * 4
    image_size = stride * height
    file_size = 14 + 40 + image_size
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, image_size, 0, 0, 0, 0)
    row = bytes([pixel] * (3 * width)) + b"\0" * (stride - 3 * width)
    return header + info + row * height


def _decode_bmp(payload: bytes) -> dict:
    """Pure-Python BMP decode: validates the magic and headers, walks
    the 24bpp pixel rows (skipping row padding) for the mean channel
    value. Raises ValueError on anything malformed — this is a real
    parser, not a length heuristic."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP: bad magic/size")
    _, file_size, _, _, data_offset = struct.unpack("<2sIHHI", payload[:14])
    header_size, width, height, planes, bpp, compression = struct.unpack(
        "<IiiHHI", payload[14:34]
    )
    if header_size < 40 or planes != 1:
        raise ValueError("unsupported BMP header")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24bpp supported (got bpp={bpp})")
    if width <= 0 or height == 0:
        # a negative width gives a negative stride that would pass the
        # truncation check and return garbage; width/height 0 would
        # silently yield mean_px_milli=None
        raise ValueError(f"invalid BMP dimensions {width}x{height}")
    flipped = height < 0
    height = abs(height)
    stride = (3 * width + 3) // 4 * 4
    if data_offset + stride * height > len(payload):
        raise ValueError("truncated BMP pixel data")
    total = 0
    for r in range(height):
        row = payload[data_offset + r * stride : data_offset + r * stride + 3 * width]
        total += sum(row)
    n_px = 3 * width * height
    return {
        "n_bytes": len(payload),
        "content_hash": hashlib.md5(payload).hexdigest(),
        "width": width,
        "height": height,
        "mean_px_milli": (total * 1000 + n_px // 2) // n_px if n_px else None,
    }


def _decode_stub(payload: bytes, media_type: str) -> dict:
    """Deterministic fake decode for ``raw`` payloads; ``bmp`` routes
    to the real parser; compressed codecs are explicitly not
    implemented in this environment."""
    if media_type == "bmp":
        return _decode_bmp(payload)
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
        "mean_px_milli": None,
    }


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-item media features via Arrow-batched mapInPandas:
    (id, n_bytes, content_hash, width, height)."""
    out_schema = f"{id_col} BIGINT, {FEATURE_FIELDS}"

    feat_cols = ["n_bytes", "content_hash", "width", "height", "mean_px_milli"]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _decode_stub(m["payload"], m["media_type"]) for m in pdf["media"]
            ]
            # explicit columns: an EMPTY Arrow batch otherwise builds a
            # zero-column frame that mismatches the declared schema and
            # fails the whole task (resize/frame_sample already pass
            # columns= for the same reason)
            fdf = pd.DataFrame(feats, columns=feat_cols)
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


def audio_envelope(
    df: DataFrame,
    frame_samples: int = 32,
    max_frames: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """PCM energy-envelope fingerprint — the audio near-dup primitive
    (the chromaprint idea reduced to its oracle-checkable core): treat
    a raw payload as an unsigned 8-bit PCM stream, average the
    amplitude of each ``frame_samples``-sample frame (EXACT integer
    division, so any engine replays it), and md5 the first
    ``max_frames`` frame energies joined with '|'. Output (id,
    n_frames, env_fp); recordings whose coarse loudness contour
    matches collide on ``env_fp``, exactly how an audio lake buckets
    near-dup candidates before an expensive verify. Payloads shorter
    than one full frame emit no row (nothing to fingerprint — the
    minhash no-bands convention). A real decoder would feed decoded
    samples at the same cardinality; the kernel, schema, and
    partitioning are what production swaps onto.

    Scale shape: one Arrow kernel pass inside the scan stage — only
    the (id, n_frames, fp) rows leave the Python worker; downstream
    dedup is a groupBy on the fingerprint with map-side partial
    aggregation, payloads never shuffle."""
    import numpy as np

    if frame_samples < 1 or max_frames < 1:
        raise ValueError("frame_samples and max_frames must be >= 1")
    out_schema = f"{id_col} BIGINT, n_frames BIGINT, env_fp STRING"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nfr, fps = [], [], []
            for i, m in zip(pdf[id_col], pdf["media"]):
                if m is None or m["payload"] is None:
                    continue  # NULL payload: nothing to sign, no row
                if m["media_type"] != "raw":
                    raise NotImplementedError(
                        f"audio decoder for {m['media_type']!r} not available"
                    )
                payload = bytes(m["payload"])
                k = min(len(payload) // frame_samples, max_frames)
                if k == 0:
                    continue
                a = np.frombuffer(
                    payload[: k * frame_samples], dtype=np.uint8
                ).astype(np.int64)
                energies = a.reshape(k, frame_samples).sum(axis=1) // frame_samples
                ids.append(i)
                nfr.append(k)
                fps.append(
                    hashlib.md5(
                        "|".join(str(int(e)) for e in energies).encode()
                    ).hexdigest()
                )
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "n_frames": pd.Series(nfr, dtype="int64"),
                    "env_fp": fps,
                }
            )

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
