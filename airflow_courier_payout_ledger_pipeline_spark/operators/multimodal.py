"""Multimodal columns: image/audio/video as opaque ``binary`` columns with typed
metadata, processed by Arrow-batched pandas functions over ``mapInPandas``.

The Spark-side plumbing is real and tested — schema contracts, partition sizing,
Arrow batch shapes, deterministic outputs. The actual codec calls are stubbed
behind ``decode_image_stub`` (the container ships no PIL/ffmpeg): the stub parses a
tiny deterministic fake header instead of JPEG markers, so tests validate the full
dataflow (binary in → feature vectors out) byte-for-byte. Swap ``_decode`` for a
real decoder without touching any Spark code.

Scale notes: ``mapInPandas`` streams Arrow batches (no per-row pickling);
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds decoder memory; binary
payloads should live in their own parquet column chunk (they do — Spark writes one
column chunk per column) so metadata-only queries never read the bytes
(column pruning drops the binary column from the scan).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import pandas as pd

#: header: magic 'FIMG' + uint16 width + uint16 height + uint8 channels
FAKE_HEADER = struct.Struct(">4sHHB")

MEDIA_SCHEMA = (
    "media_id bigint, payload binary, media_type string, declared_w int, declared_h int"
)

FEATURE_SCHEMA = (
    "media_id bigint, width int, height int, channels int, n_bytes int, "
    "mean_byte double, feature array<float>"
)


def encode_fake_image(media_id: int, w: int, h: int, channels: int = 3) -> bytes:
    """Deterministic fake image: header + (w*h*c) pseudo-pixel bytes derived from
    the id (stands in for JPEG bytes in tests)."""
    body = bytes(((media_id * 31 + i * 7) % 251) for i in range(w * h * channels))
    return FAKE_HEADER.pack(b"FIMG", w, h, channels) + body


def synthesize_payloads(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Attach a deterministic FIMG ``payload`` column to a metadata DataFrame,
    generated Arrow-batch-wise via mapInPandas (the bench/test stand-in for
    scanning a real parquet binary column — NOT a row-at-a-time Python UDF:
    rows move driver↔executor as Arrow batches, generation loops stay in-process
    over one batch at a time)."""
    import pandas as pd  # noqa: PLC0415

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                encode_fake_image(int(m), int(w), int(h))
                for m, w, h in zip(pdf["media_id"], pdf["declared_w"], pdf["declared_h"])
            ]
            yield pdf[["media_id", "payload", "media_type", "declared_w", "declared_h"]]

    return media.mapInPandas(gen, MEDIA_SCHEMA)


def _decode(payload: bytes) -> tuple[int, int, int, bytes]:
    """STUB decode — replace with PIL/libvips in production.

    Raises on a foreign format exactly like a real decoder would."""
    if len(payload) < FAKE_HEADER.size or payload[:4] != b"FIMG":
        raise NotImplementedError(
            "real image codecs are not available in this environment; "
            "payload is not in the deterministic FIMG test format"
        )
    _, w, h, c = FAKE_HEADER.unpack(payload[: FAKE_HEADER.size])
    return w, h, c, payload[FAKE_HEADER.size :]


def extract_image_features(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """binary payload → (dims, byte stats, 8-dim pooled feature vector), via
    Arrow-batched mapInPandas. Deterministic: same payload → same features."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    def decode_batch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "width", "height", "channels", "n_bytes", "mean_byte", "feature")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, c, body = _decode(bytes(payload))
                arr = np.frombuffer(body, dtype=np.uint8)
                pooled = [
                    float(chunk.mean()) if len(chunk) else 0.0
                    for chunk in np.array_split(arr.astype(np.float32), 8)
                ]
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["n_bytes"].append(len(body))
                # exact int64 sum / exact division → the identical double in any
                # engine (a float32 .mean() would drift from the SQL oracle)
                out["mean_byte"].append(
                    float(arr.sum(dtype=np.int64)) / len(arr) if len(arr) else 0.0
                )
                out["feature"].append(pooled)
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(decode_batch, FEATURE_SCHEMA)


#: video header: magic 'FVID' + uint16 n_frames + uint16 width + uint16 height
FAKE_VIDEO_HEADER = struct.Struct(">4sHHH")

VIDEO_SCHEMA = "media_id bigint, payload binary"

FRAME_SCHEMA = (
    "media_id bigint, frame_idx int, frame_w int, frame_h int, frame_mean double"
)


def encode_fake_video(media_id: int, n_frames: int, w: int, h: int) -> bytes:
    """Deterministic fake video: header + ``n_frames`` grayscale frames of
    ``w*h`` bytes each; frame ``f`` is the constant byte ``(id*31 + f*7) % 256``
    (stands in for an MP4 container in tests — the closed-form pixel value is
    what lets a SQL oracle hash-check the decoded output)."""
    frames = b"".join(
        bytes([(media_id * 31 + f * 7) % 256]) * (w * h) for f in range(n_frames)
    )
    return FAKE_VIDEO_HEADER.pack(b"FVID", n_frames, w, h) + frames


def synthesize_video_payloads(media: DataFrame) -> DataFrame:
    """Attach a deterministic FVID ``payload`` to (media_id, n_frames, w, h)
    metadata rows, Arrow-batch-wise (the test stand-in for a parquet binary
    column of real containers)."""
    import pandas as pd  # noqa: PLC0415

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [
                        encode_fake_video(int(m), int(n), int(w), int(h))
                        for m, n, w, h in zip(
                            pdf["media_id"], pdf["n_frames"], pdf["w"], pdf["h"]
                        )
                    ],
                }
            )

    return media.mapInPandas(gen, VIDEO_SCHEMA)


def _decode_video(payload: bytes) -> tuple[int, int, int, bytes]:
    """STUB container demux — replace with ffmpeg/pyav in production."""
    if len(payload) < FAKE_VIDEO_HEADER.size or payload[:4] != b"FVID":
        raise NotImplementedError(
            "real video codecs are not available in this environment; "
            "payload is not in the deterministic FVID test format"
        )
    _, n_frames, w, h = FAKE_VIDEO_HEADER.unpack(payload[: FAKE_VIDEO_HEADER.size])
    return n_frames, w, h, payload[FAKE_VIDEO_HEADER.size :]


def sample_frames(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Frame sampling: one binary video row → one output row per ``every_k``-th
    frame (frame index, dims, exact per-frame mean byte). The 1→N row fan-out
    INSIDE mapInPandas is the shape real frame extraction needs — Arrow batches
    out can be larger than batches in, no explode of materialized frame arrays
    through a shuffle.

    Scale notes: a 100 TB video corpus is dominated by payload bytes, so the
    sampler runs directly against the scan with zero shuffles; partition sizing
    comes from ``spark.sql.files.maxPartitionBytes`` (bytes, not row counts, are
    the unit that matters for binary columns). Means use exact int64 sums so the
    emitted doubles are engine-portable."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    def demux(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "frame_idx", "frame_w", "frame_h", "frame_mean")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n_frames, w, h, body = _decode_video(bytes(payload))
                arr = np.frombuffer(body, dtype=np.uint8).reshape(n_frames, w * h)
                for f in range(0, n_frames, every_k):
                    frame = arr[f]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(f)
                    out["frame_w"].append(w)
                    out["frame_h"].append(h)
                    out["frame_mean"].append(
                        float(frame.sum(dtype=np.int64)) / len(frame)
                    )
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(demux, FRAME_SCHEMA)


def media_metadata_only(media: DataFrame) -> DataFrame:
    """Metadata projection that never touches the binary column — Catalyst prunes
    ``payload`` out of the parquet scan entirely (verify with .explain: ReadSchema
    excludes it)."""
    return media.select(
        "media_id", "media_type", "declared_w", "declared_h"
    ).withColumn("declared_pixels", F.col("declared_w") * F.col("declared_h"))


#: audio header: magic 'FAUD' + uint32 sample_rate + uint32 n_samples + uint8 channels
FAKE_AUDIO_HEADER = struct.Struct(">4sIIB")

AUDIO_SCHEMA = "media_id bigint, payload binary"

AUDIO_FEATURE_SCHEMA = (
    "media_id bigint, sample_rate int, n_samples int, duration_s double, "
    "mean_amp double, zero_crossings bigint"
)


def encode_fake_audio(media_id: int, sample_rate: int, n_samples: int) -> bytes:
    """Deterministic fake PCM clip: header + big-endian int16 samples
    ``s_i = (media_id*37 + i*11) % 201 - 100`` (stands in for WAV/FLAC bytes —
    closed-form, so every decoded feature is SQL-reproducible)."""
    import numpy as np  # noqa: PLC0415

    i = np.arange(n_samples, dtype=np.int64)
    s = ((media_id * 37 + i * 11) % 201 - 100).astype(">i2")
    return FAKE_AUDIO_HEADER.pack(b"FAUD", sample_rate, n_samples, 1) + s.tobytes()


def synthesize_audio_payloads(media: DataFrame) -> DataFrame:
    """Attach deterministic FAUD payloads Arrow-batch-wise (columns required:
    media_id, sample_rate, n_samples)."""
    import pandas as pd  # noqa: PLC0415

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [
                        encode_fake_audio(int(m), int(sr), int(n))
                        for m, sr, n in zip(
                            pdf["media_id"], pdf["sample_rate"], pdf["n_samples"]
                        )
                    ],
                }
            )

    return media.mapInPandas(gen, AUDIO_SCHEMA)


def _decode_audio(payload: bytes) -> tuple[int, int, int, bytes]:
    """STUB decode — replace with soundfile/ffmpeg in production. Raises on a
    foreign format exactly like a real decoder would."""
    if len(payload) < FAKE_AUDIO_HEADER.size or payload[:4] != b"FAUD":
        raise NotImplementedError(
            "real audio codecs are not available in this environment; "
            "payload is not in the deterministic FAUD test format"
        )
    _, sr, n, c = FAKE_AUDIO_HEADER.unpack(payload[: FAKE_AUDIO_HEADER.size])
    return sr, n, c, payload[FAKE_AUDIO_HEADER.size :]


def extract_audio_features(media: DataFrame) -> DataFrame:
    """binary payload → (rate, length, duration, mean amplitude, zero-crossing
    count) via Arrow-batched mapInPandas. All arithmetic is exact int64 sums +
    one division, so every emitted double is bit-identical to the SQL oracle's;
    zero crossings are strict sign flips (``s_i · s_{i+1} < 0`` — a zero sample
    neither starts nor ends a crossing)."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    def decode_batch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows: dict[str, list] = {
                k: []
                for k in (
                    "media_id",
                    "sample_rate",
                    "n_samples",
                    "duration_s",
                    "mean_amp",
                    "zero_crossings",
                )
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                sr, n, _c, body = _decode_audio(bytes(payload))
                s = np.frombuffer(body, dtype=">i2").astype(np.int64)
                rows["media_id"].append(mid)
                rows["sample_rate"].append(sr)
                rows["n_samples"].append(n)
                rows["duration_s"].append(float(n) / sr if sr else 0.0)
                rows["mean_amp"].append(float(s.sum()) / len(s) if len(s) else 0.0)
                rows["zero_crossings"].append(
                    int(((s[:-1] * s[1:]) < 0).sum()) if len(s) > 1 else 0
                )
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(
        decode_batch, AUDIO_FEATURE_SCHEMA
    )
