"""Multimodal columns: image/audio/video as opaque ``binary`` columns with typed
metadata, processed by Arrow-batched pandas functions over ``mapInPandas``.

The Spark-side plumbing is real and tested — schema contracts, partition sizing,
Arrow batch shapes, deterministic outputs. Each decoder is a format CHAIN:

- a deterministic synthetic format (FIMG/FVID/FAUD) whose closed-form pixels/
  samples let SQL oracles hash-check the decoded output end-to-end;
- a real, dependency-free format parsed with the stdlib (binary PPM images,
  RIFF/WAV audio via ``wave``, YUV4MPEG2 video) — exercised by tests in THIS
  container;
- an optional library binding (Pillow / soundfile / PyAV), feature-detected at
  call time, for JPEG/PNG/FLAC/MP4 in deployments that install them.

An undecodable payload raises, exactly like a real decoder would — no Spark
code changes between backends.

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
    over one batch at a time).

    The metadata frame is SPREAD (round-robin repartition to the session's
    parallelism, the ``char_shingles`` explode-amplification guard) before
    the Python stage: a small-file metadata scan is ONE partition, which
    serializes every downstream Python pass — synthesis AND the decode that
    follows it — on a single task; the spread's exchange carries a few ints
    per row, negligible next to the per-row codec work it parallelizes."""
    import pandas as pd  # noqa: PLC0415

    from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import _spread

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                encode_fake_image(int(m), int(w), int(h))
                for m, w, h in zip(pdf["media_id"], pdf["declared_w"], pdf["declared_h"])
            ]
            yield pdf[["media_id", "payload", "media_type", "declared_w", "declared_h"]]

    return _spread(media).mapInPandas(gen, MEDIA_SCHEMA)


def _decode_ppm(payload: bytes) -> tuple[int, int, int, bytes]:
    """Binary PPM (``P6``) decode, pure stdlib: header tokens w, h, maxval
    (``#`` comments allowed), then w*h*3 raw RGB bytes. 16-bit PPMs
    (maxval > 255) and truncated bodies raise — a real decoder never returns
    silently-wrong pixels."""
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    w, h, maxval = tokens
    if maxval > 255:
        raise NotImplementedError(
            f"16-bit PPM (maxval={maxval}) not supported by the stdlib decoder; "
            "install Pillow for 2-byte-per-sample images"
        )
    body = payload[pos + 1 : pos + 1 + w * h * 3]
    if len(body) != w * h * 3:
        raise ValueError(
            f"truncated PPM body: expected {w * h * 3} bytes, got {len(body)}"
        )
    return w, h, 3, body


#: PNG 8-byte signature
_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: color type → samples per pixel (type 3 = palette, expanded to RGB)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> bytearray:
    """Reverse PNG scanline filtering (types 0–4, RFC 2083 §6). Sequential by
    construction — recon[x] depends on recon[x-bpp] and the prior row — so this
    is a per-byte loop; fine for the decode path (a deployment that needs
    C-speed PNG installs Pillow and takes the next link in the chain)."""
    out = bytearray(h * stride)
    prev = bytearray(stride)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"invalid PNG filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return out


def _decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """PNG decode, pure stdlib (zlib): chunk walk → IHDR dims → concatenated
    IDAT inflate → scanline defilter → (palette-expanded) pixels. Supports
    bit depth 8, color types gray/RGB/palette/gray+alpha/RGBA, non-interlaced
    — the shapes a data pipeline actually stores. 16-bit and Adam7 raise
    toward the Pillow link of the chain rather than emitting wrong pixels."""
    import zlib  # noqa: PLC0415

    pos = len(_PNG_SIG)
    w = h = depth = ctype = interlace = None
    idat: list[bytes] = []
    plte = b""
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + body + CRC
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif tag == b"PLTE":
            plte = body
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("malformed PNG: missing IHDR or IDAT")
    if depth != 8 or interlace != 0 or ctype not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG bit depth {depth} / color type {ctype} / interlace {interlace} "
            "not supported by the stdlib decoder; install Pillow"
        )
    c = _PNG_CHANNELS[ctype]
    stride = w * c
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"truncated PNG pixel data: expected {h * (stride + 1)} filtered "
            f"bytes, got {len(raw)}"
        )
    pixels = _png_unfilter(raw, h, stride, c)
    if ctype == 3:  # palette → RGB
        if not plte:
            raise ValueError("palette PNG without PLTE chunk")
        n_entries = len(plte) // 3
        bad = max(pixels, default=0)
        if bad >= n_entries:
            # an out-of-range index would slice past PLTE and silently SHRINK
            # the RGB buffer (corrupt stats downstream) — fail loudly instead
            raise ValueError(
                f"palette index {bad} out of range: PLTE has {n_entries} entries"
            )
        pixels = bytearray(
            b for i in pixels for b in plte[3 * i : 3 * i + 3]
        )
        c = 3
    return w, h, c, bytes(pixels)


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib  # noqa: PLC0415

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body))
    )


def encode_png(
    w: int, h: int, channels: int, pixels: bytes, filter_cycle: bool = True
) -> bytes:
    """Minimal REAL PNG encoder, pure stdlib: 8-bit gray/gray+alpha/RGB/RGBA,
    non-interlaced, scanlines forward-filtered (cycling None/Sub/Up/Average/
    Paeth per row when ``filter_cycle`` — so a decode round-trip exercises
    every defilter branch, not just type 0). Output opens in any PNG viewer;
    used both by tests and as the thumbnail-sink shape a curation pipeline
    writes back to parquet."""
    import zlib  # noqa: PLC0415

    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = w * channels
    if len(pixels) != h * stride:
        raise ValueError(f"expected {h * stride} pixel bytes, got {len(pixels)}")
    bpp = channels
    filtered = bytearray()
    prev = bytes(stride)
    for y in range(h):
        row = pixels[y * stride : (y + 1) * stride]
        ftype = (y % 5) if filter_cycle else 0
        filtered.append(ftype)
        if ftype == 0:
            filtered += row
        elif ftype == 1:  # Sub
            filtered += bytes(
                (row[x] - (row[x - bpp] if x >= bpp else 0)) & 0xFF
                for x in range(stride)
            )
        elif ftype == 2:  # Up
            filtered += bytes((row[x] - prev[x]) & 0xFF for x in range(stride))
        elif ftype == 3:  # Average
            filtered += bytes(
                (row[x] - (((row[x - bpp] if x >= bpp else 0) + prev[x]) >> 1)) & 0xFF
                for x in range(stride)
            )
        else:  # Paeth
            out = bytearray()
            for x in range(stride):
                a = row[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out.append((row[x] - pred) & 0xFF)
            filtered += out
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(filtered)))
        + _png_chunk(b"IEND", b"")
    )


def synthesize_png_payloads(media: DataFrame) -> DataFrame:
    """Attach REAL PNG payloads (same closed-form pixels as FIMG, so the same
    SQL oracle hash-checks the decoded output) Arrow-batch-wise. The cycling
    row filters mean the driver-checked decode covers every PNG defilter
    branch end-to-end.

    If the input carries a ``content_id`` column, pixels derive from it
    instead of ``media_id`` (several media rows can share identical pixel
    content), and the row-filter strategy toggles on media_id parity — so two
    copies of the same content have byte-DIFFERENT payloads that decode to
    identical pixels, the setup content-grain dedup must see through.

    Spread before the Python stage for the same reason as
    ``synthesize_payloads``: the real-codec encode (zlib + per-row filters)
    is the most Python-expensive synthesis in the module, and a one-partition
    metadata scan would run it — and the decode after it — on one task."""
    import pandas as pd  # noqa: PLC0415

    from airflow_courier_payout_ledger_pipeline_spark.operators.dedup import _spread

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            pdf = pdf.copy()
            has_content = "content_id" in pdf.columns
            content = pdf["content_id"] if has_content else pdf["media_id"]
            pdf["payload"] = [
                encode_png(
                    int(w),
                    int(h),
                    3,
                    bytes(
                        ((int(c) * 31 + i * 7) % 251)
                        for i in range(int(w) * int(h) * 3)
                    ),
                    filter_cycle=(bool(int(m) % 2) if has_content else True),
                )
                for m, c, w, h in zip(
                    pdf["media_id"], content, pdf["declared_w"], pdf["declared_h"]
                )
            ]
            yield pdf[["media_id", "payload", "media_type", "declared_w", "declared_h"]]

    return _spread(media).mapInPandas(gen, MEDIA_SCHEMA)


def _decode(payload: bytes) -> tuple[int, int, int, bytes]:
    """Image decode chain: the deterministic FIMG test format, then binary PPM
    and PNG (real formats, stdlib-parsed — PNG's inflate is stdlib zlib), then
    Pillow if installed (JPEG/WebP/16-bit/interlaced PNG/...). Raises on an
    undecodable format exactly like a real decoder would — feeding e.g. WebP
    without Pillow present is a deployment gap, not silent garbage."""
    if payload[:4] == b"FIMG" and len(payload) >= FAKE_HEADER.size:
        _, w, h, c = FAKE_HEADER.unpack(payload[: FAKE_HEADER.size])
        return w, h, c, payload[FAKE_HEADER.size :]
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        try:
            return _decode_png(payload)
        except NotImplementedError:
            pass  # 16-bit / interlaced: fall through to the Pillow link
    try:  # optional real-codec binding; the container ships without Pillow
        import io  # noqa: PLC0415

        from PIL import Image  # noqa: PLC0415

        img = Image.open(io.BytesIO(payload))
        return img.width, img.height, len(img.getbands()), img.tobytes()
    except ImportError:
        raise NotImplementedError(
            "payload is not FIMG / PPM / stdlib-decodable PNG and Pillow is "
            "not installed; install Pillow to decode JPEG/WebP/16-bit or "
            "interlaced PNG payloads"
        ) from None


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


RESIZED_SCHEMA = (
    "media_id bigint, src_w int, src_h int, width int, height int, payload binary"
)


def resize_images(
    media: DataFrame, target_w: int, target_h: int, batch_rows: int = 256
) -> DataFrame:
    """Nearest-neighbor resize of a binary image column, Arrow-batched: decode
    (any format ``_decode`` accepts), index-map with exact integer floor
    arithmetic — source pixel for target (tx, ty) is
    ``(tx*src_w DIV target_w, ty*src_h DIV target_h)`` — and re-encode as real
    PNG (``encode_png``), so the output column is itself a decodable image
    corpus (the thumbnail/normalize stage of a multimodal training pipeline,
    where a downstream embed/filter stage wants uniform dims).

    Determinism note: floor-index nearest neighbor over integer grids is
    bit-exact and engine-replayable (no float interpolation kernel), which is
    what lets the registered query hash-match a SQL oracle END-TO-END through
    decode -> resize -> PNG encode -> PNG decode. The resize itself is pure
    numpy fancy-indexing over one Arrow batch at a time — no row-at-a-time
    Python, nothing leaves the executor."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    if target_w < 1 or target_h < 1:
        raise ValueError(f"target dims must be >= 1, got {target_w}x{target_h}")

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "src_w", "src_h", "width", "height", "payload")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, c, body = _decode(bytes(payload))
                arr = np.frombuffer(body, dtype=np.uint8).reshape(h, w, c)
                xs = (np.arange(target_w, dtype=np.int64) * w) // target_w
                ys = (np.arange(target_h, dtype=np.int64) * h) // target_h
                resized = arr[ys][:, xs]
                out["media_id"].append(mid)
                out["src_w"].append(w)
                out["src_h"].append(h)
                out["width"].append(target_w)
                out["height"].append(target_h)
                out["payload"].append(
                    encode_png(target_w, target_h, c, resized.tobytes())
                )
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(gen, RESIZED_SCHEMA)


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


def _decode_y4m(payload: bytes) -> tuple[int, int, int, bytes]:
    """YUV4MPEG2 (``.y4m``) demux, pure stdlib: text header with W/H/C tags,
    then ``FRAME\\n`` + raw planar frames. Returns concatenated luma (Y)
    planes — the grayscale contract the frame sampler consumes."""
    nl = payload.index(b"\n")
    w = h = 0
    chroma = b"420"
    for tag in payload[:nl].split(b" ")[1:]:
        if tag[:1] == b"W":
            w = int(tag[1:])
        elif tag[:1] == b"H":
            h = int(tag[1:])
        elif tag[:1] == b"C":
            chroma = tag[1:]
    luma = w * h
    frame_bytes = {
        b"420": luma * 3 // 2, b"420jpeg": luma * 3 // 2, b"420mpeg2": luma * 3 // 2,
        b"422": luma * 2, b"444": luma * 3, b"mono": luma,
    }[chroma]
    pos, planes = nl + 1, []
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)  # "FRAME" + optional params
        planes.append(payload[fnl + 1 : fnl + 1 + luma])
        pos = fnl + 1 + frame_bytes
    return len(planes), w, h, b"".join(planes)


def _decode_video(payload: bytes) -> tuple[int, int, int, bytes]:
    """Video demux chain: the deterministic FVID test format, then YUV4MPEG2
    (a real uncompressed container, stdlib-parsed), then PyAV if installed
    (MP4/MKV/...). Raises on an undecodable container like a real demuxer
    would."""
    if payload[:4] == b"FVID" and len(payload) >= FAKE_VIDEO_HEADER.size:
        _, n_frames, w, h = FAKE_VIDEO_HEADER.unpack(payload[: FAKE_VIDEO_HEADER.size])
        return n_frames, w, h, payload[FAKE_VIDEO_HEADER.size :]
    if payload[:9] == b"YUV4MPEG2":
        return _decode_y4m(payload)
    try:  # optional real-codec binding; the container ships without PyAV
        import io  # noqa: PLC0415

        import av  # noqa: PLC0415

        frames = []
        with av.open(io.BytesIO(payload)) as container:
            for frame in container.decode(video=0):
                # to_ndarray strips per-row stride padding (planes[0] would
                # include linesize alignment bytes and break the w*h contract)
                frames.append(frame.to_ndarray(format="gray8").tobytes())
        if not frames:
            raise ValueError("container has no decodable video frames")
        return len(frames), frame.width, frame.height, b"".join(frames)
    except ImportError:
        raise NotImplementedError(
            "payload is neither FVID nor YUV4MPEG2 and PyAV is not installed; "
            "install av to demux MP4/MKV payloads"
        ) from None


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


def _decode_audio(payload: bytes):
    """Audio decode chain → ``(sample_rate, n_samples, channels, samples)``
    with ``samples`` an int64 ndarray (first channel): the deterministic FAUD
    test format, then RIFF/WAV via the stdlib ``wave`` module (a real codec
    path with zero dependencies), then soundfile if installed (FLAC/OGG/...).
    Raises on an undecodable format exactly like a real decoder would."""
    import numpy as np  # noqa: PLC0415

    if payload[:4] == b"FAUD" and len(payload) >= FAKE_AUDIO_HEADER.size:
        _, sr, n, c = FAKE_AUDIO_HEADER.unpack(payload[: FAKE_AUDIO_HEADER.size])
        s = np.frombuffer(payload[FAKE_AUDIO_HEADER.size :], dtype=">i2").astype(np.int64)
        return sr, n, c, s[::c] if c > 1 else s  # first channel, like every branch
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        import io  # noqa: PLC0415
        import wave  # noqa: PLC0415

        with wave.open(io.BytesIO(payload), "rb") as f:
            sr, c, n = f.getframerate(), f.getnchannels(), f.getnframes()
            width = f.getsampwidth()
            raw = f.readframes(n)
        if width == 1:
            # 8-bit WAV is UNSIGNED (0..255, midpoint 128) per the RIFF spec
            s = np.frombuffer(raw, dtype=np.uint8).astype(np.int64) - 128
        else:
            s = np.frombuffer(raw, dtype={2: "<i2", 4: "<i4"}[width]).astype(np.int64)
        return sr, n, c, s[::c]  # first channel
    try:  # optional real-codec binding; the container ships without soundfile
        import io  # noqa: PLC0415

        import soundfile as sf  # noqa: PLC0415

        data, sr = sf.read(io.BytesIO(payload), dtype="int16", always_2d=True)
        return sr, data.shape[0], data.shape[1], data[:, 0].astype(np.int64)
    except ImportError:
        raise NotImplementedError(
            "payload is neither FAUD nor RIFF/WAV and soundfile is not "
            "installed; install soundfile to decode FLAC/OGG payloads"
        ) from None


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
                sr, n, _c, s = _decode_audio(bytes(payload))
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


AUDIO_RESAMPLED_SCHEMA = (
    "media_id bigint, src_rate int, sample_rate int, n_samples int, payload binary"
)


def resample_audio(media: DataFrame, target_rate: int) -> DataFrame:
    """Nearest-sample rate conversion of a binary audio column, Arrow-batched:
    decode (any format ``_decode_audio`` accepts), index-map with exact
    integer floor arithmetic — output sample j reads source sample
    ``(j*src_rate) DIV target_rate``, output length is
    ``(n*target_rate) DIV src_rate`` — and re-encode as REAL RIFF/WAV (16-bit
    mono, stdlib ``wave``), so the output column is itself a decodable audio
    corpus at a uniform rate (the normalize stage before a speech/audio
    featurizer; the audio twin of ``resize_images``).

    Floor-index nearest neighbor is bit-exact and engine-replayable — no
    windowed-sinc kernel, no float phase accumulator — which lets the
    registered query hash-match a SQL oracle through decode -> resample ->
    WAV encode -> WAV decode. Samples outside int16 (possible via the 32-bit
    WAV input branch) are clipped, as a 16-bit writer must."""
    import io  # noqa: PLC0415
    import wave as wave_mod  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    if target_rate < 1:
        raise ValueError(f"target_rate must be >= 1, got {target_rate}")

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "src_rate", "sample_rate", "n_samples", "payload")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                sr, n, _c, s = _decode_audio(bytes(payload))
                m = (n * target_rate) // sr if sr else 0
                idx = (np.arange(m, dtype=np.int64) * sr) // target_rate
                res = np.clip(s[idx], -32768, 32767).astype("<i2")
                buf = io.BytesIO()
                with wave_mod.open(buf, "wb") as f:
                    f.setnchannels(1)
                    f.setsampwidth(2)
                    f.setframerate(target_rate)
                    f.writeframes(res.tobytes())
                out["media_id"].append(mid)
                out["src_rate"].append(sr)
                out["sample_rate"].append(target_rate)
                out["n_samples"].append(m)
                out["payload"].append(buf.getvalue())
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(gen, AUDIO_RESAMPLED_SCHEMA)


DHASH_SCHEMA = "media_id bigint, dhash bigint"


def dhash_images(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Perceptual difference-hash (dHash) of a decodable image column: decode,
    integer grayscale ``(r+g+b) DIV 3`` per pixel, then one bit per
    horizontally-adjacent pair — ``bit(ty,tx) = gray[ty,tx] > gray[ty,tx+1]``
    — packed little-endian into an int64. Callers feed a UNIFORM small grid
    (the ``resize_images`` output; 8x8 -> 7x8 = 56 bits here) so the hash is
    resolution-invariant: the same picture at different source sizes lands on
    the same (or Hamming-close) hash, which raw byte/content hashing
    (``image_content_dedup``) cannot do. 56 bits, not the textbook 9x8 = 64:
    bit 63 would need the int64 sign bit, and ``1 << 63`` overflows BIGINT in
    the SQL engines the oracle replays in — 56 bits keeps the pack exact and
    portable with negligible discrimination loss.

    Scale shape: pure Arrow-batched ``mapInPandas`` (decode + numpy compare,
    nothing row-at-a-time, nothing leaves the executor); downstream grouping
    by hash is one exchange carrying (id, int64) rows. Gray/compare are exact
    integer ops on the deterministic decode, so the whole chain is
    SQL-replayable end-to-end."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, c, body = _decode(bytes(payload))
                arr = np.frombuffer(body, dtype=np.uint8).reshape(h, w, c)
                gray = arr.astype(np.int64).sum(axis=2) // c
                bits = (gray[:, :-1] > gray[:, 1:]).astype(np.int64)
                pos = np.arange(bits.size, dtype=np.int64)
                ids.append(mid)
                hashes.append(int((bits.ravel() << pos).sum()))
            yield pd.DataFrame({"media_id": ids, "dhash": hashes})

    return media.select("media_id", "payload").mapInPandas(gen, DHASH_SCHEMA)


def encode_fake_image_virtual(
    seed: int, w: int, h: int, grid: int = 16, channels: int = 3
) -> bytes:
    """Deterministic COORDINATE-NORMALIZED fake image: pixel (x, y, ch) samples
    a virtual ``grid x grid`` picture at (x*grid DIV w, y*grid DIV h), so two
    renders of the same ``seed`` at DIFFERENT (w, h) are resamplings of the
    same underlying picture — the honest test fixture for resolution-invariant
    perceptual hashing (``encode_fake_image``'s raw index formula makes every
    (w, h) a different picture, which can only demonstrate exact-content
    dedup).

    Content is PIECEWISE-CONSTANT over 4x4 blocks of the virtual grid with a
    NONLINEAR per-block value — ``((seed*131 + block)^2 * 31 + ch*11) % 251``
    — tuned for what perceptual hashing needs from a fixture: blocks are
    random across seeds (a linear ramp made every dHash near-constant —
    11,516 candidate pairs / 32 true at sf0.01), but constant within a block,
    so the +/-1 sampling jitter between two renders' resize grids flips bits
    only at block boundaries (fully random per-CELL values made same-seed
    renders hash-independent — real images survive dHash precisely because
    they are smooth at the hash grid's scale, and the fixture must be
    too)."""
    body = bytearray()
    for y in range(h):
        vy = (y * grid) // h
        for x in range(w):
            vx = (x * grid) // w
            base = seed * 131 + (vy // 4) * (grid // 4) + (vx // 4)
            for ch in range(channels):
                body.append((base * base * 31 + ch * 11) % 251)
    return FAKE_HEADER.pack(b"FIMG", w, h, channels) + bytes(body)


def synthesize_virtual_payloads(media: DataFrame, grid: int = 16) -> DataFrame:
    """Attach coordinate-normalized FIMG payloads (see
    :func:`encode_fake_image_virtual`): rows carry (media_id, seed,
    declared_w, declared_h); same seed at different dims = same picture,
    different resolution. Arrow-batched like every other synth."""
    import pandas as pd  # noqa: PLC0415

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [
                        encode_fake_image_virtual(int(s), int(w), int(h), grid)
                        for s, w, h in zip(
                            pdf["seed"], pdf["declared_w"], pdf["declared_h"]
                        )
                    ],
                }
            )

    return media.mapInPandas(gen, "media_id bigint, payload binary")
