"""Multimodal plumbing: decode roundtrip, determinism, metadata-scan pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_courier_payout_ledger_pipeline_spark.operators.multimodal import (
    encode_fake_image,
    extract_image_features,
    media_metadata_only,
)


@pytest.fixture()
def media(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (i, bytearray(encode_fake_image(i, 4 + i % 3, 4, 3)), "image/fimg", 4 + i % 3, 4)
            for i in range(20)
        ],
        "media_id long, payload binary, media_type string, declared_w int, declared_h int",
    )
    path = str(tmp_path / "media")
    df.write.parquet(path)
    return spark.read.parquet(path)


def test_decode_roundtrip_and_determinism(spark, media):
    feats = {r.media_id: r for r in extract_image_features(media).collect()}
    assert len(feats) == 20
    for mid, r in feats.items():
        assert r.n_bytes == r.width * r.height * r.channels
        assert len(r.feature) == 8
    again = {r.media_id: r for r in extract_image_features(media).collect()}
    assert all(feats[m].feature == again[m].feature for m in feats)


def test_metadata_query_prunes_binary_column(spark, media):
    meta = media_metadata_only(media)
    plan = meta._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    read_schema_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema_lines and all("payload" not in l for l in read_schema_lines)
    assert meta.count() == 20


def test_foreign_payload_raises_like_real_codec(spark):
    bad = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG\r\n-not-fimg-data"))], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="real image codecs|NotImplementedError"):
        extract_image_features(bad).collect()


def test_video_frame_sampling_exact(spark):
    from airflow_courier_payout_ledger_pipeline_spark.operators.multimodal import (
        sample_frames,
        synthesize_video_payloads,
    )

    meta = spark.createDataFrame(
        [(7, 5, 4, 3), (2, 1, 2, 2)],  # 5-frame and single-frame videos
        "media_id bigint, n_frames int, w int, h int",
    )
    rows = sample_frames(synthesize_video_payloads(meta), every_k=2).collect()
    got = {(r.media_id, r.frame_idx): r for r in rows}
    # media 7: frames 0,2,4 sampled; frame f mean == (7*31 + f*7) % 256 exactly
    assert sorted(k for k in got if k[0] == 7) == [(7, 0), (7, 2), (7, 4)]
    for f in (0, 2, 4):
        r = got[(7, f)]
        assert r.frame_mean == (7 * 31 + f * 7) % 256
        assert (r.frame_w, r.frame_h) == (4, 3)
    # media 2: single frame → exactly frame 0
    assert sorted(k for k in got if k[0] == 2) == [(2, 0)]
    assert got[(2, 0)].frame_mean == (2 * 31) % 256


def test_video_foreign_payload_raises(spark):
    from airflow_courier_payout_ledger_pipeline_spark.operators.multimodal import (
        sample_frames,
    )

    bad = spark.createDataFrame(
        [(1, bytearray(b"RIFFnot-a-fake-video"))], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="real video codecs|NotImplementedError"):
        sample_frames(bad).collect()


def test_audio_features_exact(spark):
    from airflow_courier_payout_ledger_pipeline_spark.operators.multimodal import (
        extract_audio_features,
        synthesize_audio_payloads,
    )

    meta = spark.createDataFrame(
        [(3, 8000, 5), (9, 16000, 1)], "media_id bigint, sample_rate int, n_samples int"
    )
    rows = {
        r.media_id: r
        for r in extract_audio_features(synthesize_audio_payloads(meta)).collect()
    }
    # media 3, n=5: samples (3*37 + i*11) % 201 - 100 for i in 0..4
    s = [(3 * 37 + i * 11) % 201 - 100 for i in range(5)]
    r = rows[3]
    assert (r.sample_rate, r.n_samples) == (8000, 5)
    assert r.duration_s == 5 / 8000
    assert r.mean_amp == sum(s) / 5
    assert r.zero_crossings == sum(1 for a, b in zip(s, s[1:]) if a * b < 0)
    # single-sample clip: no pair to cross
    assert rows[9].zero_crossings == 0


def test_audio_foreign_payload_raises(spark):
    import pytest

    from airflow_courier_payout_ledger_pipeline_spark.operators.multimodal import (
        extract_audio_features,
    )

    bad = spark.createDataFrame(
        [(1, bytearray(b"RIFFWAVEnot-faud-data"))], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="real audio codecs|NotImplementedError"):
        extract_audio_features(bad).collect()


# ---- real-format codec chain (stdlib-parsed public formats, no deps) -------------


def test_image_features_decode_real_ppm(spark):
    """Binary PPM (P6) is a real public image format the chain decodes with no
    libraries: features must match the hand-computed pixel bytes."""
    import numpy as np

    from airflow_courier_payout_ledger_pipeline_spark.operators.multimodal import (
        extract_image_features,
    )

    w, h = 4, 2
    pixels = bytes(range(w * h * 3))
    ppm = b"P6\n# comment\n4 2\n255\n" + pixels
    df = spark.createDataFrame([(1, bytearray(ppm))], "media_id bigint, payload binary")
    [r] = extract_image_features(df).collect()
    assert (r.width, r.height, r.channels, r.n_bytes) == (4, 2, 3, w * h * 3)
    assert r.mean_byte == float(np.arange(w * h * 3).sum()) / (w * h * 3)


def test_audio_features_decode_real_wav(spark):
    """RIFF/WAV via the stdlib wave module — a genuine codec path that runs in
    this container; stereo payload, first channel analyzed."""
    import io
    import wave

    import numpy as np

    from airflow_courier_payout_ledger_pipeline_spark.operators.multimodal import (
        extract_audio_features,
    )

    sr, n = 8000, 100
    left = ((np.arange(n) * 13) % 101 - 50).astype("<i2")
    right = np.zeros(n, dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(2)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(np.column_stack([left, right]).tobytes())
    df = spark.createDataFrame(
        [(7, bytearray(buf.getvalue()))], "media_id bigint, payload binary"
    )
    [r] = extract_audio_features(df).collect()
    s = left.astype(np.int64)
    assert (r.sample_rate, r.n_samples) == (sr, n)
    assert r.duration_s == n / sr
    assert r.mean_amp == float(s.sum()) / n
    assert r.zero_crossings == int(((s[:-1] * s[1:]) < 0).sum())


def test_frame_sample_decode_real_y4m(spark):
    """YUV4MPEG2 — a real uncompressed video container, stdlib-demuxed: every
    2nd frame sampled, means computed over the luma plane."""
    from airflow_courier_payout_ledger_pipeline_spark.operators.multimodal import (
        sample_frames,
    )

    w, h = 4, 2
    luma = w * h
    frames = [bytes([v]) * luma + bytes(luma // 2) for v in (10, 20, 30)]  # C420
    y4m = b"YUV4MPEG2 W4 H2 F25:1 Ip A1:1 C420\n" + b"".join(
        b"FRAME\n" + f for f in frames
    )
    df = spark.createDataFrame([(3, bytearray(y4m))], "media_id bigint, payload binary")
    got = {
        r.frame_idx: (r.frame_w, r.frame_h, r.frame_mean)
        for r in sample_frames(df, every_k=2).collect()
    }
    assert got == {0: (4, 2, 10.0), 2: (4, 2, 30.0)}


def test_foreign_format_still_raises_without_optional_libs(spark):
    """A JPEG payload without Pillow installed must fail loudly (NotImplementedError
    surfaces through the Spark task), never emit garbage features. Skips if the
    deployment actually has Pillow."""
    import pytest

    try:
        import PIL  # noqa: F401

        pytest.skip("Pillow installed: foreign formats are decodable here")
    except ImportError:
        pass
    from airflow_courier_payout_ledger_pipeline_spark.operators.multimodal import (
        extract_image_features,
    )

    jpeg_ish = b"\xff\xd8\xff\xe0" + bytes(32)
    df = spark.createDataFrame([(1, bytearray(jpeg_ish))], "media_id bigint, payload binary")
    with pytest.raises(Exception, match="Pillow"):
        extract_image_features(df).collect()


def test_audio_8bit_wav_is_unsigned(spark):
    """8-bit WAV PCM is UNSIGNED (midpoint 128): silence (all 0x80) must
    decode to mean_amp 0 with no zero crossings — a signed read would report
    -128 silence and phantom crossings."""
    import io
    import wave

    from airflow_courier_payout_ledger_pipeline_spark.operators.multimodal import (
        extract_audio_features,
    )

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(1)
        f.setframerate(8000)
        f.writeframes(bytes([0x80]) * 64)
    df = spark.createDataFrame(
        [(9, bytearray(buf.getvalue()))], "media_id bigint, payload binary"
    )
    [r] = extract_audio_features(df).collect()
    assert r.mean_amp == 0.0 and r.zero_crossings == 0


def test_ppm_16bit_and_truncated_raise(spark):
    """Spec-valid-but-unsupported (maxval > 255) and truncated PPMs raise
    through the Spark task instead of emitting garbage features."""
    import pytest

    from airflow_courier_payout_ledger_pipeline_spark.operators.multimodal import (
        extract_image_features,
    )

    deep = b"P6\n2 2\n65535\n" + bytes(2 * 2 * 3 * 2)
    short = b"P6\n4 4\n255\n" + bytes(5)
    for payload, match in ((deep, "16-bit PPM"), (short, "truncated")):
        df = spark.createDataFrame(
            [(1, bytearray(payload))], "media_id bigint, payload binary"
        )
        with pytest.raises(Exception, match=match):
            extract_image_features(df).collect()
