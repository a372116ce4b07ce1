"""Multimodal plumbing tests: schema, batching, stubbed decode, frame plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sm_etl_cloud_run_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    deterministic_fake_decoder,
    extract_features,
    sample_frames,
)


def _media(spark):
    rows = [
        (1, "image", b"imgbytes", ("image/png", 64, 64, None)),
        (2, "video", b"vidbytes", ("video/mp4", 320, 240, 3500)),
        (3, "audio", None, ("audio/wav", None, None, 2000)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_fake_decoder(spark):
    out = extract_features(_media(spark), decode_fn=deterministic_fake_decoder).collect()
    rows = {r["media_id"]: r for r in out}
    assert len(rows[1]["feature"]) == 8
    assert rows[1]["n_bytes"] == 8 and rows[3]["n_bytes"] == 0
    # deterministic: same payload → same features
    again = {r["media_id"]: r for r in extract_features(_media(spark), decode_fn=deterministic_fake_decoder).collect()}
    assert rows[1]["feature"] == again[1]["feature"]


def test_extract_features_default_rejects_unknown_format(spark):
    # _media payloads are arbitrary bytes, not BMP/WAV — the real default
    # codec must fail loudly, not emit garbage features
    with pytest.raises(Exception, match="unrecognized media payload|UnsupportedMedia"):
        extract_features(_media(spark), decode_fn=None).collect()


def test_extract_features_real_codecs(spark):
    import numpy as np

    from sm_etl_cloud_run_spark.functions.codecs import encode_bmp, encode_wav_pcm16

    px = np.empty((4, 6, 3), np.uint8)
    px[:, :] = (10, 20, 30)
    wav = np.full(8000, 5000, np.int16)
    wav[1::2] = -5000
    media = spark.createDataFrame(
        [(1, "image", bytearray(encode_bmp(px))), (2, "audio", bytearray(encode_wav_pcm16(wav, 8000)))],
        "media_id long, kind string, payload binary",
    )
    rows = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert rows[1][:3] == [1.0, 6.0, 4.0] and rows[1][3:6] == [10.0, 20.0, 30.0]
    assert rows[2][0] == 2.0 and rows[2][1] == 8000.0
    assert rows[2][3] == 1000.0  # duration_ms
    assert rows[2][4] == 5000.0  # rms of a full-scale square wave = amplitude


def test_sample_frames_plan(spark):
    frames = sample_frames(_media(spark), every_ms=1000).collect()
    # only the video row explodes; 3500ms at 1s cadence → ts 0,1000,2000,3000
    assert [r["media_id"] for r in frames] == [2, 2, 2, 2]
    assert [r["frame_ts_ms"] for r in frames] == [0, 1000, 2000, 3000]


def test_resize_images_fake_resizer(spark):
    from sm_etl_cloud_run_spark.operators.multimodal import (
        deterministic_fake_resizer,
        resize_images,
    )

    out = resize_images(
        _media(spark), target=(8, 4), resize_fn=deterministic_fake_resizer
    ).collect()
    assert [r["media_id"] for r in out] == [1]          # only image rows reach the kernel
    r = out[0]
    assert r["width"] == 8 and r["height"] == 4
    assert r["n_bytes"] == 32 and len(r["payload"]) == 32
    # content-derived: same input → same resized bytes
    again = resize_images(
        _media(spark), target=(8, 4), resize_fn=deterministic_fake_resizer
    ).collect()[0]
    assert bytes(again["payload"]) == bytes(r["payload"])


def test_resize_images_default_rejects_unknown_format(spark):
    from sm_etl_cloud_run_spark.operators.multimodal import resize_images

    with pytest.raises(Exception) as ei:
        resize_images(_media(spark)).collect()  # payloads are not BMPs
    assert "BMP" in str(ei.value) or "resize" in str(ei.value)


def test_resize_images_real_bmp(spark):
    import numpy as np

    from sm_etl_cloud_run_spark.functions.codecs import decode_bmp, encode_bmp
    from sm_etl_cloud_run_spark.operators.multimodal import resize_images

    # 2×2 quadrant image → upscale 4×4 must replicate each quadrant 2×2
    px = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 0]]], np.uint8
    )
    media = spark.createDataFrame(
        [(7, "image", bytearray(encode_bmp(px)))], "media_id long, kind string, payload binary"
    )
    out = resize_images(media, target=(4, 4)).collect()[0]
    resized = decode_bmp(bytes(out["payload"]))
    assert resized.shape == (4, 4, 3)
    assert (resized[:2, :2] == [255, 0, 0]).all()
    assert (resized[2:, 2:] == [255, 255, 0]).all()


def test_extract_features_audio_spectral_kernel(spark):
    """The DSP kernel plugs into the same mapInPandas plumbing: one
    WAV tone per row, feature = [rms, zcr, centroid, rolloff, 8 bands]."""
    import numpy as np

    from sm_etl_cloud_run_spark.functions.codecs import (
        audio_spectral_features,
        encode_wav_pcm16,
    )
    from sm_etl_cloud_run_spark.operators.multimodal import extract_features

    rate = 16000
    rows = []
    for media_id, f0 in ((1, 1000.0), (2, 3000.0)):
        t = np.arange(rate // 2) / rate
        tone = (20000 * np.sin(2 * np.pi * f0 * t)).astype(np.int16)
        rows.append((media_id, "audio", bytearray(encode_wav_pcm16(tone, rate))))
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    out = {
        r["media_id"]: list(r["feature"])
        for r in extract_features(media, decode_fn=audio_spectral_features).collect()
    }
    assert len(out) == 2 and all(len(v) == 12 for v in out.values())
    # centroid (feature[2]) tracks the tone; band fraction peaks at f0's slice
    assert abs(out[1][2] - 1000.0) < 25 and abs(out[2][2] - 3000.0) < 25
    assert out[1][4 + 1] > 0.99 and out[2][4 + 3] > 0.99
