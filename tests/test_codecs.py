"""Unit tests for the dependency-free BMP/WAV codecs (functions/codecs.py)."""

from __future__ import annotations

import numpy as np
import pytest

from sm_etl_cloud_run_spark.functions.codecs import (
    UnsupportedMediaError,
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav_pcm16,
    media_feature_decoder,
    resize_bmp,
)


def test_bmp_roundtrip_odd_width_padding():
    # width 3 → row 9 bytes, padded to 12: exercises the 4-byte stride
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    assert (decode_bmp(encode_bmp(px)) == px).all()


def test_bmp_roundtrip_aligned_width():
    px = np.arange(4 * 8 * 3, dtype=np.uint8).reshape(4, 8, 3)
    out = encode_bmp(px)
    assert out[:2] == b"BM" and len(out) == 54 + 4 * 24
    assert (decode_bmp(out) == px).all()


def test_bmp_rejects_garbage_and_truncation():
    with pytest.raises(UnsupportedMediaError):
        decode_bmp(b"NOTABMP" * 10)
    good = encode_bmp(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(UnsupportedMediaError):
        decode_bmp(good[:-5])


def test_resize_bmp_downsample_picks_nearest():
    px = np.zeros((4, 4, 3), np.uint8)
    px[2:, 2:] = 200  # bottom-right quadrant
    small = decode_bmp(resize_bmp(encode_bmp(px), 2, 2))
    assert small.shape == (2, 2, 3)
    assert (small[1, 1] == 200).all() and (small[0, 0] == 0).all()


def test_wav_roundtrip():
    samples = (np.sin(np.linspace(0, 20, 1000)) * 12000).astype(np.int16)
    out, rate, channels = decode_wav(encode_wav_pcm16(samples, 44100))
    assert rate == 44100 and channels == 1
    assert (out == samples).all()


def test_wav_rejects_non_pcm16():
    payload = bytearray(encode_wav_pcm16(np.zeros(10, np.int16), 8000))
    payload[20] = 3  # audio_format = IEEE float
    with pytest.raises(UnsupportedMediaError):
        decode_wav(bytes(payload))
    with pytest.raises(UnsupportedMediaError):
        decode_wav(b"RIFFxxxxWAVE")  # no chunks


def test_media_feature_decoder_dispatch():
    px = np.empty((2, 2, 3), np.uint8)
    px[:, :] = (9, 18, 27)
    f_img = media_feature_decoder(encode_bmp(px))
    assert f_img == [1.0, 2.0, 2.0, 9.0, 18.0, 27.0, 4.0, 0.0]
    wav = np.full(80, 300, np.int16)
    wav[1::2] = -300
    f_wav = media_feature_decoder(encode_wav_pcm16(wav, 8000))
    assert f_wav[:3] == [2.0, 8000.0, 1.0]
    assert f_wav[3] == 10.0 and f_wav[4] == 300.0 and f_wav[5] == 300.0
    with pytest.raises(UnsupportedMediaError):
        media_feature_decoder(b"\x89PNG....")
