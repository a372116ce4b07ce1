"""Dependency-free media codecs: 24-bit BMP and 16-bit PCM WAV.

Real decode for the multimodal layer (SURVEY §2 scale additions) built
from the public file formats alone — no PIL/librosa/ffmpeg, which this
container lacks. BMP (BITMAPFILEHEADER + BITMAPINFOHEADER, BI_RGB,
bottom-up padded rows) and RIFF/WAVE (fmt + data chunks, PCM int16)
cover one image and one audio codec end-to-end; compressed formats
(JPEG/PNG/MP3/video) still require external libraries and raise
`UnsupportedMediaError` with a clear message.

Encoders exist so pipelines (and tests) can synthesize valid payloads;
decoders return numpy arrays, and `media_feature_decoder` maps any
supported payload to a fixed 8-float feature vector for
`operators.multimodal.extract_features`.
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedMediaError(ValueError):
    """Payload is not a format the dependency-free codecs support."""


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed BI_RGB)
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB array → 24-bit BMP bytes (bottom-up rows,
    4-byte row padding, BGR byte order — the on-disk convention)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_bmp expects an (h, w, 3) RGB array")
    h, w, _ = arr.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    bgr = arr[::-1, :, ::-1]  # bottom-up, RGB→BGR
    body = b"".join(bgr[r].tobytes() + b"\x00" * pad for r in range(h))
    pixel_offset = 14 + 40
    file_size = pixel_offset + len(body)
    file_header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pixel_offset)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return file_header + info_header + body


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes → (h, w, 3) uint8 RGB array."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise UnsupportedMediaError("not a BMP payload")
    (_, _, _, _, pixel_offset) = struct.unpack_from("<2sIHHI", payload, 0)
    (hdr_size, w, h, _planes, bpp, compression) = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if hdr_size < 40:
        raise UnsupportedMediaError(f"unsupported BMP header size {hdr_size}")
    if bpp != 24 or compression != 0:
        raise UnsupportedMediaError(
            f"only 24-bit uncompressed BMP supported (bpp={bpp}, compression={compression})"
        )
    bottom_up = h > 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    if len(payload) < pixel_offset + stride * h:
        raise UnsupportedMediaError("BMP pixel array truncated")
    raw = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=pixel_offset)
    rows = raw.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR→RGB


def resize_bmp(payload: bytes, w: int, h: int) -> bytes:
    """Nearest-neighbor resize of a 24-bit BMP, re-encoded as BMP.

    The real `resize_fn` for `operators.multimodal.resize_images` —
    pure numpy index math, no codec libraries.
    """
    src = decode_bmp(payload)
    sh, sw, _ = src.shape
    rows = (np.arange(h) * sh // h).clip(0, sh - 1)
    cols = (np.arange(w) * sw // w).clip(0, sw - 1)
    return encode_bmp(src[rows][:, cols])


# ---------------------------------------------------------------------------
# WAV (RIFF/WAVE, PCM int16)
# ---------------------------------------------------------------------------


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int, *, channels: int = 1) -> bytes:
    """int16 sample array (frames, or frames×channels interleaved) →
    RIFF/WAVE bytes with a 16-byte PCM fmt chunk."""
    arr = np.asarray(samples, dtype=np.int16).reshape(-1)
    data = arr.tobytes()
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, 16
    )
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(payload: bytes) -> tuple[np.ndarray, int, int]:
    """RIFF/WAVE PCM-16 bytes → (int16 samples, sample_rate, channels)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise UnsupportedMediaError("not a RIFF/WAVE payload")
    off = 12
    fmt = None
    data = None
    while off + 8 <= len(payload):
        cid, clen = struct.unpack_from("<4sI", payload, off)
        body = payload[off + 8 : off + 8 + clen]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        off += 8 + clen + (clen % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise UnsupportedMediaError("WAV missing fmt or data chunk")
    audio_format, channels, sample_rate, _rate, _align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise UnsupportedMediaError(
            f"only PCM-16 WAV supported (format={audio_format}, bits={bits})"
        )
    return np.frombuffer(data, dtype=np.int16), sample_rate, channels


# ---------------------------------------------------------------------------
# Unified feature decode
# ---------------------------------------------------------------------------

FEATURE_DIM = 8


def media_feature_decoder(payload: bytes) -> list[float]:
    """Sniff the payload magic and decode to a fixed 8-float vector.

    BMP → [1, width, height, mean_r, mean_g, mean_b, n_pixels, 0]
    WAV → [2, sample_rate, channels, duration_ms, rms, peak, n_samples, 0]
    Anything else raises `UnsupportedMediaError` (JPEG/PNG/MP3/video
    need codec libraries absent from this container).
    """
    if payload[:2] == b"BM":
        px = decode_bmp(payload)
        h, w, _ = px.shape
        means = px.reshape(-1, 3).mean(axis=0)
        return [1.0, float(w), float(h), float(means[0]), float(means[1]), float(means[2]), float(h * w), 0.0]
    if payload[:4] == b"RIFF":
        samples, rate, channels = decode_wav(payload)
        n = len(samples) // max(channels, 1)
        x = samples.astype(np.float64)
        rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
        peak = float(np.max(np.abs(x))) if len(x) else 0.0
        return [2.0, float(rate), float(channels), n * 1000.0 / rate, rms, peak, float(n), 0.0]
    raise UnsupportedMediaError(
        "unrecognized media payload (dependency-free codecs support 24-bit "
        "BMP and PCM-16 WAV; JPEG/PNG/MP3/video require PIL/librosa/ffmpeg)"
    )
