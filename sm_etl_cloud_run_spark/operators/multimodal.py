"""Multimodal column plumbing: image/audio/video as opaque binary columns.

Scale-layer operators (not in the reference): media travel as
`binary` payload + typed metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched pandas transforms over
`mapInPandas` — the payload never leaves the executors, and each batch
is a bounded Arrow chunk, so 100 TB of media streams through without
driver involvement.

Decode is REAL for the formats the dependency-free codecs in
`functions/codecs.py` cover: 24-bit BMP and PCM-16 WAV, parsed from
the public file layouts with struct+numpy. `decode_fn=None` /
`resize_fn=None` default to those codecs; compressed formats
(JPEG/PNG/MP3/video) raise `UnsupportedMediaError` because the
libraries they need (PIL/librosa/ffmpeg) are absent from this
container. `deterministic_fake_decoder` remains for plumbing tests
that don't care about pixel math.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = "media_id long, kind string, feature array<float>, n_bytes long"


def deterministic_fake_decoder(payload: bytes, dim: int = 8) -> list[float]:
    """Content-derived fake feature vector (sha256-seeded), so tests are
    deterministic without codec libraries."""
    h = hashlib.sha256(payload or b"").digest()
    return [int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)]


def extract_features(
    media: DataFrame,
    *,
    decode_fn: Callable[[bytes], list[float]] | None = None,
    batch_limit: int = 256,
) -> DataFrame:
    """Decode payloads → fixed-width feature vectors via mapInPandas.

    `decode_fn=None` uses the real dependency-free codecs
    (`functions.codecs.media_feature_decoder`: BMP + WAV; other formats
    raise `UnsupportedMediaError`). Pass `deterministic_fake_decoder`
    for codec-agnostic plumbing tests.
    """

    if decode_fn is None:
        from ..functions.codecs import media_feature_decoder

        decode_fn = media_feature_decoder

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # Bound per-yield batch size: media payloads are large, so
            # re-chunk instead of emitting one huge Arrow batch.
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start : start + batch_limit]
                feats = [decode_fn(bytes(p) if p is not None else b"") for p in chunk["payload"]]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].values,
                        "kind": chunk["kind"].values,
                        "feature": feats,
                        "n_bytes": [len(p) if p is not None else 0 for p in chunk["payload"]],
                    }
                )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, *, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: explode timestamps derived from
    metadata duration — the decode of each frame is the stubbed kernel.

    Pure plan logic (sequence + explode), fully testable without codecs.
    """
    frames = media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
    return frames


RESIZED_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "width int, height int, n_bytes long"
)


def resize_images(
    media: DataFrame,
    *,
    target: tuple[int, int] = (224, 224),
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
    batch_limit: int = 64,
) -> DataFrame:
    """Resize image payloads to `target` via mapInPandas.

    Same kernel contract as `extract_features`: `resize_fn=None` uses
    the real dependency-free nearest-neighbor BMP resizer
    (`functions.codecs.resize_bmp`; non-BMP formats raise
    `UnsupportedMediaError` — PIL is absent here). Non-image rows are
    filtered Spark-side so the Python kernel only ever sees work it can
    act on, and batches are re-chunked (`batch_limit`) because resized
    payloads are large — one huge Arrow batch per partition would spike
    executor memory.
    """
    w, h = target
    if resize_fn is None:
        from ..functions.codecs import resize_bmp

        resize_fn = resize_bmp

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start : start + batch_limit]
                out = [
                    resize_fn(bytes(p) if p is not None else b"", w, h)
                    for p in chunk["payload"]
                ]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].values,
                        "kind": chunk["kind"].values,
                        "payload": out,
                        "width": [w] * len(chunk),
                        "height": [h] * len(chunk),
                        "n_bytes": [len(b) for b in out],
                    }
                )

    return media.where(F.col("kind") == "image").mapInPandas(kernel, RESIZED_SCHEMA)


def deterministic_fake_resizer(payload: bytes, w: int, h: int) -> bytes:
    """Content-derived fake resized payload (w*h bytes from a sha256
    stream) so the plumbing is testable without PIL."""
    seed = hashlib.sha256((payload or b"") + f"{w}x{h}".encode()).digest()
    reps = (w * h) // len(seed) + 1
    return (seed * reps)[: w * h]
