"""Multimodal column plumbing for a training-data pipeline.

Media lives as opaque `binary` columns with typed metadata structs; all
heavy per-item work (decode, resize, feature extraction, frame sampling)
runs as Arrow-batched `mapInPandas` so bytes never materialize on the
driver and each task streams batches. The actual codecs (PIL/ffmpeg/
torchaudio) are NOT in this container — the decode kernel is pluggable:
the default is a deterministic fake (stable per content hash) and the
real-codec slot raises NotImplementedError, clearly marked. The Spark
side — schema, batch shape, partitioning, UDF signatures — is real and
tested.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", IntegerType()),
                    StructField("format", StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_sha256", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _fake_decode(content: bytes) -> list[float]:
    """Deterministic stand-in for a codec+encoder: FEATURE_DIM floats
    derived from the content digest. Replace via `decode_fn`."""
    d = hashlib.sha256(content).digest()
    return [b / 255.0 for b in d[:FEATURE_DIM]]


def _real_decode(content: bytes) -> list[float]:  # pragma: no cover
    raise NotImplementedError(
        "real media decoding requires PIL/ffmpeg, not available in this "
        "container — inject decode_fn=... with a codec-backed kernel"
    )


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes], list[float]] | None = None,
    batch_size_hint: int = 256,
) -> DataFrame:
    """mapInPandas feature extraction: bytes → fixed-dim float vector.

    Arrow streams batches into the Python worker; output rows drop the
    raw bytes (never carry media bytes past the stage that needs them —
    at 100 TB the bytes dominate shuffle cost)."""
    fn = decode_fn or _fake_decode

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": content.map(len).astype("int64"),
                    "content_sha256": content.map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                    "features": content.map(fn),
                }
            )

    return media.mapInPandas(_extract, FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms)
    from metadata only — pure column algebra, no decode. The decode of
    planned frames is `extract_features` over the planned subset."""
    return (
        media.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def resize_plan(media: DataFrame, max_side: int = 512) -> DataFrame:
    """Image resize *plan*: target dims preserving aspect ratio, metadata
    only (the pixel work belongs in the pluggable kernel)."""
    img = media.filter(F.col("media_type") == "image")
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(
        F.lit(1.0), F.lit(max_side) / F.greatest(w, h).cast("double")
    )
    return img.select(
        "media_id",
        w.alias("width"),
        h.alias("height"),
        F.round(w * scale).cast("int").alias("target_width"),
        F.round(h * scale).cast("int").alias("target_height"),
    )


# Ship this module by VALUE to Spark python workers (they don't share the
# driver's sys.path; see functions/crypto.py for the same pattern).
try:  # pragma: no cover
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001 - best-effort; --py-files is the fallback
    pass
