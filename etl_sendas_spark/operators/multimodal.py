"""Multimodal (image/audio/video) column plumbing.

Design: media payloads are opaque ``binary`` columns with a typed
metadata struct alongside (mime, width/height/duration, source URI).
Everything Spark-side — schema, partitioning, Arrow batch shape,
``mapInPandas`` signatures — is real and tested; the codec step itself
is STUBBED (Pillow/librosa/ffmpeg are not in this container) behind
``decode_fn`` hooks with a deterministic fake for tests.

At 100 TB the pattern is: media in Parquet binary columns (or file
pointers for >RowGroup payloads), decode in ``mapInPandas`` (Arrow
moves bytes zero-copy into the Python worker), feature columns appended
batch-wise, partitioning preserved end-to-end (decode is narrow — no
shuffle).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("uri", T.StringType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)


def fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real image/audio decoder: 8 float
    features derived from byte statistics. Replace with Pillow/librosa
    in a full environment — the Spark plumbing is identical."""
    if payload is None or len(payload) == 0:
        return [0.0] * 8
    n = len(payload)
    s = sum(payload)
    mx = max(payload)
    mn = min(payload)
    return [
        float(n),
        float(s % 997),
        float(mx),
        float(mn),
        float(payload[0]),
        float(payload[-1]),
        float(s / n),
        float((mx - mn) or 0),
    ]


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    out_col: str = "features",
    decode_fn: Callable[[bytes], list[float]] = fake_decode,
    n_features: int = 8,
) -> DataFrame:
    """Append a feature vector per media row via ``mapInPandas``.

    Narrow (no shuffle): each Arrow batch of binary payloads is decoded
    in the Python worker and the feature array column appended. The
    real decoder raises if unavailable — see :func:`fake_decode`.
    """
    # fresh StructType (StructType.add mutates the cached input schema)
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.DoubleType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out_col] = pdf[payload_col].map(
                lambda b: decode_fn(bytes(b)) if b is not None else [0.0] * n_features
            )
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize — STUB. Real implementation: Pillow inside
    ``mapInPandas`` with the same narrow batch shape as
    :func:`extract_features`. Raises until an imaging lib exists."""
    raise NotImplementedError(
        "image resize requires Pillow (not in this container); "
        "plumbing pattern: mapInPandas over binary payload batches"
    )


def frame_sample_stub(df: DataFrame, every_s: float) -> DataFrame:
    """Video frame sampling — STUB (needs ffmpeg/pyav)."""
    raise NotImplementedError(
        "frame sampling requires pyav/ffmpeg (not in this container); "
        "plumbing pattern: mapInPandas yielding one row per sampled frame"
    )
