"""Multimodal payload plumbing: opaque binary columns + typed metadata.

The engine treats image/audio/video exactly as it treats html: an opaque
``binary`` column processed by Arrow-batched UDFs (the reference's payload
is pixels for the same reason — SURVEY.md §1.1). The decode/resize/
frame-sample kernels need codec libraries that are NOT in this container,
so the kernels are stubbed (deterministic fake features clearly marked),
while everything Spark-side — schema, batch shape, partitioning, UDF
signature — is real and tested.

``media_meta`` (length + md5) is fully real and oracle-checked.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

FEATURE_DIM = 8


def _decode_image_real(payload: bytes):  # pragma: no cover - container lacks codecs
    """Real decode path — requires an image codec library (absent here)."""
    raise NotImplementedError(
        "image codecs are not installed in this container; "
        "the deterministic stub below stands in for decode+feature-extract"
    )


def _fake_decode(payload: bytes) -> tuple[str, int, int, list[float]]:
    """STUB: deterministic fake decode. Derives format/dims/features purely
    from the bytes so tests are reproducible. Replace with
    `_decode_image_real` when codecs are available."""
    if not payload:
        return ("empty", 0, 0, [0.0] * FEATURE_DIM)
    fmt = "png" if payload[:4] == b"\x89PNG" else "jpeg" if payload[:2] == b"\xff\xd8" else "bin"
    w = 1 + payload[0] % 64
    h = 1 + payload[-1] % 64
    # byte-histogram-ish feature: mean of each eighth of the payload
    n = len(payload)
    step = max(1, n // FEATURE_DIM)
    feat = [
        round(sum(payload[i : i + step]) / max(1, len(payload[i : i + step])) / 255.0, 6)
        for i in range(0, step * FEATURE_DIM, step)
    ]
    feat = (feat + [0.0] * FEATURE_DIM)[:FEATURE_DIM]
    return (fmt, w, h, feat)


def media_features(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """binary payloads -> per-item features via mapInPandas (iterator form,
    one-time init slot for a real codec), Arrow-batched."""

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one-time init would load the codec/model here (X1 pattern)
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                fmt, w, h, feat = _fake_decode(bytes(payload) if payload is not None else b"")
                rows.append(
                    {
                        "media_id": int(mid),
                        "n_bytes": len(payload) if payload is not None else 0,
                        "format": fmt,
                        "width": w,
                        "height": h,
                        "feature": feat,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_FEATURE_SCHEMA.fields])

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(_map, MEDIA_FEATURE_SCHEMA)


def media_meta(df: DataFrame, id_col: str = "media_id", payload_col: str = "payload") -> DataFrame:
    """Typed metadata over the opaque binary column — pure JVM expressions
    (no UDF): byte length + md5 content hash."""
    return df.select(
        F.col(id_col),
        F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
        F.md5(F.col(payload_col)).alias("content_md5"),
    )
