"""Multimodal column plumbing (driver brief §extras).

Images/audio/video are opaque ``binary`` columns with typed metadata
structs.  The Spark-side plumbing — schema, partitioning, Arrow batch
shape, ``mapInPandas`` signatures — is real and tested; the actual codec
calls are stubbed behind :func:`_decode_stub` (the image/audio libraries
are not in this container) with a deterministic fake so tests are stable.
"""

from __future__ import annotations

from collections.abc import Iterator

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
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes bigint, content_hash string, "
    "feature array<float>"
)


def _decode_stub(payload: bytes | None, kind: str) -> list[float]:
    """STUB: real deployments decode with PIL/ffmpeg here.  Deterministic
    fake feature = normalized byte histogram over 8 buckets.

    Raises ``NotImplementedError`` for kinds we do not even fake.
    """
    if kind not in {"image", "audio", "video"}:
        raise NotImplementedError(f"unsupported media kind: {kind}")
    if payload is None:
        return [0.0] * 8
    hist = [0] * 8
    for b in payload:
        hist[b >> 5] += 1
    total = max(1, len(payload))
    return [h / total for h in hist]


def extract_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` so each batch decodes in one Python roundtrip; the
    incoming partitioning (e.g. by ``kind``) is preserved — no shuffle.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            feats = [
                _decode_stub(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "content_hash": [
                        hashlib.md5(p if p is not None else b"").hexdigest()
                        for p in pdf["payload"]
                    ],
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled timestamp —
    pure native explode over the duration metadata (decode itself stubbed)."""
    return df.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
