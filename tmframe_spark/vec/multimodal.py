"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual media decode is stubbed behind
``DETERMINISTIC_FAKE`` because no image/audio libraries ship in this
container — swap ``_decode_image_stub`` for a PIL/libvips call in
production. Pattern: mapInPandas over (id, media binary, meta struct),
batch-wise numpy processing, fixed output schema.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

DETERMINISTIC_FAKE = True  # container has no media libs; see module docstring


def _decode_image_stub(payload: bytes) -> tuple[int, int, np.ndarray]:
    """STUB decode: returns deterministic (width, height, 8-dim feature)
    derived from the payload bytes. Replace with a real decoder
    (PIL.Image.open etc.) in production — raise if fakes are disabled."""
    if not DETERMINISTIC_FAKE:
        raise NotImplementedError("media decode requires image/audio libs")
    h = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8).astype(np.float32)
    w = int(h[:4].sum()) % 1024 + 16
    ht = int(h[4:8].sum()) % 1024 + 16
    feat = h.reshape(8, 8).mean(axis=1) / 255.0
    return w, ht, feat


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary media columns.

    Input schema: (media_id long, kind string, payload binary). Output:
    FEATURE_SCHEMA. Arrow moves the binary batches; numpy processes each
    batch vectorized-per-row (real decoders are per-item anyway).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                w, h, feat = _decode_image_stub(bytes(payload or b""))
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "width": w,
                        "height": h,
                        "n_frames": 1 if kind == "image" else 16,
                        "feature": feat.tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(fn, FEATURE_SCHEMA)


def synth_media(spark, n: int = 256) -> DataFrame:
    """Deterministic fake media table for plumbing tests: payload bytes are
    a hash-expansion of the id (no media libs involved)."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("id"), 3) + 1).cast("int"),
        ).alias("kind"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("payload"),
    )
