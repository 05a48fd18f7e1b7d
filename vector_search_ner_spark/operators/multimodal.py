"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed by Arrow-batched mapInPandas.

The decode step is STUBBED (image/audio libs aren't in this image):
`decode_image_features` tries PIL and falls back to a deterministic
byte-statistics feature vector — the Spark-side contract (schema,
batching, partitioning) is real and tested; swapping in a real decoder
changes only `_decode_one`.

At 100 TB: binary payloads ride the same parquet scans; mapInPandas
keeps them off the driver and processes per-partition Arrow batches;
feature extraction adds no shuffle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_FEATURES = 8

FEATURES_SCHEMA = (
    "doc_id long, mime string, n_bytes int, features array<float>"
)


def attach_fake_binary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize an opaque binary payload + metadata per doc (stands
    in for an image column; md5-derived so deterministic)."""
    payload = F.unhex(F.concat(F.md5(F.col(text_col)), F.md5(F.reverse(F.col(text_col)))))
    return docs.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.lit("image/png").alias("mime"),
            (F.length(F.col(text_col)) % 64 + 16).cast("int").alias("width"),
            (F.length(F.col(text_col)) % 48 + 16).cast("int").alias("height"),
        ),
    )


def _decode_one(payload: bytes) -> list[float]:
    try:  # real decoder path (not available in this image)
        from PIL import Image  # noqa: F401

        raise NotImplementedError("real image decode not wired up in this image")
    except ImportError:
        pass
    # deterministic fake: byte statistics as features
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    h = int(hashlib.md5(payload).hexdigest()[:8], 16)
    feats = [
        float(arr.size),
        float(arr.sum() % 997),
        float(arr.mean()),
        float(arr.min()),
        float(arr.max()),
        float(arr[0]),
        float(arr[-1]),
        float(h % 1000),
    ]
    return [float(np.float32(x)) for x in feats]


def decode_image_features(with_binary: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over the binary column."""

    def op(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "features": [_decode_one(bytes(p)) for p in pdf["payload"]],
                }
            )

    return with_binary.mapInPandas(op, schema=FEATURES_SCHEMA)
