"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

The Spark-side plumbing (schemas, Arrow-batched mapInPandas pipelines, batch
shapes, partition sizing) is real and tested; the actual codec work is
stubbed behind deterministic fakes / NotImplementedError because the codec
libraries (PIL/ffmpeg/librosa) are not in this container. Swapping the fake
for a real decoder changes ONE function body, not the pipeline.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# typed metadata carried beside every media blob
MEDIA_META_SCHEMA = T.StructType([
    T.StructField("media_type", T.StringType()),     # image|audio|video
    T.StructField("format", T.StringType()),         # png|jpg|wav|mp4|...
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("content_hash", T.LongType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])


def _fake_decode_features(blob: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for decode->embed: bytes are folded into `dim`
    buckets. Replace with a real decoder (PIL + model) when available."""
    if blob is None:
        return [0.0] * dim
    acc = [0] * dim
    for i, by in enumerate(blob):
        acc[i % dim] = (acc[i % dim] + by) % 997
    return [a / 997.0 for a in acc]


def decode_image(blob: bytes):  # pragma: no cover - intentional stub
    """Real image decode is not available in this container."""
    raise NotImplementedError("image codec not available; use extract_features (fake)")


def extract_features(
    df: DataFrame,
    id_col: str = "media_id",
    blob_col: str = "data",
    dim: int = 8,
    batch_rows: int = 256,
) -> DataFrame:
    """mapInPandas feature extraction over binary blobs.

    Arrow-batched: each pandas batch holds ~batch_rows blobs (bound the batch
    byte size at scale with spark.sql.execution.arrow.maxRecordsPerBatch so a
    partition of 100 MB videos doesn't materialize at once)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np  # noqa: F401  (vectorized impls hook in here)

        for pdf in batches:
            out = pd.DataFrame({
                "media_id": pdf[id_col],
                "n_bytes": pdf[blob_col].map(lambda b: 0 if b is None else len(b)),
                "content_hash": pdf[blob_col].map(
                    lambda b: 0 if b is None else hash(bytes(b)) & 0x7FFFFFFFFFFFFFFF),
                "features": pdf[blob_col].map(lambda b: _fake_decode_features(b, dim)),
            })
            yield out

    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_rows))
    return df.select(id_col, blob_col).mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000,
                      meta_col: str = "meta") -> DataFrame:
    """Video frame-sampling *plan*: one row per (media, frame_ts) — the
    explode happens engine-side so the decode UDF receives a bounded work
    list; the decode itself is the stubbed step."""
    return df.withColumn(
        "frame_ts_ms",
        F.explode(F.sequence(F.lit(0),
                             F.greatest(F.col(f"{meta_col}.duration_ms") - 1, F.lit(0)),
                             F.lit(every_ms))),
    )
