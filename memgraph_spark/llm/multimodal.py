"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

The Spark-side plumbing (schemas, Arrow-batched mapInPandas pipelines, batch
shapes, partition sizing) is real and tested. Codec work is import-gated:
when Pillow is installed, decode/feature/resize run the real codec; when it
is not (this container ships no PIL/ffmpeg/librosa), they fall back to
deterministic fakes with the same work shape, so pipelines and tests behave
identically either way. The gate lives in _pil()/_decode_features/
_resize_blob — swapping in further codecs changes those bodies only.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator


def _chunked(batches: Iterator[pd.DataFrame],
             rows: int) -> Iterator[pd.DataFrame]:
    """Re-slice incoming Arrow batches to at most `rows` rows each, INSIDE
    the pandas function.

    Scope of the bound: this bounds the OUTPUT-side working set per step
    (decoded features / resized blobs / sampled frames are produced for at
    most `rows` inputs at a time). The INPUT batch has already been
    materialized by Arrow at the session's
    spark.sql.execution.arrow.maxRecordsPerBatch (default 10000) before we
    see it, so `batch_rows` does NOT bound incoming-blob memory. Callers
    running wide-blob pipelines (100 MB videos) must also bound the input
    side — use `arrow_batch_bound(spark, rows)` around the *action* that
    executes the pipeline, which sets and restores that session conf
    (pandas UDFs read it at execution time, so wrapping the action is
    sufficient for lazy frames)."""
    for pdf in batches:
        if len(pdf) <= rows:
            yield pdf
            continue
        for lo in range(0, len(pdf), rows):
            yield pdf.iloc[lo:lo + rows]

import contextlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@contextlib.contextmanager
def arrow_batch_bound(spark, rows: int):
    """Bound INPUT-side Arrow batch size for the duration of an action.

    spark.sql.execution.arrow.maxRecordsPerBatch is read when a pandas-UDF
    stage executes, so wrapping the .count()/.write/.collect() action that
    drives a multimodal pipeline is enough to bound how many blobs one
    incoming Arrow batch materializes — without leaking the setting to
    later pandas UDFs in the session. Complements `batch_rows`, which
    bounds only the output-side slice (see _chunked)."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, str(rows))
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)

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


def _content_hash(blob) -> int:
    """Deterministic 63-bit content hash (md5-folded). Python's builtin
    hash() is per-process seeded and MUST NOT be used across executors."""
    if blob is None:
        return 0
    d = hashlib.md5(bytes(blob)).digest()
    return int.from_bytes(d[:8], "big") & 0x7FFFFFFFFFFFFFFF


def _pil():
    """Import gate for the real image codec — same pattern as the torch gate
    in algos/gnn.py (mirrors the reference's own import gate,
    src/mage/python/mage/link_prediction/factory.py:4). Returns the PIL
    Image module or None."""
    try:
        from PIL import Image
        return Image
    except Exception:  # pragma: no cover - PIL absent in this container
        return None


def decode_image(blob: bytes):
    """Real image decode via Pillow when importable; raises when the codec
    library is absent (deliberate dependency gate, not a stub)."""
    Image = _pil()
    if Image is None:
        raise NotImplementedError(
            "image codec not available (pip install Pillow); "
            "extract_features falls back to a deterministic fake")
    import io
    return Image.open(io.BytesIO(bytes(blob)))


def _decode_features(blob, dim: int = 8) -> list[float]:
    """decode -> feature vector: real (PIL grayscale thumbnail, mean-pooled
    to `dim` buckets) when the codec is importable AND the blob decodes;
    otherwise the deterministic byte-fold fake, so pipelines built on text
    stand-in blobs keep identical outputs with or without Pillow."""
    Image = _pil()
    if Image is not None and blob:
        try:
            img = decode_image(blob).convert("L").resize((dim, 1))
            return [px / 255.0 for px in img.getdata()]
        except NotImplementedError:  # pragma: no cover
            raise
        except Exception:
            pass  # not a decodable image: fall through to the fake
    return _fake_decode_features(blob, dim)


def _resize_blob(blob, w: int, h: int):
    """Real PIL resize -> PNG re-encode when importable + decodable; else a
    deterministic nearest-neighbour byte-stream resample (same work shape,
    codec-free)."""
    if blob is None:
        return None
    Image = _pil()
    if Image is not None:
        try:
            import io
            img = decode_image(blob).resize((w, h))
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            return buf.getvalue()
        except NotImplementedError:  # pragma: no cover
            raise
        except Exception:
            pass
    target = max(1, (w * h) // 8)
    b = bytes(blob)
    if not b:
        return b""
    step = len(b) / target
    return bytes(b[min(len(b) - 1, int(i * step))] for i in range(target))


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

        for pdf in _chunked(batches, batch_rows):
            out = pd.DataFrame({
                "media_id": pdf[id_col],
                "n_bytes": pdf[blob_col].map(lambda b: 0 if b is None else len(b)),
                "content_hash": pdf[blob_col].map(_content_hash),
                "features": pdf[blob_col].map(lambda b: _decode_features(b, dim)),
            })
            yield out

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


def media_table(spark, sf_dir: str, media_type: str = "image") -> DataFrame:
    """Build a typed media table from the documents parquet: each document's
    text becomes an opaque blob (deterministic UTF-8 encode standing in for
    real image/audio bytes) beside the MEDIA_META_SCHEMA metadata struct.
    The shape — (media_id, data BINARY, meta STRUCT) — is the contract every
    pipeline here consumes; at scale this is the parquet layout (blobs in
    their own column chunk, metadata columns prunable without touching
    blob bytes)."""
    docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    blob = F.encode(F.col("text"), "UTF-8")
    n = F.length(blob)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        blob.alias("data"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit({"image": "png", "audio": "wav",
                   "video": "mp4"}.get(media_type, "bin")).alias("format"),
            (n % 640 + 16).cast("int").alias("width"),
            (n % 480 + 16).cast("int").alias("height"),
            (n * 10).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("data", T.BinaryType()),
    T.StructField("meta", MEDIA_META_SCHEMA),
])


def resize_images(df: DataFrame, width: int, height: int,
                  id_col: str = "media_id", blob_col: str = "data",
                  meta_col: str = "meta", batch_rows: int = 256) -> DataFrame:
    """mapInPandas image resize. The pipeline — Arrow batches in, updated
    blob + metadata struct out, bounded batch sizes — is real; the pixel
    resample is a deterministic fake (byte stream re-sampled to the target
    byte budget) standing in for PIL's Image.resize."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in _chunked(batches, batch_rows):
            meta = pd.DataFrame(list(pdf[meta_col]))
            meta["width"] = width
            meta["height"] = height
            yield pd.DataFrame({
                "media_id": pdf[id_col],
                "data": pdf[blob_col].map(lambda b: _resize_blob(b, width, height)),
                "meta": meta.to_dict("records"),
            })

    return df.select(id_col, blob_col, meta_col).mapInPandas(run, RESIZED_SCHEMA)


AUDIO_WINDOW_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("window_idx", T.IntegerType()),
    T.StructField("start_ms", T.LongType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("zero_crossings", T.LongType()),
])


def audio_window_features(df: DataFrame, window_ms: int = 1000,
                          id_col: str = "media_id", blob_col: str = "data",
                          meta_col: str = "meta",
                          batch_rows: int = 64) -> DataFrame:
    """Windowed audio features (RMS energy + zero-crossing count per
    window), the MFCC-pipeline shape without the codec: the blob is treated
    as signed 8-bit PCM — real WAV/MP3 decode is the single swap-in point.
    Window boundaries derive from duration_ms so the fan-out (one output row
    per window) matches frame_sample_plan's engine-side budget."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in _chunked(batches, batch_rows):
            out = {k: [] for k in ("media_id", "window_idx", "start_ms",
                                   "rms", "zero_crossings")}
            for mid, blob, meta in zip(pdf[id_col], pdf[blob_col], pdf[meta_col]):
                dur = int(meta["duration_ms"] or 0) if meta is not None else 0
                n_win = max(1, (dur + window_ms - 1) // window_ms)
                sig = (np.frombuffer(bytes(blob), dtype=np.int8).astype(np.float64)
                       if blob else np.zeros(1))
                chunks = np.array_split(sig, n_win)
                for wi, ch in enumerate(chunks):
                    if not len(ch):
                        ch = np.zeros(1)
                    out["media_id"].append(mid)
                    out["window_idx"].append(wi)
                    out["start_ms"].append(wi * window_ms)
                    out["rms"].append(float(np.sqrt(np.mean(ch ** 2))))
                    out["zero_crossings"].append(
                        int(np.count_nonzero(np.diff(np.signbit(ch)))))
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col, meta_col).mapInPandas(
        run, AUDIO_WINDOW_SCHEMA)
