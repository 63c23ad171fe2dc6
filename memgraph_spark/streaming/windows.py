"""Event-time windowed aggregation + custom stateful operators for streams.

The reference executes stream batches through registered transformations
(src/query/stream/streams.cpp — each batch becomes Cypher against storage);
analytics over those streams (rolling counts, session detection for the
TTL/trigger machinery) are what these operators provide, expressed as
idiomatic Structured Streaming:

- `windowed_counts` — tumbling/sliding event-time windows with a watermark,
  so late data within the lateness bound still lands in its window and
  state for closed windows is dropped (bounded state at 100 TB/day rates).
- `sessionize` — gap-based session windows as a CUSTOM STATEFUL OPERATOR
  via applyInPandasWithState: per-key open-session state, sessions emitted
  when the gap elapses (event-time timeout via watermark). This is the
  template for any reference operator Spark lacks natively: keyed state +
  Arrow-batched pandas logic, state size O(open keys), not O(events seen).

Both run identically on any readStream source (kafka/file/rate); tests use
file sources with trigger(availableNow=True) since no broker ships here.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Watermarked windowed counts/sums per key.

    Works on both streaming and batch frames (batch ignores the watermark,
    which is exactly Spark's unified-semantics contract: the streaming
    result converges to the batch result once all late data arrives)."""
    # watermarks only accept TIMESTAMP; parquet event tables come in as NTZ
    df = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    w = F.window(F.col(ts_col), window, slide or window)
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (df.groupBy(w.alias("win"), F.col(key_col))
            .agg(F.count("*").alias("n_events"),
                 F.sum("value").alias("sum_value"))
            .select(F.col("win.start").alias("win_start"),
                    F.col("win.end").alias("win_end"),
                    key_col, "n_events", "sum_value"))


SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("sum_value", T.DoubleType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("start_us", T.LongType()),
    T.StructField("last_us", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("sum_value", T.DoubleType()),
])


def sessionize(
    events: DataFrame,
    gap_ms: int = 30 * 60 * 1000,
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Gap-based sessionization as an applyInPandasWithState operator.

    Per user: events within `gap_ms` of the previous one extend the open
    session; a longer silence closes it. Closed sessions are emitted as soon
    as they are observed (mid-batch) or when the event-time timeout fires
    (watermark passed start + gap with no new events). State per key is one
    4-field row — O(active users), independent of stream length."""

    gap_us = gap_ms * 1000

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (uid,) = key
        if state.hasTimedOut:
            start_us, last_us, n, sv = state.get
            state.remove()
            yield pd.DataFrame({
                "user_id": [uid],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(last_us, unit="us")],
                "n_events": [n],
                "sum_value": [sv],
            })
            return
        cur = list(state.get) if state.exists else None
        out = []
        # Arrow hands the key's batch as multiple chunks with no cross-chunk
        # ordering guarantee: concatenate and sort ONCE so late-but-in-
        # watermark events fold in event-time order (per-chunk sorting would
        # mis-split sessions at chunk boundaries).
        chunks = list(pdfs)
        batch = (pd.concat(chunks, ignore_index=True).sort_values(ts_col)
                 if chunks else pd.DataFrame({ts_col: [], "value": []}))
        for ts, val in zip(batch[ts_col], batch["value"]):
            # state holds MICROseconds: the emitted session bounds must
            # round-trip the source timestamps exactly (oracle parity)
            us = int(pd.Timestamp(ts).value // 1_000)
            if cur is None:
                cur = [us, us, 1, float(val)]
            elif us - cur[1] <= gap_us:
                # extend keeps bounds monotone: an event older than the open
                # session's end (late vs prior-batch state) must not rewrite
                # session_end backward or leave session_start unexpanded
                cur[0] = min(cur[0], us)
                cur[1] = max(cur[1], us)
                cur[2] += 1
                cur[3] += float(val)
            else:
                out.append((uid, cur[0], cur[1], cur[2], cur[3]))
                cur = [us, us, 1, float(val)]
        if cur is not None:
            state.update(tuple(cur))
            # event-time timeouts must sit strictly beyond the watermark
            state.setTimeoutTimestamp(
                max(cur[1] // 1000 + gap_ms, state.getCurrentWatermarkMs() + 1))
        if out:
            yield pd.DataFrame({
                "user_id": [o[0] for o in out],
                "session_start": [pd.Timestamp(o[1], unit="us") for o in out],
                "session_end": [pd.Timestamp(o[2], unit="us") for o in out],
                "n_events": [o[3] for o in out],
                "sum_value": [o[4] for o in out],
            })

    return (events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
            .withWatermark(ts_col, watermark)
            .groupBy(key_col)
            .applyInPandasWithState(
                fn, SESSION_SCHEMA, _STATE_SCHEMA, "append",
                GroupStateTimeout.EventTimeTimeout))


def sessionize_batch(
    events: DataFrame,
    gap_ms: int = 30 * 60 * 1000,
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Batch oracle for `sessionize`: the same gap-session semantics as pure
    DataFrame ops (lag + cumulative session ids), used to cross-check the
    stateful streaming operator and as the backfill path over historical
    parquet. One window shuffle on the session key — scales with AQE."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col)
    # unix_micros after a cast to TIMESTAMP handles TIMESTAMP_NTZ parquet
    # columns too (NTZ cannot cast straight to double); µs precision matches
    # the streaming operator's state exactly
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    sessioned = (
        events
        .withColumn("_us", us)
        .withColumn("_gap", F.col("_us") - F.lag("_us").over(w))
        .withColumn("_new", F.when(F.col("_gap").isNull() |
                                   (F.col("_gap") > gap_ms * 1000), 1).otherwise(0))
        .withColumn("_sid", F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, 0))))
    return (sessioned.groupBy(key_col, "_sid")
            .agg(F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"),
                 F.count("*").alias("n_events"),
                 F.sum("value").alias("sum_value"))
            .drop("_sid", "_us", "_gap", "_new"))


def stream_dedup_exact(
    events: DataFrame,
    key_cols: list[str] | None = None,
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    text_col: str | None = None,
) -> DataFrame:
    """Streaming exact deduplication — the ingest-side stage of the corpus
    dedup pipeline (llm/dedup handles the batch/fuzzy stages).

    Drops events whose key (default: md5 of `text_col`, else `key_cols`)
    was already seen within the watermark horizon, via
    dropDuplicatesWithinWatermark: state for a key is freed once the
    watermark passes it, so state size is bounded by the dedup horizon
    (keys/hour x lateness), never by stream lifetime — the property that
    makes exact dedup viable on an unbounded 100 TB/day feed. Batch frames
    fall back to plain dropDuplicates (unified semantics)."""
    df = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if text_col is not None:
        df = df.withColumn("__dedup_key", F.md5(F.col(text_col)))
        keys = ["__dedup_key"]
    else:
        keys = list(key_cols or [])
        if not keys:
            raise ValueError("stream_dedup_exact needs key_cols or text_col")
    if df.isStreaming:
        out = df.withWatermark(ts_col, watermark) \
                .dropDuplicatesWithinWatermark(keys)
    else:
        out = df.dropDuplicates(keys)
    return out.drop("__dedup_key") if text_col is not None else out
