"""Watermarked windowed aggregation + applyInPandasWithState sessionization
(SURVEY §2.12 — event-time analytics over streams; file sources stand in
for Kafka, trigger(availableNow) drains them deterministically)."""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import functions as F

from memgraph_spark.streaming.windows import (
    sessionize, sessionize_batch, windowed_counts)
from tests.conftest import SF_SMOKE

GAP_MS = 30 * 60 * 1000


def _events(spark, n_users=5):
    return (spark.read.parquet(f"{SF_SMOKE}/events.parquet")
            .filter(F.col("user_id") < n_users)
            .select("ts", "user_id", "event_type", "value"))


def _run_stream(df_stream, name):
    q = (df_stream.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(300)
    return name


def test_windowed_counts_stream_matches_batch(spark):
    batch = _events(spark)
    d = tempfile.mkdtemp()
    batch.write.mode("overwrite").parquet(d)
    stream = (spark.readStream.schema(batch.schema).parquet(d))

    name = f"wc_{uuid.uuid4().hex[:8]}"
    _run_stream(windowed_counts(stream, window="15 minutes"), name)
    got = {(r["win_start"], r["event_type"]): (r["n_events"], r["sum_value"])
           for r in spark.table(name).collect()}

    expected = {(r["win_start"], r["event_type"]): (r["n_events"], r["sum_value"])
                for r in windowed_counts(batch, window="15 minutes").collect()}
    # append mode only emits windows the final watermark has closed; every
    # emitted window must match the batch result exactly, and the closed
    # set must cover all but the last watermark-window of data
    assert got
    for k, v in got.items():
        assert expected[k][0] == v[0]
        assert abs(expected[k][1] - v[1]) < 1e-6
    missing = set(expected) - set(got)
    if missing:
        max_ts = batch.agg(F.max("ts")).first()[0]
        horizon = [k[0] for k in missing]
        # anything missing sits inside the final (still-open) watermark span
        assert min(horizon) >= max_ts - __import__("datetime").timedelta(minutes=45)


def test_sessionize_stream_matches_batch_oracle(spark):
    ev = _events(spark, n_users=4)
    max_ts = ev.agg(F.max("ts")).first()[0]
    # sentinel event per user far past every real session: closes them all
    sentinel = (ev.select("user_id").distinct()
                .select(F.lit(max_ts).alias("ts"), "user_id",
                        F.lit("sentinel").alias("event_type"),
                        F.lit(0.0).alias("value"))
                .withColumn("ts", F.col("ts") + F.expr("INTERVAL 7 DAYS")))

    d = tempfile.mkdtemp()
    # two files -> two micro-batches (maxFilesPerTrigger=1): the sentinel
    # batch advances the watermark, firing the event-time timeouts
    ev.coalesce(1).write.parquet(os.path.join(d, "f1"))
    sentinel.coalesce(1).write.parquet(os.path.join(d, "f2"))
    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(d, "*")))

    name = f"sess_{uuid.uuid4().hex[:8]}"
    _run_stream(sessionize(stream, gap_ms=GAP_MS, watermark="0 seconds"), name)
    got = {(r["user_id"], r["session_start"], r["session_end"],
            r["n_events"], round(r["sum_value"], 6))
           for r in spark.table(name).collect()}

    want = {(r["user_id"], r["session_start"], r["session_end"],
             r["n_events"], round(r["sum_value"], 6))
            for r in sessionize_batch(ev, gap_ms=GAP_MS).collect()}
    # every real session must be emitted (sentinel sessions stay open)
    assert want <= got
    extras = got - want
    assert all(e[3] == 1 and e[4] == 0.0 for e in extras)  # only sentinels


def test_sessionize_late_event_keeps_bounds_monotone(spark):
    """A late-but-in-watermark event (older than the open session's end,
    arriving in a later micro-batch) must extend session_start downward /
    leave session_end alone — never rewrite session_end backward."""
    base = "2024-01-01 00:00:00"
    rows1 = [(base, 1, "a", 1.0), ("2024-01-01 00:10:00", 1, "a", 2.0)]
    rows2 = [("2024-01-01 00:05:00", 1, "a", 4.0)]  # late: < open end
    schema = "ts string, user_id long, event_type string, value double"

    def mk(rows):
        return (spark.createDataFrame(rows, schema)
                .withColumn("ts", F.col("ts").cast("timestamp")))

    f1 = mk(rows1)
    f2 = mk(rows2)
    sentinel = mk([("2024-01-08 00:00:00", 1, "sentinel", 0.0)])

    d = tempfile.mkdtemp()
    f1.coalesce(1).write.parquet(os.path.join(d, "f1"))
    f2.coalesce(1).write.parquet(os.path.join(d, "f2"))
    sentinel.coalesce(1).write.parquet(os.path.join(d, "f3"))
    stream = (spark.readStream.schema(f1.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(d, "*")))

    name = f"late_{uuid.uuid4().hex[:8]}"
    _run_stream(sessionize(stream, gap_ms=GAP_MS, watermark="1 hour"), name)
    sess = [r for r in spark.table(name).collect() if r["n_events"] == 3]
    assert len(sess) == 1
    (r,) = sess
    assert str(r["session_start"]) == base
    assert str(r["session_end"]) == "2024-01-01 00:10:00"
    assert r["sum_value"] == 7.0


def test_sessionize_batch_properties(spark):
    ev = _events(spark)
    sess = sessionize_batch(ev, gap_ms=GAP_MS)
    rows = sess.collect()
    assert sess.groupBy("user_id").agg(F.sum("n_events").alias("n")) \
        .join(ev.groupBy("user_id").count(), "user_id") \
        .filter("n <> count").count() == 0
    assert all(r["session_start"] <= r["session_end"] for r in rows)


def test_stream_dedup_exact_matches_batch(spark):
    """Streaming dropDuplicatesWithinWatermark output (file-source drain)
    equals batch dropDuplicates on the same key, duplicates injected."""
    from memgraph_spark.streaming.windows import stream_dedup_exact
    batch = _events(spark).limit(200)
    dup = batch.unionByName(batch.limit(50))  # 50 exact duplicate rows
    d = tempfile.mkdtemp()
    dup.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(dup.schema).parquet(d)

    name = f"dd_{uuid.uuid4().hex[:8]}"
    _run_stream(
        stream_dedup_exact(stream, key_cols=["user_id", "ts", "event_type"]),
        name)
    got = spark.sql(f"SELECT count(*) AS n FROM {name}").first()["n"]
    want = stream_dedup_exact(
        dup, key_cols=["user_id", "ts", "event_type"]).count()
    assert got == want == batch.dropDuplicates(
        ["user_id", "ts", "event_type"]).count()


def test_stream_dedup_text_hash_key(spark):
    """text_col mode keys on md5(text) and drops the helper column."""
    from memgraph_spark.streaming.windows import stream_dedup_exact
    rows = [(1, "2024-01-01 00:00:00", "same text"),
            (2, "2024-01-01 00:01:00", "same text"),
            (3, "2024-01-01 00:02:00", "other text")]
    df = spark.createDataFrame(rows, "doc_id long, ts string, text string")
    out = stream_dedup_exact(df, text_col="text")
    assert out.count() == 2
    assert "__dedup_key" not in out.columns
