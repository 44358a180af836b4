"""Streaming window aggregation + stateful sessionization over `events`.

Batch/stream parity by construction: each streaming job has a batch twin in
:mod:`geektime_bigdata_spark.operators.windows`, and the tests assert the
``availableNow`` (process-everything-then-stop) run produces exactly the
batch answer — the standard way to validate streaming logic without a live
source.

Scale notes: the tumbling-window aggregate is partial+final per window key
with watermark-driven state eviction — at 100 TB/day the state held is one
row per (window, event_type), not per event. The sessionizer keeps one
small state blob per user_id; ``applyInPandasWithState`` processes each
key's micro-batch slice as a pandas frame (Arrow-batched, not per-row).
"""

from __future__ import annotations

import os
import tempfile
import uuid
from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from geektime_bigdata_spark.registry import table

SESSION_GAP_SEC = 30 * 60


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet with the same ns->us
    timestamp normalization as the batch registry (file streams require an
    explicit schema; we take the raw one and convert)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return _events_stream(spark, sf_dir)


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream with the same ns->us timestamp normalization as the batch
    registry (the raw parquet long column arrives as-is in the stream)."""
    raw_schema = spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")
    ).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes)["ts"] == "bigint":
        stream = stream.withColumn(
            "ts", F.expr("timestamp_micros(ts div 1000)")
        )
    return stream


def run_streaming_hourly_rollup(
    spark: SparkSession, sf_dir: str, timeout_sec: int = 120
) -> DataFrame:
    """Tumbling 1-hour window x event_type counts/sums with a 1-hour
    watermark, executed with ``availableNow`` into a memory sink.

    Batch twin: :func:`...operators.windows.hourly_event_rollup` (the
    window start == date_trunc('hour', ts) for tumbling windows)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("hour"),
            "event_type",
            "n",
            "total_value",
        )
    )
    name = f"gbs_stream_hourly_{uuid.uuid4().hex[:8]}"
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_sec)
    return spark.table(name)


def run_streaming_sliding_counts(
    spark: SparkSession, sf_dir: str, timeout_sec: int = 120
) -> DataFrame:
    """Hopping-window streaming aggregate: 2-hour windows advancing
    hourly, watermarked. Batch twin:
    :func:`...operators.windows.sliding_window_counts`. Same Expand
    (2 rows per event) + windowed state; watermark bounds state to the
    open windows only."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(F.col("w.start").alias("w_start"), "n", "total_value")
    )
    name = f"gbs_stream_sliding_{uuid.uuid4().hex[:8]}"
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_sec)
    return spark.table(name)


def run_streaming_enriched_rollup(
    spark: SparkSession, sf_dir: str, timeout_sec: int = 120
) -> DataFrame:
    """Stream-static join: the events stream enriched against the static
    ``customer`` dimension (user_id -> mktsegment), then a per-segment
    rollup. The static side re-resolves per micro-batch and broadcasts —
    the canonical dimension-enrichment topology; no state beyond the
    aggregate itself."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = _events_stream(spark, sf_dir)
    dim = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    agg = (
        stream.join(F.broadcast(dim), "user_id")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )
    name = f"gbs_stream_enriched_{uuid.uuid4().hex[:8]}"
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_sec)
    return spark.table(name)


def run_streaming_attribution(
    spark: SparkSession, sf_dir: str, timeout_sec: int = 180
) -> DataFrame:
    """Stream-stream join: purchases joined to the same user's clicks in
    the preceding hour — both sides are watermarked streams, so Spark
    buffers only the last ~2h of clicks per key in state (the time-range
    condition bounds state eviction; an unwatermarked stream join would
    buffer forever). Batch twin: the pair set of
    :func:`...operators.joins.attribution_range_join` (pre-aggregation).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = _events_stream(spark, sf_dir)
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "2 hours")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") < F.col("p_ts")),
    ).select("purchase_id", "user_id", "c_ts")
    name = f"gbs_stream_attr_{uuid.uuid4().hex[:8]}"
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_sec)
    return spark.table(name)


def run_streaming_dedup(
    spark: SparkSession, sf_dir: str, timeout_sec: int = 120
) -> DataFrame:
    """Streaming exact dedup: first event per (user_id, event_type) key
    passes, later duplicates drop —
    ``dropDuplicatesWithinWatermark`` keeps per-key state only within the
    watermark horizon, so state is bounded even on an infinite stream
    (plain dropDuplicates on a stream grows state forever). The
    training-data analogue is streaming ingest dedup by content
    fingerprint."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = _events_stream(spark, sf_dir).select(
        "user_id", "event_type", "ts"
    )
    deduped = stream.withWatermark("ts", "24 hours").dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )
    name = f"gbs_stream_dedup_{uuid.uuid4().hex[:8]}"
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            deduped.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_sec)
    return spark.table(name)


def run_streaming_upsert_sink(
    spark: SparkSession, sf_dir: str, out_dir: str, timeout_sec: int = 180
) -> DataFrame:
    """``foreachBatch`` upsert sink: each micro-batch merges its rows into
    a keyed parquet state (latest write per (user_id, event_type) wins) —
    the standard stream->lakehouse upsert topology when the table format
    has no native MERGE. The merge itself is the batch compaction pattern
    (union + newest-per-key window), so replaying a batch is idempotent.
    At scale the state table is partitioned/bucketed by key so each batch
    rewrites only touched partitions. Returns the final state DataFrame."""
    from pyspark.sql import Window

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = _events_stream(spark, sf_dir).select(
        "user_id", "event_type", "ts", "value", "event_id"
    )
    state_path = os.path.join(out_dir, "state")

    def merge_batch(batch_df, batch_id: int) -> None:
        sess = batch_df.sparkSession
        try:
            existing = sess.read.parquet(state_path)
        except Exception:
            existing = None
        merged = (
            existing.unionByName(batch_df) if existing is not None else batch_df
        )
        w = Window.partitionBy("user_id", "event_type").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        latest = (
            merged.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        # write-then-swap would be atomic on a real table format; plain
        # parquet needs the temp-dir dance because we read our own output
        tmp = state_path + f".tmp{batch_id}"
        latest.write.mode("overwrite").parquet(tmp)
        final = sess.read.parquet(tmp)
        final.write.mode("overwrite").parquet(state_path)

    ckpt = os.path.join(out_dir, "ckpt")
    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return spark.read.parquet(state_path)


def _sessionize_group(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Stateful per-user sessionizer: carries (last_ts_us, n_sessions)
    across micro-batches; a gap > SESSION_GAP_SEC starts a new session.
    Emits the running per-user session count each batch."""
    (user_id,) = key
    if state.exists:
        last_ts_us, n_sessions = state.get
    else:
        last_ts_us, n_sessions = -1, 0
    # gather the key's full batch slice before sorting — a key's rows may
    # arrive as several pandas chunks within one micro-batch
    all_ts = [ts for pdf in pdfs for ts in pdf["ts"]]
    for ts in sorted(all_ts):
        ts_us = int(pd.Timestamp(ts).value // 1000)
        if last_ts_us < 0 or ts_us - last_ts_us > SESSION_GAP_SEC * 1_000_000:
            n_sessions += 1
        last_ts_us = ts_us
    state.update((last_ts_us, n_sessions))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_sessions": [n_sessions]}
    )


def run_streaming_sessionization(
    spark: SparkSession, sf_dir: str, timeout_sec: int = 120
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    session counting with a 30-minute gap — the streaming twin of the
    batch :func:`...operators.windows.sessionize` (same gap rule).

    State is one (last_ts, count) pair per user; with ProcessingTimeTimeout
    disabled and availableNow the final emitted row per user equals the
    batch session count."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = _events_stream(spark, sf_dir).select("user_id", "ts")
    out = stream.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType="user_id long, n_sessions long",
        stateStructType="last_ts_us long, n_sessions long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"gbs_stream_sessions_{uuid.uuid4().hex[:8]}"
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_sec)
    # last emitted row per user is the final count
    t = spark.table(name)
    return t.groupBy("user_id").agg(F.max("n_sessions").alias("n_sessions"))
