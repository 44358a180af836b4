"""Streaming/batch equivalence tests (SURVEY.md §7.3: streaming checks use
availableNow micro-batch -> static-batch equivalence, not the DuckDB oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from geektime_bigdata_spark.operators.windows import (
    hourly_event_rollup,
    sessionize,
    sliding_window_counts,
)
from geektime_bigdata_spark.registry import table
from geektime_bigdata_spark.streaming.windows import (
    run_streaming_enriched_rollup,
    run_streaming_hourly_rollup,
    run_streaming_sessionization,
    run_streaming_sliding_counts,
)


def _rowset(df):
    return sorted(tuple(map(str, r)) for r in df.collect())


def test_streaming_hourly_rollup_equals_batch(spark, sf_dir):
    stream_result = run_streaming_hourly_rollup(spark, sf_dir)
    batch_result = hourly_event_rollup(spark, sf_dir)
    assert _rowset(stream_result) == _rowset(batch_result)


def test_streaming_sliding_counts_equals_batch(spark, sf_dir):
    stream_result = run_streaming_sliding_counts(spark, sf_dir)
    batch_result = sliding_window_counts(spark, sf_dir)
    assert _rowset(stream_result) == _rowset(batch_result)


def test_streaming_enriched_rollup_equals_batch(spark, sf_dir):
    stream_result = run_streaming_enriched_rollup(spark, sf_dir)
    e = table(spark, sf_dir, "events")
    dim = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    batch_result = (
        e.join(dim, "user_id")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )
    assert _rowset(stream_result) == _rowset(batch_result)


def test_streaming_sessionization_equals_batch(spark, sf_dir):
    stream_result = run_streaming_sessionization(spark, sf_dir)
    batch_result = (
        sessionize(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.max("session_id").alias("n_sessions"))
    )
    assert _rowset(stream_result) == _rowset(batch_result)
