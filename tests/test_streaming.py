"""Streaming/batch equivalence tests (SURVEY.md §7.3: streaming checks use
availableNow micro-batch -> static-batch equivalence, not the DuckDB oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from geektime_bigdata_spark.operators.windows import (
    hourly_event_rollup,
    sessionize,
)
from geektime_bigdata_spark.streaming.windows import (
    run_streaming_hourly_rollup,
    run_streaming_sessionization,
)


def _rowset(df):
    return sorted(tuple(map(str, r)) for r in df.collect())


def test_streaming_hourly_rollup_equals_batch(spark, sf_dir):
    stream_result = run_streaming_hourly_rollup(spark, sf_dir)
    batch_result = hourly_event_rollup(spark, sf_dir)
    assert _rowset(stream_result) == _rowset(batch_result)


def test_streaming_sessionization_equals_batch(spark, sf_dir):
    stream_result = run_streaming_sessionization(spark, sf_dir)
    batch_result = (
        sessionize(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.max("session_id").alias("n_sessions"))
    )
    assert _rowset(stream_result) == _rowset(batch_result)
