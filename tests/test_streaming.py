"""Streaming/batch equivalence tests (SURVEY.md §7.3: streaming checks use
availableNow micro-batch -> static-batch equivalence, not the DuckDB oracle)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from geektime_bigdata_spark.functions import grid_round
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
            grid_round(
                (
                    F.sum(
                        F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5)).cast(
                            "long"
                        )
                    )
                    / F.lit(1e6)
                ).cast("double"),
                6,
            ).alias("total_value"),
        )
    )
    assert _rowset(stream_result) == _rowset(batch_result)


def test_streaming_full_outer_attribution_sound_vs_batch(spark, sf_dir):
    """FULL OUTER stream-stream join soundness: matched rows equal the
    batch inner join; every left-null row is a true purchase anti-join
    member and every right-null row a true click anti-join member; no
    null row duplicates."""
    from geektime_bigdata_spark.streaming.windows import (
        run_streaming_attribution_full_outer,
    )

    out = run_streaming_attribution_full_outer(spark, sf_dir).collect()
    e = table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    cond = (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") < F.col("p_ts"))
    )
    inner = {
        (r["purchase_id"], r["click_id"])
        for r in p.join(c, cond).select("purchase_id", "click_id").collect()
    }
    p_anti = {r["purchase_id"] for r in p.join(c, cond, "left_anti").collect()}
    c_anti = {r["click_id"] for r in c.join(p, cond, "left_anti").collect()}
    got_matched = {
        (r["purchase_id"], r["click_id"])
        for r in out
        if r["purchase_id"] is not None and r["click_id"] is not None
    }
    got_pnull = [r["purchase_id"] for r in out if r["click_id"] is None]
    got_cnull = [r["click_id"] for r in out if r["purchase_id"] is None]
    assert got_matched == inner and inner
    assert set(got_pnull) <= p_anti
    assert set(got_cnull) <= c_anti
    assert len(got_pnull) == len(set(got_pnull))
    assert len(got_cnull) == len(set(got_cnull))


def _protobuf_usable() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_usable(),
    reason="transformWithState's driver worker needs google.protobuf "
    "(state-server protocol); this container ships it broken and "
    "installs are disallowed — runs on any normal cluster image",
)
def test_streaming_user_totals_tws_equals_batch(spark, sf_dir):
    """transformWithStateInPandas running totals: the newest emission
    per user after an availableNow drain must equal the batch
    groupBy(user_id) count + micro-unit sum exactly."""
    from geektime_bigdata_spark.streaming.windows import (
        run_streaming_user_totals_tws,
    )

    got = run_streaming_user_totals_tws(spark, sf_dir)
    e = table(spark, sf_dir, "events")
    want = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5)).cast("long")
        ).alias("total_value_micros"),
    )
    assert _rowset(got) == _rowset(want)


def test_streaming_session_windows_equals_batch(spark, sf_dir):
    """Native session_window under availableNow (complete mode) must
    equal the batch gap-merge rollup row-for-row."""
    from geektime_bigdata_spark.operators.windows import (
        session_window_rollup,
    )
    from geektime_bigdata_spark.streaming.windows import (
        run_streaming_session_windows,
    )

    stream_result = run_streaming_session_windows(spark, sf_dir)
    batch_result = session_window_rollup(spark, sf_dir)
    assert stream_result.columns == batch_result.columns
    assert _rowset(stream_result) == _rowset(batch_result)


def test_streaming_sessionization_equals_batch(spark, sf_dir):
    """The stateful sessionizer now emits the full batch-sessionize
    schema (user_id, session_id, n_events, session_value_micros,
    duration_us — the all-integer contract surface), so the equivalence
    check is row-for-row against the batch twin."""
    stream_result = run_streaming_sessionization(spark, sf_dir)
    batch_result = sessionize(spark, sf_dir)
    assert stream_result.columns == batch_result.columns
    assert _rowset(stream_result) == _rowset(batch_result)


def test_watermark_drops_late_data(spark, tmp_path):
    """Watermark semantics: an event older than the watermark arriving in a
    later micro-batch is DROPPED — the closed window's emitted count never
    changes. Two availableNow runs share one checkpoint (phase 2 sees only
    the new file), append mode emits a window only once its end passes the
    watermark."""
    import pandas as pd

    src = tmp_path / "src"
    ckpt = tmp_path / "ckpt"
    sink = tmp_path / "sink"
    src.mkdir()

    def write_batch(name, ts_list):
        # micros, not pandas-default nanos: the engine session reads
        # TIMESTAMP(NANOS) as long (registry nanosAsLong), which would
        # clash with the declared timestamp schema here
        pd.DataFrame(
            {"ts": pd.to_datetime(ts_list), "v": range(len(ts_list))}
        ).to_parquet(
            src / name, coerce_timestamps="us", allow_truncated_timestamps=True
        )

    def run_phase():
        stream = (
            spark.readStream.schema("ts timestamp, v long")
            .parquet(str(src))
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("w_start"), "n")
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", str(sink))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # phase 1: events at 10:00/11:00/12:00 -> watermark 11:00; the
    # 10:00-11:00 window closes and is emitted with n=1
    write_batch("a.parquet", ["2024-01-01 10:00", "2024-01-01 11:00",
                              "2024-01-01 12:00"])
    run_phase()
    # phase 2: a LATE event at 10:30 (< watermark -> dropped) plus 13:00
    # advancing the watermark to 12:00 -> the 11:00 window closes with n=1
    write_batch("b.parquet", ["2024-01-01 10:30", "2024-01-01 13:00"])
    run_phase()

    rows = {
        str(r["w_start"]): r["n"]
        for r in spark.read.parquet(str(sink)).collect()
    }
    # the late 10:30 event must NOT have re-opened/changed the 10:00 window
    assert rows.get("2024-01-01 10:00:00") == 1, rows
    assert rows.get("2024-01-01 11:00:00") == 1, rows
    # and exactly one emission per closed window
    assert len(rows) == 2, rows


def test_streaming_attribution_equals_batch_pairs(spark, sf_dir):
    """Stream-stream join result must equal the batch non-equi join's
    pair set (availableNow processes everything; watermarks only bound
    state, they drop nothing in a single complete pass)."""
    from geektime_bigdata_spark.streaming.windows import (
        run_streaming_attribution,
    )

    stream_pairs = run_streaming_attribution(spark, sf_dir)
    e = table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts").alias("p_ts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    batch_pairs = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") < F.col("p_ts")),
    ).select("purchase_id", "user_id", "c_ts")
    assert _rowset(stream_pairs) == _rowset(batch_pairs)


def test_streaming_upsert_sink_equals_batch_upsert(spark, sf_dir, tmp_path):
    """The foreachBatch keyed-merge sink's final state must equal the
    batch append+newest-per-key compaction (upsert_latest)."""
    from geektime_bigdata_spark.operators.relational import upsert_latest
    from geektime_bigdata_spark.streaming.windows import (
        run_streaming_upsert_sink,
    )

    state = run_streaming_upsert_sink(spark, sf_dir, str(tmp_path / "sink"))
    batch = upsert_latest(spark, sf_dir)
    cols = ["user_id", "event_type", "ts", "value", "event_id"]
    assert _rowset(state.select(*cols)) == _rowset(batch.select(*cols))


def test_streaming_dedup_one_row_per_key(spark, sf_dir):
    """Streaming dedup keeps exactly one row per key, and the key set
    equals the batch distinct (WHICH row survives depends on arrival
    order, so the contract is per-key uniqueness + key coverage)."""
    from geektime_bigdata_spark.streaming.windows import run_streaming_dedup

    out = run_streaming_dedup(spark, sf_dir)
    per_key = out.groupBy("user_id", "event_type").count().collect()
    assert per_key and all(r["count"] == 1 for r in per_key)
    batch_keys = _rowset(
        table(spark, sf_dir, "events").select("user_id", "event_type").distinct()
    )
    assert _rowset(out.select("user_id", "event_type")) == batch_keys


def test_streaming_outer_attribution_sound_vs_batch(spark, sf_dir):
    """LEFT OUTER stream-stream join soundness: matched rows must equal
    the batch inner join exactly, and every null-padded row must be a
    true batch anti-join member (availableNow may WITHHOLD trailing
    null rows — watermark hasn't passed their bound — but must never
    invent or duplicate one)."""
    from geektime_bigdata_spark.streaming.windows import (
        run_streaming_attribution_outer,
    )

    out = run_streaming_attribution_outer(spark, sf_dir).collect()
    e = table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts").alias("p_ts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    cond = (
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") < F.col("p_ts"))
    )
    inner = {
        (r["purchase_id"], r["user_id"], r["c_ts"])
        for r in p.join(c, cond).select(
            "purchase_id", "user_id", "c_ts"
        ).collect()
    }
    anti = {
        r["purchase_id"]
        for r in p.join(c, cond, "left_anti").collect()
    }
    got_matched = {
        (r["purchase_id"], r["user_id"], r["c_ts"])
        for r in out
        if r["c_ts"] is not None
    }
    got_null = [r["purchase_id"] for r in out if r["c_ts"] is None]
    assert got_matched == inner and inner
    assert set(got_null) <= anti
    assert len(got_null) == len(set(got_null))


def test_state_source_reads_aggregation_state(spark, tmp_path):
    """The state data source must expose exactly the per-key aggregation
    buffers a drained streaming agg holds — equal to the batch
    aggregate of the same input. Value fields are the physical buffer
    names (count, sum), not output aliases."""
    from pyspark.sql import functions as F

    from geektime_bigdata_spark.streaming import inspect_streaming_state

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(30)],
        "event_id long, user_id long, value double",
    )
    df.write.parquet(src)
    stream = (
        spark.readStream.schema("event_id long, user_id long, value double")
        .parquet(src)
    )
    q = (
        stream.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .writeStream.outputMode("complete")
        .format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    meta, state = inspect_streaming_state(spark, ckpt)
    ops = meta.collect()
    assert len(ops) == 1 and ops[0]["operatorName"] == "stateStoreSave"

    got = sorted(
        (r["key"]["user_id"], r["count"], r["sum"])
        for r in state.select(
            "key", "value.count", "value.sum"
        ).collect()
    )
    ref = sorted(
        (r["user_id"], r["n"], r["s"])
        for r in df.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    )
    assert got == ref, (got, ref)


def test_state_source_reads_join_sides(spark, tmp_path):
    """A stream-stream join checkpoint exposes four symmetricHashJoin
    stores (keyToNumValues / keyWithIndexToValue per side); the
    joinSide option reads each side's buffered rows — here nothing is
    watermark-evicted, so each side's state holds exactly its filtered
    input."""
    import datetime as dt

    from pyspark.sql import functions as F

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    base = dt.datetime(2024, 5, 1, 9, 0, 0)
    rows = [
        (i, base + dt.timedelta(minutes=i), i % 3,
         "click" if i % 2 else "purchase", float(i), "{}")
        for i in range(40)
    ]
    ddl = ("event_id long, ts timestamp, user_id long, "
           "event_type string, value double, props string")
    spark.createDataFrame(rows, ddl).write.parquet(src)
    s = spark.readStream.schema(ddl).parquet(src)
    clicks = (
        s.filter("event_type='click'")
        .select("user_id", F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "2 hours")
    )
    purch = (
        s.filter("event_type='purchase'")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "2 hours")
    )
    j = clicks.join(
        purch,
        (clicks.user_id == purch.p_user)
        & purch.p_ts.between(
            clicks.c_ts, clicks.c_ts + F.expr("INTERVAL 1 HOUR")
        ),
    )
    q = (
        j.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    meta = spark.read.format("state-metadata").load(ckpt)
    stores = {r["stateStoreName"] for r in meta.collect()}
    assert stores == {
        "left-keyToNumValues", "left-keyWithIndexToValue",
        "right-keyToNumValues", "right-keyWithIndexToValue",
    }
    n_clicks = sum(1 for r in rows if r[3] == "click")
    n_purch = len(rows) - n_clicks
    left = spark.read.format("statestore").option("joinSide", "left").load(ckpt)
    right = spark.read.format("statestore").option("joinSide", "right").load(ckpt)
    assert left.count() == n_clicks
    assert right.count() == n_purch
