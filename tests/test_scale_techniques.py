"""Scale-technique tests: bucketed joins must elide exchanges; salted
aggregation must equal the plain aggregation."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from geektime_bigdata_spark.operators.scale import (
    bucketed_order_lineitem_join,
    salted_top_words,
    write_bucketed,
)
from geektime_bigdata_spark.operators.text import word_counts
from geektime_bigdata_spark.plans import explain_str


@pytest.fixture(scope="module")
def bucketed_db(spark, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("bucketed")
    # location comes from the session warehouse; we just need the tables
    write_bucketed(spark, "/root/testdata/sf0.001", db="gbs_bucketed_test")
    yield "gbs_bucketed_test"
    spark.sql("DROP TABLE IF EXISTS gbs_bucketed_test.orders")
    spark.sql("DROP TABLE IF EXISTS gbs_bucketed_test.lineitem")
    spark.sql("DROP DATABASE IF EXISTS gbs_bucketed_test")


def test_bucketed_join_elides_exchange(spark, bucketed_db):
    df = bucketed_order_lineitem_join(spark, db=bucketed_db)
    # force the SMJ path: at test scale the planner would broadcast the
    # tiny side, which proves nothing about bucket co-location (at 100 TB
    # neither fact side is broadcastable)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        join_plan = explain_str(
            spark.table(f"{bucketed_db}.orders").join(
                spark.table(f"{bucketed_db}.lineitem"),
                spark.table(f"{bucketed_db}.orders")["o_orderkey"]
                == spark.table(f"{bucketed_db}.lineitem")["l_orderkey"],
            ),
            "formatted",
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in join_plan, join_plan
    assert "Exchange" not in join_plan, join_plan
    # and the full agg query returns the right cardinality (one row per
    # order that has lineitems)
    n_orders_with_lines = (
        spark.table(f"{bucketed_db}.lineitem")
        .select("l_orderkey")
        .distinct()
        .count()
    )
    assert df.count() == n_orders_with_lines


def test_bucketed_join_values_match_unbucketed(spark, bucketed_db, sf_dir):
    from geektime_bigdata_spark.registry import table
    from pyspark.sql import functions as F

    bucketed = {
        r["o_orderkey"]: (r["n_lines"], r["revenue"])
        for r in bucketed_order_lineitem_join(spark, db=bucketed_db).collect()
    }
    o, li = table(spark, sf_dir, "orders"), table(spark, sf_dir, "lineitem")
    plain = {
        r["o_orderkey"]: (r["n_lines"], r["revenue"])
        for r in o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
        )
        .collect()
    }
    assert bucketed == plain


def test_salted_equals_plain_word_count(spark, sf_dir):
    salted = {
        r["word"]: r["cnt"] for r in salted_top_words(spark, sf_dir).collect()
    }
    plain = {r["word"]: r["cnt"] for r in word_counts(spark, sf_dir).collect()}
    assert salted == plain


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join handling demonstrated on ACTUAL skew: 95% of a
    synthetic fact lands on one hot key, the dim side is uniform, and
    after execution the adaptive plan must show the hot partition was
    split (SortMergeJoin(skew=true) + a 'skewed' AQEShuffleRead).

    Two test-scale adjustments, both size-only (the rule itself is
    untouched): thresholds are lowered from the 256MB production default
    so ~5MB of skew qualifies, and the fact side is repartitioned to 16
    map tasks first — skew splits operate on per-mapper output chunks,
    so a single-mapper input (one small parquet file) is indivisible no
    matter how skewed it is. At 100 TB both conditions hold naturally
    (thousands of mappers, multi-GB hot partitions)."""
    from geektime_bigdata_spark.registry import table

    tuned = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in tuned}
    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        e = table(spark, "/root/testdata/sf0.1", "events")
        fact = e.select(
            F.when(F.col("event_id") % 20 != 0, F.lit(1))
            .otherwise(F.col("event_id") % 50)
            .alias("k"),
            "value",
            "props",
        ).repartition(16)
        dim = spark.range(0, 50).select(
            F.col("id").alias("k"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        joined = fact.join(dim, "k")
        n = len(joined.collect())  # run to completion so AQE finalizes
        assert n == fact.count()
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, final
        assert any(
            "skewed" in line and "AQEShuffleRead" in line
            for line in final.splitlines()
        ), final
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_partition_pruning(spark, sf_dir, tmp_path):
    """A dt-partitioned layout must prune directories at planning time:
    the day predicate lands in PartitionFilters and the scanned data is
    exactly that day's (count matches a full-scan filter)."""
    from geektime_bigdata_spark.operators.scale import (
        pruned_daily_rollup,
        write_date_partitioned,
    )
    from geektime_bigdata_spark.plans import explain_str
    from geektime_bigdata_spark.registry import table

    out = str(tmp_path / "events_by_day")
    write_date_partitioned(spark, sf_dir, out)
    day = "2024-01-05"
    df = pruned_daily_rollup(spark, out, day)
    text = explain_str(df, "formatted")
    pf_lines = [l for l in text.splitlines() if "PartitionFilters" in l]
    assert pf_lines and "dt" in pf_lines[0], text

    expect = (
        table(spark, sf_dir, "events")
        .filter(F.date_format("ts", "yyyy-MM-dd") == day)
        .count()
    )
    got = df.agg(F.sum("n")).collect()[0][0]
    assert got == expect and expect > 0, (got, expect)


def test_dynamic_partition_pruning_subquery(spark, sf_dir, tmp_path):
    """Joining a dt-partitioned fact against a FILTERED dim must inject a
    dynamicpruning subquery on the fact scan (DPP — partitions are
    skipped at runtime from the dim's build side, the mechanism that
    makes star-schema joins viable on a partitioned 100 TB fact), and
    the result must equal the semantically-identical static filter."""
    from geektime_bigdata_spark.operators.scale import write_date_partitioned
    from geektime_bigdata_spark.plans import explain_str

    out = str(tmp_path / "events_dpp")
    write_date_partitioned(spark, sf_dir, out)
    fact = spark.read.parquet(out)
    days = [r["dt"] for r in fact.select("dt").distinct().collect()]
    pick = sorted(days)[:2]
    dim = spark.createDataFrame(
        [(d, "keep" if d in pick else "drop") for d in days], "dt string, flag string"
    )
    joined = (
        fact.join(dim.filter(F.col("flag") == "keep"), "dt")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    text = explain_str(joined, "formatted")
    assert "dynamicpruning" in text.lower(), text

    expect = (
        fact.filter(F.col("dt").isin(pick))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    got = joined.collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, expect)) and got


def test_runtime_bloom_filter_join_pruning(spark, sf_dir):
    """A selective filter on the dimension side of a shuffle join makes
    Spark inject a RUNTIME bloom filter: the filtered orders keys build a
    ``bloom_filter_agg`` (partial+merge — one sketch per task crosses the
    wire) and the lineitem side applies ``might_contain`` BEFORE its
    shuffle. At 100 TB this is the difference between shuffling the whole
    fact table and shuffling only rows that can possibly join — the
    runtime-filter analogue of static partition pruning. Thresholds are
    lowered because injection is size-gated (the real gates: creation
    side under ~100MB, application side over ~10GB)."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan
        assert "bloom_filter_agg" in plan, plan
        # the runtime filter must not change the answer
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
        )
        expected = (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        )
        assert sorted(map(tuple, j.collect())) == sorted(
            map(tuple, expected)
        )
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
