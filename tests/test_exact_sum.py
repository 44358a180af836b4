"""Edge-case contract tests for the float-determinism primitives."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from geektime_bigdata_spark.functions import exact_sum, grid_round


def test_exact_sum_empty_and_all_null_yield_null(spark):
    """SQL sum semantics: empty input and all-null input -> NULL (the
    overflow guard must not fire on the NULL count*max product)."""
    empty = spark.createDataFrame([(1.5,)], "v double").filter("v > 99")
    assert empty.agg(exact_sum("v").alias("s")).collect()[0]["s"] is None
    nulls = spark.createDataFrame([(None,), (None,)], "v double")
    assert nulls.agg(exact_sum("v").alias("s")).collect()[0]["s"] is None


def test_exact_sum_is_exact_and_order_independent(spark):
    rows = [(0.1,), (0.2,), (0.3,), (123.456789,)]
    df = spark.createDataFrame(rows, "v double")
    got = df.agg(exact_sum("v").alias("s")).collect()[0]["s"]
    assert got == 123.456789 + 0.6  # micro-grid sum: 124056789 / 1e6
    assert got == 124056789 / 1e6
    # repartitioning (different accumulation order) cannot move the result
    for n in (1, 3, 7):
        alt = df.repartition(n).agg(exact_sum("v").alias("s")).collect()
        assert alt[0]["s"] == got


def test_exact_sum_overflow_raises_loudly(spark):
    """A group exceeding the long envelope must error (ANSI sum overflow
    or the count*max guard), never silently wrap."""
    big = spark.createDataFrame([(9.0e12,)] * 4, "v double")
    with pytest.raises(Exception, match="OVERFLOW|envelope"):
        big.agg(exact_sum("v").alias("s")).collect()


def test_exact_sum_wide_handles_beyond_long_scale(spark):
    big = spark.createDataFrame([(9.0e12,)] * 4, "v double")
    got = big.agg(exact_sum("v", wide=True).alias("s")).collect()[0]["s"]
    assert got == 3.6e13


def test_grid_round_at_exact_decimal_tie(spark):
    """The motivating case: 642700/200/1e6 = 0.0032135 exactly — a
    decimal tie where SQL round() diverges between engines; grid_round
    must floor the double's actual side deterministically."""
    df = spark.createDataFrame([(642700 / 200 / 1e6,)], "v double")
    got = df.select(grid_round("v", 6).alias("r")).collect()[0]["r"]
    # double(0.0032135) sits just below the true tie; floor(+0.5) is
    # deterministic — and identical to DuckDB's evaluation of the same ops
    import duckdb

    duck = duckdb.connect().execute(
        "SELECT floor((642700 / 200 / 1000000.0) * 1000000.0 + 0.5)"
        " / 1000000.0"
    ).fetchone()[0]
    assert got == duck


def test_oracle_canon_distinguishes_one_ulp():
    """The parity gate is only as strong as its canonicalizer: a 1-ulp
    engine divergence must NOT survive _canon (round 2's sessionize
    fail hid behind a 12-sig-digit canon; the full-repr canon is the
    fix and this pins it)."""
    import math

    from tests.oracle import _canon

    x = 0.1
    y = math.nextafter(x, 1.0)
    assert x != y and _canon(x) != _canon(y)
    # and NaN/None/bool stay distinguishable from each other and floats
    assert len({_canon(float("nan")), _canon(None), _canon(True),
                _canon(1.0)}) == 4


def test_values_relation_guards_empty_and_nonfinite(spark):
    """ADVICE r17: empty rows and non-finite doubles must fall back to
    createDataFrame instead of rendering malformed VALUES SQL."""
    from geektime_bigdata_spark.functions import values_relation

    empty = values_relation(spark, [], "a long, b double")
    assert empty.collect() == []
    assert [f.name for f in empty.schema.fields] == ["a", "b"]

    nan_inf = values_relation(
        spark,
        [(1, float("nan")), (2, float("inf"))],
        "a long, b double",
    )
    rows = {r["a"]: r["b"] for r in nan_inf.collect()}
    assert rows[1] != rows[1]  # NaN
    assert rows[2] == float("inf")

    # the fast VALUES path still round-trips finite doubles bit-exactly
    v = values_relation(spark, [(7, 0.1 + 0.2)], "a long, b double")
    assert v.collect()[0]["b"] == 0.1 + 0.2


def test_lift_collected_guards_nonfinite(spark):
    from geektime_bigdata_spark.functions import lift_collected

    src = spark.createDataFrame(
        [(1, float("nan")), (2, float("-inf")), (3, 1.25)], "a long, b double"
    )
    out = {r["a"]: r["b"] for r in lift_collected(spark, src).collect()}
    assert out[1] != out[1]
    assert out[2] == float("-inf")
    assert out[3] == 1.25


def test_shingles_n1_short_circuit(spark):
    """ADVICE r17: n=1 must not render a trailing-comma arrays_zip."""
    from geektime_bigdata_spark.functions import shingles

    df = spark.createDataFrame(
        [(["a", "b", "a"],), ([],)], "toks array<string>"
    )
    got = [r[0] for r in df.select(shingles("toks", 1)).collect()]
    assert got == [["a", "b"], []]
