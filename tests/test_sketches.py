"""Sketch-aggregate tests: approximate answers must land within tolerance
of the exact twin (sketches cannot hash-match a DuckDB oracle — bounded
error IS their contract)."""

from __future__ import annotations

from geektime_bigdata_spark.operators.sketches import (
    distinct_users_approx,
    distinct_users_exact,
    order_quantiles_approx,
    order_quantiles_exact,
)


def _by_key(df, key):
    return {r[key]: r for r in df.collect()}


def test_hll_distinct_within_tolerance(spark, sf_dir):
    exact = _by_key(distinct_users_exact(spark, sf_dir), "event_type")
    approx = _by_key(distinct_users_approx(spark, sf_dir), "event_type")
    assert set(exact) == set(approx)
    for k in exact:
        e, a = exact[k]["n_users"], approx[k]["n_users"]
        # rsd=2%; allow 5 sigma
        assert abs(a - e) <= max(2, 0.10 * e), (k, e, a)


def test_percentile_approx_within_tolerance(spark, sf_dir):
    exact = _by_key(order_quantiles_exact(spark, sf_dir), "o_orderpriority")
    approx = _by_key(order_quantiles_approx(spark, sf_dir), "o_orderpriority")
    assert set(exact) == set(approx)
    for k in exact:
        for col in ("p50", "p99"):
            e, a = exact[k][col], approx[k][col]
            # rank error <= 1/accuracy; value tolerance 2% of the exact
            assert abs(a - e) <= max(1.0, 0.02 * abs(e)), (k, col, e, a)
