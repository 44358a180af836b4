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


def test_misra_gries_guarantee(spark, sf_dir):
    """Distributed Misra-Gries contract: estimates never overcount, the
    summed undercount is bounded by N/k, and every term with true
    frequency above N/k survives the sketch."""
    from geektime_bigdata_spark.operators.sketches import (
        MG_COUNTERS,
        frequent_terms_exact,
        frequent_terms_mg,
    )

    exact = {
        r["term"]: r["n"] for r in frequent_terms_exact(spark, sf_dir).collect()
    }
    est = {
        r["term"]: r["n_est"] for r in frequent_terms_mg(spark, sf_dir).collect()
    }
    n_total = sum(exact.values())
    bound = n_total / MG_COUNTERS
    assert set(est) <= set(exact)
    for t, n in exact.items():
        if n > bound:
            assert t in est, (t, n, bound)
        if t in est:
            assert n - bound <= est[t] <= n, (t, n, est[t], bound)
