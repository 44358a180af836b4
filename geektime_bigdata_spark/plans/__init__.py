"""Plan introspection — homework-5 parity (SURVEY.md §4.3).

The reference's one custom artifact is ``MyPushDown``, a no-op Catalyst rule
that logs ``plan.toJSON`` (MySparkSessionExtension.scala:13-18), injected via
``injectOptimizerRule`` and observed through PlanChangeLogger output
captured in homework-5/README.md:112-904. PySpark reaches the same
observables without a JVM build step:

- :func:`explain_str` — EXPLAIN simple/extended/formatted/codegen/cost.
- :func:`optimized_plan_json` — the optimizer output as JSON, the exact
  payload MyPushDown logged.
- :func:`enable_plan_change_log` — the PlanChangeLogger switch the
  reference used (``spark.sql.planChangeLog.level``).
- :func:`plan_summary` — physical-operator census for plan-shape tests
  (partial/final HashAggregate, BroadcastHashJoin, PushedFilters...).
"""

from geektime_bigdata_spark.plans.introspect import (
    enable_plan_change_log,
    explain_str,
    optimized_plan_json,
    plan_summary,
)

__all__ = [
    "explain_str",
    "optimized_plan_json",
    "enable_plan_change_log",
    "plan_summary",
]
