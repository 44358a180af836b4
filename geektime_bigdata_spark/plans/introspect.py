"""Plan introspection utilities (see package docstring).

Reference: /root/reference/homework-5/src/main/scala/club/projectgaia/
bigdata/homework5/MySparkSessionExtension.scala:13-25 (no-op logging rule)
and homework-5/README.md:81 (planChangeLog activation). These functions
reproduce the *capability* — observing analyzer/optimizer/physical plans —
with public PySpark APIs only.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """EXPLAIN output as a string (modes: simple, extended, codegen,
    cost, formatted) — the `df.explain()` text without stdout capture."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def optimized_plan_json(df: DataFrame) -> list[dict]:
    """The optimized logical plan serialized to JSON — the same payload the
    reference's MyPushDown rule logged (plan.toJSON,
    MySparkSessionExtension.scala:15), parsed into Python objects."""
    return json.loads(df._jdf.queryExecution().optimizedPlan().toJSON())


def enable_plan_change_log(spark: SparkSession, level: str = "WARN") -> None:
    """Turn on Catalyst's PlanChangeLogger (homework-5/README.md:81):
    every effective rule application is logged with before/after plans."""
    spark.conf.set("spark.sql.planChangeLog.level", level)


def disable_plan_change_log(spark: SparkSession) -> None:
    spark.conf.unset("spark.sql.planChangeLog.level")


def plan_summary(df: DataFrame) -> dict[str, object]:
    """Physical-plan census for plan-shape assertions: operator name counts
    plus pushdown/codegen indicators from EXPLAIN formatted."""
    text = explain_str(df, "formatted")
    ops: dict[str, int] = {}
    for line in text.splitlines():
        s = line.strip()
        # operator tree lines look like "* HashAggregate (5)" / "+- Exchange (4)"
        if "(" in s and (s.startswith(("*", "+-", ":", "-"))) :
            name = (
                s.lstrip("*+-: ")
                .split("(")[0]
                .strip()
            )
            if name:
                ops[name] = ops.get(name, 0) + 1
    return {
        "operators": ops,
        "has_pushed_filters": "PushedFilters: [" in text
        and "PushedFilters: []" not in text,
        "wholestage_codegen": "* " in text or "*(" in text,
        "n_exchanges": ops.get("Exchange", 0) + ops.get("AQEShuffleRead", 0),
        "text": text,
    }
