"""JVM SparkSessionExtensions parity test (reference:
homework-5 MySparkSessionExtension.scala:13-25): build the extension jar
with Spark's bundled Scala compiler, boot a FRESH JVM configured with
``spark.sql.extensions=gbs.ext.GbsSparkExtension``, and assert the
injected rule (a) registers in the optimizer's "User Provided Optimizers"
batch and (b) actually fires during query optimization.

A subprocess is required because extensions bind at SparkSession
construction — the suite's shared session (and its JVM) can't be reused.
Skips cleanly when the Spark-bundled scala-compiler jar is absent.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXT_DIR = os.path.join(REPO, "ext")
JAR = os.path.join(EXT_DIR, "gbs-spark-extension.jar")

_PROBE = """
import sys
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .appName("gbs-ext-smoke")
    .config("spark.sql.extensions", "gbs.ext.GbsSparkExtension")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
# (a) registered: injectOptimizerRule lands the rule in the two
# "Operator Optimization ..." batches (extendedOperatorOptimizationRules;
# the "User Provided Optimizers" batch is experimental.extraOptimizations,
# a different extension point)
opt = spark._jsparkSession.sessionState().optimizer()
batches = opt.batches()
hits = []
for i in range(batches.size()):
    b = batches.apply(i)
    rules = b.rules()
    if any(
        "GbsNoopRule" in rules.apply(j).ruleName()
        for j in range(rules.size())
    ):
        hits.append(b.name())
assert hits, "GbsNoopRule not registered in any optimizer batch"
# (b) fires: run a real query and read the invocation counter via py4j
# (py4j auto-converts the AtomicLong, a java.lang.Number, to int)
df = spark.sql("SELECT id % 7 AS k, count(*) AS n FROM range(1000) GROUP BY id % 7")
df.collect()
cls = spark._jvm.java.lang.Class.forName("gbs.ext.GbsRuleCounter$")
module = cls.getField("MODULE$").get(None)
fired = module.count()
assert fired > 0, fired
print(f"EXT_OK batches={hits} fired={fired}")
"""


@pytest.mark.skipif(
    not glob.glob("/opt/spark/jars/scala-compiler-*.jar"),
    reason="Spark-bundled scala compiler not present; cannot build the jar",
)
def test_extension_rule_registers_and_fires(tmp_path):
    src = os.path.join(EXT_DIR, "src", "main", "scala",
                       "GbsSparkExtension.scala")
    if not os.path.exists(JAR) or (
        os.path.getmtime(src) > os.path.getmtime(JAR)
    ):
        subprocess.run(
            [os.path.join(EXT_DIR, "build.sh")], check=True, timeout=300
        )
    probe = tmp_path / "probe.py"
    probe.write_text(_PROBE)
    env = dict(os.environ)
    # the extension class must be on the DRIVER classpath when the JVM
    # launches — builder .config() lands after JVM start in a python-
    # launched session, so pass it through the gateway's submit args
    env["PYSPARK_SUBMIT_ARGS"] = (
        f"--driver-class-path {JAR} pyspark-shell"
    )
    res = subprocess.run(
        [sys.executable, str(probe)],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
        env=env,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert "EXT_OK" in res.stdout, res.stdout
