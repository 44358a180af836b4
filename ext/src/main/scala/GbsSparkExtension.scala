// JVM extension-point parity for the reference's custom optimizer rule
// injection (reference: homework-5/src/main/scala/club/projectgaia/bigdata/
// homework5/MySparkSessionExtension.scala:13-25, `injectOptimizerRule` at
// :20-25 — semantics reproduced against the public SparkSessionExtensions
// API, not copied).
//
// The injected rule lands in the optimizer's "User Provided Optimizers"
// batch and runs on every optimization pass. It is a deliberate no-op on
// the plan (the Python side of this repo carries the real optimizations);
// what it demonstrates is the LOADABLE JVM HOOK: a cluster operator can
// ship plan-rewrite logic to every session via
//   --conf spark.jars=ext/gbs-spark-extension.jar
//   --conf spark.sql.extensions=gbs.ext.GbsSparkExtension
// with zero application-code changes.
//
// Build (no build tool needed — uses Spark's own bundled scala-compiler):
//   ext/build.sh
// Verified by tests/test_jvm_extension.py, which builds the jar, boots a
// fresh JVM with the extension configured, and asserts the rule both
// registers in the "User Provided Optimizers" batch and actually fires.

package gbs.ext

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Observable invocation counter: the smoke test reads this through py4j
  * to prove the batch FIRED, not merely registered. */
object GbsRuleCounter {
  val count = new AtomicLong(0L)
}

/** No-op logging rule: counts invocations, returns the plan unchanged. */
class GbsNoopRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    GbsRuleCounter.count.incrementAndGet()
    logDebug(s"GbsNoopRule pass over ${plan.nodeName}")
    plan
  }
}

/** Entry point named by spark.sql.extensions. */
class GbsSparkExtension extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectOptimizerRule(_ => new GbsNoopRule)
  }
}
