package graft

import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.{ChaosInjectRule, ChaosOnce}

/** Pins the chaos-retry sweep's machinery (tools/ChaosRetrySweep).
  * The sweep itself is a runMain gate (verify SKILL): clean vs
  * injected-retry content hashes over the whole registry. These tests
  * pin the parts that must hold for that comparison to MEAN anything:
  * the guard is transparent on the value plane (always true, never
  * throws outside a task), and the injection rule is idempotent under
  * the fixed-point optimizer (a second application must not stack a
  * second failure point onto the same scan — that would double the
  * failure budget consumed per task and overrun maxFailures=4).
  */
class ChaosRetrySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("ChaosOnce is value-transparent: true on every row, no throw off-task") {
    val e = ChaosOnce()
    e.initialize(2) // partition 2 is a chaos residue — but no TaskContext here
    assert(e.eval(null) == true)
    assert(!e.deterministic, "must stay nondeterministic or the optimizer folds it")
  }

  test("ChaosInjectRule wraps scans and aggregates exactly once (fixed-point safe)") {
    val plan = SparkEntry.queries("q1_pricing_summary")(spark, SparkFixture.sf0001)
      .queryExecution.optimizedPlan
    def chaosFilters(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.collect { case f @ Filter(c, _) if c.isInstanceOf[ChaosOnce] => f }.size
    val once = ChaosInjectRule(plan)
    val n1 = chaosFilters(once)
    assert(n1 >= 2, s"expected a scan wrap and an aggregate wrap, got $n1")
    val twice = ChaosInjectRule(once)
    assert(chaosFilters(twice) == n1,
      "re-application must not stack a second chaos filter on tagged nodes")
  }
}
