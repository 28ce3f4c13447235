package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture.{spark, sf0001}

/** r14 verdict task 5: the SHJ pin envelope (per-task build =
  * frame_bytes / shuffle.partitions must fit in task memory because
  * shuffle_hash builds cannot spill) must be SELF-ENFORCING, not
  * prose. ShjEnvelope.check runs the arithmetic at plan time on every
  * pinned build frame. */
class ShjEnvelopeSpec extends AnyFunSuite {
  import spark.implicits._

  test("a large frame at artificially-low partitions triggers the guard") {
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      // Range stats are exact (8 bytes/row): 200M rows ≈ 1.6 GB frame,
      // 800 MB/task at 2 partitions — far past the 128 MiB budget.
      // Plan-time only: nothing executes.
      val big = spark.range(200L * 1000 * 1000).toDF("doc_id")
      ShjEnvelope.check(big, "spec-big")
      assert(ShjEnvelope.lastBreach.isDefined, "guard must flag 800 MB/task")
      val (stage, est, parts) = ShjEnvelope.lastBreach.get
      assert(stage === "spec-big" && parts === 2)
      assert(est / parts > ShjEnvelope.BudgetBytes)

      // enforce flag escalates the warn to a plan-time failure
      spark.conf.set("spark.graft.shj.enforce", "true")
      val e = intercept[IllegalStateException](ShjEnvelope.check(big, "spec-big"))
      assert(e.getMessage.contains("shuffle_merge"),
        "failure message must name the spillable fallback")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set("spark.graft.shj.enforce", "false")
      ShjEnvelope.resetBreach()
    }
  }

  test("the pinned operators pass through the guard clean at fixture scale") {
    // wiring proof: real pinned operators plan and run with no breach
    // at sf0.001/32. lastBreach is STICKY (a clean check never clears
    // it — r15 review: the old clean-clear let a later clean check in
    // the same multi-pin operator erase an inner breach), so the
    // explicit reset + run + isEmpty pattern here observes a breach at
    // ANY of the operator's pins, not just the last one.
    ShjEnvelope.resetBreach()
    val n = Dedup.dedupContainment(spark, sf0001).count()
    val w = TextOps.textWinnowing(spark, sf0001).count()
    spark.catalog.clearCache()
    assert(n >= 0 && w >= 0)
    assert(ShjEnvelope.lastBreach.isEmpty,
      s"unexpected envelope breach at fixture scale: ${ShjEnvelope.lastBreach}")
  }

  test("a later clean check does not erase an earlier breach (sticky observable)") {
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      ShjEnvelope.resetBreach()
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      ShjEnvelope.check(spark.range(200L * 1000 * 1000).toDF("doc_id"), "spec-inner")
      assert(ShjEnvelope.lastBreach.exists(_._1 == "spec-inner"))
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      ShjEnvelope.check(spark.range(10).toDF("doc_id"), "spec-outer-clean")
      assert(ShjEnvelope.lastBreach.exists(_._1 == "spec-inner"),
        "clean outer check must not clear the inner breach")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      ShjEnvelope.resetBreach()
    }
  }
}
