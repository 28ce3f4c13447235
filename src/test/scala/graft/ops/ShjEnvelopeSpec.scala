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
    }
  }

  test("the pinned operators pass through the guard clean at fixture scale") {
    // wiring proof: a real pinned operator (C28 containment — two
    // check'd frames) plans and runs with no breach at sf0.001/32
    ShjEnvelope.lastBreach = Some(("sentinel", BigInt(0), 0))
    val n = Dedup.dedupContainment(spark, sf0001).count()
    spark.catalog.clearCache()
    assert(n >= 0)
    assert(ShjEnvelope.lastBreach.isEmpty,
      s"unexpected envelope breach at fixture scale: ${ShjEnvelope.lastBreach}")
  }
}
