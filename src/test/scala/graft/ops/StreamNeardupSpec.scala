package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture.{spark, sf0001}

/** C67 pipeline_stream_neardup: the streaming banded ingest must land
  * on exactly the batch answer — shingle-eligible docs minus the
  * higher id of every confirmed ≥0.8 pair (C2's pair set). This is
  * the batch-cut-invariance claim made in the op's Scaladoc, checked
  * against the independently-oracled batch operator. */
class StreamNeardupSpec extends AnyFunSuite {

  test("streaming near-dup ingest equals the batch pair-set answer at EVERY cut") {
    import spark.implicits._
    val eligible = Dedup.shingled(spark, sf0001)
      .select("doc_id").as[Long].collect().toSet
    val dropped = Dedup.dedupNgramJaccard(spark, sf0001)
      .select("d2").as[Long].collect().toSet
    assert(dropped.nonEmpty, "no ≥0.8 pairs on this feed — vacuous")
    // fpt=1 exercises the history path (3 micro-batches: within-batch
    // candidates AND banded-history joins); fpt=3 is the registered
    // query's single-trigger form (r13 default, the r12 verdict's
    // floor fix). BOTH must land on the batch answer: that equality is
    // the batch-cut-invariance contract the SEEN policy licenses the
    // default with.
    Seq(1, 3).foreach { fpt =>
      val kept = PipelineQueries.pipelineStreamNeardupFpt(spark, sf0001, fpt)
        .select("doc_id").as[Long].collect().toSet
      assert(kept === (eligible -- dropped),
        s"streaming kept set diverged at fpt=$fpt: " +
          s"missing ${(eligible -- dropped) -- kept}, " +
          s"extra ${kept -- (eligible -- dropped)}")
    }
    // and the registered entry point IS the fpt=3 form
    val reg = PipelineQueries.pipelineStreamNeardup(spark, sf0001)
      .select("doc_id").as[Long].collect().toSet
    assert(reg === (eligible -- dropped), "registered query diverged")
  }
}
