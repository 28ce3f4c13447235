package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture.{spark, sf0001}

/** C67 pipeline_stream_neardup: the streaming banded ingest must land
  * on exactly the batch answer — shingle-eligible docs minus the
  * higher id of every confirmed ≥0.8 pair (C2's pair set). This is
  * the batch-cut-invariance claim made in the op's Scaladoc, checked
  * against the independently-oracled batch operator. */
class StreamNeardupSpec extends AnyFunSuite {

  test("streaming near-dup ingest equals the batch pair-set answer") {
    import spark.implicits._
    val kept = PipelineQueries.pipelineStreamNeardup(spark, sf0001)
      .select("doc_id").as[Long].collect().toSet
    val eligible = Dedup.shingled(spark, sf0001)
      .select("doc_id").as[Long].collect().toSet
    val dropped = Dedup.dedupNgramJaccard(spark, sf0001)
      .select("d2").as[Long].collect().toSet
    assert(dropped.nonEmpty, "no ≥0.8 pairs on this feed — vacuous")
    assert(kept === (eligible -- dropped),
      s"streaming kept set diverged: missing ${(eligible -- dropped) -- kept}, " +
        s"extra ${kept -- (eligible -- dropped)}")
  }
}
