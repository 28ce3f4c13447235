package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture.{spark, sf0001}

class FingerprintSpec extends AnyFunSuite {

  test("text_fingerprint collisions are exactly the injected copies") {
    import spark.implicits._
    val pairs = TextOps.textFingerprint(spark, sf0001)
      .as[(Long, Long)].collect()
    val docs = graft.Tables.table(spark, sf0001, "documents").count()
    // corpus texts are unique -> the only fp collisions are the
    // doc_id+1000000 copies injected by Dedup.dupFeed; this is what
    // licenses the text-equality SQL oracle for this query
    assert(pairs.length === (docs / 10).toInt)
    assert(pairs.forall { case (d1, d2) => d2 === d1 + graft.ops.Dedup.DupShift && d1 % 10 === 0 })
  }
}
