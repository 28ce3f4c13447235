package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture.{spark, sf0001}

/** C65 text_dup_ngram_coverage: exact driver-side recomputation at
  * sf0.001 — gram-by-gram, no sampling — plus the arithmetic
  * identities the op's columns must satisfy. */
class TextDupCoverageSpec extends AnyFunSuite {

  test("text_dup_ngram_coverage matches a driver-side recomputation") {
    import spark.implicits._
    val out = TextOps.textDupNgramCoverage(spark, sf0001)
      .select("doc_id", "n_slots", "n_dup_slots", "dup_ppm")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val grams: Map[Long, Seq[String]] = docs.map { case (id, text) =>
      val w = text.split(" ", -1)
      id -> (if (w.length >= 13) w.sliding(13).map(_.mkString(" ")).toSeq
             else Seq.empty)
    }.toMap
    val docFreq = grams.toSeq
      .flatMap { case (id, gs) => gs.distinct.map(g => (g, id)) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val expected = grams.filter(_._2.nonEmpty).map { case (id, gs) =>
      val dup = gs.count(g => docFreq(g) >= 2).toLong
      val slots = gs.size.toLong
      (id, slots, dup, math.floor(dup * 1000000.0 / slots + 0.5).toLong)
    }.toSeq.sortBy(_._1)
    assert(out.length === expected.length, "doc coverage row count differs")
    out.zip(expected).foreach { case (got, want) =>
      assert(got === want, s"coverage mismatch: got $got want $want")
    }
    // the metric must be non-vacuous on this feed: documents share
    // boilerplate openings, so SOME dup mass must exist
    assert(out.map(_._3).sum > 0L, "zero dup slots corpus-wide — vacuous")
  }
}
