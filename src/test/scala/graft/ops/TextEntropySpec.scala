package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture.{spark, sf0001}

/** C46: the Spark-side entropy must equal an independent plain-Scala
  * recomputation (same fixed-point contract) on every corpus doc, and
  * obey the information-theoretic bounds. */
class TextEntropySpec extends AnyFunSuite {

  private def entropy(elems: Seq[String]): Double = {
    val n = elems.size
    val fp = elems.groupBy(identity).values.map(_.size).map { c =>
      math.floor((c * 1.0 / n) * math.log(n * 1.0 / c) /
        0.6931471805599453 * 1000000 + 0.5).toLong
    }.sum
    math.floor(fp.toDouble / 1000000 * 10000 + 0.5) / 10000
  }

  test("text_entropy matches a plain-Scala recomputation and its bounds") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = TextOps.textEntropy(spark, sf0001)
      .select("doc_id", "char_entropy", "word_entropy")
      .as[(Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val texts = graft.Tables.table(spark, sf0001, "documents")
      .select($"doc_id", regexp_replace($"text", "[^\\x00-\\x7F]", "").as("t"))
      .as[(Long, String)].collect()
    assert(texts.nonEmpty && got.nonEmpty)
    for ((id, t) <- texts if t.nonEmpty) {
      val chars = t.map(_.toString)
      val words = t.split(" ").filter(_.nonEmpty).toSeq
      if (words.nonEmpty) {
        val (ce, we) = got(id)
        assert(ce === entropy(chars), s"doc $id char entropy mismatch")
        assert(we === entropy(words), s"doc $id word entropy mismatch")
        // bounds: 0 ≤ H ≤ log2(distinct)
        val ceMax = math.log(chars.distinct.size.toDouble) / math.log(2) + 1e-4
        val weMax = math.log(words.distinct.size.toDouble) / math.log(2) + 1e-4
        assert(ce >= 0 && ce <= ceMax, s"doc $id char entropy $ce out of [0, $ceMax]")
        assert(we >= 0 && we <= weMax, s"doc $id word entropy $we out of [0, $weMax]")
      }
    }
  }
}
