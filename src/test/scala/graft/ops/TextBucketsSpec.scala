package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture.{spark, sf0001}

/** C64 text_ccnet_buckets: tercile mechanics that must hold for any
  * feed — ntile balance, mean-NLL ordering along the bucket axis. */
class TextBucketsSpec extends AnyFunSuite {

  test("text_ccnet_buckets: balanced terciles with ordered mean NLL") {
    import spark.implicits._
    val rows = TextOps.textCcnetBuckets(spark, sf0001)
      .select("pred_lang", "bucket", "n_docs", "mean_nll")
      .as[(String, Long, Long, Double)].collect()
    val byLang = rows.groupBy(_._1)
    assert(byLang.size >= 2, s"only ${byLang.keySet} detected — vacuous")
    byLang.foreach { case (lang, bs) =>
      val sorted = bs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === Seq(1L, 2L, 3L),
        s"$lang missing buckets: ${sorted.toSeq}")
      // ntile keeps group sizes within one of each other
      assert(sorted.map(_._3).max - sorted.map(_._3).min <= 1,
        s"$lang terciles unbalanced: ${sorted.toSeq}")
      // buckets are cut along ascending NLL, so bucket means ascend
      sorted.sliding(2).foreach { case Array(lo, hi) =>
        assert(lo._4 <= hi._4, s"$lang mean NLL not ordered: $lo vs $hi")
      }
    }
  }
}
