package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture.{spark, sf0001}

/** Properties of the round-8 additions that the oracles can't express:
  * the winnowing detection guarantee, the Bloom filter's no-false-
  * negative law, DSIR's separation purpose, BM25's ranking shape, and
  * the gap audit's exact damage reconstruction. */
class Round8OpsSpec extends AnyFunSuite {

  test("winnowing guarantees a shared fingerprint for a shared 8-word run") {
    import spark.implicits._
    // w + k - 1 = 8 shared words, disjoint context everywhere else
    val run = "alpha beta gamma delta epsilon zeta eta theta"
    val a = s"one two three four $run five six seven eight nine ten"
    val b = s"red green blue cyan teal $run pink white black gray olive"
    val fps = TextOps.winnowFps(spark,
        Seq((1L, a), (2L, b)).toDF("doc_id", "text"))
      .as[(Long, Long)].collect().groupBy(_._1)
      .map { case (d, hs) => d -> hs.map(_._2).toSet }
    assert((fps(1L) intersect fps(2L)).nonEmpty,
      "shared >= w+k-1 run must yield a shared fingerprint")
    // vocabulary-disjoint docs share nothing (fixed strings, 32-bit hashes)
    val c = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    val fps2 = TextOps.winnowFps(spark,
        Seq((1L, a), (3L, c)).toDF("doc_id", "text"))
      .as[(Long, Long)].collect().groupBy(_._1)
      .map { case (d, hs) => d -> hs.map(_._2).toSet }
    assert((fps2(1L) intersect fps2(3L)).isEmpty)
  }

  test("bloom decontamination never false-negatives vs the exact gate") {
    import spark.implicits._
    val audit = TextOps.textBloomDecontaminate(spark, sf0001)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(audit.nonEmpty)
    for ((doc, _, flagged, exact, fp) <- audit.map(r => (r._1, r._2, r._3, r._4, r._5))) {
      assert(flagged >= exact, s"doc $doc: bloom missed an exact leak")
      assert(fp === flagged - exact, s"doc $doc: fp accounting")
    }
    // the exact-leak doc set must equal C19's corpus-side doc set
    val bloomLeaks = audit.filter(_._4 > 0).map(_._1).toSet
    val c19 = TextOps.textDecontaminate(spark, sf0001)
      .select("doc_id").as[Long].collect().toSet
    assert(bloomLeaks === c19)
  }

  test("DSIR weights separate the target source from the rest") {
    import spark.implicits._
    val w = PipelineQueries.pipelineImportanceWeights(spark, sf0001)
      .join(graft.Tables.table(spark, sf0001, "documents")
        .select($"doc_id", $"source"), "doc_id")
      .select($"source", $"weight", $"selected")
      .as[(String, Double, Boolean)].collect()
    val (tgt, rest) = w.partition(_._1 == "src0")
    assert(tgt.map(_._2).sum / tgt.size > rest.map(_._2).sum / rest.size,
      "target docs must score higher on average")
    val selShare = w.count(r => r._3 && r._1 == "src0").toDouble / w.count(_._3)
    val baseShare = tgt.size.toDouble / w.length
    assert(selShare > 2 * baseShare,
      s"selection must over-represent the target ($selShare vs $baseShare)")
  }

  test("bm25 returns a full, monotonically scored top-10 per query") {
    import spark.implicits._
    val r = TextOps.textBm25Topk(spark, sf0001)
      .as[(Long, Int, Long, Long)].collect()
    val byQ = r.groupBy(_._1)
    assert(byQ.keySet === Set(1L, 2L, 3L, 4L))
    for ((q, rows) <- byQ) {
      assert(rows.length === 10, s"query $q row count")
      val byRank = rows.sortBy(_._2).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (x, y) => x >= y },
        s"query $q scores must be non-increasing in rank")
    }
  }

  test("gap audit reconstructs exactly the injected damage") {
    import spark.implicits._
    val n = graft.Tables.events(spark, sf0001).count()
    val holeLo = math.floor((n - 1) * 0.23).toLong
    val all = 0L until n
    val survived = all.filterNot(q =>
      q % 997 == 0 || (q >= holeLo && q < holeLo + 50))
    val expDups = survived.filter(_ % 501 == 0)
      .map(q => ("dup", q, q, 1L))
    val present = survived.toSet
    val missing = all.filterNot(present)
    // contiguous missing runs -> expected gap rows
    val expGaps = missing.foldLeft(List.empty[(Long, Long)]) {
      case ((lo, hi) :: t, q) if q == hi + 1 => (lo, q) :: t
      case (acc, q) => (q, q) :: acc
    }.reverse
      // runs touching either end of the stream have no neighbor on one
      // side in the received stream, so the audit cannot see them
      .filter(g => g._1 > 0 && g._2 < n - 1)
      .map { case (lo, hi) => ("gap", lo, hi, hi - lo + 1) }
    val got = graft.cdc.CdcQueries.gapAudit(spark, sf0001)
      .as[(String, Long, Long, Long)].collect().toList
    val want = (expDups ++ expGaps).sortBy(r => (r._1, r._2)).toList
    assert(got === want)
  }
}
