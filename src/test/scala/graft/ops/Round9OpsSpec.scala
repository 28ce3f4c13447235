package graft.ops

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture.{spark, sf0001}

/** Semantics + plan-shape checks for the round-9 additions. */
class Round9OpsSpec extends AnyFunSuite {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("text_span_dedup: duplicated spans survive only in their keeper doc") {
    import spark.implicits._
    val got = TextOps.textSpanDedup(spark, sf0001)
      .select("doc_id", "n_spans", "n_dropped", "new_digest")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got.nonEmpty)
    assert(got.map(_._3).sum > 0,
      "no cross-doc duplicate spans found — data or threshold drift")
    // independent rebuild: 10-word spans, df>=2 keeps only the min doc
    val docs = graft.Tables.table(spark, sf0001, "documents")
      .select($"doc_id", split($"text", " ").as("w"))
      .as[(Long, Seq[String])].collect()
    val spanOf = docs.map { case (id, w) =>
      id -> w.grouped(10).map(_.mkString(" ")).toVector
    }.toMap
    val byDocs = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.SortedSet[Long]]
    spanOf.foreach { case (id, spans) =>
      spans.foreach(sp =>
        byDocs.getOrElseUpdate(sp,
          scala.collection.mutable.SortedSet.empty[Long]) += id)
    }
    val keeper = byDocs.collect {
      case (sp, ids) if ids.size >= 2 => sp -> ids.head
    }.toMap
    val want = spanOf.toSeq.map { case (id, spans) =>
      val kept = spans.filter(sp => keeper.get(sp).forall(_ == id))
      (id, spans.length.toLong, (spans.length - kept.length).toLong,
        md5hex(kept.mkString(" ")))
    }.filter(r => r._3 < r._2).sortBy(_._1)
    assert(got === want)
  }

  test("text_span_dedup: property — random corpora match the reference rewrite") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    // small vocab forces cross-doc span collisions; lengths straddle
    // the 10-word span boundary (incl. docs shorter than one span)
    val wordGen = Gen.oneOf("a", "b", "c", "d", "e", "f")
    val docGen = Gen.choose(1, 35)
      .flatMap(n => Gen.listOfN(n, wordGen).map(_.mkString(" ")))
    val corpusGen = Gen.choose(4, 12)
      .flatMap(k => Gen.listOfN(k, docGen))
    val prop = Prop.forAll(corpusGen) { texts =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      val got = TextOps
        .spanDedupCore(spark, docs.toDF("doc_id", "text"))
        .select("doc_id", "n_spans", "n_dropped", "new_digest")
        .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
      // reference rewrite in plain Scala
      val spansOf = docs.map { case (id, t) =>
        id -> t.split(" ").grouped(10).map(_.mkString(" ")).toVector
      }
      val keeper = spansOf.flatMap { case (id, sps) => sps.map(_ -> id) }
        .groupBy(_._1).collect {
          case (sp, occ) if occ.map(_._2).distinct.size >= 2 =>
            sp -> occ.map(_._2).min
        }
      val want = spansOf.map { case (id, sps) =>
        val kept = sps.filter(sp => keeper.get(sp).forall(_ == id))
        (id, sps.length.toLong, (sps.length - kept.length).toLong,
          md5hex(kept.mkString(" ")))
      }.filter(r => r._3 < r._2).sortBy(_._1)
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("pipeline_drop_ledger: kept set equals clean_corpus; gates partition the corpus") {
    import spark.implicits._
    val ledger = PipelineQueries.pipelineDropLedger(spark, sf0001)
      .select("doc_id", "gate", "kept").as[(Long, String, Boolean)].collect()
    val nDocs = graft.Tables.table(spark, sf0001, "documents").count()
    assert(ledger.length === nDocs, "ledger must cover EVERY document")
    // the ledger's kept ids must equal C14's kept set by construction
    val keptIds = ledger.filter(_._3).map(_._1).toSet
    val c14 = PipelineQueries.pipelineCleanCorpus(spark, sf0001)
      .select("doc_id").as[Long].collect().toSet
    assert(keptIds === c14, s"ledger kept ${keptIds.size} != clean_corpus ${c14.size}")
    // gates that the data can trip must fire, and kept ⟺ gate 5.
    // exact_dup only fires when the RAW corpus has md5 twins (none at
    // sf0.001 — the dup feed's injected twins carry synthetic ids)
    val byGate = ledger.groupBy(_._2).view.mapValues(_.length).toMap
    Seq("1_length", "3_near_dup", "4_lang", "5_kept")
      .foreach(g => assert(byGate.getOrElse(g, 0) > 0, s"gate $g never fires: $byGate"))
    val rawTwins = graft.Tables.table(spark, sf0001, "documents")
      .groupBy(md5($"text")).count().filter($"count" > 1).count()
    assert(byGate.getOrElse("2_exact_dup", 0) === 0 == (rawTwins == 0),
      s"exact_dup gate count ${byGate.getOrElse("2_exact_dup", 0)} vs $rawTwins raw twins")
    assert(ledger.forall(r => r._3 == (r._2 == "5_kept")))
  }

  test("mm_scene_segments: segments tile each video; rollup reuses the window partitioning") {
    import spark.implicits._
    val df = Multimodal.mmSceneSegments(spark, sf0001)
    val rows = df.select("doc_id", "seg_id", "start_f", "n_frames")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // tiling: per video, segment frame counts sum to the asset's frame
    // count, the first segment starts at frame 0, and seg ids are
    // contiguous from 0 (cut-count islands can't skip)
    val expect = graft.Tables.table(spark, sf0001, "documents")
      .filter($"doc_id" % 3 === 2)
      .select($"doc_id", ceil($"n_chars" / 64.0).cast("long").as("nf"))
      .as[(Long, Long)].collect().toMap
    rows.groupBy(_._1).foreach { case (doc, segs) =>
      assert(segs.map(_._4).sum === expect(doc),
        s"doc $doc segments don't tile its frames")
      assert(segs.map(_._3).min === 0L)
      assert(segs.map(_._2).sorted.toSeq === (0L until segs.length).toSeq,
        s"doc $doc seg ids not contiguous")
    }
    assert(rows.groupBy(_._1).size === expect.size, "missing videos")
    // multi-segment videos exist (the threshold actually cuts)
    assert(rows.groupBy(_._1).exists(_._2.length > 1))
    // plan shape: every hash exchange is keyed on doc_id alone — the
    // (doc, seg) rollup must ride the window's partitioning, and the
    // frame explode/checksum must happen in-row before any exchange
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val hashX = plan.collect {
      case e: ShuffleExchangeExec
        if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
    }
    assert(hashX.nonEmpty)
    hashX.foreach { e =>
      val exprs = e.outputPartitioning.asInstanceOf[HashPartitioning]
        .expressions.map(_.sql.toLowerCase)
      assert(exprs.forall(_.contains("doc_id")) && exprs.size == 1,
        s"unexpected exchange keys: $exprs — rollup stopped reusing the window partitioning")
    }
  }
}
