package graft.tools

/** Plan-bound scale-exponent harness — the r15 promotion of the manual
  * perturbed-copy protocol (SCALING.md rounds 14–15) into a tool, the
  * same move that took the drift canary from prose to the bench line.
  *
  *   runMain graft.tools.ScaleCurve <srcSfDir> <query>[,query...] \
  *     [loCopies=10] [hiCopies=30] [runs=2]
  *
  * Protocol (identical to the hand-run rounds, so numbers are
  * comparable): build `lo`- and `hi`-copy PERTURBED replicas of the
  * source SF dir (ScaleUp `perturb`: cross-copy pairs are provably not
  * near-dups, so the answer grows linearly in copies and the exponent
  * is plan-bound, not answer-bound), warm each query shape once on
  * sf0.001, then time `runs` time-separated sweeps over the (lo, hi)
  * blocks with a cache release before every measurement. Per (copies,
  * query) the best across runs is kept — the pairwise-min basis every
  * repo sweep uses, because a shared box's noise is one-sided.
  *
  * Output: one TIMER line per measurement, one parseable
  * `EXPONENT <q>: ...` line per query with the row-growth ratio next
  * to the time ratio (rows ≈ hi/lo ⇒ the replica behaved, the
  * exponent is the plan's), and a `CURVE VERDICT` max-e trailer.
  *
  * Replicas are cached under /tmp/scalecurve keyed by source dir name
  * and copy count, completion-marked: a killed build reruns instead of
  * half-reading (the r14 sf3 regeneration cost ~10 min; the marker
  * makes re-entry free).
  */
object ScaleCurve {

  /** log-ratio exponent: time ~ copies^e between the two replicas. */
  def exponent(tLo: Double, tHi: Double, lo: Int, hi: Int): Double = {
    require(tLo > 0 && tHi > 0 && hi > lo && lo >= 1, s"bad curve point ($tLo, $tHi, $lo, $hi)")
    math.log(tHi / tLo) / math.log(hi.toDouble / lo)
  }

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val names = args(1).split(",").toSeq
    val lo = args.lift(2).map(_.toInt).getOrElse(10)
    val hi = args.lift(3).map(_.toInt).getOrElse(30)
    val runs = args.lift(4).map(_.toInt).getOrElse(2)
    require(hi > lo && lo >= 1, s"need hiCopies > loCopies >= 1, got $lo/$hi")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")

    val srcTag = new java.io.File(src).getName
    // completion marker carries a fingerprint of the SOURCE dir (file
    // name/size/mtime per table): a regenerated source — sf dirs are
    // rebuilt between rounds — or a different dir with the same
    // basename invalidates the cache instead of silently timing
    // queries against last round's data (r15 review)
    val srcPrint = Option(new java.io.File(src).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      .flatMap { t =>
        val fs = Option(t.listFiles()).getOrElse(Array(t))
        fs.sortBy(_.getName).map(f => s"${t.getName}/${f.getName}:${f.length}:${f.lastModified}")
      }.mkString("\n")
    def replica(copies: Int): String = {
      val out = s"/tmp/scalecurve/${srcTag}_x${copies}p"
      val marker = new java.io.File(out, "_GRAFT_SCALE_OK")
      val cached = marker.isFile &&
        new String(java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8") == srcPrint
      if (!cached) {
        if (marker.isFile)
          println(s"CURVE source changed since $out was built — rebuilding")
        println(s"CURVE building ${copies}x perturbed replica at $out")
        ScaleUp.scale(spark, src, out, copies, perturb = true)
        java.nio.file.Files.write(marker.toPath, srcPrint.getBytes("UTF-8"))
      }
      out
    }
    val dirLo = replica(lo)
    val dirHi = replica(hi)

    // warm every shape once on sf0.001 (codegen + JIT, as in Bench):
    // the curve must compare data-proportional work, not compiler time
    val tiny = new java.io.File(new java.io.File(src).getParentFile, "sf0.001")
    if (tiny.isDirectory) names.foreach { n =>
      graft.SparkEntry.queries(n)(spark, tiny.getPath).count()
      graft.GraftSession.release(spark)
    } else
      // an unwarmed first block pays codegen/JIT inside tLo, biasing
      // the exponent DOWN — loud, because a too-small e can pass a
      // plan that is actually superlinear (r15 review)
      println(s"CURVE WARN no sf0.001 sibling next to $src — shapes unwarmed, " +
        "the lo-replica block absorbs codegen/JIT cost and e is biased low")

    val best = collection.mutable.Map.empty[(Int, String), Double]
    val rowsAt = collection.mutable.Map.empty[(Int, String), Long]
    (1 to runs).foreach { r =>
      Seq(lo -> dirLo, hi -> dirHi).foreach { case (c, d) =>
        names.foreach { n =>
          graft.GraftSession.release(spark)
          val t0 = System.nanoTime()
          val rows = graft.SparkEntry.queries(n)(spark, d).count()
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"TIMER $n@x$c: $sec%.2f s ($rows rows, run $r)")
          val k = (c, n)
          best(k) = math.min(best.getOrElse(k, Double.MaxValue), sec)
          rowsAt(k) = rows
        }
      }
    }

    var maxE = Double.MinValue
    names.foreach { n =>
      val tLo = best((lo, n)); val tHi = best((hi, n))
      val e = exponent(tLo, tHi, lo, hi)
      maxE = math.max(maxE, e)
      val rLo = rowsAt((lo, n)); val rHi = rowsAt((hi, n))
      val growth = if (rLo > 0) f"${rHi.toDouble / rLo}%.2f" else "n/a"
      println(f"EXPONENT $n: tx$lo=$tLo%.2f tx$hi=$tHi%.2f e=$e%.2f rows=$rLo/$rHi (x$growth)")
    }
    println(f"CURVE VERDICT: max e = $maxE%.2f over ${names.size} queries " +
      s"(plan-bound target <= ~1.2; answer rows should grow ~${hi.toDouble / lo})")
    spark.stop()
  }
}
