package graft.tools

import org.apache.spark.sql.SparkSession

/** Time EVERY registered query against one sf dir (the measured@sf1
  * sweep): warm each shape on sf0.001 first, then TWO timed runs per
  * query, printing Bench-style TIMER lines (pairwise min, plus both
  * raw timings) sorted by name. Two runs per query is the r10 verdict's
  * noise-legibility order for the SCALING sweeps: the box swings
  * single-query timings up to 10× between same-code executions, and
  * a pairwise min with the raw pair visible lets a reader separate a
  * real regression (both runs slow) from one noisy run. Per-query
  * errors print and don't abort the sweep.
  *
  *   runMain graft.tools.TimeAll <sfDir> [runsPerQuery] [orderSeed]
  *
  * `orderSeed` (r13 verdict task 6) shuffles the query ORDER with a
  * seeded deterministic permutation. The 2 GB gate regressed twice in
  * r13 through order-dependent races (broadcast-drain vs cleaner) that
  * a fixed alphabetical repro kept missing — the low-memory gate now
  * runs N seeded orders so the next drain/planner race surfaces
  * in-round instead of in the driver's sweep. No seed = the stable
  * alphabetical order (cross-round comparability of the timings).
  */
object TimeAll {
  def main(args: Array[String]): Unit = {
    // trailing k=v args become session confs (the TimeQuery convention
    // — r16: the 2 GB enforcement seed needs spark.graft.shj.enforce);
    // positional args are everything else, in the old order
    val (confArgs, posArgs) = args.partition(_.contains("="))
    val sfDir = posArgs(0)
    val runs = if (posArgs.length > 1) posArgs(1).toInt else 2
    val orderSeed = if (posArgs.length > 2) Some(posArgs(2).toLong) else None
    val b = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    confArgs.map(_.split("=", 2)).foreach(a => b.config(a(0), a(1)))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tiny = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
    // drift canaries bracket the sweep (see DriftCanary): cross-window
    // totals are only comparable after checking these lines — canary =
    // scan/CPU class, canary2 = shuffle/join class (r15: r14's window
    // drift was class-selective and invisible to the scan probe)
    val canaryPre = DriftCanary.warmThenTime(spark)
    val canary2Pre = DriftCanary.warmThenTimeJoin(spark)
    println(f"TIMER __canary_pre__: $canaryPre%.2f s")
    println(f"TIMER __canary2_pre__: $canary2Pre%.2f s")
    var total = 0.0
    val ordered = {
      val base = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      orderSeed match {
        case Some(seed) =>
          println(s"ORDER seed=$seed (randomized query order)")
          new scala.util.Random(seed).shuffle(base)
        case None => base
      }
    }
    ordered.foreach { case (n, fn) =>
      try {
        if (tiny.isDirectory) fn(spark, tiny.getPath).count()
        val timings = (1 to runs).map { _ =>
          // Bench-parity: drop the warmup's (and prior runs') persists
          // and finished memory-sink tables so each timing does its own
          // IO/shuffle work on an unpinned heap (see TimeQuery)
          graft.GraftSession.release(spark)
          val t0 = System.nanoTime()
          val rows = fn(spark, sfDir).count()
          ((System.nanoTime() - t0) / 1e9, rows)
        }
        val sec = timings.map(_._1).min
        total += sec
        val raw = timings.map(t => f"${t._1}%.2f").mkString("/")
        println(f"TIMER $n: $sec%.2f s (${timings.head._2} rows, runs $raw)")
      } catch {
        case e: Exception => println(s"TIMER $n: FAILED ${e.getClass.getSimpleName}: ${e.getMessage.take(120)}")
      }
    }
    val canaryPost = DriftCanary.run(spark)
    val canary2Post = DriftCanary.runJoin(spark)
    println(f"TIMER __canary_post__: $canaryPost%.2f s")
    println(f"TIMER __canary2_post__: $canary2Post%.2f s")
    // same within-run drift naming as Bench's drift_classes: a class
    // is drifted when its pre/post pair moves >1.5× either way; empty
    // list = the sweep total is cross-round comparable as-is
    val drifted = Seq(
      "scan" -> (canaryPre, canaryPost),
      "shuffle" -> (canary2Pre, canary2Post)
    ).collect { case (cls, (a, b))
        if math.min(a, b) > 0 && math.max(a, b) / math.min(a, b) > 1.5 => cls }
    println(s"CANARY VERDICT: drift_classes=${drifted.mkString("[", ",", "]")}")
    println(f"TIMER __total__: $total%.2f s (pairwise-min of $runs runs/query)")
    spark.stop()
  }
}
