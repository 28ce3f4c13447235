package graft.tools

import org.apache.spark.sql.functions._

/** Partition-count determinism audit (r11, generalizing the
  * dedup_containment find): the containment anomaly was an
  * execution-order-dependent tie in a window — invisible at the
  * driver's fixed partition count, decisive under AQE's runtime
  * coalescing. This sweep hunts the whole class: every registered
  * query runs TWICE at sf0.01 with AQE on — once at 32 shuffle
  * partitions (the driver's shape) and once at 7 (a prime, so every
  * hash boundary moves) — and the full result multisets are compared
  * by an order-insensitive content hash. A query whose RESULT depends
  * on the partition count has an order-dependent tie or a
  * non-associative fold that a 1000-executor cluster would surface as
  * a silent wrong answer; the driver's single-shape oracle can never
  * catch it.
  *
  *   runMain graft.tools.DeterminismSweep <sfDir>
  */
object DeterminismSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.builder("local[8]", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def contentHash(name: String): (Long, Long) = {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val row = df
        .select(xxhash64(df.columns.map(c => col(c).cast("string")): _*).as("h"))
        .agg(count(lit(1)), sum($bigint("h")))
        .collect()(0)
      val r = (row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1))
      spark.catalog.clearCache()
      r
    }
    // sum(xxhash64) needs no overflow guard semantics — wraparound via
    // the BIGINT sum would ANSI-abort; sum into DECIMAL then mod back
    def $bigint(c: String) =
      (col(c) % 1000000007L).cast("long")

    var bad = 0
    graft.SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        val a = contentHash(name)
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        val b = contentHash(name)
        if (a == b) println(s"DET ok   $name $a")
        else { bad += 1; println(s"DET DIFF $name 32p=$a 7p=$b") }
      } catch {
        case e: Exception =>
          bad += 1
          println(s"DET ERR  $name ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
      }
    }
    println(if (bad == 0) "DET VERDICT: ALL DETERMINISTIC"
            else s"DET VERDICT: $bad queries diverge or err")
    spark.stop()
  }
}
