package graft.tools

import org.apache.spark.sql.SparkSession

/** Time EVERY registered query against one sf dir (the measured@sf1
  * sweep): warm each shape on sf0.001 first, then one timed run,
  * printing Bench-style TIMER lines sorted by name. Per-query errors
  * print and don't abort the sweep.
  *
  *   runMain graft.tools.TimeAll <sfDir>
  */
object TimeAll {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tiny = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
    var total = 0.0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      try {
        if (tiny.isDirectory) fn(spark, tiny.getPath).count()
        // Bench-parity: drop the warmup's (and prior queries') persists
        // so each timing does its own IO/shuffle work (see TimeQuery)
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        total += sec
        println(f"TIMER $n: $sec%.2f s ($rows rows)")
      } catch {
        case e: Exception => println(s"TIMER $n: FAILED ${e.getClass.getSimpleName}: ${e.getMessage.take(120)}")
      }
    }
    println(f"TIMER __total__: $total%.2f s")
    spark.stop()
  }
}
