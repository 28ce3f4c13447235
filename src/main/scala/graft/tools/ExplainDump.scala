package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: write a registered query's `.explain("formatted")` text
  * to `<outDir>/<query>_<tag>.txt` — the round-16 optimization
  * evidence format (plans/r16/<query>_before.txt / _after.txt).
  *
  *   runMain graft.tools.ExplainDump <sfDir> <query>[,query...] <outDir> <tag>
  *
  * The dump is the PRE-execution formatted plan (join strategies,
  * Exchange placement, PushedFilters/ReadSchema as planned) followed by
  * the POST-execution adaptive plan tree, so both the static shape and
  * the AQE-final shape are on record.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val outDir = new java.io.File(args(2))
    val tag = args(3)
    outDir.mkdirs()
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // execute so the adaptive plan finalizes (same drain as PlanProbe:
      // one partition at a time, never the full result on the driver)
      val it = df.toLocalIterator()
      while (it.hasNext) it.next()
      val executed = df.queryExecution.executedPlan.toString
      val txt = s"=== $n ($tag) explain formatted ===\n" + formatted +
        s"\n=== $n ($tag) executed (AQE-final) ===\n" + executed + "\n"
      val f = new java.io.File(outDir, s"${n}_$tag.txt")
      java.nio.file.Files.write(f.toPath, txt.getBytes("UTF-8"))
      println(s"wrote ${f.getPath} (${txt.length} chars)")
      graft.GraftSession.release(spark)
    }
    spark.stop()
  }
}
