package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual queries with optional session config overrides:
  *
  *   runMain graft.tools.TimeQuery <sfDir> <query>[,query...] [k=v ...]
  *
  * Each query runs twice (warm on sf0.001 first); prints per-query
  * seconds. Extra args become session config entries, e.g.
  * `spark.sql.streaming.stateStore.providerClass=...RocksDBStateStoreProvider`.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val confs = args.drop(2).map(_.split("=", 2)).map(a => (a(0), a(1)))
    val b = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    confs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tiny = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      if (tiny.isDirectory) fn(spark, tiny.getPath).count()
      // clear BEFORE timing, exactly like Bench between runs: a prior
      // query's (or the warmup's) persisted branches would otherwise
      // serve this timing from cache and understate it (r10: a repeat
      // run read 3.25 s where the bench-comparable cost was ~4.3 s);
      // release also drops finished streaming sink tables — the r11
      // low-memory repro needed 44 queries' retained sinks to surface
      graft.GraftSession.release(spark)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      try {
        val rows = df.count()
        println(f"TIMER $n: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
      } catch { case e: Throwable =>
        // dump the (possibly adaptively re-planned) physical plan at
        // failure time — a planner-chosen broadcast only shows up here,
        // not in the isolated-success probe (low-memory sweep forensics)
        println(s"TIMER $n: FAILED ${e.getClass.getSimpleName}: ${e.getMessage}")
        println(df.queryExecution.executedPlan.toString.take(20000))
        throw e
      }
    }
    spark.stop()
  }
}
