package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB time attribution for a registered query (r17, r16 verdict
  * tasks 4/6: "count write jobs per micro-batch" / "phase-probe the
  * neardup runner"). The streaming runners hide their cost in
  * foreachBatch bodies where a plan dump shows only the final frame —
  * this probe runs ONE warm invocation with a SparkListener attached
  * and prints every job's wall time (scheduler-stamped start/end, so
  * listener-bus lag can't skew it) plus the first stage's callsite
  * name, which names the action (parquet write, collect, count...).
  *
  *   runMain graft.tools.JobProbe <sfDir> <query>[,query...]
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.sortBy(_.stageId).lastOption
          .map(_.name.takeWhile(_ != '\n')).getOrElse("?")
        starts.put(js.jobId, (js.time, site)); ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, site) =>
          done.add((je.jobId, (je.time - t0) / 1e3, site))
        }
        ()
      }
    })
    val tiny = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      if (tiny.isDirectory) fn(spark, tiny.getPath).count()
      graft.GraftSession.release(spark)
      done.clear()
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      // listener events are posted asynchronously — give the bus a
      // moment to drain so late job-end events are counted
      Thread.sleep(500)
      val jobs = {
        val it = done.iterator(); val b = Seq.newBuilder[(Int, Double, String)]
        while (it.hasNext) b += it.next()
        b.result().sortBy(_._1)
      }
      println(f"JOBPROBE $n total ${total}%.2f s, ${jobs.size} jobs, " +
        f"job-sum ${jobs.map(_._2).sum}%.2f s ($rows rows)")
      jobs.foreach { case (id, sec, site) =>
        println(f"  job $id%4d ${sec}%7.3f s  $site")
      }
    }
    spark.stop()
  }
}
