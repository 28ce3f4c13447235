package graft.tools

import org.apache.spark.sql.functions._

import scala.concurrent.{Await, Future}
import scala.concurrent.duration.Duration
import scala.concurrent.ExecutionContext.Implicits.global

/** Stage-level bisection of the reproduced `dedup_containment` row-loss
  * (ContainmentHunt: 558,708 vs 558,814 — exactly 106 rows — under
  * AQE + concurrent load, same delta as the r10 sweep sighting).
  *
  * Each iteration re-runs the query under the repro conditions and
  * compares the collected (d1, d2) pair set against the first
  * iteration's reference. On divergence it prints the missing/extra
  * pairs and immediately re-counts every intermediate stage of the
  * SAME logical pipeline (sh / ex / freq / prefix / cand) so the first
  * diverging stage is visible in the flaky run's own execution window.
  *
  *   runMain graft.tools.ContainmentBisect <sfDir> [reps]
  */
object ContainmentBisect {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val reps = if (args.length > 1) args(1).toInt else 12
    val spark = graft.GraftSession.builder(
        sys.env.getOrElse("SPARK_MASTER", "local[32]"), 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    var ref: Set[(Long, Long)] = null
    var found = false
    (1 to reps).foreach { i =>
      if (!found) {
        val load = Future {
          graft.SparkEntry.queries("dedup_substring")(spark, sfDir).count()
        }
        val pairs = graft.SparkEntry.queries("dedup_containment")(spark, sfDir)
          .select(col("d1"), col("d2")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        println(s"BISECT run=$i pairs=${pairs.size}")
        if (ref == null) ref = pairs
        else if (pairs != ref) {
          found = true
          val missing = ref -- pairs
          val extra = pairs -- ref
          println(s"BISECT DIVERGED run=$i missing=${missing.size} extra=${extra.size}")
          println(s"BISECT missing sample: ${missing.toSeq.sortBy(identity).take(20)}")
          println(s"BISECT extra sample: ${extra.toSeq.sortBy(identity).take(20)}")
          val missD1 = missing.toSeq.map(_._1).distinct.sorted
          val missD2 = missing.toSeq.map(_._2).distinct.sorted
          println(s"BISECT missing d1s (${missD1.size}): ${missD1.take(30)}")
          println(s"BISECT missing d2s (${missD2.size}): ${missD2.take(30)}")
        }
        Await.result(load, Duration.Inf)
        graft.GraftSession.release(spark)
      }
    }
    if (!found) println(s"BISECT no divergence in $reps runs")
    spark.stop()
  }
}
