package graft.tools

import org.apache.spark.sql.functions._

import scala.concurrent.{Await, Future}
import scala.concurrent.duration.Duration
import scala.concurrent.ExecutionContext.Implicits.global

/** Active reproduction harness for the r10-disclosed `dedup_containment`
  * anomaly: ONE of six sf1 sweep executions printed 106 rows low
  * (558,708 vs 558,814) with no task retries logged. A silent row loss
  * in a dedup operator would be the worst defect class in the tree, so
  * the r10 verdict ordered ≥20 hash-logged runs under concurrent load
  * with AQE both on and off (the two planner modes the sweeps mix).
  *
  * Protocol per run: AQE alternates each iteration; a CONCURRENT heavy
  * query (`dedup_substring` — same fragFeed scan, its own persist) runs
  * in a background future to create the executor-memory pressure the
  * flaky sweep had; the probe then fully materializes the containment
  * result and prints rows + an order-insensitive content hash
  * (sum of per-row hash() over all three columns). Any run whose
  * (rows, hash) differs from the mode reproduces the anomaly.
  *
  *   runMain graft.tools.ContainmentHunt <sfDir> [reps]
  */
object ContainmentHunt {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val reps = if (args.length > 1) args(1).toInt else 20
    val spark = graft.GraftSession.builder(
        sys.env.getOrElse("SPARK_MASTER", "local[32]"), 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    var seen = Map.empty[(Long, Long), Int]
    (1 to reps).foreach { i =>
      val aqe = i % 2 == 0
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      val load = Future {
        graft.SparkEntry.queries("dedup_substring")(spark, sfDir).count()
      }
      val t0 = System.nanoTime()
      val row = graft.SparkEntry.queries("dedup_containment")(spark, sfDir)
        .agg(count(lit(1)).as("rows"),
          sum(hash(col("d1"), col("d2"), col("cont")).cast("long")).as("h"))
        .collect()(0)
      val key = (row.getLong(0), row.getLong(1))
      seen = seen.updated(key, seen.getOrElse(key, 0) + 1)
      println(f"HUNT run=$i%2d aqe=$aqe%-5s rows=${key._1} hash=${key._2} " +
        f"sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      Await.result(load, Duration.Inf)
      graft.GraftSession.release(spark)
    }
    println(s"HUNT distinct(rows,hash) outcomes: ${seen.size} -> $seen")
    println(if (seen.size == 1) "HUNT VERDICT: STABLE (no reproduction)"
            else "HUNT VERDICT: REPRODUCED — bisect now")
    spark.stop()
  }
}
