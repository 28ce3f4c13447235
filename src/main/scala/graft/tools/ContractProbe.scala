package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: time mm_canonical's phases (pair gen, star contraction,
  * rollup) with repetitions — used to attribute the r8 latency work;
  * not part of the query surface. */
object ContractProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    (1 to reps).foreach { i =>
      var t0 = System.nanoTime()
      val pairs = graft.ops.Multimodal.phashPairsProbe(spark, sfDir)
        .select($"d1".as("u"), $"d2".as("v")).localCheckpoint()
      val n = pairs.count()
      val t1 = System.nanoTime()
      val (labels, rounds) = graft.ops.Dedup.starContract(pairs, 32)
      val nl = labels.count()
      val t2 = System.nanoTime()
      println(f"PROBE rep$i pairs=$n (${(t1 - t0) / 1e9}%.2f s) " +
        f"contract rounds=$rounds labels=$nl (${(t2 - t1) / 1e9}%.2f s)")
    }
    spark.stop()
  }
}
