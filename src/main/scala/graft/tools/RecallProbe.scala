package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: per-query top-K hit counts of the approximate ANN
  * operators vs the exact baseline, at one SF dir — used to pin the
  * recall floors in the ann_lsh / ann_ivf driver-gate contracts.
  * Usage: runMain graft.tools.RecallProbe <sfDir>
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val exact = graft.ops.Ann.annBruteforce(spark, dir)
      .select($"query_id", $"neighbor_id")
    for ((name, df) <- Seq(
        "lsh" -> graft.ops.Ann.annLsh(spark, dir),
        "ivf" -> graft.ops.Ann.annIvf(spark, dir))) {
      val hits = df.select($"query_id", $"neighbor_id")
        .join(exact, Seq("query_id", "neighbor_id"))
        .groupBy($"query_id").agg(count(lit(1)).as("n_hits"))
        .orderBy($"query_id")
        .collect().map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" ")
      println(s"PROBE $name $dir $hits")
    }
    spark.stop()
  }
}
