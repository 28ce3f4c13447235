package graft.tools

import org.apache.spark.sql.functions._

/** Replicate ONE table of a test SF dir N× with disjoint id spaces —
  * the single-table companion to [[ScaleUp]] for adversarial-shape
  * runs (e.g. the ×100 100%-duplicated corpus that drives every LSH
  * bucket past its cap) without paying for a full-dir replica.
  *
  *   runMain graft.tools.RepTable <srcSfDir> <outDir> <table> <idCol> <copies>
  */
object RepTable {
  def main(args: Array[String]): Unit = {
    val Array(src, out, tbl, idCol, copiesStr) = args.take(5)
    val copies = copiesStr.toInt
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet(s"$src/$tbl.parquet")
    (0 until copies).map(i =>
        base.withColumn(idCol, col(idCol) + lit(i * 100000000L)))
      .reduce(_ unionByName _)
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$out/$tbl.parquet")
    println(s"REPLICATED $tbl x$copies -> " +
      spark.read.parquet(s"$out/$tbl.parquet").count() + " rows")
    spark.stop()
  }
}
