package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize an N×-scaled copy of a test SF dir in /tmp by unioning
  * id-shifted replicas — for scale-behavior smoke runs only (the
  * replica texts/vectors are identical, which deliberately stresses
  * the dedup operators with a 100%-duplicated corpus, the CommonCrawl
  * shape).
  *
  *   runMain graft.tools.ScaleUp <srcSfDir> <outDir> <copies>
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val Array(src, out, copiesStr) = args.take(3)
    val copies = copiesStr.toInt
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")

    def rep(name: String, idCols: Seq[String], shift: Long): Unit = {
      // events: keep the on-disk ts representation (eventsRaw handles
      // the nanos-vs-NTZ footer drift); replicas stay bit-identical
      val base =
        if (name == "events") graft.Tables.eventsRaw(spark, src)
        else spark.read.parquet(s"$src/$name.parquet")
      val parts = (0 until copies).map { i =>
        idCols.foldLeft(base) { (df, c) =>
          df.withColumn(c, col(c) + lit(i * shift))
        }
      }
      parts.reduce(_ unionByName _)
        .repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"SCALED $name -> ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    // dims stay 1×; facts replicate with disjoint id spaces
    Seq("region", "nation", "customer", "supplier", "part").foreach { n =>
      spark.read.parquet(s"$src/$n.parquet")
        .write.mode("overwrite").parquet(s"$out/$n.parquet")
    }
    rep("orders", Seq("o_orderkey"), 100000000L)
    rep("lineitem", Seq("l_orderkey"), 100000000L)
    rep("events", Seq("event_id"), 100000000L)
    rep("documents", Seq("doc_id"), 100000000L)
    rep("embeddings", Seq("vec_id"), 100000000L)
    spark.stop()
  }
}
