package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway dev probe — edited per investigation, never committed. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val filt = base.filter($"v".isNotNull &&
      expr("aggregate(v, cast(0 as double), (a, x) -> a + x * x)") > 0)

    time("count-base")(base.count())
    time("count-filt")(filt.count())
    time("seeds-pred")(base.filter($"vec_id" < 64).orderBy($"vec_id").count())
    time("seeds-limit")(filt.orderBy($"vec_id").limit(64).count())
    // warm
    graft.ops.Ann.annIvfPq(spark, dir).count()
    spark.catalog.clearCache()
    time("ivf_pq-full")(graft.ops.Ann.annIvfPq(spark, dir).count())
    spark.stop()
  }
}
