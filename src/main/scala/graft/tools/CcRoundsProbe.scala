package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: time the dedup_cluster composite's phases separately —
  * pair mining (C3 LSH + exact hub edges), then the starContract loop
  * (with its round count), then the label decoration — so the
  * optimization rounds can see which phase owns the wall clock.
  *
  *   runMain graft.tools.CcRoundsProbe <sfDir>
  */
object CcRoundsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    (1 to 2).foreach { run =>
      graft.GraftSession.release(spark)
      val t0 = System.nanoTime()
      val near = graft.ops.Dedup.dedupMinhashLsh(spark, sfDir)
        .select($"d1", $"d2")
      val wd = graft.ops.Dedup.dupFeed(spark, sfDir)
        .filter($"text".isNotNull)
        .select(md5($"text").as("h"), $"doc_id").persist()
      val hubs = wd.groupBy($"h")
        .agg(min($"doc_id").as("d1"), count(lit(1)).as("c"))
        .filter($"c" > 1)
      val exactE = wd.join(hubs, "h")
        .select($"d1", $"doc_id".as("d2"))
        .filter($"d1" =!= $"d2")
      val e = near.unionByName(exactE).dropDuplicates("d1", "d2")
      val eP = e.persist()
      val nEdges = eP.count()
      val t1 = System.nanoTime()
      val parts = math.max(1, math.min(10000, (nEdges / 250000L).toInt + 1))
      val (labels, rounds) = graft.ops.Dedup.starContract(
        eP.select($"d1".as("u"), $"d2".as("v")), parts)
      val t2 = System.nanoTime()
      val n = labels.count()
      val t3 = System.nanoTime()
      println(f"CC run=$run edges=$nEdges mine=${(t1 - t0) / 1e9}%.2f s " +
        f"contract=${(t2 - t1) / 1e9}%.2f s (rounds=$rounds) " +
        f"labels=$n labelCount=${(t3 - t2) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
