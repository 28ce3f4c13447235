package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: split dedup_cluster cost into edge mining vs the
  * star-contraction loop, and report the round count.
  *
  *   runMain graft.tools.CcProbe <sfDir>
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    graft.ops.Dedup.dedupCluster(spark, "/root/testdata/sf0.001").count() // warm
    val t0 = System.nanoTime()
    val near = graft.ops.Dedup.dedupMinhashLsh(spark, dir).select($"d1", $"d2")
    val exactE = graft.ops.Dedup.dupFeed(spark, dir)
      .groupBy(md5($"text").as("h"))
      .agg(sort_array(collect_list($"doc_id")).as("ids"))
      .filter(size($"ids") > 1)
      .select(element_at($"ids", 1).as("d1"), explode($"ids").as("d2"))
      .filter($"d1" =!= $"d2")
    val e = near.unionByName(exactE).dropDuplicates("d1", "d2").persist()
    val nE = e.count()
    val t1 = System.nanoTime()
    println(f"EDGEGEN ${(t1 - t0) / 1e9}%.2f s ($nE edges)")
    val (labels, rounds) =
      graft.ops.Dedup.starContract(e.select($"d1".as("u"), $"d2".as("v")), 1)
    val nL = labels.count()
    val t2 = System.nanoTime()
    println(f"STARCONTRACT ${(t2 - t1) / 1e9}%.2f s ($rounds rounds, $nL labels)")
    spark.stop()
  }
}
