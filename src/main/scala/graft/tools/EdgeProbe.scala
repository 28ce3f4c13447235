package graft.tools

import org.apache.spark.sql.functions._

/** Scratch probe: exchange inventory of dedup_cluster's EAGER edge job
  * (the eP.count() subtree PlanProbe's final-plan walk never sees) —
  * 2 GB-gate forensics; delete when the dig closes. */
object EdgeProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = args(0)
    val near = graft.ops.Dedup.dedupMinhashLsh(spark, dir).select($"d1", $"d2")
    val wd = graft.ops.Dedup.dupFeed(spark, dir).filter($"text".isNotNull)
      .select(md5($"text").as("h"), $"doc_id").persist()
    val hubs = wd.groupBy($"h")
      .agg(min($"doc_id").as("d1"), count(lit(1)).as("c"))
      .filter($"c" > 1)
    val exactE = wd.join(hubs, "h")
      .select($"d1", $"doc_id".as("d2"))
      .filter($"d1" =!= $"d2")
    val e = near.unionByName(exactE).dropDuplicates("d1", "d2")
    // collect() executes THIS df's own QueryExecution (count() spawns a
    // separate one, and a persist would hide the subtree behind the
    // InMemoryRelation) — so the inventory below walks the REAL
    // adaptive plan with runtime join elections and built sizes
    println(s"EDGE count=${e.collect().length}")
    PlanProbe.inventory("edge_job", e)
  }
}
