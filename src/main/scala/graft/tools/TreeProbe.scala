package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Dev probe: print a registered query's full optimized + executed
  * plan trees (PlanProbe prints only the exchange inventory).
  *
  *   runMain graft.tools.TreeProbe <sfDir> <query>[,query...]
  */
object TreeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args(1).split(",")) {
      val df = graft.SparkEntry.queries(n)(spark, args(0))
      df.count()
      println(s"=== $n OPTIMIZED ===")
      println(df.queryExecution.optimizedPlan.treeString)
      println(s"=== $n EXECUTED ===")
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      println(plan.treeString)
    }
    spark.stop()
  }
}
