package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Dev probe: print a query's executed-plan exchange inventory. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args(1).split(",")) {
      val df = graft.SparkEntry.queries(n)(spark, args(0))
      df.count()
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val xs = plan.collect { case e: ShuffleExchangeExec => e }
      println(s"PLAN $n exchanges=${xs.size}")
      xs.foreach(e => println(s"  X ${e.outputPartitioning}"))
    }
    spark.stop()
  }
}
