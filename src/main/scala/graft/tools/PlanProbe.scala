package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}

/** Dev probe: print a query's executed-plan exchange inventory —
  * shuffles AND broadcasts, the latter with their built sizes (the
  * low-memory sweep's question: which broadcast scales with the
  * corpus?). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args(1).split(",")) {
      val df = graft.SparkEntry.queries(n)(spark, args(0))
      // drain df's OWN QueryExecution, NOT count(): count() spawns a
      // separate (column-pruned, differently planned) execution,
      // leaving df's adaptive plan unexecuted — the walk then reports
      // the INITIAL static plan and misses every runtime join election
      // (this hid the 130 MiB confirm() broadcast builds the 2 GB gate
      // kept dying on). toLocalIterator runs the same queryExecution
      // and finalizes the adaptive plan while holding ONE partition at
      // a time — collect() held the full result and risked driver OOM
      // on corpus-sized outputs in exactly the low-memory forensics
      // contexts this probe serves (r13 ADVICE)
      val it = df.toLocalIterator()
      while (it.hasNext) it.next()
      inventory(n, df)
      graft.GraftSession.release(spark)
    }
    spark.stop()
  }

  /** Print the exchange inventory of an ALREADY-EXECUTED df's adaptive
    * plan (callable from scratch probes whose interesting job is an
    * eager subtree PlanProbe's registered-query walk never sees). */
  def inventory(n: String, df: org.apache.spark.sql.DataFrame): Unit = {
    locally {
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // AQE hides materialized stages inside QueryStageExec (the
      // executed subplan is a FIELD, not a child) — walk them explicitly
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.QueryStageExec
      import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
      // identity-visited set: ReusedExchangeExec.child POINTS AT the
      // original exchange subtree, so recursing into it without the
      // guard inventories every reused shuffle/broadcast (and its whole
      // subtree) twice (r11 ADVICE) — report reuse as a reference line
      // instead and count each physical exchange once
      val seen = java.util.Collections.newSetFromMap(
        new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
      def walk(p: SparkPlan, f: SparkPlan => Unit): Unit = if (seen.add(p)) {
        f(p)
        p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan, f)
          case q: QueryStageExec => walk(q.plan, f)
          case r: ReusedExchangeExec => walk(r.child, f)
          case _ => ()
        }
        p.children.foreach(walk(_, f))
        p.subqueries.foreach(walk(_, f))
      }
      var nx = 0
      val out = new scala.collection.mutable.ArrayBuffer[String]
      walk(plan, {
        case e: ShuffleExchangeExec =>
          nx += 1; out += s"  X ${e.outputPartitioning}"
        case b: BroadcastExchangeExec =>
          val sz = b.metrics.get("dataSize").map(_.value).getOrElse(-1L)
          val rows = b.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
          out += f"  B rows=$rows size=${sz / 1024.0 / 1024.0}%.1f MiB  ${b.child.nodeName}"
        case r: ReusedExchangeExec =>
          out += s"  R reuse -> ${r.child.nodeName}(${r.child.id})"
        case _ => ()
      })
      println(s"PLAN $n exchanges=$nx")
      out.foreach(println)
      if (sys.env.contains("PLAN_FULL")) {
        // authoritative: the final adaptive plan's own string (walker-
        // independent evidence of Broadcast* nodes)
        println(plan.toString.take(40000))
      }
    }
  }
}
