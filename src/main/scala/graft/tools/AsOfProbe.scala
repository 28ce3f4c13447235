package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe for the AsOfJoinExec row-path audit (r7 verdict item 8):
  * time the custom O(n+m) merge-scan exec against the best built-in
  * formulation — union both sides into one frame and forward-fill the
  * state columns with `last(ignoreNulls)` over a (key, ts, side)
  * window — on the same feeds.
  *
  *   runMain graft.tools.AsOfProbe <sfDir> [reps]
  */
object AsOfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val ev = graft.Tables.events(spark, sfDir)
    def purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"user_id".as("p_user"),
        expr("unix_micros(ts)").as("p_ts"))
    def state = ev.filter($"event_type" =!= "purchase")
      .select($"event_id".as("s_id"), $"user_id".as("s_user"),
        expr("unix_micros(ts)").as("s_ts"), $"event_type".as("s_type"),
        $"value".as("s_value"))

    def mergeExec() = graft.plans.AsOf.join(purchases, state,
        "p_user", "p_ts", "p_id", "s_user", "s_ts", "s_id")
      .select($"p_id", $"p_user", $"s_id", $"s_type", $"s_value")

    def windowEquiv() = {
      // state rows sort BEFORE purchases at equal ts (side 0 < 1) so
      // ts <= p_ts is inclusive, matching the exec's semantics; s_id
      // breaks ties among same-(user, ts) state rows
      val st = state.select($"s_user".as("u"), $"s_ts".as("ts"),
        lit(0).as("side"), $"s_id", $"s_type", $"s_value",
        lit(null).cast("long").as("p_id"))
      val pu = purchases.select($"p_user".as("u"), $"p_ts".as("ts"),
        lit(1).as("side"), lit(null).cast("long").as("s_id"),
        lit(null).cast("string").as("s_type"),
        lit(null).cast("double").as("s_value"), $"p_id")
      val w = Window.partitionBy($"u")
        .orderBy($"ts", $"side", coalesce($"s_id", lit(Long.MaxValue)))
        .rowsBetween(Window.unboundedPreceding, 0)
      st.unionByName(pu)
        .withColumn("ls_id", last($"s_id", ignoreNulls = true).over(w))
        .withColumn("ls_type", last($"s_type", ignoreNulls = true).over(w))
        .withColumn("ls_value", last($"s_value", ignoreNulls = true).over(w))
        .filter($"p_id".isNotNull)
        .select($"p_id", $"u".as("p_user"), $"ls_id".as("s_id"),
          $"ls_type".as("s_type"), $"ls_value".as("s_value"))
    }

    // same-result check once, then timing reps. Time via the noop
    // sink: count() lets Catalyst prune the window path's unused
    // state columns (the custom exec's output is fixed), so noop is
    // the fair full-materialization comparison.
    val a = mergeExec().orderBy($"p_id").collect().map(_.toString)
    val b = windowEquiv().orderBy($"p_id").collect().map(_.toString)
    println(s"PROBE equal=${a.sameElements(b)} rows=${a.length}")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      noop(mergeExec())
      val t1 = System.nanoTime()
      noop(windowEquiv())
      val t2 = System.nanoTime()
      println(f"PROBE rep$i merge-exec ${(t1 - t0) / 1e9}%.2f s " +
        f"window ${(t2 - t1) / 1e9}%.2f s")
    }
    // bare-count probe — the column-pruning case that motivated
    // AsOfColumnPruning (r8 measured 0.92 s for the unpruned exec vs
    // 0.22 s for the window form on exactly this shape): a count()
    // consumes no joined columns, so the rule should trim both sides
    // to key/ts/tie before the exchange
    def bare() = graft.plans.AsOf.join(purchases, state,
      "p_user", "p_ts", "p_id", "s_user", "s_ts", "s_id")
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      bare().count()
      val t1 = System.nanoTime()
      println(f"PROBE rep$i bare-count (pruned) ${(t1 - t0) / 1e9}%.2f s")
    }
    // show whether the rule actually trimmed the exec's children
    val cq = bare().groupBy().count()
    cq.collect()
    val cplan = cq.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    println("PROBE bare-count plan:\n" + cplan.treeString)
    // WIDE-state probe — the case the rule exists for: a state table
    // with 16 surplus columns. "wide-full" consumes everything (all 16
    // ride both the exchange and the sort); "wide-count" consumes
    // nothing, so the rule trims both sides to key/ts/tie. The spread
    // between the two IS the pruning win at this width.
    def wideState = (0 until 16).foldLeft(state) { (df, i) =>
      df.withColumn(s"pad$i", concat($"s_type", lit("-"), $"s_value"))
    }
    def wideJoin() = graft.plans.AsOf.join(purchases, wideState,
      "p_user", "p_ts", "p_id", "s_user", "s_ts", "s_id")
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      noop(wideJoin())
      val t1 = System.nanoTime()
      wideJoin().count()
      val t2 = System.nanoTime()
      println(f"PROBE rep$i wide-full ${(t1 - t0) / 1e9}%.2f s " +
        f"wide-count (pruned) ${(t2 - t1) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
