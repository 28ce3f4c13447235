package graft.plans

import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Attribute

/** Public API for the as-of join operator. */
object AsOf {

  /** Register the planner strategy + pruning rule once per session
    * (idempotent) — the fallback for sessions built without
    * [[graft.GraftExtensions]]. `extraOptimizations` runs AFTER the
    * main optimizer batches, so here the child Projects the rule
    * inserts stay as explicit projections above the scans rather than
    * merging into ReadSchema — pruning still removes the columns from
    * the exchange + sort, which is the cost that matters. */
  def register(spark: SparkSession): Unit = {
    val strategies = spark.experimental.extraStrategies
    if (!strategies.contains(AsOfStrategy))
      spark.experimental.extraStrategies = strategies :+ AsOfStrategy
    val opts = spark.experimental.extraOptimizations
    if (!opts.contains(AsOfColumnPruning))
      spark.experimental.extraOptimizations = opts :+ AsOfColumnPruning
  }

  /** LEFT AS-OF join: every `left` row + the latest `right` row with
    * the same key at or before the left timestamp (ties broken by the
    * highest tie column). Key/ts/tie must be BIGINT columns; name the
    * two sides' columns distinctly (the output carries both). */
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, leftTs: String, leftTie: String,
      rightKey: String, rightTs: String, rightTie: String): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    def attr(df: DataFrame, name: String): Attribute =
      df.queryExecution.analyzed.output
        .find(_.name == name)
        .getOrElse(throw new IllegalArgumentException(s"no column $name"))
    GraftSqlBridge.ofRows(spark, AsOfJoinPlan(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      attr(left, leftKey), attr(left, leftTs), attr(left, leftTie),
      attr(right, rightKey), attr(right, rightTs), attr(right, rightTie)))
  }
}
