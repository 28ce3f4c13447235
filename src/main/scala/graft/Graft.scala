package graft

import org.apache.spark.sql.SparkSession

/** One-call library setup for SQL-first users: registers every graft
  * SQL function family (hash/vector kernels, pgoutput codec, array
  * parser, frame splitter) and the as-of planner strategy on an
  * existing session. Sessions built with [[GraftSession.builder]] or
  * `spark.sql.extensions=graft.GraftExtensions` already have the
  * planner strategy; function registration is per-session either way. */
object Graft {
  def register(spark: SparkSession): Unit = {
    functions.GraftExpressions.register(spark)
    cdc.PgOutputExpressions.register(spark)
    plans.AsOf.register(spark)
  }
}
