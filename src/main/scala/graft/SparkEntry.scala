package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) + §7 (plan).
  *
  * Every implemented capability registers a query here; each query has a
  * DuckDB oracle in [[oracleSql]] unless its semantics are not
  * SQL-expressible (those are spec-tested instead, see SURVEY.md §5).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q5RegionRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented capability from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ cdc.CdcQueries.queries ++
      ops.PipelineQueries.queries

  /** DuckDB-runnable ANSI SQL equivalent per query (same column names,
    * same deterministic rounding — see SURVEY.md §5). */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++ cdc.CdcQueries.oracles ++
      ops.PipelineQueries.oracles
}
