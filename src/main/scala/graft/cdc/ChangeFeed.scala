package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical change feed (SURVEY.md §4).
  *
  * A deterministic CDC stream derived from the driver's `events` table
  * so every CDC operator has a DuckDB-checkable oracle:
  * `event_id` → seq (the LSN analog), `user_id` → key, and
  * signup→insert / error→delete / other→update. The same mapping is
  * written once as SQL in [[changesSql]] and reused by every oracle.
  */
object ChangeFeed {

  /** Timestamp output format used everywhere a timestamp surfaces in a
    * query result (Spark side); [[tsFmtDuck]] is the DuckDB twin. */
  val tsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
  val tsFmtDuck = "%Y-%m-%d %H:%M:%S.%f"

  val changesSql: String =
    """changes AS (
      |  SELECT event_id AS seq, ts, user_id AS key,
      |    CASE WHEN event_type = 'signup' THEN 'i'
      |         WHEN event_type = 'error' THEN 'd'
      |         ELSE 'u' END AS op,
      |    event_type, value, props
      |  FROM events)""".stripMargin

  /** Spark twin of [[changesSql]]. */
  def fromEvents(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Tables.events(s, dir).select(
      $"event_id".as("seq"), $"ts", $"user_id".as("key"),
      when($"event_type" === "signup", "i")
        .when($"event_type" === "error", "d")
        .otherwise("u").as("op"),
      $"event_type", $"value", $"props")
  }
}
