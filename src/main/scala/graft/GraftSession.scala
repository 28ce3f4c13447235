package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended configuration.
  *
  * `shufflePartitions` should track total cores locally and ≈ 2–3×
  * total executor cores on a cluster (AQE coalesces the excess); the
  * remaining settings are safe everywhere: AQE with skew-join
  * splitting, UTC session time, and event-time ordering left to
  * operators (every graft query carries an explicit ORDER BY).
  */
object GraftSession {

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")

  /** Local session sized to the machine (tests, examples, bench). */
  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
      ui: Boolean = false): SparkSession =
    builder(s"local[$cores]", cores)
      .config("spark.ui.enabled", ui.toString)
      .getOrCreate()
}
