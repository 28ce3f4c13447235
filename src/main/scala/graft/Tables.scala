package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md). */
object Tables {

  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    * read natively ([PARQUET_TYPE_ILLEGAL]). Read nanos as long and
    * truncate to microseconds — exactly what DuckDB's ns→µs TIMESTAMP
    * coercion does, so oracle comparisons stay exact. */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
