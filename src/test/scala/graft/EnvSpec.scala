package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Environment contract, pinned after the round-8 platform bump broke
  * 52 correctness rows at once: the test-data generation and the Spark
  * runtime must agree on how `events.ts` resolves, and a drift must
  * fail HERE, loudly and by name, instead of as 17 cascaded analysis
  * errors in unrelated suites.
  *
  * Proven on: Spark 4.1.2 / Scala 2.13 / events.ts =
  * parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) → TIMESTAMP_NTZ.
  * Previously: Spark 4.0.x / TIMESTAMP(NANOS) read as raw BIGINT via
  * `spark.sql.legacy.parquet.nanosAsLong` (conf gone in 4.1).
  */
class EnvSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import SparkFixture.sf0001

  test("Spark version is the one this build was proven on") {
    // informational pin: a bump doesn't necessarily break anything,
    // but it must be a visible, named event (see round-8 postmortem)
    val v = spark.version
    assert(v.startsWith("4."), s"unexpected Spark major version: $v")
    info(s"Spark $v (proven on 4.1.2)")
  }

  test("events.ts resolves to a representation Tables can normalize") {
    val dt = Tables.eventsSchema(spark, sf0001)("ts").dataType
    assert(Set[DataType](LongType, TimestampNTZType, TimestampType)(dt),
      s"events.ts resolved as $dt — extend Tables.eventTsMicros before " +
        "anything else this round; every events consumer depends on it")
  }

  test("normalized events read yields sane microsecond event-times") {
    val row = Tables.events(spark, sf0001)
      .selectExpr("min(ts) AS lo", "max(ts) AS hi", "count(*) AS n")
      .head
    val lo = row.getTimestamp(0)
    val hi = row.getTimestamp(1)
    assert(row.getLong(2) > 0)
    // the unit-scale failure class (nanos read as micros or vice
    // versa) lands decades away from the data's real 2024-ish range
    assert(lo.after(java.sql.Timestamp.valueOf("2000-01-01 00:00:00")),
      s"min ts $lo pre-2000: ts unit mismatch")
    assert(hi.before(java.sql.Timestamp.valueOf("2100-01-01 00:00:00")),
      s"max ts $hi post-2100: ts unit mismatch")
  }

  test("batch and declared-schema stream feeds agree on event-time") {
    // the streaming path re-declares the footer schema explicitly;
    // both normalizations must land on identical micros
    val schema = Tables.eventsSchema(spark, sf0001)
    val viaDeclared = spark.read.schema(schema)
      .parquet(s"$sf0001/events.parquet")
      .select(Tables.eventTsMicros(schema("ts").dataType).as("us"))
      .selectExpr("sum(us) AS s", "min(us) AS lo").head
    val viaBatch = Tables.events(spark, sf0001)
      .selectExpr("sum(unix_micros(ts)) AS s", "min(unix_micros(ts)) AS lo")
      .head
    assert(viaDeclared.getLong(0) === viaBatch.getLong(0))
    assert(viaDeclared.getLong(1) === viaBatch.getLong(1))
  }
}
