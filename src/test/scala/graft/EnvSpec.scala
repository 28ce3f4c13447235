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

  test("every test table resolves to its recorded schema contract") {
    // the round-8 drift hit only events.ts, but ANY regeneration of
    // the test data should fail here first, by table name, instead of
    // as scattered analysis errors. events is exempt from exactness
    // (Tables normalizes its ts representations — covered above).
    val expected = Map(
      "region" -> "struct<r_regionkey:int,r_name:string>",
      "nation" -> "struct<n_nationkey:int,n_name:string,n_regionkey:int>",
      "customer" -> ("struct<c_custkey:bigint,c_name:string," +
        "c_nationkey:int,c_acctbal:double,c_mktsegment:string>"),
      "supplier" -> ("struct<s_suppkey:bigint,s_name:string," +
        "s_nationkey:int,s_acctbal:double>"),
      "part" -> ("struct<p_partkey:bigint,p_name:string,p_brand:string," +
        "p_type:string,p_size:int,p_retailprice:double>"),
      "orders" -> ("struct<o_orderkey:bigint,o_custkey:bigint," +
        "o_orderstatus:string,o_totalprice:double," +
        "o_orderdate:timestamp_ntz,o_orderpriority:string>"),
      "lineitem" -> ("struct<l_orderkey:bigint,l_partkey:bigint," +
        "l_suppkey:bigint,l_linenumber:int,l_quantity:double," +
        "l_extendedprice:double,l_discount:double,l_tax:double," +
        "l_returnflag:string,l_linestatus:string," +
        "l_shipdate:timestamp_ntz>"),
      "documents" -> ("struct<doc_id:bigint,text:string,lang:string," +
        "source:string,n_chars:bigint>"),
      "embeddings" ->
        "struct<vec_id:bigint,embedding:array<float>,label:int>")
    val drift = expected.flatMap { case (t, want) =>
      val got = Tables.table(spark, sf0001, t).schema.catalogString
      if (got == want) None else Some(s"$t: $got (recorded: $want)")
    }
    assert(drift.isEmpty,
      "test-data schema drift — re-prove every consumer, then re-record:\n"
        + drift.mkString("\n"))
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
