package graft.cdc

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture.{spark, sf0001}

class CdcQueriesSpec extends AnyFunSuite {

  test("pg_decode_permissive nulls corrupt records instead of failing") {
    import spark.implicits._
    PgOutputExpressions.register(spark)
    val good = PgOutput.encode(PgOutput.Insert(1, Seq(Some("42"), None)))
    val df = Seq(good, Array[Byte](0x7f, 0x00), Array[Byte]()).toDF("raw")
    // strict mode fails the job on the corrupt record
    intercept[Exception] {
      df.select(expr("pg_decode(raw)")).collect()
    }
    // permissive mode quarantines it as NULL
    val out = df.select(expr("pg_decode_permissive(raw)").as("d")).collect()
    assert(out.count(_.isNullAt(0)) === 2)
    assert(out.count(!_.isNullAt(0)) === 1)
  }

  test("schema evolution: value column appears/disappears by epoch") {
    import spark.implicits._
    val out = CdcQueries.schemaEvolution(spark, sf0001)
      .select($"seq", $"op", $"event_type", $"value").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val seq = r.getLong(0); val op = r.getString(1)
      val epoch = (seq / 1000) % 3
      if (op == "d") { assert(r.isNullAt(2) && r.isNullAt(3)) }
      else {
        // v0 has no `value` column; v2 dropped `event_type`
        assert(r.isNullAt(3) === (epoch == 0), s"seq $seq value")
        assert(r.isNullAt(2) === (epoch == 2), s"seq $seq event_type")
      }
    }
  }
}
