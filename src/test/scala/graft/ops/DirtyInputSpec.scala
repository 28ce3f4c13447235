package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkFixture.spark

/** Pins the dirty-input contracts introduced by the r10 dirty-data
  * audit (tools/DirtyData + tools/selfcheck over a null/empty/zero
  * replica, 171/171 green — this spec keeps the LOCAL invariants that
  * audit relies on from regressing without re-running the sweep).
  *
  * The failure classes pinned here are the ones clean generator data
  * can never surface: ANSI div-by-zero on empty documents, encoder
  * NOT_NULL crashes on malformed change records, Spark's
  * sequence(0, -1) auto-reverse, and null-vs-zero vector handling. */
class DirtyInputSpec extends AnyFunSuite {
  import spark.implicits._

  private def docs = Seq((1L, "hello the world of spark"), (2L, ""))
    .toDF("doc_id", "text")
    .unionByName(Seq((3L, null.asInstanceOf[String])).toDF("doc_id", "text"))

  test("sequence(0, -1) silently auto-reverses — the trap mmFrames guards") {
    // If Spark ever changes this to an empty array, the explicit
    // length > 0 guards in Multimodal become redundant but stay safe;
    // if it STAYS [0, -1], an unguarded explode emits phantom frames.
    val out = spark.range(1)
      .select(sequence(lit(0), lit(-1)).as("s")).head().getSeq[Long](0)
    assert(out === Seq(0L, -1L))
  }

  test("empty document: quality ratios are NULL, not a corpus-pass abort") {
    val q = docs.select($"doc_id", length($"text").as("n"),
        ((size(split($"text", "[a-z]")).cast("double") - 1) /
          nullif(length($"text"), lit(0))).as("alpha_ratio"))
      .orderBy($"doc_id").collect()
    assert(q(1).isNullAt(2)) // empty doc -> NULL ratio
    assert(q(2).isNullAt(2)) // null doc -> NULL ratio
  }

  test("well-formed change contract: malformed events are excluded, NULL value survives") {
    val ev = Seq(
      (Some(1L), Some("2024-01-01 00:00:00"), Some(10L), Some("click"), Some(1.5)),
      (Some(2L), None, Some(10L), Some("click"), Some(1.0)), // null ts
      (Some(3L), Some("2024-01-01 00:00:02"), None, Some("view"), Some(2.0)), // null user
      (Some(4L), Some("2024-01-01 00:00:03"), Some(11L), None, Some(3.0)), // null type
      (Some(5L), Some("2024-01-01 00:00:04"), Some(12L), Some("view"), None)) // null VALUE: kept
      .toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .select($"event_id", $"ts_s".cast("timestamp").as("ts"),
        $"user_id", $"event_type", $"value")
    val wf = graft.cdc.ChangeFeed.wellFormed(ev)
    assert(wf.count() === 2)
    assert(wf.select($"event_id").as[Long].collect().sorted === Array(1L, 5L))
    // the SQL twin is the same predicate
    assert(ev.filter(graft.cdc.ChangeFeed.wellFormedSql).count() === 2)
  }

  test("simhash pairs: null-text docs produce no pairs, identical dirty docs still pair") {
    val feed = docs.unionByName(
      Seq((12L, ""), (13L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val pairs = Dedup.simhashPairs(spark, feed)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((2L, 12L)))   // two empty docs: same fingerprint
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L || p._2 == 13L))
  }

  test("valid-vector contract: null and zero-norm vectors never reach cosine math") {
    val emb = Seq(
      (1L, Some(Seq(1.0f, 0.0f)), 0),
      (2L, Some(Seq(0.0f, 0.0f)), 0))
      .toDF("vec_id", "embedding", "label")
      .unionByName(Seq((3L, None: Option[Seq[Float]], 0))
        .toDF("vec_id", "embedding", "label"))
    val valid = emb
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .filter($"v".isNotNull &&
        expr("aggregate(v, cast(0 as double), (a, x) -> a + x * x)") > 0)
    assert(valid.select($"vec_id").as[Long].collect() === Array(1L))
  }
}
