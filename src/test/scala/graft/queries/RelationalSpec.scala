package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture.{spark, sf0001}

/** Semantics checks for the round-4 relational additions. */
class RelationalSpec extends AnyFunSuite {

  test("q_skew_salted_join equals the unsalted join") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sf0001)
      .select(
        when($"user_id" % 5 < 4, lit(7L)).otherwise($"user_id" % 150)
          .as("merchant_id"),
        floor($"value" * 100 + 0.5).cast("long").as("cents"))
    val dim = spark.read.parquet(s"$sf0001/customer.parquet")
      .filter($"c_custkey" < 150)
      .select($"c_custkey".as("merchant_id"), $"c_mktsegment".as("segment"))
    val plain = ev.join(dim, "merchant_id")
      .groupBy($"segment")
      .agg(count(lit(1)).as("n_events"), sum($"cents").as("cents_total"))
      .as[(String, Long, Long)].collect().sortBy(_._1)
    val salted = Relational.queries("q_skew_salted_join")(spark, sf0001)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(salted.toSeq === plain.toSeq)
    // the synthesized skew is real: the hot merchant dominates
    val hot = ev.filter($"merchant_id" === 7L).count().toDouble / ev.count()
    assert(hot > 0.7, f"hot-key share $hot%.2f")
  }

  test("q22_global_scalar_anti is non-vacuous and matches brute force") {
    import spark.implicits._
    val cust = spark.read.parquet(s"$sf0001/customer.parquet")
      .select($"c_custkey", $"c_acctbal", $"c_nationkey").collect()
    val urgent = spark.read.parquet(s"$sf0001/orders.parquet")
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey").as[Long].collect().toSet
    val pos = cust.map(_.getDouble(1)).filter(_ > 0)
    val avgBal = pos.sum / pos.length
    val qualifying = cust.filter(r =>
      r.getDouble(1) > avgBal && !urgent.contains(r.getLong(0)))
    assert(qualifying.nonEmpty, "anti join is vacuous at sf0.001")
    val got = Relational.queries("q22_global_scalar_anti")(spark, sf0001)
    assert(got.agg(sum($"numcust")).as[Long].head() === qualifying.length)
  }

  test("q13_custdist conserves customers across the histogram") {
    import spark.implicits._
    val got = Relational.queries("q13_custdist")(spark, sf0001)
    val nCust = spark.read.parquet(s"$sf0001/customer.parquet").count()
    assert(got.agg(sum($"custdist")).as[Long].head() === nCust)
  }

  test("q_band_range_join matches a brute-force band join") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sf0001)
      .select($"event_id", $"event_type", unix_micros($"ts").as("tus"),
        floor($"value" * 100 + 0.5).cast("long").as("cents"))
      .collect()
    val signups = ev.filter(_.getString(1) == "signup")
    val purchases = ev.filter(_.getString(1) == "purchase")
    val want = signups.map { s =>
      val near = purchases.filter(p =>
        math.abs(p.getLong(2) - s.getLong(2)) <= 300000000L)
      (s.getLong(0), near.length.toLong, near.map(_.getLong(3)).sum)
    }.sortBy(_._1)
    val got = Relational.queries("q_band_range_join")(spark, sf0001)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === want.toSeq)
  }

  test("q_sketch_set_ops: audit columns carry a real estimator deviation") {
    import spark.implicits._
    val rows = Relational.queries("q_sketch_set_ops")(spark, sf0001)
      .select("set_op", "exact_count", "est_err_bands", "est_ok")
      .as[(String, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(rows.length === 5)
    // view/purchase audiences must be real; derived sets may be empty
    // at tiny SFs (the band column handles ex=0 without dividing)
    assert(Seq("1_view", "2_purchase")
      .forall(op => rows.find(_._1 == op).get._2 > 0),
      s"degenerate exact counts: ${rows.toSeq}")
    // the ±5%-band claim must hold here (below the sketch's exact-mode
    // threshold the estimate is exact, so 0 bands is a hard fact, not
    // a vacuous TRUE)
    assert(rows.forall(r => r._3 === 0L && r._4), s"estimator out of band: ${rows.toSeq}")
    // non-vacuous: recompute the RAW estimates and pin them to the
    // exact counts directly — if the sketch drifted, this names the
    // set_op and magnitude instead of an opaque driver hash fail
    val ev = graft.Tables.events(spark, sf0001).select($"user_id", $"event_type")
    val est = ev.agg(
        expr("cast(theta_sketch_estimate(theta_sketch_agg(CASE WHEN event_type = 'view' THEN user_id END)) as double)").as("e_view"),
        expr("cast(theta_sketch_estimate(theta_sketch_agg(CASE WHEN event_type = 'purchase' THEN user_id END)) as double)").as("e_purchase"))
      .head
    val exactView = rows.find(_._1 == "1_view").get._2.toDouble
    val exactPurch = rows.find(_._1 == "2_purchase").get._2.toDouble
    assert(math.abs(est.getDouble(0) - exactView) / exactView <= 0.05,
      s"view estimate ${est.getDouble(0)} vs exact $exactView")
    assert(math.abs(est.getDouble(1) - exactPurch) / exactPurch <= 0.05,
      s"purchase estimate ${est.getDouble(1)} vs exact $exactPurch")
  }

  test("q_event_transitions: row-stochastic matrix over exactly the user pairs") {
    import spark.implicits._
    val rows = Relational.qEventTransitions(spark, sf0001)
      .select("from_type", "to_type", "n", "p_ppm")
      .as[(String, String, Long, Long)].collect()
    // each user with k events contributes exactly k-1 ordered pairs
    val ev = graft.Tables.events(spark, sf0001)
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    assert(rows.map(_._3).sum === nEvents - nUsers,
      s"pair count ${rows.map(_._3).sum} != events $nEvents - users $nUsers")
    // conditional probabilities are normalized per from_type (each
    // cell rounds half-up, so a row of k cells lands within ±k/2 ppm)
    rows.groupBy(_._1).foreach { case (from, cells) =>
      val sum = cells.map(_._4).sum
      assert(math.abs(sum - 1000000L) <= cells.length,
        s"row $from not stochastic: $sum ppm over ${cells.length} cells")
    }
  }
}
