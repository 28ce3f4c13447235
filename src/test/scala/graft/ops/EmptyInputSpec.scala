package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture.spark

/** Empty-input contract (r11 sweep, tools/EmptyData + EmptySweep):
  * zero-row tables are a routine production state (fresh CDC slot, new
  * tenant, filtered-to-nothing partition) and must yield either a
  * clean — usually empty — result or a NAMED contract error, never a
  * nameless crash. The full gate is the sweep (171 queries: 168 clean,
  * 3 named contracts, oracle parity on all 168); this spec pins the
  * cheap representative fixes so a regression fails in `sbt test`
  * without the sweep. */
class EmptyInputSpec extends AnyFunSuite {

  private lazy val emptyDir: String = {
    val out = graft.Scratch.dir("graft_empty_sf").toString
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { n =>
      spark.read.parquet(s"${graft.SparkFixture.sf0001}/$n.parquet")
        .limit(0).coalesce(1).write.mode("overwrite").parquet(s"$out/$n.parquet")
    }
    graft.Tables.eventsRaw(spark, graft.SparkFixture.sf0001).limit(0)
      .coalesce(1).write.mode("overwrite").parquet(s"$out/events.parquet")
    out
  }

  private def rows(q: String): Array[org.apache.spark.sql.Row] = {
    val r = graft.SparkEntry.queries(q)(spark, emptyDir).collect()
    spark.catalog.clearCache()
    r
  }

  test("empty corpus: moment/power-iteration ops yield empty frames") {
    assert(rows("emb_anisotropy").isEmpty)   // was: empty.max crash
    assert(rows("emb_whiten").isEmpty)       // via the topPc guard
  }

  test("empty feed: layout/shard/curve ops run with defined nulls") {
    assert(rows("pipeline_zorder_layout").isEmpty)  // was: getLong(null)
    assert(rows("pipeline_shard_manifest").isEmpty) // was: UNABLE_TO_INFER_SCHEMA
    val curve = rows("dedup_survival_curve")        // was: ANSI divide-by-zero
    assert(curve.length === 5 && curve.forall(_.isNullAt(4)),
      "survival curve must keep its 5-threshold spine with NULL ppm")
  }

  test("empty feed: lag metrics keep SQL's global TOTAL row") {
    val lag = rows("cdc_lag_metrics") // was: 0 rows vs the oracle's 1
    assert(lag.length === 1 && lag(0).getString(0) === "TOTAL"
      && lag(0).getLong(1) === 0L)
  }

  test("empty feed: named contracts fire by name, not by accident") {
    val e = intercept[IllegalArgumentException](rows("ann_ivf_pq"))
    assert(e.getMessage.contains("corpus has 0 valid vectors"))
  }
}
