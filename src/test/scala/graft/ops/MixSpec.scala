package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture.{spark, sf0001}

/** C62 pipeline_temperature_mix property checks. The α=1/2 rule has
  * closed-form consequences that hold for ANY feed: shares sum to 1,
  * boost = Σn / (Σ√n · √n_i) is strictly decreasing in n_i, and the
  * smallest/largest sources sit on opposite sides of boost 1 whenever
  * sources differ — so these assertions are non-vacuous without any
  * feed engineering. */
class MixSpec extends AnyFunSuite {

  test("pipeline_temperature_mix: shares normalize, boost flattens monotonically") {
    import spark.implicits._
    val rows = PipelineQueries.pipelineTemperatureMix(spark, sf0001)
      .select("source", "tokens", "natural_ppm", "temp_ppm", "boost")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(rows.length > 1, "need at least two sources")
    val k = rows.length
    // each ppm cell rounds half-up, so the sums land within ±k/2 ppm
    assert(math.abs(rows.map(_._3).sum - 1000000L) <= k,
      s"natural shares do not normalize: ${rows.map(_._3).sum}")
    assert(math.abs(rows.map(_._4).sum - 1000000L) <= k,
      s"temperature shares do not normalize: ${rows.map(_._4).sum}")
    // temperature can only move shares TOWARD uniform: boost is
    // monotone non-increasing in source size (ties allowed by 4-dp
    // rounding), >1 at the small end, <1 at the large end
    val bySize = rows.sortBy(_._2)
    bySize.sliding(2).foreach { case Array(small, large) =>
      assert(small._5 >= large._5,
        s"boost not monotone: $small vs $large")
    }
    assert(bySize.head._5 > 1.0, s"smallest source not boosted: ${bySize.head}")
    assert(bySize.last._5 < 1.0, s"largest source not damped: ${bySize.last}")
  }
}
