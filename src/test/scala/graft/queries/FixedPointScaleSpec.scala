package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture.spark

/** The 100 TB fixed-point headroom contract (r10 audit): every
  * `X * 1e6 div T` share/ppm expression whose X tracks corpus-scale
  * revenue (≈2.2e18 cents) or token counts (≈2.5e13) is widened
  * through DECIMAL(38) on the Spark side (HUGEINT in the oracles) —
  * the BIGINT product exceeds 2^63 at the design point, which under
  * Spark 4's default ANSI mode ABORTS the query at exactly the scale
  * the engine is built for (and silently wraps on a legacy non-ANSI
  * cluster). This spec feeds the widened idioms those magnitudes and
  * pins the un-widened failure itself, so the rationale stays
  * demonstrated, not asserted. */
class FixedPointScaleSpec extends AnyFunSuite {

  test("widened ppm idioms are exact at 100 TB magnitudes (BIGINT form overflows)") {
    import spark.implicits._
    // q8/q14 share shape: 2.2e18 cents total, ~27% branch
    val shares = Seq((600000000000000000L, 2200000000000000000L))
      .toDF("x", "t")
      .selectExpr("cast(x as decimal(38,0)) * 1000000 div t AS ppm")
      .head()
    assert(shares.getLong(0) ===
      (BigInt(600000000000000000L) * 1000000 / BigInt(2200000000000000000L)).toLong)
    // the un-widened form dies at the same magnitudes (ANSI overflow;
    // a non-ANSI cluster would silently wrap instead)
    val died = intercept[Exception] {
      Seq((600000000000000000L, 2200000000000000000L)).toDF("x", "t")
        .selectExpr("x * 1000000 div t AS wrapped").head()
    }
    assert(died.getMessage.contains("ARITHMETIC_OVERFLOW"), died.getMessage)

    // q11 gate shape: global 100-scaled revenue × 3
    val gate = Seq((2200000000000000000L, 40000000L)).toDF("tot", "np")
      .selectExpr("cast(tot as decimal(38,0)) * 3 div (np * 2) AS thr").head()
    assert(gate.getLong(0) ===
      (BigInt(2200000000000000000L) * 3 / (BigInt(40000000L) * 2)).toLong)

    // C58 rate/expected shape: per-source token counts ~2.5e13
    val mix = Seq((13000000000000L, 25000000000000L)).toDF("ft", "ta")
      .selectExpr(
        "least(1000000, cast(ft as decimal(38,0)) * 1000000 div ta) AS rate",
        "cast(ta as decimal(38,0)) * least(1000000," +
          " cast(ft as decimal(38,0)) * 1000000 div ta) div 1000000 AS exp")
      .head()
    assert(mix.getLong(0) === 520000L)
    assert(mix.getLong(1) ===
      (BigInt(25000000000000L) * 520000L / 1000000L).toLong)

    // C72 likelihood-ratio shape: the long product (tc+1)*(r_tot+B)
    // at a hot bucket (1e12) × corpus features (2.5e13) — the widened
    // form promotes each factor to double BEFORE multiplying
    val lr = Seq((1000000000000L, 25000000000000L, 900000000000L, 5000000000000L))
      .toDF("tc", "rt", "rc", "tt")
      .selectExpr(
        "floor(log(cast(tc + 1L as double) * (rt + 256) /" +
          " (cast(rc + 1L as double) * (tt + 256))) * 1000000 + 0.5) AS lr_fp")
      .head()
    val expected = math.floor(math.log(
      (1000000000000L + 1L).toDouble * (25000000000000L + 256).toDouble /
        ((900000000000L + 1L).toDouble * (5000000000000L + 256).toDouble))
      * 1000000 + 0.5).toLong
    assert(lr.getLong(0) === expected)
  }
}
