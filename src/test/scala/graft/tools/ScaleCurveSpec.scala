package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** Pins for the ScaleCurve harness: the exponent arithmetic and the
  * ScaleUp `perturb` replica contract it measures against. The
  * contract is what makes a measured exponent PLAN-bound — if
  * cross-replica tokens ever collided again, near-dup answers would
  * go quadratic in copies and the curve would silently revert to the
  * answer-bound artifact r13 measured (e=2.0 on output that itself
  * grew 9.6×). */
class ScaleCurveSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val Shift = 100000000L

  test("exponent is the log-ratio of times over the copy ratio") {
    // linear plan: 3× data → 3× time ⇒ e = 1
    assert(math.abs(ScaleCurve.exponent(1.0, 3.0, 10, 30) - 1.0) < 1e-12)
    // flat plan: constant time ⇒ e = 0
    assert(ScaleCurve.exponent(7.5, 7.5, 10, 30) == 0.0)
    // quadratic plan: 3× data → 9× time ⇒ e = 2
    assert(math.abs(ScaleCurve.exponent(2.0, 18.0, 1, 3) - 2.0) < 1e-12)
    // degenerate points refuse instead of returning NaN/Inf
    intercept[IllegalArgumentException](ScaleCurve.exponent(0.0, 1.0, 10, 30))
    intercept[IllegalArgumentException](ScaleCurve.exponent(1.0, 2.0, 30, 10))
  }

  test("perturb replica: linear rows, disjoint cross-copy tokens, rotated embeddings") {
    val src = SparkFixture.sf0001
    val out = java.nio.file.Files.createTempDirectory("scalecurve_spec").toString
    ScaleUp.scale(spark, src, out, copies = 2, perturb = true)

    val base = spark.read.parquet(s"$src/documents.parquet")
    val docs = spark.read.parquet(s"$out/documents.parquet")
    assert(docs.count() == 2 * base.count(), "facts replicate linearly in copies")

    // replica 1 suffixes every token with v1 — so no shingle, gram, or
    // winnowing window can match across copies, which is the whole
    // point of the mode
    val r1BadTokens = docs.filter(col("doc_id") >= Shift)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0 && !col("w").endsWith("v1"))
      .count()
    assert(r1BadTokens == 0, "every replica-1 token carries the v1 suffix")
    // replica 0 is verbatim: its token set cannot contain the suffix
    val r0Suffixed = docs.filter(col("doc_id") < Shift)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w").endsWith("v1")).count()
    assert(r0Suffixed == 0, "replica 0 stays verbatim")
    // n_chars tracks the rewritten text, not the source's
    val nCharsDrift = docs.filter(length(col("text")) =!= col("n_chars")).count()
    assert(nCharsDrift == 0, "n_chars recomputed after the token rewrite")

    // embeddings: replica 1 is replica 0's vector rotated by one dim —
    // norm-preserving (kills cross-copy cosine alignment, keeps
    // within-copy cluster structure)
    val pair = spark.read.parquet(s"$out/embeddings.parquet")
      .filter(col("vec_id") === 0L || col("vec_id") === Shift)
      .orderBy("vec_id").collect()
    assert(pair.length == 2)
    val v0 = pair(0).getSeq[Float](pair(0).fieldIndex("embedding"))
    val v1 = pair(1).getSeq[Float](pair(1).fieldIndex("embedding"))
    assert(v1 == v0.drop(1) ++ v0.take(1), "replica-1 embedding is the dim-rotation of replica 0's")
  }
}
