package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fixed synthetic CPU+shuffle probe for separating BOX DRIFT from
  * code changes in bench sweeps (r12 verdict task 1: three straight
  * rounds burned investigation time attributing total swings — r10
  * embeddings, r11 drop_ledger, r12's +12% sf1 — to the box's
  * documented diurnal drift; a canary timed at sweep start/end turns
  * the next cross-window comparison into a one-line read).
  *
  * The probe is deliberately DATA-FREE (no file IO — cold-page effects
  * are a separate, per-query phenomenon the two-sweep protocol already
  * handles): `range` → per-row md5 + xxhash64 (CPU) → a 64-key
  * groupBy count_distinct (one real exchange + hash-agg) → count.
  * Same plan, same row count, every invocation; the only variable is
  * the box. Callers time [[run]] AFTER one discarded warm call
  * ([[warmThenTime]]) so whole-stage-codegen javac doesn't pollute the
  * first reading. ~2-3 s on an idle local[32] (sized down from
  * 24M rows after the first smoke read 8-12 s: the per-row md5 costs
  * more than estimated) - big enough that a 1.5x box slowdown moves
  * it well past jitter, small enough to add ~6-9 s per sweep. */
object DriftCanary {
  val Rows = 6L * 1000 * 1000

  def run(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(0L, Rows, 1L, 32)
      .select((xxhash64(col("id")) % 64).as("k"),
        md5(col("id").cast("string")).as("h"))
      .groupBy(col("k")).agg(count_distinct(col("h")).as("n"))
      .agg(sum(col("n"))).collect()
    (System.nanoTime() - t0) / 1e9
  }

  /** One discarded codegen-warm call, then the timed probe. */
  def warmThenTime(spark: SparkSession): Double = { run(spark); run(spark) }
}
