package graft.ops

import org.apache.spark.sql.DataFrame

/** Self-enforcing operating envelope for the `shuffle_hash` pins on
  * corpus-proportional build frames (r14 verdict task 5 — until now
  * the envelope lived only as prose arithmetic in SCALING.md and the
  * pin scaladocs). SHJ builds cannot spill, so per-task build =
  * frame_bytes / shuffle.partitions must keep fitting in executor task
  * memory; the safe setting is partitions ∝ corpus (≈ corpus_bytes /
  * 100 MiB — ~40k at 100 TB, an unremarkable cluster number), and the
  * spillable fallback is `shuffle_merge` at the measured 6.8× sort
  * premium.
  *
  * [[check]] evaluates that arithmetic AT PLAN TIME from Catalyst's
  * own size estimate for the build frame and warns loudly — or fails
  * the query when `spark.graft.shj.enforce=true` — when the estimated
  * per-task build exceeds [[BudgetBytes]]. The default is warn, not
  * fail: Catalyst's estimate for these scan-derived frames is linear
  * in the corpus but was measured ~30× UNDER the in-memory build at
  * sf1 (PlanProbe executed inventory), so an estimate BREACH means the
  * actual build is far past the envelope — while a hard fail on an
  * estimate would let planner quirks kill legitimate queries. The
  * enforce flag is for deployments that prefer dying at plan time to
  * dying mid-shuffle.
  */
object ShjEnvelope {
  /** Conservative per-task build budget from the SCALING.md envelope:
    * sized so the ~30×-underestimating linear scan estimate still
    * flags long before a real executor OOM. */
  val BudgetBytes: Long = 128L * 1024 * 1024

  /** Last breach observed (stage, estimatedBytes, partitions) — test
    * observable. STICKY: a clean check never clears it, because a
    * multi-pin operator (c33 checks two frames) would otherwise erase
    * an inner breach with a later clean check and the spec's
    * no-breach assertion would pass vacuously (r15 review). Clear
    * explicitly via [[resetBreach]]. */
  @volatile private[graft] var lastBreach: Option[(String, BigInt, Int)] = None
  private[graft] def resetBreach(): Unit = lastBreach = None

  /** Plan-time envelope check for an SHJ build frame; returns the
    * frame unchanged so it chains into `.hint("shuffle_hash")`. */
  def check(df: DataFrame, stage: String): DataFrame = {
    val spark = df.sparkSession
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts = math.max(1,
      spark.conf.get("spark.sql.shuffle.partitions", "200").toInt)
    if (est / parts > BudgetBytes) {
      lastBreach = Some((stage, est, parts))
      val msg = s"SHJ envelope breach at '$stage': estimated build " +
        s"$est bytes over $parts shuffle partitions ≈ ${est / parts} " +
        s"bytes/task > ${BudgetBytes} budget — shuffle_hash builds cannot " +
        "spill. Raise spark.sql.shuffle.partitions toward " +
        s"frame_bytes/100MiB (≈ ${est / (100L * 1024 * 1024) + 1}) or flip " +
        "this pin to shuffle_merge (spillable, ~6.8× sort premium)."
      if (spark.conf.get("spark.graft.shj.enforce", "false").toBoolean)
        throw new IllegalStateException(msg)
      Console.err.println(s"GRAFT WARN $msg")
    }
    df
  }
}
