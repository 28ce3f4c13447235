package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize an N×-scaled copy of a test SF dir in /tmp by unioning
  * id-shifted replicas — for scale-behavior smoke runs.
  *
  *   runMain graft.tools.ScaleUp <srcSfDir> <outDir> <copies> [mode]
  *
  * Two modes (r13 verdict task 4):
  *
  *  - `verbatim` (default): replica texts/vectors are identical, which
  *    deliberately stresses the dedup operators with a 100%-duplicated
  *    corpus (the CommonCrawl shape) — but it makes the exact near-dup
  *    ANSWER grow quadratically in copy count, so a scale exponent
  *    measured on it conflates answer growth with plan cost
  *    (SCALING.md round-13: containment read e=2.0 on output that
  *    itself grew 9.6×).
  *  - `perturb`: replica i > 0 gets its tokens suffixed (`w` → `wvi`)
  *    and its embedding dims rotated by i, so cross-copy pairs stop
  *    being near-dups while WITHIN-replica structure (fragments,
  *    planted dups, vector clusters) is preserved verbatim. The
  *    answer then grows ~linearly with copies, and the measured
  *    exponent is PLAN-bound: superlinear time on a perturbed replica
  *    is a real plan pathology, not the replica's answer.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val Array(src, out, copiesStr) = args.take(3)
    val copies = copiesStr.toInt
    val perturb = args.lift(3).contains("perturb")
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    scale(spark, src, out, copies, perturb)
    spark.stop()
  }

  /** Body of the CLI, callable in-process (ScaleCurve builds its
    * replicas through this; ScaleCurveSpec pins the perturb
    * contract without a JVM fork). */
  def scale(spark: SparkSession, src: String, out: String,
      copies: Int, perturb: Boolean): Unit = {

    def rep(name: String, idCols: Seq[String], shift: Long): Unit = {
      // events: keep the on-disk ts representation (eventsRaw handles
      // the nanos-vs-NTZ footer drift); replicas stay bit-identical
      val base =
        if (name == "events") graft.Tables.eventsRaw(spark, src)
        else spark.read.parquet(s"$src/$name.parquet")
      val parts = (0 until copies).map { i =>
        val shifted = idCols.foldLeft(base) { (df, c) =>
          df.withColumn(c, col(c) + lit(i * shift))
        }
        if (!perturb || i == 0) shifted
        else if (name == "documents")
          // suffix every token: replica i shares no shingle/gram/window
          // with replica j ≠ i, but keeps its own internal structure
          shifted
            .withColumn("text", concat_ws(" ",
              transform(split(col("text"), " "), w => concat(w, lit(s"v$i")))))
            .withColumn("n_chars", length(col("text")).cast("long"))
        else if (name == "embeddings")
          // rotate dims by i: norm-preserving, kills cross-replica
          // cosine alignment for the generator's quasi-random vectors
          shifted.withColumn("embedding", expr(
            s"transform(embedding, (x, j) -> element_at(embedding, " +
              s"cast((j + $i) % size(embedding) as int) + 1))"))
        else shifted
      }
      parts.reduce(_ unionByName _)
        .repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"SCALED $name -> ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    // dims stay 1×; facts replicate with disjoint id spaces
    Seq("region", "nation", "customer", "supplier", "part").foreach { n =>
      spark.read.parquet(s"$src/$n.parquet")
        .write.mode("overwrite").parquet(s"$out/$n.parquet")
    }
    rep("orders", Seq("o_orderkey"), 100000000L)
    rep("lineitem", Seq("l_orderkey"), 100000000L)
    rep("events", Seq("event_id"), 100000000L)
    rep("documents", Seq("doc_id"), 100000000L)
    rep("embeddings", Seq("vec_id"), 100000000L)
  }
}
