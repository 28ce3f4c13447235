package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: time the C3 MinHash-LSH pipeline's stages separately
  * (shingle, sign, band+bucket, capped pairs, confirm) so the
  * optimization rounds can see which stage owns the wall clock.
  *
  *   runMain graft.tools.LshPhaseProbe <sfDir>
  */
object LshPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    graft.functions.GraftExpressions.register(spark)
    graft.functions.MinKAgg.register(spark)
    (1 to 2).foreach { run =>
      graft.GraftSession.release(spark)
      def t[A](tag: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"LSH run=$run $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      val sh0 = graft.ops.Dedup.shingled(spark, sfDir)
      val sh = sh0.withColumn("sig", expr("minhash_sig(sh, 128)")).persist()
      t("shingle+sign (persist count)") { sh.count() }
      val bands = sh.select($"doc_id",
        explode(array((0 until 16).map(b =>
          struct(lit(b).as("band"),
            xxhash64(slice($"sig", b * 8 + 1, 8)).as("bh"))): _*)).as("e"))
        .select($"doc_id", $"e.band", $"e.bh")
      val buckets = bands.groupBy($"band", $"bh")
        .agg(expr(s"min_k(doc_id, ${graft.ops.Dedup.BucketCap})").as("ids"),
          count(lit(1)).as("cnt"))
        .filter($"cnt" > 1).persist()
      t("band+bucket (persist count)") { buckets.count() }
      val capped = buckets
        .select(explode($"ids").as("d1"), $"ids")
        .select($"d1", explode($"ids").as("d2"))
        .filter($"d1" < $"d2").dropDuplicates("d1", "d2")
      t("capped pair count") { capped.count() }
      val full = sh.select($"doc_id",
        transform($"sh", x => xxhash64(x)).as("sh2"))
      val confirmed = capped.join(full.as("x"), $"d1" === $"x.doc_id")
        .join(full.as("y"), $"d2" === $"y.doc_id")
        .select($"d1", $"d2",
          size(array_intersect($"x.sh2", $"y.sh2")).as("inter"),
          (size($"x.sh2") + size($"y.sh2")).as("ntot"))
        .filter($"inter".cast("double") / ($"ntot" - $"inter") >= 0.8)
      t("confirm") { confirmed.count() }
      t("full dedupMinhashLsh") {
        graft.ops.Dedup.dedupMinhashLsh(spark, sfDir).count()
      }
      sh.unpersist(); buckets.unpersist()
    }
    spark.stop()
  }
}
