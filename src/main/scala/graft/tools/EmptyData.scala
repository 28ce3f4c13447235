package graft.tools

/** Synthesize a schema-preserving ZERO-ROW replica of a test SF dir —
  * the input class the dirty replica (null/empty/zero VALUES) doesn't
  * cover: empty TABLES. A real pipeline hits them constantly (a new
  * tenant, a filtered-to-nothing partition, a fresh CDC slot), and the
  * defect class is specific: driver-side `.head()`/`collect()(0)` on
  * an empty frame, `require` contracts written for populated corpora,
  * window/agg seeds that assume ≥1 row. EmptySweep classifies every
  * registered query against this replica.
  *
  *   runMain graft.tools.EmptyData <srcSfDir> <outDir>
  */
object EmptyData {
  def main(args: Array[String]): Unit = {
    val Array(src, out) = args.take(2)
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    def write(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      println(s"EMPTY $name -> ${graft.Scratch.writeSingleParquet(df, out, name)} rows")
    tables.foreach { n =>
      write(n, spark.read.parquet(s"$src/$n.parquet").limit(0))
    }
    // events keeps its on-disk ts representation (nanos-vs-NTZ drift)
    write("events", graft.Tables.eventsRaw(spark, src).limit(0))
    spark.stop()
  }
}
