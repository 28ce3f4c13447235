package graft.tools

/** Run every registered query against the EmptyData zero-row replica
  * and classify the outcome:
  *
  *   OK n=<rows>   — executes cleanly (usually 0 rows; global aggs and
  *                   parameter spines may legitimately emit rows)
  *   CONTRACT      — a NAMED requirement fired (require /
  *                   IllegalArgumentException / raise_error text):
  *                   defined behavior, documented input contract
  *   CRASH         — anything else (NPE, NoSuchElement on a driver-side
  *                   head()/collect()(0), index errors, ANSI aborts):
  *                   a defect — empty input must never crash namelessly
  *
  *   runMain graft.tools.EmptySweep <emptyDir>
  */
object EmptySweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfempty")
    val spark = graft.GraftSession.builder("local[8]", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var crash = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        // collect(), not count(): count() lets column pruning skip
        // every derived column, which hid two DIVIDE_BY_ZERO crashes
        // that only fired when the full row materialized (first run
        // of this sweep)
        val n = fn(spark, dir).collect().length
        println(s"EMPTYSWEEP OK       $name n=$n")
      } catch {
        case e: Throwable =>
          val root = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
            .toSeq.last
          val named = root.isInstanceOf[IllegalArgumentException] ||
            root.isInstanceOf[IllegalStateException] ||
            String.valueOf(root.getMessage).contains("USER_RAISED_EXCEPTION") ||
            String.valueOf(root.getMessage).startsWith("requirement failed")
          if (named)
            println(s"EMPTYSWEEP CONTRACT $name ${root.getClass.getSimpleName}: " +
              String.valueOf(root.getMessage).linesIterator.next().take(140))
          else {
            crash += 1
            println(s"EMPTYSWEEP CRASH    $name ${root.getClass.getName}: " +
              String.valueOf(root.getMessage).linesIterator.toSeq.headOption
                .getOrElse("").take(200))
          }
      } finally graft.GraftSession.release(spark)
    }
    println(if (crash == 0) "EMPTYSWEEP VERDICT: no nameless crashes"
            else s"EMPTYSWEEP VERDICT: $crash nameless crashes")
    spark.stop()
  }
}
