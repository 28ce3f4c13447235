package graft.tools

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize a LONG-DOCUMENT replica of a test SF dir: same tables,
  * same row counts, but document slices grow to real crawl-page /
  * transcript lengths (the generator tops out near 400 chars; a crawl
  * corpus runs to hundreds of KB per row):
  *
  *   - ~190 KB docs of 30k pseudo-random words over a 50-word
  *     per-doc-seeded vocab (per-row shingle/token volume);
  *   - ~120 KB docs of 20k words over a 40-word vocab;
  *   - a single 20 KB unbroken token (whitespace tokenizers see ONE
  *     word — the no-spaces degenerate at length; sized by the BPE
  *     oracle's quadratic char comprehension, see the case-2 note —
  *     the engine itself swept a 100 KB token fine and RegexScrubSpec
  *     pins regex linearity at 300 KB in-engine);
  *   - 50k words of alternating "a b" (distinct-2 run-length stress —
  *     repetition/entropy ops at maximal duplication).
  *
  * Vocabularies are deliberately SMALL so per-row O(len·distinct)
  * ops stay at their design envelope (the book-length
  * sorted-run-length fallback for text_entropy is a separate,
  * disclosed path); what this replica stresses is LENGTH — per-row
  * explode volume (30k shingles/row), driver result width, oracle
  * list comprehensions over 200 KB strings — not pathological
  * overlap (the skew replica owns that). Texts are generated
  * driver-side with an LCG seeded by doc_id (deterministic, no RNG
  * state) — ~20 MB total at sf0.01, trivially bounded; a row-count
  * guard fails by name if pointed at a corpus-scale dir.
  *
  *   runMain graft.tools.LongDocData <srcSfDir> <outDir>
  */
object LongDocData {
  private def lcg(seed: Long): () => Long = {
    var x = seed * 6364136223846793005L + 1442695040888963407L
    () => { x = x * 6364136223846793005L + 1442695040888963407L; x >>> 16 }
  }

  def words(seed: Long, n: Int, vocab: Int): String = {
    val next = lcg(seed)
    val sb = new StringBuilder(n * 6)
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append('w').append(seed % 97).append('x')
        .append(next() % vocab)
      i += 1
    }
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val Array(src, out) = args.take(2)
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")

    def write(name: String, df: DataFrame): Unit =
      println(s"LONG $name -> ${graft.Scratch.writeSingleParquet(df, out, name)} rows")

    Seq("region", "nation", "supplier", "part", "customer",
      "orders", "lineitem", "embeddings").foreach { n =>
      write(n, spark.read.parquet(s"$src/$n.parquet"))
    }
    write("events", graft.Tables.eventsRaw(spark, src))

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val nDocs = docs.count()
    require(nDocs <= 50000,
      s"LongDocData builds texts driver-side; $nDocs docs exceeds the 50k bound")
    val mutated = docs.collect().map { r =>
      val id = r.getLong(r.fieldIndex("doc_id"))
      // word counts are bounded by the ORACLE, not the engine: the
      // DuckDB twin's shingle list comprehension (w[i:i+2] slices) is
      // measured QUADRATIC in word count (0.35 s/doc at 4k words,
      // 4x per doubling — 30k-word docs put single oracles past 30
      // min), while the Spark side is linear and swept the original
      // 30k-word replica whole. 2.5–4k words is still 10–60x the
      // generator's lengths; the giant single token (len(w)=3, so
      // the SHINGLE comprehension stays tiny) keeps the max-length
      // stress — its 100 KB original exposed the quadratic
      // email-scrub regex, and its shipped size is bounded by C81's
      // char-level oracle (case-2 note below).
      val text = (id % 23) match {
        case 0 => words(id, 4000, 50)                      // ~25 KB
        case 1 => words(id, 2500, 40)                      // ~16 KB
        // 20 KB, not the original 100 KB: C81's oracle re-derives the
        // full BPE trajectory with a char-slicing comprehension that is
        // quadratic per pass AND re-evaluated across the 6-round CTE
        // chain — measured >15 min at 100 KB vs 15 s without the token
        // (the engine side is indifferent: it swept 100 KB fine). The
        // 300 KB regex-linearity adversary lives in RegexScrubSpec,
        // in-engine, where no oracle has to chew it.
        case 2 => "x" * 20000 + " tail token"              // one giant word
        case 3 => Array.fill(2000)("a b").mkString(" ")    // distinct-2 run
        case _ => r.getString(r.fieldIndex("text"))
      }
      Row(id, text, r.getString(r.fieldIndex("lang")),
        r.getString(r.fieldIndex("source")),
        text.codePointCount(0, text.length).toLong)
    }
    val schema = docs.select("doc_id", "text", "lang", "source", "n_chars").schema
    write("documents", spark.createDataFrame(
      spark.sparkContext.parallelize(mutated.toSeq, 8), schema))

    spark.stop()
  }
}
