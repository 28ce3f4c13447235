package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize a UNICODE replica of a test SF dir: same tables, same
  * row counts, but deterministic document slices carry the scripts a
  * real multilingual corpus is made of and the ASCII word-soup
  * generator never emits:
  *
  *   - unspaced CJK (whitespace tokenizers see ONE giant token; char
  *     ops see multi-byte code points);
  *   - astral-plane emoji + ZWJ sequences + regional-indicator flags
  *     (surrogate pairs: Java string length ≠ code-point count — any
  *     op that splits per UTF-16 unit diverges from DuckDB's
  *     per-code-point view);
  *   - combining diacritics (é as e+U+0301 AND precomposed U+00E9 in
  *     the same text — normalization-sensitive equality);
  *   - RTL Arabic (spaced words, bidi code points);
  *   - Latin-extended casing traps (ß, İ, dotless ı).
  *
  * All derived columns (n_chars) are recomputed from the mutated text
  * at WRITE time, so both engines read consistent metadata and every
  * divergence the sweep finds is a genuine cross-engine string-
  * semantics bug (code-unit vs code-point splits, regex class
  * behavior, normalization) — the r8 silent-garbage class again, now
  * for the string layer. Slices key on doc_id % 23 (prime), residues
  * 0–5 (~26% of the corpus), one script family per residue.
  *
  *   runMain graft.tools.UnicodeData <srcSfDir> <outDir>
  */
object UnicodeData {
  val Cjk: String =
    "数据表扫描连接合并批处理窗口排序值行列分区哈希聚合过滤查询火花客户小快慢" +
    "数据表扫描连接合并批处理窗口排序值行列分区哈希聚合过滤查询火花客户小快慢" +
    "数据表扫描连接合并批处理窗口排序值行列分区哈希聚合过滤查询火花客户小快慢"

  val Emoji: String =
    "table scan 🚀 join merge 😀😀 batch " +
    "window 🇺🇸 value row 👨‍\ud83d" +
    "\udc69‍👧‍👦 agg filter query data " +
    "spark 🚀🚀 line customer small fast slow the a " +
    "table scan join merge batch window order value row column part hash"

  val Combining: String =
    "table scan mérge batch mérge window ordre valeur ligne " +
    "colonne partie hachage agrégat filtre requête données " +
    "spark ligne client petit rapide lent le la table scan joindre " +
    "fusionner lot fenêtre ordre valeur rangée colonne partie"

  val Arabic: String =
    "جدول مسح ضم " +
    "دمج دفعة نافذة " +
    "قيمة صف عمود " +
    "جزء تجميع مرشح " +
    "استعلام بيانات " +
    "سطر عميل صغير " +
    "سريع بطيء جدول " +
    "مسح ضم دمج دفعة"

  val Casing: String =
    "straße İstanbul ırmak tabelle scannen verbinden " +
    "zusammenführen stapel fenster ordnung wert zeile spalte teil " +
    "hash aggregat filter abfrage daten spark zeile kunde klein schnell " +
    "langsam die ein tabelle scannen verbinden stapel fenster ordnung"

  def main(args: Array[String]): Unit = {
    val Array(src, out) = args.take(2)
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")

    def slice(idCol: String, rs: Int*) =
      pmod(col(idCol), lit(23)).isin(rs.map(_.asInstanceOf[Any]): _*)

    // single-FILE layout, exactly like /root/testdata/sf* (selfcheck's
    // DuckDB side reads '<dir>/<table>.parquet' as a file)
    def write(name: String, df: DataFrame): Unit =
      println(s"UNI $name -> ${graft.Scratch.writeSingleParquet(df, out, name)} rows")

    Seq("region", "nation", "supplier", "part", "customer",
      "orders", "lineitem", "embeddings").foreach { n =>
      write(n, spark.read.parquet(s"$src/$n.parquet"))
    }
    write("events", graft.Tables.eventsRaw(spark, src))

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val mutated = docs
      .withColumn("text",
        when(slice("doc_id", 0, 1), lit(Cjk))
          .when(slice("doc_id", 2), lit(Emoji))
          .when(slice("doc_id", 3), lit(Combining))
          .when(slice("doc_id", 4), lit(Arabic))
          .when(slice("doc_id", 5), lit(Casing))
          .otherwise(col("text")))
      .withColumn("lang",
        when(slice("doc_id", 0, 1), lit("zh"))
          .when(slice("doc_id", 2), lit("en"))
          .when(slice("doc_id", 3), lit("fr"))
          .when(slice("doc_id", 4), lit("ar"))
          .when(slice("doc_id", 5), lit("de"))
          .otherwise(col("lang")))
      // recomputed from the mutated text with Spark's code-point
      // length — both engines then read consistent metadata
      .withColumn("n_chars", length(col("text")).cast("long"))
    write("documents", mutated)

    spark.stop()
  }
}
