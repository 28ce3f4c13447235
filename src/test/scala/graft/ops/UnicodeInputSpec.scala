package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkFixture.spark

/** Unicode-input contract (r11 sweep, tools/UnicodeData): a replica
  * with CJK / astral emoji / combining-diacritic / RTL / Latin-casing
  * document slices reads 171/171 oracle-green — no cross-engine
  * string-semantics divergence. This spec pins the underlying traps
  * that make that hold, so a future op that splits text per UTF-16
  * unit (instead of stripping to ASCII first, C38's convention) fails
  * here instead of silently diverging from DuckDB's per-code-point
  * view. */
class UnicodeInputSpec extends AnyFunSuite {
  import spark.implicits._

  test("astral plane: length counts code points; char-split behavior is pinned") {
    val r = spark.range(1).select(
        length(lit("a🚀b")).as("len"),
        size(split(lit("a🚀b"), "")).as("n_split"),
        size(split(regexp_replace(lit("a🚀b"),
          "[^\\x00-\\x7F]", ""), "")).as("n_stripped"))
      .head()
    // Spark's length() is code-point based (UTF8String.numChars) and
    // AGREES with DuckDB's length() — 3 for a+rocket+b
    assert(r.getInt(0) === 3, "length() must count code points")
    // char-level split is ALSO code-point based in Spark — the rocket
    // stays one element, matching DuckDB's t[i] indexing; if this ever
    // flips to UTF-16 units (4, surrogate halves), every char-level op
    // MUST strip to ASCII first (textEntropy's existing convention)
    assert(r.getInt(1) === 3, s"split(text,'') code-point contract moved: ${r.getInt(1)}")
    assert(r.getInt(2) === 2, "ASCII strip must drop the astral pair entirely")
  }

  test("combining diacritics are separate code points on both engines — no implicit NFC") {
    // e + U+0301 is TWO code points; precomposed U+00E9 is ONE. The
    // engines agree because NEITHER normalizes — an op that wants
    // fold-equality must normalize explicitly (none does today).
    val r = spark.range(1).select(
        length(lit("é")).as("decomposed"),
        length(lit("é")).as("precomposed"),
        (lit("é") === lit("é")).as("eq"))
      .head()
    assert(r.getInt(0) === 2 && r.getInt(1) === 1 && !r.getBoolean(2))
  }

  test("unspaced CJK: whitespace tokenizers see one giant token, shingle gates filter it") {
    // the unicode replica's zh slice — split-on-space yields ONE word,
    // so every size(w) >= 3 shingle/quality gate excludes it on BOTH
    // engines (shared predicate), rather than one engine shingling
    // bytes and the other code points
    val cjk = graft.tools.UnicodeData.Cjk
    val r = spark.range(1).select(
        size(split(lit(cjk), " ")).as("n_words"),
        length(lit(cjk)).as("n_cp"))
      .head()
    assert(r.getInt(0) === 1, "unspaced CJK must be one whitespace token")
    assert(r.getInt(1) === cjk.codePointCount(0, cjk.length),
      "Spark length must equal Java codePointCount on CJK")
  }
}
