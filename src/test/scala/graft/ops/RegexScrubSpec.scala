package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkFixture.spark

/** Pins the lookbehind-guarded email scrub (r11 long-doc sweep
  * finding): the plain `[a-z0-9]+@[a-z]+\.[a-z]+` is QUADRATIC under
  * Java's backtracking engine on long alphanumeric runs — every
  * interior position of a run re-consumes the run's tail before
  * failing, so one 100 KB unbroken token cost ~10^10 char ops and
  * wedged an executor core for 17+ minutes. The
  * `(?<![a-z0-9])`-guarded form fails interior positions in O(1) and
  * must return the EXACT match set of the plain form (which the
  * DuckDB oracle keeps — RE2 is linear by construction and has no
  * lookbehind), because a returned match can never be preceded by a
  * local-part character: the enclosing run's start would yield an
  * earlier-starting match that find() returns first. */
class RegexScrubSpec extends AnyFunSuite {
  import spark.implicits._

  private val plain = "[a-z0-9]+@[a-z]+\\.[a-z]+"
  private val guarded = "(?<![a-z0-9])[a-z0-9]+@[a-z]+\\.[a-z]+"

  test("guarded and plain email patterns scrub identically on adversarial shapes") {
    val cases = Seq(
      "contact user42@example.com now",          // plain hit
      "foo_bar@x.com",                           // underscore-adjacent local
      "Abar@x.com",                              // uppercase-adjacent local
      "a@b.c x9@y.zz tail",                      // multiple matches
      "no at sign here 555-1234",                // no email
      "x" * 5000 + "@example.com",               // long run INTO a match
      "@x.com a@@b.com trailing@",               // malformed shapes
      "1abc@x.com.y",                            // leading digit + dotted tld
      "")
    val df = cases.toDF("t")
    val rows = df.select(
        regexp_replace($"t", plain, "<EMAIL>").as("p"),
        regexp_replace($"t", guarded, "<EMAIL>").as("g"),
        size(expr(s"regexp_extract_all(t, '$plain', 0)")).as("np"),
        size(expr(s"regexp_extract_all(t, '$guarded', 0)")).as("ng"))
      .collect()
    rows.zip(cases).foreach { case (r, c) =>
      assert(r.getString(0) === r.getString(1), s"replacement diverged on '$c'")
      assert(r.getInt(2) === r.getInt(3), s"match count diverged on '$c'")
    }
  }

  test("guarded pattern is linear on a 300 KB unbroken run (the wedged-core shape)") {
    // with the plain pattern this single row is ~10^11 char ops
    // (hours); the guarded form completes in milliseconds — finishing
    // at all IS the assertion, the timeout is generous slack
    val big = "x" * 300000 + " tail user7@example.com"
    val out = Seq(big).toDF("t")
      .select(regexp_replace($"t", guarded, "<EMAIL>").as("s"))
      .head().getString(0)
    assert(out.endsWith("tail <EMAIL>"))
    assert(out.startsWith("xxxx"))
  }
}
