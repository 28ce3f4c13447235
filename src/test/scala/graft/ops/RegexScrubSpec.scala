package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkFixture.spark

/** Pins the start-guarded email scrub (r11 long-doc sweep finding,
  * guard corrected in the r11 review pass): the plain
  * `[a-z0-9]+@[a-z]+\.[a-z]+` is QUADRATIC under Java's backtracking
  * engine on long alphanumeric runs — every interior position of a
  * run re-consumes the run's tail before failing, so one 100 KB
  * unbroken token cost ~10^10 char ops and wedged an executor core
  * for 17+ minutes. The guard restricts match STARTS to run starts
  * (negative lookbehind) OR the previous match's end (`\G`); every
  * other position fails in O(1). The `\G` arm is what makes the
  * match set EXACTLY the plain form's (which the DuckDB oracle
  * keeps — RE2 is linear by construction and has no lookbehind): an
  * RE2 leftmost match can start mid-run precisely when the run's
  * prefix was consumed by the previous match — the lookbehind alone
  * dropped an email abutting the previous match's TLD
  * ('a@b.com2@d.ee' scrubbed once instead of twice). */
class RegexScrubSpec extends AnyFunSuite {
  import spark.implicits._

  private val plain = "[a-z0-9]+@[a-z]+\\.[a-z]+"
  // must equal the pattern in TextOps.textScrub / PipelineQueries C14
  private val guarded = "(?:(?<![a-z0-9])|\\G)[a-z0-9]+@[a-z]+\\.[a-z]+"
  // the r11 pre-review guard — kept to pin the divergence it caused
  private val lookbehindOnly = "(?<![a-z0-9])[a-z0-9]+@[a-z]+\\.[a-z]+"

  private val cases = Seq(
    "contact user42@example.com now",          // plain hit
    "foo_bar@x.com",                           // underscore-adjacent local
    "Abar@x.com",                              // uppercase-adjacent local
    "a@b.c x9@y.zz tail",                      // multiple matches
    "no at sign here 555-1234",                // no email
    "x" * 5000 + "@example.com",               // long run INTO a match
    "@x.com a@@b.com trailing@",               // malformed shapes
    "1abc@x.com.y",                            // leading digit + dotted tld
    "a@b.com2@d.ee",                           // ABUTTING: digit local after tld
    "zza@b.com2@d.ee",                         // abutting with run-prefixed first
    "a@b.comb@c.dd7@e.ff",                     // greedy tld eats the 2nd local
    "a@b.com@c.dd",                            // bare @ straight after tld
    "")

  test("guarded and plain email patterns scrub identically on adversarial shapes") {
    val df = cases.toDF("t")
    val rows = df.select(
        regexp_replace($"t", plain, "<EMAIL>").as("p"),
        regexp_replace($"t", guarded, "<EMAIL>").as("g"),
        size(regexp_extract_all($"t", lit(plain), lit(0))).as("np"),
        size(regexp_extract_all($"t", lit(guarded), lit(0))).as("ng"))
      .collect()
    rows.zip(cases).foreach { case (r, c) =>
      assert(r.getString(0) === r.getString(1), s"replacement diverged on '$c'")
      assert(r.getInt(2) === r.getInt(3), s"match count diverged on '$c'")
    }
  }

  test("the lookbehind-only guard DOES diverge on the abutting shape (why \\G exists)") {
    val r = Seq("a@b.com2@d.ee").toDF("t")
      .select(
        size(regexp_extract_all($"t", lit(plain), lit(0))).as("np"),
        size(regexp_extract_all($"t", lit(lookbehindOnly), lit(0))).as("nl"))
      .head()
    assert(r.getInt(0) === 2)
    assert(r.getInt(1) === 1,
      "if this starts passing, the pin no longer demonstrates the divergence")
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
