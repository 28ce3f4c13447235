package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2 is the coverage contract: every inventory row's query
  * key must be registered (and every registered query documented).
  * Keys appear in §2 table rows as the second, backtick-quoted cell. */
class CoverageSpec extends AnyFunSuite {

  private val surveyKeys: Set[String] = {
    val lines = scala.io.Source.fromFile("SURVEY.md", "UTF-8").getLines().toSeq
    val row = """^\|\s*[A-Z0-9b—-]+\s*\|\s*`([a-z0-9_]+)`\s*\|.*""".r
    lines.collect { case row(k) => k }.toSet
  }

  test("every SURVEY §2 inventory key is a registered query") {
    val registered = SparkEntry.queries.keySet
    val missing = surveyKeys -- registered
    assert(missing.isEmpty, s"in SURVEY but not registered: $missing")
  }

  test("every registered query is documented in SURVEY §2") {
    val registered = SparkEntry.queries.keySet
    val undocumented = registered -- surveyKeys
    assert(undocumented.isEmpty, s"registered but not in SURVEY: $undocumented")
  }

  test("every oracle belongs to a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("every registered query has an oracle (no rows-only rows left)") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"unexpected rows-only set: $rowsOnly")
  }

  // Three straight rounds of §8 count drift (r4/r5/r6 verdicts): the
  // headline numbers now fail the build when they lag the code.
  test("SURVEY §8 headline counts match the registry and the test tree") {
    val survey = scala.io.Source.fromFile("SURVEY.md", "UTF-8").mkString
    val qc = """(\d+) queries registered""".r.findFirstMatchIn(survey)
      .map(_.group(1).toInt)
    assert(qc.contains(SparkEntry.queries.size),
      s"§8 says '${qc.orNull} queries registered', registry has ${SparkEntry.queries.size}")
    val tc = """(\d+) ScalaTest tests""".r.findFirstMatchIn(survey)
      .map(_.group(1).toInt)
    val actualTests = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get("src/test/scala"))
        .iterator().asScala.filter(_.toString.endsWith(".scala"))
        .map(p => """(?m)^\s*test\(""".r
          .findAllIn(java.nio.file.Files.readString(p)).size)
        .sum
    }
    assert(tc.contains(actualTests),
      s"§8 says '${tc.orNull} ScalaTest tests', test tree has $actualTests")
  }

  // r7 verdict: the §8 bench figure hand-drifted (88.1 vs the driver's
  // 88.740) while the counts were already build-enforced — stamp the
  // bench line the same way: §8 must quote the newest committed
  // BENCH_r*.json total verbatim.
  test("SURVEY §8 bench figure matches the newest committed BENCH_r*.json") {
    val benches = Option(new java.io.File(".").listFiles()).get
      .filter(f => f.getName.matches("BENCH_r\\d+\\.json")).sortBy(_.getName)
    assume(benches.nonEmpty, "no BENCH files committed yet")
    val latest = java.nio.file.Files.readString(benches.last.toPath)
    // the driver wraps stdout with escaped quotes; match either form
    val total = """\\?"metric\\?":\\?"total\\?",\\?"value\\?":([0-9.]+)"""
      .r.findFirstMatchIn(latest).map(_.group(1))
    assert(total.nonEmpty, s"no total in ${benches.last.getName}")
    val survey = scala.io.Source.fromFile("SURVEY.md", "UTF-8").mkString
    val quoted = """last driver measurement \*\*([0-9.]+) s\*\*"""
      .r.findFirstMatchIn(survey).map(_.group(1))
    assert(quoted === total,
      s"§8 quotes '${quoted.orNull} s', ${benches.last.getName} says '${total.orNull}'")
  }
}
