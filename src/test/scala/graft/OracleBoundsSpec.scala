package graft

import org.scalatest.funsuite.AnyFunSuite

/** Literal-bound audit over every registered oracle (r10 verdict task
  * 7, generalizing the C12b fix: a `generate_series(0, 9999)` frame
  * cap silently diverged once a payload outgrew it — the same class
  * can hide in ANY oracle literal that bounds data rather than
  * parameterizes the query). The audit scans every `oracleSql` string
  * for the two bound-generating shapes:
  *
  *   - `generate_series(...)` whose arguments are ALL numeric literals
  *     (a series derived from row data — `generate_series(0, n_frames
  *     - 1)` — references columns and passes);
  *   - `unnest([...])` whose array elements are all numeric literals
  *     (a literal value spine).
  *
  * Every hit must be a JUSTIFIED PARAMETER SPINE — a set of query
  * parameters mirrored verbatim by the Spark side — registered in the
  * allowlist below with its justification. A new literal bound in any
  * oracle fails this spec until it is either derived from the row or
  * consciously allowlisted; a stale allowlist row (query gone or
  * literal removed) fails too, so the list can't rot. */
class OracleBoundsSpec extends AnyFunSuite {

  // query -> (expected literal spines, justification)
  private val allow: Map[String, (Set[String], String)] = Map(
    "dedup_survival_curve" -> (Set("[50, 60, 70, 80, 90]"),
      "Jaccard-threshold sweep parameters; Spark side iterates the same" +
        " five thresholds — a parameter spine, not a data cap"),
    "ann_nprobe_sweep" -> (Set("[1, 2, 4, 8]"),
      "probe-depth sweep parameters; Spark side builds the identical" +
        " nprobe spine frame — a parameter spine, not a data cap"),
    "cdc_stream_sliding" -> (Set("[0, 1, 2, 3]"),
      "the 4 slide offsets of a 1h window sliding by 15min (window/" +
        "slide ratio, structural); Spark side uses window(ts, '1 hour'," +
        " '15 minutes') with the same ratio")
  )

  private val series = """generate_series\(([^)]*)\)""".r
  private val spine = """unnest\((\[[^\]]*\])\)""".r
  private def allLiteral(s: String) = s.trim.nonEmpty &&
    s.replaceAll("[\\[\\]\\s0-9,.+*/-]", "").isEmpty

  test("every literal oracle bound is a justified parameter spine") {
    val found: Map[String, Set[String]] = SparkEntry.oracleSql.flatMap {
      case (name, sql) =>
        val hits =
          series.findAllMatchIn(sql).map(_.group(1)).filter(allLiteral)
            .map(a => s"generate_series($a)").toSet ++
          spine.findAllMatchIn(sql).map(_.group(1)).filter(allLiteral).toSet
        if (hits.nonEmpty) Some(name -> hits) else None
    }
    val unjustified = found.filter { case (q, hits) =>
      !allow.get(q).exists(_._1 == hits)
    }
    assert(unjustified.isEmpty,
      s"literal bounds without an allowlist justification: $unjustified — " +
        "derive them from the row (the C12b pattern) or allowlist with why")
    val stale = allow.keySet -- found.keySet
    assert(stale.isEmpty, s"allowlist rows with no matching oracle: $stale")
  }
}
