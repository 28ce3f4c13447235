package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class MisraGriesSpec extends AnyFunSuite {

  /** Deterministic skewed stream: key i appears (i % 7 == 0) ? 40 : 2
    * times over 500 distinct keys — cardinality 5× the capacity. */
  private def stream: Seq[Long] =
    (0L until 500L).flatMap(i => Seq.fill(if (i % 7 == 0) 40 else 2)(i))

  private def exact(xs: Seq[Long]): Map[Long, Long] =
    xs.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("MG guarantee holds under update-only ingestion") {
    val m = 100
    val b = new MGBuffer(m)
    val xs = stream
    xs.foreach(b.add(_, 1L))
    val f = exact(xs)
    val est = b.sortedEntries.toMap
    val slack = xs.size / (m + 1)
    for ((k, fk) <- f if fk > slack)
      assert(est.contains(k), s"mandatory heavy hitter $k dropped")
    for ((k, e) <- est) {
      assert(e <= f(k), s"overestimate for $k: $e > ${f(k)}")
      assert(e >= f(k) - slack, s"estimate for $k below band: $e < ${f(k)} - $slack")
    }
  }

  test("MG guarantee survives partitioned merge (mergeable summaries)") {
    val m = 100
    val xs = stream
    // partition round-robin into 8 partials, merge pairwise
    val partials = (0 until 8).map { p =>
      val b = new MGBuffer(m)
      xs.zipWithIndex.collect { case (x, i) if i % 8 == p => x }
        .foreach(b.add(_, 1L))
      b
    }
    val merged = partials.reduce { (a, b) => a.mergeIn(b); a }
    assert(merged.counts.size <= m, s"merge exceeded capacity: ${merged.counts.size}")
    val f = exact(xs)
    val est = merged.sortedEntries.toMap
    val slack = xs.size / (m + 1)
    for ((k, fk) <- f if fk > slack)
      assert(est.contains(k), s"mandatory heavy hitter $k dropped after merge")
    for ((k, e) <- est) {
      assert(e <= f(k), s"merge overestimate for $k")
      assert(e >= f(k) - slack, s"merge estimate below band for $k")
    }
  }
}
