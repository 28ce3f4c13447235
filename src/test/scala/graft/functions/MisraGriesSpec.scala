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

  test("MG band survives adversarial random merge trees (property, 120 cases)") {
    // The Agarwal et al. mergeable-summaries claim is order-free: ANY
    // tree of partial merges over ANY stream split must keep every
    // estimate inside [f − n/(m+1), f]. Exercise it with seeded-random
    // streams (weighted adds included — the round-7 weighted-overflow
    // rule), random partition assignment, and a random pairwise merge
    // order per case.
    for (seed <- 0 until 120) {
      val rnd = new scala.util.Random(seed)
      val m = 4 + rnd.nextInt(29)           // capacity 4..32
      val nKeys = 2 + rnd.nextInt(80)       // cardinality 2..81
      val len = 50 + rnd.nextInt(1500)
      // zipf-ish skew: low keys drawn more often
      val items = Seq.fill(len) {
        val k = math.min(rnd.nextInt(nKeys), rnd.nextInt(nKeys)).toLong
        val w = 1L + rnd.nextInt(5)
        (k, w)
      }
      val nParts = 1 + rnd.nextInt(9)
      val partials = Array.fill(nParts)(new MGBuffer(m))
      items.foreach { case (k, w) => partials(rnd.nextInt(nParts)).add(k, w) }
      // random merge tree: repeatedly merge a random buffer into
      // another random survivor until one remains
      val live = scala.collection.mutable.ArrayBuffer(partials.toIndexedSeq: _*)
      while (live.size > 1) {
        val i = rnd.nextInt(live.size)
        val src = live.remove(i)
        val dst = live(rnd.nextInt(live.size))
        dst.mergeIn(src)
      }
      val merged = live.head
      val n = items.map(_._2).sum
      val slack = n / (m + 1)
      val f = items.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val est = merged.sortedEntries.toMap
      assert(merged.counts.size <= m, s"seed=$seed: size ${merged.counts.size} > m=$m")
      for ((k, fk) <- f if fk > slack)
        assert(est.contains(k), s"seed=$seed: heavy hitter $k (f=$fk > $slack) dropped")
      for ((k, e) <- est) {
        assert(e <= f(k), s"seed=$seed: overestimate for $k: $e > ${f(k)}")
        assert(e >= f(k) - slack, s"seed=$seed: $k below band: $e < ${f(k)} - $slack")
      }
    }
  }
}
