package graft.functions

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** The bounded bucket-cap aggregates (r10 hardening): any partition
  * split and any merge-tree order must reproduce exactly the closed
  * form they replaced — `slice(sort_array(collect_list(x)), 1, k)` for
  * [[MinKBuffer]], the hash-sorted sliced struct list for
  * [[MinKPairBuffer]] — while each buffer never holds more than k
  * entries at any point. */
class MinKAggSpec extends AnyFunSuite {

  private def mergeTree[B](partials: Seq[B], rnd: Random, merge: (B, B) => B): B = {
    var live = partials.toVector
    while (live.size > 1) {
      val i = rnd.nextInt(live.size)
      val a = live(i)
      live = live.patch(i, Nil, 1)
      val j = rnd.nextInt(live.size)
      val b = live(j)
      live = live.updated(j, merge(b, a))
    }
    live.head
  }

  test("min_k equals sorted.take(k) under random partitioned merge trees (100 cases)") {
    for (seed <- 0 until 100) {
      val rnd = new Random(seed)
      val k = 1 + rnd.nextInt(10)
      val n = rnd.nextInt(400)
      val xs = Seq.fill(n)(rnd.nextLong() % 1000)
      val nParts = 1 + rnd.nextInt(8)
      val partials = (0 until nParts).map { p =>
        val b = new MinKBuffer(k)
        xs.zipWithIndex.collect { case (x, i) if i % nParts == p => x }
          .foreach(b.insert)
        assert(b.size <= k, "buffer exceeded bound during update")
        b
      }
      val merged = mergeTree[MinKBuffer](partials, rnd,
        (a, b) => { var i = 0; while (i < b.size) { a.insert(b.vals(i)); i += 1 }; a })
      assert(merged.size <= k, "buffer exceeded bound after merge")
      assert(merged.sorted.toSeq === xs.sorted.take(k), s"seed=$seed k=$k n=$n")
    }
  }

  test("min_k_by equals hash-sorted slice under random partitioned merge trees (100 cases)") {
    for (seed <- 1000 until 1100) {
      val rnd = new Random(seed)
      val k = 1 + rnd.nextInt(10)
      val n = rnd.nextInt(400)
      // (key, value) pairs: 6 distinct keys of magnitude > 2^53 (a
      // double-scored top-k would corrupt them) colliding often enough
      // to exercise the value tie-break
      val xs = Seq.fill(n)(
        ((rnd.nextInt(6).toLong - 3L) * (1L << 60), rnd.nextLong() % 1000))
      val nParts = 1 + rnd.nextInt(8)
      val partials = (0 until nParts).map { p =>
        val b = new MinKPairBuffer(k)
        xs.zipWithIndex.collect { case (x, i) if i % nParts == p => x }
          .foreach { case (key, v) => b.insert(key, v) }
        assert(b.size <= k, "pair buffer exceeded bound during update")
        b
      }
      val merged = mergeTree[MinKPairBuffer](partials, rnd,
        (a, b) => { var i = 0; while (i < b.size) { a.insert(b.keys(i), b.vals(i)); i += 1 }; a })
      assert(merged.size <= k, "pair buffer exceeded bound after merge")
      assert(merged.sortedVals.toSeq === xs.sorted.take(k).map(_._2),
        s"seed=$seed k=$k n=$n")
    }
  }
}
