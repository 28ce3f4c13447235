package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture.{spark, sf0001}

/** Round-10 additions. */
class Round10OpsSpec extends AnyFunSuite {

  test("text_bpe_apply replays a plain-Scala BPE trajectory exactly") {
    // the C76 property-test pattern: the whole declarative trajectory
    // (pair counts → tie-broken winner → greedy left-to-right merge →
    // curve stats) must equal an independent imperative reference run
    // over the same word-frequency table, round for round
    import spark.implicits._
    import org.apache.spark.sql.functions.{explode, length, split}
    val rows = TextOps.textBpeApply(spark, sf0001).collect()
    assert(rows.length === TextOps.BpeSteps)

    // mirror the operator's word filter EXACTLY (incl. the U+0001
    // separator exclusion) so both sides build tf from the same set —
    // r10 review finding; testdata is ASCII, so per-char splitting
    // below matches the operator's code-point substring
    val tf = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(explode(split($"text", " ")).as("word"))
      .filter(length($"word") > 0 && !$"word".contains("\u0001"))
      .groupBy($"word").count()
      .as[(String, Long)].collect()
    var vocab: Seq[(Vector[String], Long)] =
      tf.toSeq.map { case (w, n) => (w.map(_.toString).toVector, n) }
    for (k <- 1 to TextOps.BpeSteps) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((sy, n) <- vocab; i <- 0 until sy.length - 1) {
        val key = (sy(i), sy(i + 1))
        counts(key) = counts.getOrElse(key, 0L) + n
      }
      val ((l, r), cnt) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
      vocab = vocab.map { case (sy, n) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < sy.length) {
          if (i + 1 < sy.length && sy(i) == l && sy(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += sy(i); i += 1 }
        }
        (out.result(), n)
      }
      val row = rows(k - 1)
      assert(row.getLong(0) === k.toLong)
      assert((row.getString(1), row.getString(2)) === ((l, r)),
        s"round $k winner")
      assert(row.getString(3) === l + r)
      assert(row.getLong(4) === cnt, s"round $k pair count")
      val totalTokens = vocab.map { case (sy, n) => sy.length * n }.sum
      assert(row.getLong(5) === totalTokens, s"round $k token total")
      val nTypes = vocab.flatMap(_._1).distinct.size.toLong
      assert(row.getLong(6) === nTypes, s"round $k symbol types")
    }
  }

  test("LSH oversize-bucket star path: a >cap identical cluster loses every non-min member") {
    // r10 review finding: the 64-id bucket slice could silently drop
    // the tail of a giant near-identical cluster from the candidate
    // set (and thus from the composite pipelines' loser set). The star
    // augmentation pairs every member of an oversize bucket with the
    // bucket min — exercised here directly, since no natural bucket
    // exceeds the cap at test SFs.
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val text = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = (0 until 100).map(i => (i.toLong, text)).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(spark, Dedup.shingleDocs(spark, docs))
      .select($"d1", $"d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    // every non-min doc must be a loser: d2 ∈ {1..99} all present
    val losers = pairs.map(_._2).toSet
    assert((1L until 100L).forall(losers.contains),
      s"missing losers: ${(1L until 100L).filterNot(losers.contains).take(10)}")
    // and the star pairs are true pairs: min id 0 pairs with the tail
    assert(pairs.filter(_._1 == 0L).map(_._2).toSet.size === 99)
  }

  test("text_bpe_apply curve is sane: token total strictly drops, bounded by pair count") {
    val rows = TextOps.textBpeApply(spark, sf0001).collect()
    var prev = Long.MaxValue
    for (row <- rows) {
      val (pairN, total) = (row.getLong(4), row.getLong(5))
      assert(total < prev, "each merge must shrink the corpus")
      if (prev != Long.MaxValue) {
        val drop = prev - total
        // greedy non-overlap merges between ceil(n/2) and n occurrences
        assert(drop <= pairN && drop >= (pairN + 1) / 2,
          s"drop $drop outside [${(pairN + 1) / 2}, $pairN]")
      }
      prev = total
    }
  }
}
