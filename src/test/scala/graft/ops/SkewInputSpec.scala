package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture.spark

/** Skew-input contract (r11 sweep, tools/SkewData; self-describing
  * r12): heavy hitters — a viral duplicate cohort, one hot user owning
  * ~22% of the feed, hot dim keys — are the shapes a uniform generator
  * never makes and a real 100 TB corpus always has. The full gate is
  * the sweep (Verify + selfcheck over the skew replica), and since r12
  * it reads 171/171 oracle-green with NO out-of-band narrative: C3's
  * oracle (Dedup.dedupMinhashLshSql) encodes the star-reduction
  * contract itself — oversize identical-shingle-set cohorts emit
  * capped all-pairs + (min, m) star links, exactly the engine's
  * reduction. This spec pins the cheap representatives so a
  * regression fails in `sbt test` without the sweep. */
class SkewInputSpec extends AnyFunSuite {
  import spark.implicits._

  test("mix sample: digit-free source takes the odd-source rate, not an engine error") {
    // skew-sweep finding: source='viral-hub' has no numeric suffix;
    // DuckDB's CAST('' AS INT) is a hard error while Spark's cast
    // nulls — the contract is now explicit on both sides (NULLIF /
    // TRY_CAST): no parity digit -> conservative 1/4 keep rate.
    val out = graft.Scratch.dir("graft_skew_mix").toString
    spark.read.parquet(s"${graft.SparkFixture.sf0001}/documents.parquet")
      .withColumn("source",
        when(pmod($"doc_id", lit(23)) < 6, lit("viral-hub"))
          .otherwise($"source"))
      .coalesce(1).write.mode("overwrite").parquet(s"$out/documents.parquet")
    val got = graft.SparkEntry.queries("pipeline_mix_sample")(spark, out)
      .filter($"source" === "viral-hub").select($"n_sampled").as[Long].collect()
    val expected = spark.read.parquet(s"$out/documents.parquet")
      .filter($"source" === "viral-hub")
      .filter(substring(md5(concat(lit("mix:"), $"doc_id".cast("string"))), 1, 2) < "40")
      .count()
    assert(got.toSeq === Seq(expected), "digit-free source must sample at the 1/4 rate")
    assert(expected > 0, "fixture must actually sample some viral docs")
    assert(graft.SparkEntry.oracleSql("pipeline_mix_sample").contains("TRY_CAST"),
      "oracle must TRY_CAST the digit parse or DuckDB aborts on digit-free sources")
    spark.catalog.clearCache()
  }

  test("viral cohort: C3 pair emission is star-reduced, complete, and non-quadratic") {
    // 132 docs with IDENTICAL shingle sets — every band maps all 132
    // into ONE bucket, 2x the 64-id cap (the sweep's viral cohort at
    // sf0.01). Contract under an oversize bucket: the emitted pair set
    // is the capped all-pairs plus the iterated-star links — bounded
    // by cap^2, NOT by cohort^2 — and still covers every member in one
    // connected component with the min id as canonical survivor. The
    // unconstrained all-pairs form (8,646 pairs here, ~10^12 for a
    // million-strong viral cluster at corpus scale) is exactly what
    // must never materialize.
    val sh = (1 to 60).map(i => s"w$i")
    val n = 132
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("sh", ArrayType(StringType))))
    val feed = spark.createDataFrame(
      spark.sparkContext.parallelize((0 until n).map(i => Row(i.toLong, sh)), 4),
      schema)
    val pairs = Dedup.minhashPairs(spark, feed)
      .select($"d1", $"d2").as[(Long, Long)].collect()
    spark.catalog.clearCache()

    val cap = Dedup.BucketCap
    val subs = Dedup.SubBuckets
    // capped all-pairs over the 64 smallest ids, plus the r13
    // per-residue-class star links: ids 0..131 put one class minimum
    // at each residue 0..15 (all inside the cap), and every rmin
    // star-links to every past-cap member — pairs among in-cap members
    // are already the capped set. Emission is cap^2-bounded plus a
    // LINEAR tail (<= SubBuckets links per past-cap member), never
    // cohort-quadratic.
    val expectedCount = cap * (cap - 1) / 2 + subs * (n - cap)
    assert(pairs.length === expectedCount,
      s"expected star-reduced ${expectedCount} pairs, got ${pairs.length}")
    assert(pairs.length <= cap * (cap - 1) / 2 + subs * (n - cap),
      "emission must stay capped-quadratic + linear-tail")
    // completeness: every doc participates; min-id canonical reaches all
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(inPairs.size === n, s"unpaired docs: ${((0L until n.toLong).toSet -- inPairs).take(5)}")
    val parent = scala.collection.mutable.Map((0L until n.toLong).map(d => d -> d): _*)
    def find(d: Long): Long =
      if (parent(d) == d) d else { val r = find(parent(d)); parent(d) = r; r }
    pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    assert((0L until n.toLong).map(find).toSet.size === 1,
      "viral cohort must resolve to one connected component")
  }

  test("viral boilerplate cohort: C28 emission is df-capped; rare evidence stays exact") {
    // 120 containers (> ContainDfCap = 100) share ONE identical
    // boilerplate text — every shingle of every member (and of the
    // ~14 injected fragments) has df ≈ 134, so under the r14 df-cap
    // contract NO candidate survives: emission drops from ~cohort²
    // (≈15k ordered pairs) to zero. A 3-copy cluster with df=3
    // shingles rides the rare path and must still emit its exact
    // all-pairs — the cap removes hot-only evidence, nothing else.
    val out = graft.Scratch.dir("graft_skew_c28").toString
    val boiler = (1 to 40).map(i => s"b$i").mkString(" ")
    val rareText = (1 to 20).map(i => s"r$i").mkString(" ")
    val m = 120
    val viral = (0 until m).map(i => (i.toLong, boiler))
    // ids chosen so no rare-cluster doc is %9==0 (no fragment noise)
    val rareIds = Seq(1001L, 1002L, 1003L)
    (viral ++ rareIds.map(id => (id, rareText))).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/documents.parquet")
    val got = Dedup.dedupContainment(spark, out)
      .as[(Long, Long, Double)].collect()
    spark.catalog.clearCache()
    assert(got.forall(p => p._1 >= 1000L && p._2 >= 1000L),
      s"hot-only-evidence pairs must be dropped by ContainDfCap, got " +
        s"${got.filter(p => p._1 < 1000L || p._2 < 1000L).take(5).toSeq}")
    val want = (for { a <- rareIds; b <- rareIds if a != b } yield (a, b, 1.0)).toSet
    assert(got.toSet === want,
      "rare-evidence cluster must emit its exact ordered all-pairs at cont=1.0")
    // and the contract is in the compared artifact, not out-of-band
    assert(graft.SparkEntry.oracleSql("dedup_containment").contains("inter_rare"),
      "C28 oracle must self-describe the df-cap (inter_rare > 0)")
  }

  test("viral cohort: C38 phash emission is capped + star-reduced, complete, non-quadratic") {
    // r15 (ADVICE high): 150 assets share ONE identical payload — one
    // phash value, 2.3× the 64-id cap (the skew replica's viral cohort
    // shape on the media path). Contract: capped all-pairs over the 64
    // smallest ids plus a (min, m) star link per past-cap member —
    // never cohort², and the whole cohort stays one connected
    // component. Ids ≡ 1 (mod 8) so the %8==0 re-encode variant
    // injection adds no second cohort.
    val out = graft.Scratch.dir("graft_skew_c38").toString
    val viral = Seq.fill(8)("alpha beta gamma delta").mkString(" ") // 183 chars
    val n = 150
    (0 until n).map(i => (8L * i + 1, viral)).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/documents.parquet")
    val pairs = Multimodal.phashPairsProbe(spark, out)
      .select($"d1", $"d2", $"hamming").as[(Long, Long, Long)].collect()
    spark.catalog.clearCache()

    val cap = Dedup.BucketCap
    val expected = cap * (cap - 1) / 2 + (n - cap)
    assert(pairs.length === expected,
      s"expected capped ${expected} pairs (uncapped all-pairs would be " +
        s"${n * (n - 1) / 2}), got ${pairs.length}")
    assert(pairs.forall(_._3 === 0L), "identical payloads must pair at hamming 0")
    // completeness: every asset participates; min-id canonical reaches all
    val ids = (0 until n).map(i => 8L * i + 1)
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(inPairs === ids.toSet,
      s"unpaired assets: ${(ids.toSet -- inPairs).take(5)}")
    val parent = scala.collection.mutable.Map(ids.map(d => d -> d): _*)
    def find(d: Long): Long =
      if (parent(d) == d) d else { val r = find(parent(d)); parent(d) = r; r }
    pairs.foreach { case (a, b, _) => parent(find(a)) = find(b) }
    assert(ids.map(find).toSet.size === 1,
      "viral media cohort must resolve to one connected component")
    // and the contract lives in the compared artifact (ADVICE r15: the
    // r14 oracle derived uncapped all-pairs — the skew gate's blind spot)
    val sql = graft.SparkEntry.oracleSql("mm_phash_neardup")
    assert(sql.contains(s"rk <= $cap") && sql.contains("within_star"),
      "C38 oracle must self-describe the capped + star reduction")
  }

  test("C38 band occupancy: 16-bit bands keep candidate generation sub-all-pairs") {
    // r15 done-criterion for the r14 weak flag: the band join's
    // candidate count over v distinct hashes must stay well under the
    // all-pairs space — ≤ v²/256 discriminates the widened 4×16-bit
    // bands (measured v²/≈600 on this corpus: 219 candidates at
    // v = 497) from the old 4×8-bit ones (measured v²/≈45: 2,920 —
    // which FAILS this bound). The asymptotic term is 4·v²/65536 for
    // uniform hashes; natural text clusters block signs, hence the
    // conservative margin.
    val (nv, cand) = Multimodal.phashBandCandidates(spark, graft.SparkFixture.sf0001)
    spark.catalog.clearCache()
    assert(nv > 400, s"fixture corpus too small to bound ($nv values)")
    assert(cand <= nv * nv / 256,
      s"band candidates $cand exceed v²/256 = ${nv * nv / 256} at v=$nv — " +
        "the generation term has regressed toward the 8-bit birthday bound")
  }

  test("C3's registered oracle self-describes the star reduction (r12)") {
    // r11 verdict task 4: the skew sweep used to carry an out-of-band
    // "1 disclosed FAIL" narrative because C3's oracle was the
    // unconstrained C2 all-pairs form. The registered oracle now
    // encodes the reduction for oversize identical-shingle-set
    // cohorts, so the sweep reads 171/171 and the contract lives in
    // the compared artifact itself.
    val sql = graft.SparkEntry.oracleSql("dedup_minhash_lsh")
    val cap = Dedup.BucketCap
    assert(sql.contains(s"csz > $cap") && sql.contains(s"rk <= $cap")
      && sql.contains("over_star"),
      "C3 oracle must carry the capped + star special case for >cap cohorts")
    assert(sql.contains("list_transform(sh, s -> md5(s))"),
      "cohort identity must key on the canonical shingle SET through " +
        "per-element hashes (separator-injection-proof, r12 ADVICE)")
    assert(sql.contains(s"doc_id % ${Dedup.SubBuckets}"),
      "oracle must name the engine's residue classes (r13 parallel election)")
  }
}
