package graft.sources

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Kafka-shaped offset-log source: topic/partition/offset semantics —
  * per-partition ordered offsets stable across re-reads, log-end
  * offsets from segment names alone, by-name segment seek, and a
  * checkpointed (partition → offset) map that survives a restart. */
class KafkaLogSourceSpec extends AnyFunSuite {
  private val spark = SparkFixture.spark
  import spark.implicits._

  private def seg(dir: String, part: Int, base: Long, recs: Seq[(String, String)]): Unit = {
    val pdir = Paths.get(dir, s"p=$part")
    Files.createDirectories(pdir)
    Files.write(pdir.resolve(f"$base%020d-${recs.size}.jsonl"),
      recs.map { case (k, v) => s"$k\t$v" }.mkString("", "\n", "\n")
        .getBytes("UTF-8"))
  }

  test("batch read assigns offsets base+index per partition, partitions independent") {
    val dir = Files.createTempDirectory("kafkalog_batch").toString
    seg(dir, 0, 0L, Seq(("a", "v0"), ("b", "v1")))
    seg(dir, 0, 2L, Seq(("a", "v2")))
    seg(dir, 1, 0L, Seq(("c", "w0")))
    val got = spark.read.format("kafkalog").load(dir)
      .orderBy($"partition", $"offset")
      .as[(Int, Long, String, String)].collect().toSeq
    assert(got === Seq((0, 0L, "a", "v0"), (0, 1L, "b", "v1"),
      (0, 2L, "a", "v2"), (1, 0L, "c", "w0")))
  }

  test("slice seek skips whole segments by name and leading records by count") {
    val dir = Files.createTempDirectory("kafkalog_seek").toString
    seg(dir, 0, 0L, (0 until 4).map(i => (s"k$i", s"v$i")))
    seg(dir, 0, 4L, (4 until 8).map(i => (s"k$i", s"v$i")))
    // a reader over [5, 7) must never open the first segment and must
    // skip one leading record of the second; the segment list is
    // plan-time state now, so build it the way the planner does
    val conf = new org.apache.hadoop.conf.Configuration()
    val segs = graft.sources.v2.KafkaLogSource.listTopic(dir, conf)(0)
    val r = new graft.sources.v2.TopicSliceReader(
      graft.sources.v2.TopicSlicePartition(dir, 0, 5L, 7L,
        graft.sources.v2.KafkaLogSource.sliceSegments(segs, 5L, 7L)), conf)
    val out = scala.collection.mutable.Buffer[(Long, String)]()
    while (r.next()) {
      val row = r.get()
      out += ((row.getLong(1), row.getUTF8String(3).toString))
    }
    r.close()
    assert(out.toSeq === Seq((5L, "v5"), (6L, "v6")))
  }

  test("micro-batch advances the per-partition offset map and reads only new records") {
    val dir = Files.createTempDirectory("kafkalog_mb").toString
    seg(dir, 0, 0L, Seq(("a", "m1")))
    seg(dir, 1, 0L, Seq(("b", "m2")))
    val q = spark.readStream.format("kafkalog").load(dir)
      .select($"value")
      .writeStream.format("memory").queryName("kafka_mb")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("kafka_mb").as[String].collect().sorted.toSeq ===
        Seq("m1", "m2"))
      // appends land on BOTH partitions: next batch plans only them
      seg(dir, 0, 1L, Seq(("a", "m3")))
      seg(dir, 1, 1L, Seq(("c", "m4")))
      q.processAllAvailable()
      assert(spark.table("kafka_mb").as[String].collect().sorted.toSeq ===
        Seq("m1", "m2", "m3", "m4"))
      val prog = q.recentProgress.flatMap(p => Option(p.sources)).flatten
      assert(prog.exists(_.endOffset == """{"0":2,"1":2}"""),
        s"offsets: ${prog.map(_.endOffset).toSeq}")
    } finally q.stop()
  }

  test("kill-and-restart resumes each partition from its checkpointed offset") {
    // the consumer-group contract: a committed (partition → offset)
    // map survives the consumer's death; the restarted consumer seeks
    // each partition independently and re-emits nothing
    val dir = Files.createTempDirectory("kafkalog_restart").toString
    val cp = Files.createTempDirectory("kafkalog_restart_cp").toString
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def start() = spark.readStream.format("kafkalog").load(dir)
      .select($"value")
      .writeStream.option("checkpointLocation", cp)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => emitted.add(r.getString(0))); ()
      }.start()
    seg(dir, 0, 0L, Seq(("a", "m1"), ("b", "m2")))
    seg(dir, 1, 0L, Seq(("c", "m3")))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(emitted.asScala.toSeq.sorted === Seq("m1", "m2", "m3"))
    // partition 0 advances while the consumer is dead; partition 1 idle
    seg(dir, 0, 2L, Seq(("a", "m4")))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(emitted.asScala.toSeq.sorted === Seq("m1", "m2", "m3", "m4"),
      s"restart re-emitted or skipped records: ${emitted.asScala.toSeq.sorted}")
  }

  test("blank lines inside a segment never shift offsets — full read and resume agree") {
    // r10 review finding: the resume seek counted blank lines as
    // records while next() skipped them uncounted, so a resume after a
    // blank line re-emitted a record under a shifted offset
    val dir = Files.createTempDirectory("kafkalog_blank").toString
    val pdir = Paths.get(dir, "p=0")
    Files.createDirectories(pdir)
    // 4 records with a blank line between v1 and v2; the name's count
    // declares the RECORD count (4)
    Files.write(pdir.resolve(f"${0L}%020d-4.jsonl"),
      "a\tv0\nb\tv1\n\nc\tv2\nd\tv3\n".getBytes("UTF-8"))
    val full = spark.read.format("kafkalog").load(dir)
      .orderBy($"offset").as[(Int, Long, String, String)].collect().toSeq
    assert(full.map(r => (r._2, r._4)) ===
      Seq((0L, "v0"), (1L, "v1"), (2L, "v2"), (3L, "v3")))
    // a resume from offset 2 seeks past the blank line without
    // counting it and emits exactly (2, v2), (3, v3)
    val conf = new org.apache.hadoop.conf.Configuration()
    val segs = graft.sources.v2.KafkaLogSource.listTopic(dir, conf)(0)
    val r = new graft.sources.v2.TopicSliceReader(
      graft.sources.v2.TopicSlicePartition(dir, 0, 2L, 4L,
        graft.sources.v2.KafkaLogSource.sliceSegments(segs, 2L, 4L)), conf)
    val out = scala.collection.mutable.Buffer[(Long, String)]()
    while (r.next()) {
      val row = r.get()
      out += ((row.getLong(1), row.getUTF8String(3).toString))
    }
    r.close()
    assert(out.toSeq === Seq((2L, "v2"), (3L, "v3")))
  }

  test("empty topic plans zero partitions, not an error") {
    val dir = Files.createTempDirectory("kafkalog_empty").toString
    Files.createDirectories(Paths.get(dir, "p=0"))
    assert(spark.read.format("kafkalog").load(dir).count() === 0L)
  }
}
