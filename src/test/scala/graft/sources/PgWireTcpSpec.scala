package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture.{spark, sf0001}
import graft.sources.v2.PgWireReplayServer

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

  test("pgoutput over loopback TCP equals the A22 file-transport answer, and acks the final LSN") {
    // the A22 answer over the file transport (its CORRECTNESS row is
    // DuckDB-oracled every round, so this IS the oracle answer)
    val viaFiles = graft.cdc.CdcQueries.replicationSource(spark, sf0001)
    val expect = viaFiles.collect().map(_.toString).sorted
    assert(expect.nonEmpty, "empty A22 answer — vacuous transport test")

    // same wire bytes, socket transport: keepaliveEvery=64 forces many
    // reply-requested keepalives (and the mid-stream status updates
    // they solicit) on this feed, not just the end-of-WAL one
    val segDir = graft.cdc.CdcQueries.writeWireSegments(spark, sf0001)
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
}
