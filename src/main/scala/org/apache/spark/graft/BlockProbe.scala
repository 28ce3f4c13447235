package org.apache.spark.graft

import org.apache.spark.SparkContext
import org.apache.spark.storage.BroadcastBlockId

/** Minimal private[spark] bridge: count the broadcast blocks the
  * block manager still holds. [[graft.GraftSession.release]] polls
  * this to the cleaner's FIXPOINT between harness queries — the
  * observable that replaces the r13 fixed 150 ms yield, which the
  * 2 GB low-memory gate proved racy (ContextCleaner's unbroadcast
  * pass can take longer than any fixed sleep when hundreds of dead
  * broadcasts' torrent pieces are queued; see the release() comment
  * for the full history). Read-only: enumerating block ids never
  * touches the blocks, so a legitimately-live broadcast is safe —
  * the poll exits on stall, it never force-removes. */
object BlockProbe {
  def broadcastBlockCount(sc: SparkContext): Int =
    broadcastBlockIds(sc).size

  /** The surviving ids, for diagnostics (HarnessReleaseSpec's failure
    * message names the blocks the drain left behind). */
  def broadcastBlockIds(sc: SparkContext): Seq[String] =
    sc.env.blockManager.master
      .getMatchingBlockIds(_.isInstanceOf[BroadcastBlockId],
        askStorageEndpoints = true)
      .map(_.name)
}
