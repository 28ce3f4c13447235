package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.cdc.ChangeRecord

/** Bucket-partitioned incremental upsert sink — the compaction/scale
  * upgrade path [[MaterializedTable]]'s Scaladoc promises: instead of
  * rewriting the whole table every micro-batch, keys hash into
  * `buckets` partitions and a batch rewrites ONLY the buckets its keys
  * touch; untouched buckets carry forward by reference.
  *
  * Layout (a minimal log-structured table format, the pattern
  * Iceberg/Delta formalize):
  * {{{
  *   table/_LATEST              name of the current manifest (the only
  *                              mutable file; flipped atomically via
  *                              FileContext OVERWRITE rename)
  *   table/m{batch}_{ts}        immutable manifest: "<bucket>\t<dir>"
  *                              per line — bucket → version dir
  *   table/v{batch}_{ts}/__b=K/ immutable parquet, one dir per bucket
  * }}}
  * Readers resolve pointer → manifest → bucket dirs, so they see one
  * consistent version end-to-end (MVCC); old manifests remain valid
  * snapshots until vacuumed.
  *
  * 100 TB: per batch, write cost ∝ size of touched buckets, not table
  * size — with enough buckets that approaches the change volume, which
  * is the whole point of incremental materialization. The same bucket
  * function co-locates the upsert window's shuffle and any downstream
  * key-equi join (bucket-join without an exchange).
  *
  * [[compact]] is the maintenance pass: drops delete tombstones at or
  * below an acked sequence horizon (safe exactly when the ingest
  * guarantees no change ≤ horizon can still arrive — the LSN-ack
  * contract of A19's resume bookkeeping) and merges each bucket's
  * accumulated files back to ~one, under a fresh manifest.
  */
object PartitionedTable {

  import MaterializedTable.{fs, latestWithTombstones, readPointer, writePointer}

  private def bucketCol(buckets: Int) = pmod(hash(col("key")), lit(buckets))

  /** bucket → version-dir map of the current manifest (empty if none). */
  def readManifest(s: SparkSession, table: String): Map[Int, String] =
    readPointer(s, table) match {
      case None => Map.empty
      case Some(m) =>
        val f = fs(s, table)
        val in = f.open(new Path(table, m))
        try {
          val out = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
          out.toString("UTF-8").linesIterator.filter(_.nonEmpty).map { l =>
            val Array(b, v) = l.split('\t'); b.toInt -> v
          }.toMap
        } finally in.close()
    }

  private def writeManifest(s: SparkSession, table: String, name: String,
      manifest: Map[Int, String]): Unit = {
    val f = fs(s, table)
    val body = manifest.toSeq.sorted.map { case (b, v) => s"$b\t$v" }
      .mkString("\n")
    val out = f.create(new Path(table, name), true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    writePointer(s, table, name) // manifests immutable; pointer flips
  }

  private def bucketPaths(table: String, m: Map[Int, String]): Seq[String] =
    m.toSeq.sorted.map { case (b, v) => s"$table/$v/__b=$b" }

  /** Current table state incl. tombstones (None before first batch).
    * `__b` is recomputed from the key (partition-dir reads drop the
    * partition column). */
  def readSnapshot(s: SparkSession, table: String, buckets: Int): Option[DataFrame] = {
    val m = readManifest(s, table)
    if (m.isEmpty) None
    else Some(s.read.parquet(bucketPaths(table, m): _*)
      .withColumn("__b", bucketCol(buckets)))
  }

  /** Current materialized state (tombstones filtered, bucket dropped). */
  def readLatest(s: SparkSession, table: String, buckets: Int): DataFrame =
    readSnapshot(s, table, buckets)
      .map(_.filter(col("op") =!= "d").drop("__b"))
      .getOrElse(throw new IllegalStateException(s"no snapshot at $table"))

  /** Streaming upsert sink; each micro-batch rewrites touched buckets
    * only and republishes the manifest. */
  def upsertSink(changes: Dataset[ChangeRecord], table: String,
      checkpoint: String, buckets: Int): StreamingQuery = {
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[ChangeRecord], batchId: Long) =>
        val s = batch.sparkSession
        val b = batch.toDF().withColumn("__b", bucketCol(buckets))
        // the touched-bucket list is ≤ `buckets` ints — a bounded
        // driver-side manifest decision, not per-row driver work
        val touched = b.select("__b").distinct()
          .collect().map(_.getInt(0)).sorted
        val manifest = readManifest(s, table)
        val priorPaths = touched
          .flatMap(p => manifest.get(p).map(v => s"$table/$v/__b=$p"))
        val prior =
          if (priorPaths.isEmpty) None
          else Some(s.read.parquet(priorPaths.toIndexedSeq: _*)
            .withColumn("__b", bucketCol(buckets)))
        val all = prior.map(_.unionByName(b)).getOrElse(b)
        val version = s"v${batchId}_${System.currentTimeMillis()}"
        latestWithTombstones(all).write.partitionBy("__b")
          .mode("overwrite").parquet(s"$table/$version")
        writeManifest(s, table, s"m${batchId}_${System.currentTimeMillis()}",
          manifest ++ touched.map(_ -> version))
        ()
      }
      .start()
  }

  /** Maintenance compaction: drop tombstones with seq ≤ `horizon`
    * (the acked replication position — nothing at or below it can
    * still arrive), merge every bucket back to ~one file, publish a
    * fresh manifest. Returns the new version dir name. */
  def compact(s: SparkSession, table: String, buckets: Int,
      horizon: Long): String = {
    val snap = readSnapshot(s, table, buckets)
      .getOrElse(throw new IllegalStateException(s"no snapshot at $table"))
    val kept = snap.filter(!(col("op") === "d" && col("seq") <= horizon))
    val version = s"vc_${System.currentTimeMillis()}"
    if (kept.isEmpty) {
      // every surviving row was a GC-able tombstone: partitionBy writes
      // no data files for an empty frame (read-back would fail schema
      // inference) and an empty manifest reads as "no snapshot". Publish
      // one schema-bearing empty bucket instead, so readLatest returns a
      // legitimately empty table.
      kept.drop("__b").repartition(1)
        .write.mode("overwrite").parquet(s"$table/$version/__b=0")
      writeManifest(s, table, s"mc_${System.currentTimeMillis()}",
        Map(0 -> version))
    } else {
      kept.repartition(buckets, col("__b")).write.partitionBy("__b")
        .mode("overwrite").parquet(s"$table/$version")
      // manifest lists only buckets that still hold rows (a bucket whose
      // every row was a dropped tombstone writes no dir)
      val present = s.read.parquet(s"$table/$version")
        .select("__b").distinct().collect().map(_.getInt(0))
      writeManifest(s, table, s"mc_${System.currentTimeMillis()}",
        present.map(_ -> version).toMap)
    }
    version
  }
}
