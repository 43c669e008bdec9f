package graft.merge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed table replication driven by the change feed — the downstream-sync
  * loop the reference runs as full re-extraction per cycle
  * (extract.py:58-107 re-reads whole source tables every 30 s). Here a
  * replica catches up by consuming [[TxTable.readChangesKeyed]] and
  * applying ONE net operation per changed key through the tri-clause
  * [[MergeSink.mergeIntoTx]] — per sync cycle that is O(changed keys +
  * replica merge), never O(source), which at 100 TB is the difference
  * between a replica that follows in seconds and one that re-ships the
  * table.
  *
  * Net-effect collapse: a key touched by several versions in the window
  * (insert@v2, update@v3, delete@v4) applies only its LATEST action —
  * ordered by (commit version, postimage-over-preimage) so an update
  * pair within one version resolves to its postimage. Keys whose whole
  * life fits inside the window (insert then delete) net to a guarded-out
  * tombstone and never reach the replica.
  *
  * Exactly-once: each sync's merge commit carries
  * (appId = replica:&lt;keys&gt;, epoch = source head applied) as its txn
  * mark — the same atomic-mark argument as [[TxTable.appendOnce]] — so a
  * crashed sync re-runs from its true base and a replayed sync is a
  * no-op. The replica stays a plain readable TxTable throughout.
  *
  * Feed-horizon contract: syncs must run inside the source's vacuum
  * retention window ([[TxTable.readChanges]]'s floor fence fails loudly
  * otherwise); recovery from a blown horizon is [[resnapshot]]. */
object Replicator {

  /** txn appId namespace; keyed so two replicas with different key
    * definitions never share marks. */
  def appId(keys: Seq[String]): String = s"graft-replica:${keys.mkString(",")}"

  /** Bring the replica at `dstDir` up to date with `srcDir`. Returns the
    * source version the replica now reflects, None when there is nothing
    * to do. First call snapshots; later calls apply the net change feed. */
  def sync(spark: SparkSession, srcDir: String, dstDir: String,
           keys: Seq[String]): Option[Long] = {
    require(keys.nonEmpty, "Replicator.sync needs >= 1 key column")
    val app = appId(keys)
    val srcHead = TxTable.headVersion(spark, srcDir).getOrElse { return None }
    val applied = TxTable.lastTxn(spark, dstDir, app)
    if (applied.exists(_ >= srcHead)) return None
    applied match {
      case None => resnapshot(spark, srcDir, dstDir, keys)
      case Some(from) =>
        val ch = TxTable.readChangesKeyed(spark, srcDir, keys, from,
          Some(srcHead)).getOrElse {
          return Some(srcHead) // version advance with no file delta
        }
        applyNet(spark, dstDir, keys, ch, app, srcHead)
        Some(srcHead)
    }
  }

  /** Apply one change-feed slice to the replica as ONE net merge commit
    * marked (app, epoch) — shared by the batch [[sync]] and the
    * micro-batch loop [[stream]] starts. Idempotent: a slice whose epoch
    * the replica already reflects is skipped whole, which is exactly the
    * replay-safety foreachBatch needs after a crash. Works on both the
    * raw insert/delete feed and the keyed update_pre/postimage form (an
    * update's postimage IS its version's insert-like action in both). */
  private[graft] def applyNet(spark: SparkSession, dstDir: String,
                              keys: Seq[String], ch: org.apache.spark.sql.DataFrame,
                              app: String, epoch: Long): Unit = {
    if (TxTable.lastTxn(spark, dstDir, app).exists(_ >= epoch)) return
    val insertLike =
      col("_change_type").isin("insert", "update_postimage")
    // latest action per key: version ascending, postimage beats its
    // own version's preimage
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_commit_version").desc,
        when(insertLike, 1).otherwise(0).desc)
    val net = ch
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .withColumn("__op", when(insertLike, lit("U")).otherwise(lit("D")))
      .drop("__rn", "_change_type", "_commit_version")
    val dataCols = net.columns.toSeq.filterNot(c =>
      keys.contains(c) || c == "__op")
    MergeSink.mergeIntoTx(spark, dstDir, net, keys,
      updateCols = dataCols,
      matchedDeleteCond = Some(col("s.__op") === "D"),
      insertCond = Some(col("s.__op") =!= "D"),
      txn = Some(app -> epoch))
  }

  /** Streaming replication: subscribe to `srcDir`'s commit log
    * ([[graft.sql.GraftStreamSource]], cdc mode) and fold each
    * micro-batch into the replica with the SAME net-merge algebra and
    * (app, epoch) marks as [[sync]] — so the replica a stream maintains
    * is bit-for-bit the replica a sync loop would build, but follows
    * continuously instead of polling (the reference's 30 s cycle,
    * `scheduler.py:45-69`, without the re-extraction). Exactly-once:
    * offsets ride the checkpoint WAL, and a replayed foreachBatch is a
    * no-op via the epoch guard in [[applyNet]].
    *
    * Returns the started query; callers own its lifecycle
    * (`processAllAvailable`/`awaitTermination`/`stop`). Pass
    * `Trigger.AvailableNow()` for a catch-up-and-stop run,
    * `ProcessingTime` for a live follower. */
  def stream(spark: SparkSession, srcDir: String, dstDir: String,
             keys: Seq[String], checkpointDir: String,
             trigger: org.apache.spark.sql.streaming.Trigger =
               org.apache.spark.sql.streaming.Trigger.AvailableNow(),
             maxVersionsPerBatch: Option[Long] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(keys.nonEmpty, "Replicator.stream needs >= 1 key column")
    val app = appId(keys)
    val reader = spark.readStream.format("graft").option("mode", "cdc")
    maxVersionsPerBatch.foreach(m =>
      reader.option("maxVersionsPerBatch", m.toString))
    reader.load(srcDir).writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // epoch = the batch's top version; computed on the driver from the
        // tiny cdc-version column (bounded by maxVersionsPerBatch slices)
        val top = batch.agg(max(col("_commit_version"))).head()
        if (!top.isNullAt(0))
          applyNet(spark, dstDir, keys, batch, app, top.getLong(0))
      }
      .start()
  }

  /** Full re-seed: replace the replica with the current source snapshot
    * and mark it at the source head. The first-sync path, and the loud
    * recovery move when the source's vacuum horizon outran the feed. */
  def resnapshot(spark: SparkSession, srcDir: String, dstDir: String,
                 keys: Seq[String]): Option[Long] = {
    val srcHead = TxTable.headVersion(spark, srcDir).getOrElse { return None }
    val snap = TxTable.read(spark, srcDir).getOrElse { return None }
    TxTable.replace(spark, dstDir, snap, txn = Some(appId(keys) -> srcHead))
    Some(srcHead)
  }

  /** The source version the replica currently reflects. */
  def appliedVersion(spark: SparkSession, dstDir: String,
                     keys: Seq[String]): Option[Long] =
    TxTable.lastTxn(spark, dstDir, appId(keys))
}
