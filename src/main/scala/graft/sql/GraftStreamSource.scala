package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.StreamingBridge
import org.apache.spark.sql.types.StructType

import graft.merge.TxTable

/** A TxTable commit log as a Structured Streaming SOURCE — the
  * subscription the reference approximates with a 30 s re-extraction poll
  * (`scheduler.py:45-69` re-reads source tables every cycle; here a
  * downstream job consumes exactly the commits it has not seen).
  *
  * Offsets ARE commit versions: micro-batch (start, end] replays
  * [[TxTable.readChanges]] over that version range, so each batch costs
  * O(files changed in range), never O(table) — the property that makes a
  * 100 TB table followable. The V1 `Source` shape (the one Delta ships)
  * keeps the read path a planned batch DataFrame — vectorized parquet,
  * pushdown, codegen, no row-at-a-time connector — while
  * [[SupportsTriggerAvailableNow]] is implemented natively so
  * `Trigger.AvailableNow` + `maxVersionsPerBatch` drains to the head
  * snapshot in bounded-size batches and stops (the generic V1 wrapper
  * would freeze the FIRST rate-limited offset as the target and stop one
  * batch in).
  *
  * Modes (`option("mode", ...)`):
  *  - `appends` (default): rows ADDED to the table; a commit that removes
  *    files (delete/update/replace/compaction) fails the stream loudly
  *    unless `ignoreDeletes=true` (silently dropping changes would
  *    un-sync every consumer — the Delta source makes the same choice);
  *  - `cdc`: the full change feed with `_change_type` /
  *    `_commit_version` columns — the input for streaming replication
  *    ([[graft.merge.Replicator.stream]]).
  *
  * `startingVersion` (default 0) = the snapshot boundary: 0 streams the
  * whole table history from its first commit (seed + follow in one
  * query); the current head streams only future commits.
  * `startingTimestamp` (exclusive with it) resolves an instant — epoch
  * millis or `yyyy-MM-dd HH:mm:ss` text, the batch reader's
  * `timestampAsOf` grammar — to the newest commit at or before it, which
  * becomes that boundary. `maxVersionsPerBatch` rate-limits how many
  * commits one micro-batch may cover.
  *
  * Restart contract: offsets come back from the checkpoint WAL; a start
  * version below the source's vacuum floor fails loudly
  * ([[TxTable.readChanges]]'s fence) — recovery is a fresh checkpoint (or
  * [[graft.merge.Replicator.resnapshot]] for replicas), never silent
  * data loss. */
final class GraftStreamSource(spark: SparkSession, dir: String,
                              cdc: Boolean, startingVersion: Long,
                              maxVersionsPerBatch: Option[Long],
                              ignoreDeletes: Boolean)
    extends Source with SupportsTriggerAvailableNow {

  require(maxVersionsPerBatch.forall(_ > 0),
    "maxVersionsPerBatch must be positive")

  override val schema: StructType = GraftStreamSource.schemaFor(spark, dir, cdc)

  /** Head frozen by `Trigger.AvailableNow` at query start: the drain
    * target. None outside available-now runs (follow the live head). */
  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(
      TxTable.headVersion(spark, dir).getOrElse(startingVersion))

  private def ver(json: String): Long = json.trim.toLong

  /** Admission-control offset negotiation (the path the engine uses for
    * this source; the legacy `getOffset` below is kept only for API
    * completeness): advance from `start` by at most `maxVersionsPerBatch`
    * commits toward the (possibly frozen) head; null = caught up. */
  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val from = Option(start).map(o => ver(o.json)).getOrElse(startingVersion)
    val head0 = TxTable.headVersion(spark, dir).getOrElse(return null)
    val head = availableNowCap.fold(head0)(math.min(head0, _))
    val next = maxVersionsPerBatch.fold(head)(m => math.min(head, from + m))
    if (next <= from) null else LongOffset(next)
  }

  override def reportLatestOffset(): OffsetV2 =
    TxTable.headVersion(spark, dir).map(LongOffset(_)).orNull

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def initialOffset(): OffsetV2 = LongOffset(startingVersion)

  override def deserializeOffset(json: String): OffsetV2 = LongOffset(ver(json))

  override def getOffset: Option[Offset] =
    TxTable.headVersion(spark, dir).filter(_ > startingVersion)
      .map(LongOffset(_))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val after = start.map(o => ver(o.json)).getOrElse(startingVersion)
    val until = ver(end.json)
    val batch = TxTable.readChanges(spark, dir, after, Some(until)) match {
      case None => return StreamingBridge.emptyStreaming(spark, schema)
      case Some(ch) if cdc => ch
      case Some(ch) =>
        if (!ignoreDeletes) {
          // `_change_type` is a per-slice literal, so this filter constant-
          // folds to an empty scan when no commit in range removed files —
          // the happy path costs nothing
          require(ch.filter(col("_change_type") === "delete").isEmpty,
            s"commits ($after, $until] of $dir removed or rewrote files; " +
              "an appends-mode stream cannot represent that — use " +
              "mode=cdc, or ignoreDeletes=true to skip removals")
        }
        ch.filter(col("_change_type") === "insert")
          .drop("_change_type", "_commit_version")
    }
    StreamingBridge.asStreaming(batch.select(schema.fieldNames.map(col): _*))
  }

  override def stop(): Unit = ()

  override def toString: String =
    s"GraftStreamSource[$dir, mode=${if (cdc) "cdc" else "appends"}]"
}

object GraftStreamSource {

  /** Stream schema: the table's batch-read column order, plus the CDC
    * columns in cdc mode (matching [[TxTable.readChanges]]'s output). */
  def schemaFor(spark: SparkSession, dir: String, cdc: Boolean): StructType = {
    val base = TxTable.read(spark, dir).getOrElse(throw
      new IllegalArgumentException(
        s"cannot stream from $dir before its first commit — the stream " +
          "schema is carried by the table's data")).schema
    if (!cdc) base
    else StructType(base.fields ++ Seq(
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.LongType, nullable = false)))
  }

  private[sql] def fromParameters(spark: SparkSession, dir: String,
                                  parameters: Map[String, String]): GraftStreamSource = {
    val cdc = parameters.get("mode") match {
      case None | Some("appends") => false
      case Some("cdc")            => true
      case Some(other) => throw new IllegalArgumentException(
        s"unknown graft stream mode '$other' (use 'appends' or 'cdc')")
    }
    // startingTimestamp: the stream-side twin of the batch reader's
    // timestampAsOf — resolved ONCE at source construction to the newest
    // commit at or before the instant, which becomes the snapshot
    // boundary (commits AFTER it stream)
    val byTs = parameters.get("startingTimestamp").map { raw =>
      val t = raw.trim
      val micros: Long =
        if (t.matches("-?\\d+")) t.toLong * 1000L // epoch millis
        else java.sql.Timestamp.valueOf(t).getTime * 1000L
      TxTable.versionAtTimestampMicros(spark, dir, micros).getOrElse(0L)
    }
    require(byTs.isEmpty || !parameters.contains("startingVersion"),
      "give startingVersion OR startingTimestamp, not both")
    new GraftStreamSource(spark, dir, cdc,
      startingVersion = byTs.orElse(parameters.get("startingVersion")
        .map(_.trim.toLong)).getOrElse(0L),
      maxVersionsPerBatch =
        parameters.get("maxVersionsPerBatch").map(_.trim.toLong),
      ignoreDeletes =
        parameters.get("ignoreDeletes").exists(_.trim.toBoolean))
  }
}
