package graft.runtime

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.control.NonFatal

/** The incremental micro-batch runtime — the reference's scheduler+pipeline
  * loop (pipeline.py:25-115, scheduler.py:35-69; SURVEY §2.11) over our
  * merge sinks, with the two silent-data-loss bugs fixed (SURVEY §2.12.e/i):
  *
  *  - when a batch hits its row cap, the watermark advances to the MAX
  *    watermark-column value actually extracted (not wall-clock NOW), so
  *    rows between the cap and NOW are never skipped;
  *  - a capped stream drains in a loop within the cycle instead of leaking
  *    backlog to the next cycle at 1 cap per 30 s.
  *
  * Caps are applied with a deterministic (watermarkCol, tieBreak) sort
  * (§2.12.a fix) so re-extraction is reproducible.
  */
final case class StreamSpec(
    name: String,
    /** builds the incremental batch: rows with watermarkCol >= since */
    extract: (SparkSession, Timestamp) => DataFrame,
    watermarkCol: String,
    tieBreakCol: String,
    sink: DataFrame => Unit,
    cap: Int = 5000)

final case class StreamResult(name: String, rows: Long, drainedLoops: Int,
                              error: Option[String])

final case class CycleReport(results: Seq[StreamResult]) {
  def failed: Seq[StreamResult] = results.filter(_.error.isDefined)
  def totalRows: Long = results.map(_.rows).sum
}

class IncrementalRunner(spark: SparkSession, store: WatermarkStore,
                        overlapSec: Long = 90L,
                        now: () => Timestamp = () => new Timestamp(System.currentTimeMillis()),
                        maxConcurrentStreams: Int = 1) {

  /** One cycle over all streams; failures are isolated per stream
    * (pipeline.py's per-table try/except, T6). With
    * `maxConcurrentStreams > 1` the independent streams run as concurrent
    * Spark jobs (they touch disjoint targets and watermark rows commute per
    * table) — the reference's sequential table loop is its biggest
    * throughput cliff at scale; cluster-side the scheduler interleaves the
    * stages. */
  def runCycle(streams: Seq[StreamSpec]): CycleReport = {
    def one(s: StreamSpec): StreamResult =
      try runStream(s)
      catch { case NonFatal(e) =>
        StreamResult(s.name, 0L, 0, Some(e.toString)) }
    if (maxConcurrentStreams <= 1) CycleReport(streams.map(one))
    else {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(maxConcurrentStreams, math.max(streams.size, 1)))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try CycleReport(Await.result(
        Future.sequence(streams.map(s => Future(one(s)))), Duration.Inf))
      finally pool.shutdown()
    }
  }

  /** Extract-cap-sink-advance for one stream, looping until drained (T5). */
  private def runStream(s: StreamSpec): StreamResult = {
    var total = 0L
    var loops = 0
    var drained = false
    while (!drained) {
      val since = store.since(s.name, overlapSec)
      val batch = s.extract(spark, since)
        .orderBy(col(s.watermarkCol), col(s.tieBreakCol))
        .limit(s.cap)
        .localCheckpoint() // batch is consumed 3× (sink, count, max); pin it
      val n = batch.count()
      if (n > 0) s.sink(batch)
      val wallNow = now()
      val newWm: Timestamp =
        if (n < s.cap) wallNow // fully drained: NOW, like the reference
        else batch.agg(max(col(s.watermarkCol))).collect()(0).getTimestamp(0)
      // T8: advance even on an empty batch so the overlap window stays 90s.
      val prev = store.get(s.name).map(_.lastFetchedAt)
      store.advance(s.name, n, newWm, wallNow)
      total += n
      loops += 1
      drained = n < s.cap
      // Guard: > cap rows sharing one watermark value can't make progress by
      // timestamp alone; idempotent sinks absorbed them, so stop the loop
      // rather than spin (the reference would silently lose these, §2.12.e).
      if (!drained && prev.contains(newWm)) drained = true
    }
    StreamResult(s.name, total, loops, None)
  }
}

/** Cycle scheduler with failure escalation (scheduler.py:35-69, T1/T7) and
  * optional persisted per-cycle metrics (A5 observability). */
class CycleScheduler(runner: IncrementalRunner,
                     maxConsecutiveFailures: Int = 10,
                     onAlert: String => Unit = s => System.err.println(s),
                     metrics: Option[MetricsStore] = None,
                     now: () => Timestamp = () => new Timestamp(System.currentTimeMillis())) {
  private var consecutiveFailures = 0
  private var cycleId = 0L

  def runOnce(streams: Seq[StreamSpec]): CycleReport = {
    val report = runner.runCycle(streams)
    cycleId += 1
    metrics.foreach(_.record(cycleId, now(), report))
    if (report.failed.nonEmpty) {
      consecutiveFailures += 1
      if (consecutiveFailures >= maxConsecutiveFailures)
        onAlert(s"$consecutiveFailures consecutive failed cycles: " +
          report.failed.map(r => s"${r.name}: ${r.error.get}").mkString("; "))
    } else consecutiveFailures = 0
    report
  }

  /** Blocking poll loop (scheduler.py:45-69). Runs `cycles` iterations
    * (Int.MaxValue ≈ forever), sleeping `pollIntervalSec` between cycles —
    * even after a failed cycle, like the reference. */
  def run(streams: Seq[StreamSpec], pollIntervalSec: Long = 30L,
          cycles: Int = Int.MaxValue): Unit = {
    var i = 0
    while (i < cycles) {
      runOnce(streams)
      i += 1
      if (i < cycles) Thread.sleep(pollIntervalSec * 1000L)
    }
  }
}
