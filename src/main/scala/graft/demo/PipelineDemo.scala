package graft.demo

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import graft.catalog.Bootstrap
import graft.ext.Quality
import graft.merge.MergeSink
import graft.ops.ScenarioPipeline
import graft.runtime.{CycleScheduler, IncrementalRunner, MetricsStore, WatermarkStore}

/** Runnable end-to-end showcase: bootstrap a warehouse, replay the
  * reference-shaped sources through the six incremental streams in three
  * poll cycles (concurrent streams, capped+drained batches, idempotent
  * merges), then print per-cycle metrics, watermarks, target counts, and a
  * data-quality report.
  *
  * `sbt "runMain graft.demo.PipelineDemo [warehouseDir]"`
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${math.min(32, Runtime.getRuntime.availableProcessors)}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val wh = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-demo").toString + "/wh")
    val boot = new Bootstrap(spark, wh)
    boot.setup()
    val store = new WatermarkStore(spark, boot.tablePath("etl_watermark"))
    val src = ReferenceFixtures.build(spark)

    var horizon: Timestamp = ReferenceFixtures.ts(1)
    val runner = new IncrementalRunner(spark, store, overlapSec = 90,
      now = () => horizon, maxConcurrentStreams = 6)
    val sched = new CycleScheduler(runner,
      metrics = Some(new MetricsStore(spark, s"$wh/etl_metrics")),
      now = () => horizon)

    for (h <- Seq(ReferenceFixtures.ts(3), ReferenceFixtures.ts(5),
        ReferenceFixtures.ts(20))) {
      horizon = h
      val visible = ReferenceFixtures.visibleBefore(src, h)
      val r = sched.runOnce(ScenarioPipeline.streams(spark, visible, boot))
      println(s"[demo] cycle@$h rows=${r.totalRows} failed=${r.failed.size}")
    }

    println("[demo] per-cycle metrics:")
    spark.read.parquet(s"$wh/etl_metrics")
      .orderBy("cycle_id", "stream").show(50, truncate = false)
    println("[demo] watermarks: " + store.all().keys.toSeq.sorted.mkString(", "))
    graft.model.Schemas.targets.keys.toSeq.sorted.foreach { t =>
      println(s"[demo] $t rows=" +
        MergeSink.readAny(spark, boot.tablePath(t)).map(_.count()).getOrElse(0L))
    }

    val dim = MergeSink.readAny(spark, boot.tablePath("dim_scenario")).get
    val nih = MergeSink.readAny(spark, boot.tablePath("fact_node_input_history")).get
    val rs = MergeSink.readAny(spark, boot.tablePath("fact_run_summary")).get
    val health = Quality.report(Map(
      "dim_scenario.pk_dups" -> Quality.duplicates(dim, Seq("scenario_id")),
      "node_history.pk_dups" -> Quality.duplicates(nih, Seq("source_id")),
      "node_history.orphan_scenarios" ->
        Quality.orphans(nih, dim, "scenario_id", "scenario_id"),
      "run_summary.orphan_scenarios" ->
        Quality.orphans(rs, dim, "scenario_id", "scenario_id"),
      "node_history.scd2_violations" ->
        MergeSink.scd2Violations(nih, Seq("scenario_id", "model_node_id"),
          "is_current_version")))
    println("[demo] health: " + health.toSeq.sorted.mkString(", "))
    val bad = health.filter(_._2 > 0)
    if (bad.nonEmpty) { println(s"[demo] FAILED checks: $bad"); sys.exit(1) }
    println("[demo] all health checks clean")
    spark.stop()
  }
}
