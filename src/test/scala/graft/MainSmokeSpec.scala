package graft

/** Smoke test of the production entrypoint: one full cycle over the demo
  * corpus into a fresh warehouse — bootstrap, six streams, merges, metrics,
  * watermark advancement all wired through the same code path spark-submit
  * launches. */
class MainSmokeSpec extends SparkTestBase {

  test("Main runs one cycle end-to-end against the demo corpus") {
    spark // force the shared session so Main reuses it via getOrCreate
    val wh = tmpDir("main-smoke")
    Main.run(Map(
      "GRAFT_WAREHOUSE" -> wh,
      "GRAFT_CYCLES" -> "1",
      "POLL_INTERVAL_SEC" -> "1"))
    val dim = spark.read.parquet(s"$wh/dim_scenario")
    assert(dim.count() == 20)
    val wm = new graft.runtime.WatermarkStore(spark, s"$wh/etl_watermark")
    assert(wm.all().keySet.contains("fc_scenario"))
    assert(spark.read.parquet(s"$wh/etl_metrics").count() > 0)
  }

  test("Main with GRAFT_TX_SINKS commits every target through the TxTable log") {
    spark
    val wh = tmpDir("main-tx")
    Main.run(Map(
      "GRAFT_WAREHOUSE" -> wh,
      "GRAFT_CYCLES" -> "2",
      "POLL_INTERVAL_SEC" -> "0",
      "GRAFT_TX_SINKS" -> "1",
      "GRAFT_COMPACT_EVERY_CYCLES" -> "1")) // exercises compactLog + vacuum
    // all six targets are commit-log tables now
    for (t <- Seq("dim_scenario", "fact_node_input_history", "fact_run_summary",
        "fact_node_calc_results", "fact_event_input_history",
        "fact_scenario_timeline"))
      assert(graft.merge.TxTable.exists(spark, s"$wh/$t"), s"$t has no log")
    // same contents the rename-swap smoke asserts, read through the log
    val dim = graft.merge.TxTable.read(spark, s"$wh/dim_scenario").get
    assert(dim.count() == 20)
    assert(dim.select("scenario_id").distinct().count() == 20)
    val timeline = graft.merge.TxTable.read(spark, s"$wh/fact_scenario_timeline").get
    val keys = timeline.select("source_key")
    assert(keys.count() > 0 && keys.count() == keys.distinct().count())
  }

  test("maintenance compaction keeps the append-sink file count bounded across cycles") {
    spark
    val wh = tmpDir("main-compact")
    // compact aggressively (every cycle, threshold 1) so three cycles of the
    // 30s-cadence append story exercise the maintenance path end-to-end
    Main.run(Map(
      "GRAFT_WAREHOUSE" -> wh,
      "GRAFT_CYCLES" -> "3",
      "POLL_INTERVAL_SEC" -> "0",
      "GRAFT_COMPACT_EVERY_CYCLES" -> "1",
      "GRAFT_COMPACT_MAX_FILES" -> "1"))
    val timeline = s"$wh/fact_scenario_timeline"
    val rows = spark.read.parquet(timeline).count()
    assert(rows > 0)
    // demo fixtures span 7 event dates; targetPartitions=1 ⇒ one file per
    // date partition after compaction (un-compacted, the first cycle alone
    // writes shuffle-partitions × dates file sets)
    val files = graft.merge.MergeSink.dataFileCount(spark, timeline)
    assert(files <= 10, s"expected compacted file count <= 10, got $files")
    // compaction must not disturb correctness: replaying the same corpus
    // produced no duplicate events
    val keyed = spark.read.parquet(timeline).select("source_key")
    assert(keyed.count() == keyed.distinct().count())
  }
}
