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
}
