package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Dedup
import graft.model.Tables

/** Dev-only timing harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $label: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val sigs = Dedup.signatures(docs, "doc_id", "text", 1, 32)
    time("sigs")(sigs.count())
    val narrow = Dedup.lshBands(sigs, 32, 8)
    time("bands")(narrow.count())
    val pairs = narrow
      .join(narrow.withColumnRenamed("doc_id", "doc_b"), Seq("band_id", "band_hash"))
      .filter(col("doc_id") < col("doc_b"))
      .select(col("doc_id").as("doc_a"), col("doc_b")).distinct()
    time("pairs")(pairs.count())
    time("full")(Dedup.minhashNearDups(docs, "doc_id", "text", 1, 32, 8, 0.5).count())
    time("simhashTable")(Dedup.simhashTable(docs, "doc_id", "text").count())

    // drive the incremental runtime end-to-end: 3 poll cycles over events
    // with a moving visibility horizon, dedup-append sink, then reconcile
    import java.sql.Timestamp
    import graft.merge.MergeSink
    import graft.runtime.{IncrementalRunner, StreamSpec, WatermarkStore}
    val base = java.nio.file.Files.createTempDirectory("graft-run").toString
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    var horizon = Timestamp.valueOf("2024-01-01 00:00:00")
    val store = new WatermarkStore(spark, s"$base/wm")
    val runner = new IncrementalRunner(spark, store, 90, () => horizon)
    val spec = StreamSpec("events",
      (s, since) => events.filter(col("ts") >= lit(since) && col("ts") < lit(horizon)),
      "ts", "event_id",
      b => MergeSink.appendDedup(spark, s"$base/sink", b, "event_id"), cap = 300)
    for (h <- Seq("2024-01-12 00:00:00", "2024-01-21 00:00:00", "2024-02-01 00:00:00")) {
      horizon = Timestamp.valueOf(h)
      val r = runner.runCycle(Seq(spec))
      println(s"[scratch] cycle@$h: rows=${r.totalRows} loops=${r.results.head.drainedLoops} err=${r.failed.size}")
    }
    graft.functions.Registry.registerAll(spark)
    spark.sql("SELECT safe_bool('yes') b, dot_product(array(1.0d,2.0d), array(3.0d,4.0d)) d").show()
    println(s"[scratch] sink rows=${spark.read.parquet(s"$base/sink").count()} " +
      s"(source=${events.count()}) watermark=${store.get("events").get}")
    spark.stop()
  }
}
