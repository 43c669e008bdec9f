package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.merge.MergeSink
import graft.model.Tables
import graft.streaming.Streams

/** Structured Streaming binding (SURVEY §2.11): a file micro-batch stream
  * through foreachBatch + merge sink equals the batch result; windowed
  * aggregation with watermark runs. */
class StreamsSpec extends SparkTestBase {

  test("parquet stream -> appendDedup sink converges to batch result") {
    val srcDir = tmpDir("stream-src")
    val sinkDir = tmpDir("stream-sink")
    val ckDir = tmpDir("stream-ck")
    val events = Tables.load(spark, sf(), "events")
    // stage the source as several files to get several micro-batches
    events.repartition(5).write.parquet(srcDir)
    val stream = Streams.parquetStream(spark, srcDir,
      spark.read.parquet(srcDir).schema, maxFilesPerTrigger = 2)
    val q = Streams.toMergeSink(stream, ckDir, Trigger.AvailableNow())(
      (s, batch, _) => MergeSink.appendDedup(s, sinkDir, batch, "event_id"))
    q.awaitTermination(120000)
    assert(spark.read.parquet(sinkDir).count() == events.count())
    // re-delivering everything (new checkpoint, same sink) changes nothing
    val q2 = Streams.toMergeSink(
      Streams.parquetStream(spark, srcDir, spark.read.parquet(srcDir).schema),
      tmpDir("stream-ck2"), Trigger.AvailableNow())(
      (s, batch, _) => MergeSink.appendDedup(s, sinkDir, batch, "event_id"))
    q2.awaitTermination(120000)
    assert(spark.read.parquet(sinkDir).count() == events.count())
  }

  test("stateful sessionization closes the same sessions as the batch query") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val srcDir = tmpDir("sess-src")
    val events = Tables.load(spark, sf(), "events")
    // one ts-sorted file -> one ordered micro-batch, so in-batch session
    // splits are deterministic and comparable to the batch q26 result
    events.orderBy("ts").coalesce(1).write.parquet(srcDir)
    val stream = Streams.parquetStream(spark, srcDir,
      spark.read.parquet(srcDir).schema, maxFilesPerTrigger = 1)
      .selectExpr("user_id", "ts").as[Streams.SessionEvent]
    val closed = Streams.sessionize(stream, gapSec = 30 * 60)
    val q = closed.writeStream.outputMode("append")
      .format("memory").queryName("sessions")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.sql("SELECT COUNT(*) FROM sessions").collect()(0).getLong(0)
    val batchSessions = SparkEntry.queries("q26_sessionize")(spark, sf()).count()
    val nUsers = events.select("user_id").distinct().count()
    // every session closes except each user's final (still-open) one
    assert(streamed == batchSessions - nUsers,
      s"streamed=$streamed batch=$batchSessions users=$nUsers")
  }

  test("reference timeline lifecycle transform runs unchanged as a stream") {
    import java.sql.Timestamp
    val srcDir = tmpDir("tlstream-src")
    val sinkDir = tmpDir("tlstream-sink")
    val since = Timestamp.valueOf("2024-03-01 00:00:00")
    val fcScenario = graft.demo.ReferenceFixtures.build(spark).fcScenario
    fcScenario.repartition(3).write.parquet(srcDir) // several micro-batches
    val expected = graft.ops.ScenarioPipeline
      .timelineLifecycleBranches(spark.read.parquet(srcDir), since)
      .select("source_key", "event_type", "scenario_id")
      .collect().map(_.toString).sorted.toSeq

    // the SAME transform over a readStream scan, merged via the dedup sink
    val stream = Streams.parquetStream(spark, srcDir,
      spark.read.parquet(srcDir).schema, maxFilesPerTrigger = 1)
    val q = Streams.toMergeSink(
      graft.ops.ScenarioPipeline.timelineLifecycleBranches(stream, since),
      tmpDir("tlstream-ck"), Trigger.AvailableNow())(
      (s, batch, _) => MergeSink.appendDedup(s, sinkDir, batch, "source_key"))
    q.awaitTermination(120000)
    val got = spark.read.parquet(sinkDir)
      .select("source_key", "event_type", "scenario_id")
      .collect().map(_.toString).sorted.toSeq
    assert(got == expected && got.nonEmpty)
  }

  test("curation prep (scrub + sample + chunk) runs unchanged as a stream") {
    // the training-data prep operators are stateless narrow transforms, so
    // the SAME composition must work over readStream with identical output
    import graft.ext.{Sampling, TextPrep}
    val srcDir = tmpDir("prep-src")
    val sinkDir = tmpDir("prep-sink")
    val docs = Tables.load(spark, sf(), "documents")
    docs.repartition(4).write.parquet(srcDir)

    def prep(df: org.apache.spark.sql.DataFrame) = {
      val sampled = Sampling.uniform(df, col("doc_id"), 0.5)
        .select(col("doc_id"), TextPrep.scrubPii(col("text")).as("clean"))
      TextPrep.chunkTokens(sampled, col("doc_id"), col("clean"), 24, 12)
        .withColumn("chunk_key",
          concat(col("doc_id"), lit("#"), col("chunk_no")))
    }
    val expected = prep(spark.read.parquet(srcDir))
      .select("chunk_key", "chunk_tokens")
      .collect().map(_.toString).sorted.toSeq

    val stream = Streams.parquetStream(spark, srcDir,
      spark.read.parquet(srcDir).schema, maxFilesPerTrigger = 1)
    val q = Streams.toMergeSink(prep(stream), tmpDir("prep-ck"),
      Trigger.AvailableNow())(
      (s, batch, _) => MergeSink.appendDedup(s, sinkDir, batch, "chunk_key"))
    q.awaitTermination(120000)
    val got = spark.read.parquet(sinkDir)
      .select("chunk_key", "chunk_tokens")
      .collect().map(_.toString).sorted.toSeq
    assert(got == expected && got.nonEmpty)
  }

  test("streaming top-k converges to the batch heavy hitters") {
    import spark.implicits._
    val srcDir = tmpDir("hh-src")
    val events = Tables.load(spark, sf(), "events")
    events.repartition(3).write.parquet(srcDir)
    val stream = Streams.parquetStream(spark, srcDir,
        spark.read.parquet(srcDir).schema, maxFilesPerTrigger = 1)
      .selectExpr("event_type AS group", "CAST(user_id AS STRING) AS item")
      .as[Streams.KeyedItem]
    val q = Streams.topkFreq(stream, capacity = 512, k = 5)
      .writeStream.outputMode("update")
      .format("memory").queryName("hh")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // update mode re-emits per batch; the LAST snapshot per (group, rank)
    // must equal the batch top-5 (capacity 512 > distinct users => exact)
    val streamed = spark.sql(
      """SELECT group, item, cnt FROM (
        |  SELECT *, row_number() OVER (PARTITION BY group, batch_rank
        |    ORDER BY group_total DESC) AS rn FROM hh) WHERE rn = 1""".stripMargin)
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet).toMap
    val batch = events.groupBy("event_type", "user_id").count()
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_type")
          .orderBy(desc("count"), col("user_id").cast("string"))))
      .filter(col("rk") <= 5)
      .select(col("event_type"), col("user_id").cast("string"), col("count"))
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet).toMap
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (g, items) =>
      assert(items == batch(g), s"group $g: $items vs ${batch(g)}")
    }
  }

  test("windowed counts with watermark produce sane totals") {
    val srcDir = tmpDir("wstream-src")
    val events = Tables.load(spark, sf(), "events")
    events.write.parquet(srcDir)
    val stream = Streams.parquetStream(spark, srcDir,
      spark.read.parquet(srcDir).schema)
    val agg = Streams.windowedCounts(stream, "ts", "event_type",
      "1 day", "90 seconds")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("win")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // append mode emits only closed windows; the final (open) window is held
    // back, so totals are <= input count and strictly positive
    val emitted = spark.sql("SELECT sum(n) FROM win").collect()(0)
    assert(!emitted.isNullAt(0) && emitted.getLong(0) > 0)
    assert(emitted.getLong(0) <= events.count())
  }
}
