package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.merge.TxTable
import graft.sql.{GraftDataSource, GraftStreamSink}

/** The commit log as a Structured Streaming SINK
  * (`df.writeStream.format("graft")`): exactly-once txn-marked commits,
  * append/complete modes, partitioned layouts, and the full declarative
  * loop source → transform → sink with nothing but format options. */
class GraftStreamSinkSpec extends SparkTestBase {

  private def df(ids: Range, tag: String): DataFrame = {
    val sq = spark.sqlContext; import sq.implicits._
    ids.map(i => (i.toLong, s"$tag-$i", i * 10.0)).toDF("id", "name", "score")
      .repartition(1)
  }

  private def idsOf(dir: String): Set[Long] =
    TxTable.read(spark, dir).map(_.select("id").collect()
      .map(_.getLong(0)).toSet).getOrElse(Set.empty)

  test("declarative loop: readStream.format(graft) -> writeStream.format(graft), exactly-once across AvailableNow reruns") {
    val src = tmpDir("sk-src"); val dst = tmpDir("sk-dst")
    val ck = tmpDir("sk-ck")
    TxTable.append(spark, src, df(1 to 10, "a"))
    TxTable.append(spark, src, df(11 to 20, "b"))

    def drain(): Unit = {
      val q = spark.readStream.format("graft").load(src)
        .writeStream.format("graft")
        .option("path", dst)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }

    drain()
    assert(idsOf(dst) == (1L to 20L).toSet)
    val head1 = TxTable.headVersion(spark, dst)

    // rerun with nothing new: no batch, no commit, no duplicate rows
    drain()
    assert(idsOf(dst) == (1L to 20L).toSet)
    assert(TxTable.headVersion(spark, dst) == head1)

    // new source commit: exactly the delta lands
    TxTable.append(spark, src, df(21 to 25, "c"))
    drain()
    assert(idsOf(dst) == (1L to 25L).toSet)
    assert(TxTable.read(spark, dst).get.count() == 25)
  }

  test("addBatch is idempotent per (appId, batchId): a redelivered epoch is a no-op") {
    val dir = tmpDir("sk-idem")
    val sink = new GraftStreamSink(spark, dir, Nil, OutputMode.Append(),
      Some("writer-1"))
    sink.addBatch(0, df(1 to 5, "a"))
    sink.addBatch(0, df(100 to 105, "dup")) // crash-replay of epoch 0
    assert(idsOf(dir) == (1L to 5L).toSet)
    sink.addBatch(1, df(6 to 8, "b"))
    assert(idsOf(dir) == (1L to 8L).toSet)
    // distinct appId = distinct writer: its epoch 0 is NOT a replay
    new GraftStreamSink(spark, dir, Nil, OutputMode.Append(),
      Some("writer-2")).addBatch(0, df(9 to 9, "w2"))
    assert(idsOf(dir) == (1L to 9L).toSet)
  }

  test("complete mode replaces atomically per epoch, still exactly-once") {
    val dir = tmpDir("sk-complete")
    val sink = new GraftStreamSink(spark, dir, Nil, OutputMode.Complete(),
      Some("agg-writer"))
    sink.addBatch(0, df(1 to 5, "a"))
    sink.addBatch(1, df(1 to 8, "a")) // recomputed full result
    assert(idsOf(dir) == (1L to 8L).toSet)
    sink.addBatch(1, df(1 to 3, "stale")) // replayed epoch: no-op
    assert(idsOf(dir) == (1L to 8L).toSet)
  }

  test("writeStream.partitionBy lands a partitioned TxTable layout") {
    val src = tmpDir("sk-psrc"); val dst = tmpDir("sk-pdst")
    val sq = spark.sqlContext; import sq.implicits._
    TxTable.append(spark, src,
      (1 to 20).map(i => (i.toLong, if (i % 2 == 0) "even" else "odd"))
        .toDF("id", "bucket").repartition(1))
    val q = spark.readStream.format("graft").load(src)
      .writeStream.format("graft")
      .partitionBy("bucket")
      .option("path", dst)
      .option("checkpointLocation", tmpDir("sk-pck"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(graft.sql.GraftSql.partitionColumns(spark, dst) == Seq("bucket"))
    assert(TxTable.read(spark, dst).get.count() == 20)
    assert(TxTable.read(spark, dst).get.filter(col("bucket") === "even")
      .count() == 10)
  }

  test("update mode is refused with a pointer at the merge sinks") {
    val e = intercept[IllegalArgumentException] {
      new GraftDataSource().createSink(spark.sqlContext,
        Map("path" -> tmpDir("sk-upd")), Nil, OutputMode.Update())
    }
    assert(e.getMessage.contains("merge sinks"))
  }

  test("driving addBatch outside a StreamingQuery without txnAppId fails loudly") {
    val sink = new GraftStreamSink(spark, tmpDir("sk-noid"), Nil,
      OutputMode.Append(), None)
    val e = intercept[IllegalStateException] {
      sink.addBatch(0, df(1 to 2, "x"))
    }
    assert(e.getMessage.contains("txnAppId"))
  }

  test("identity table as stream sink: ids assign per micro-batch, exactly-once on redelivery") {
    import org.apache.spark.sql.types._
    val dst = tmpDir("sk-ident")
    TxTable.create(spark, dst, StructType(Seq(
      StructField("sid", LongType), StructField("name", StringType))))
    // arm the allocator the DDL way (the prop form CREATE accepts)
    TxTable.setProperties(spark, dst, Map(
      "graft.identity.sid" -> "start=1,step=1,explicit=false,next=1"))
    val sink = new GraftStreamSink(spark, dst, Nil, OutputMode.Append(),
      Some("ident-app"))
    def batch(ids: Range, tag: String) = {
      val sq = spark.sqlContext; import sq.implicits._
      ids.map(i => (null.asInstanceOf[java.lang.Long], s"$tag-$i"))
        .toDF("sid", "name").repartition(1)
    }
    sink.addBatch(0, batch(1 to 5, "a"))
    sink.addBatch(1, batch(1 to 3, "b"))
    // redelivered epoch: a no-op — no rows, no ids consumed
    sink.addBatch(1, batch(1 to 3, "b"))
    val rows = TxTable.read(spark, dst).get
      .select("sid", "name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq.sortBy(_._1)
    assert(rows.map(_._1) == (1L to 8L), rows.mkString(","))
    assert(rows.count(_._2.startsWith("a-")) == 5)
    assert(TxTable.identitySpecs(spark, dst)("sid").next == 9L)
  }
}
