package graft

import org.apache.spark.sql.functions._
import graft.merge.TxTable

/** RENAME/DROP COLUMN via column mapping (the Delta column-mapping idea
  * cut to name mapping): data files keep their physical column names
  * forever; one versioned property re-labels the logical view. Pinned
  * here: metadata-only cost (zero files move), reads/writes in logical
  * names against mixed old/new files, time travel below the DDL, the
  * taint rule (a physically-carried name can never be reborn), the loud
  * refusals (partition and constraint-referenced columns), and the
  * interplay with stats skipping, deletion vectors, and row rewrites. */
class ColumnMappingSpec extends SparkTestBase {
  import spark.implicits._

  private def livePaths(dir: String): Seq[String] =
    TxTable.liveFilePaths(spark, dir).sorted

  test("RENAME is metadata-only: logical view flips, files stay, time travel keeps the old name") {
    val dir = tmpDir("cm-ren")
    TxTable.append(spark, dir,
      (1 to 20).map(i => (i.toLong, s"u$i", i * 10.0)).toDF("id", "usr", "amt"))
    val vOld = TxTable.headVersion(spark, dir).get
    val before = livePaths(dir)
    TxTable.renameColumn(spark, dir, "usr", "user_name")
    assert(livePaths(dir) == before) // zero bytes moved
    val t = TxTable.read(spark, dir).get
    assert(t.columns.toSeq == Seq("id", "user_name", "amt"))
    assert(t.filter(col("id") === 3L).select("user_name").as[String].head() == "u3")
    // time travel below the DDL reads the OLD schema
    assert(TxTable.read(spark, dir, asOf = Some(vOld)).get
      .columns.toSeq == Seq("id", "usr", "amt"))
  }

  test("writes arrive in logical names and land on the physical column; old+new files merge") {
    val dir = tmpDir("cm-write")
    TxTable.append(spark, dir,
      (1 to 10).map(i => (i.toLong, s"a$i")).toDF("id", "v"))
    TxTable.renameColumn(spark, dir, "v", "val")
    // append WITH the new logical name: must land under physical 'v'
    TxTable.append(spark, dir,
      (11 to 20).map(i => (i.toLong, s"b$i")).toDF("id", "val"))
    val t = TxTable.read(spark, dir).get
    assert(t.count() == 20)
    val m = t.select("id", "val").as[(Long, String)].collect().toMap
    assert(m(5L) == "a5" && m(15L) == "b15")
    // the physical files never forked: one coherent column across batches
    assert(t.columns.toSeq == Seq("id", "val"))
    // chained rename + rename BACK to the original (identity restore)
    TxTable.renameColumn(spark, dir, "val", "v2")
    TxTable.renameColumn(spark, dir, "v2", "v")
    assert(TxTable.read(spark, dir).get.columns.toSeq == Seq("id", "v"))
    assert(!TxTable.hasColumnMapping(spark, dir))
  }

  test("DROP removes the column from the view; the name is tainted forever") {
    val dir = tmpDir("cm-drop")
    TxTable.append(spark, dir,
      (1 to 10).map(i => (i.toLong, s"s$i", i * 1.0)).toDF("id", "secret", "w"))
    val vOld = TxTable.headVersion(spark, dir).get
    TxTable.dropColumns(spark, dir, Seq("secret"))
    val t = TxTable.read(spark, dir).get
    assert(t.columns.toSeq == Seq("id", "w") && t.count() == 10)
    // time travel still sees it (retention governs the bytes, as ever)
    assert(TxTable.read(spark, dir, asOf = Some(vOld)).get
      .columns.contains("secret"))
    // appends no longer need it; reads stay coherent
    TxTable.append(spark, dir, Seq((11L, 11.0)).toDF("id", "w"))
    assert(TxTable.read(spark, dir).get.count() == 11)
    // the taint rule: the name can never be reborn
    val e = intercept[IllegalArgumentException] {
      TxTable.addColumns(spark, dir, Seq(
        org.apache.spark.sql.types.StructField("secret",
          org.apache.spark.sql.types.StringType)))
    }
    assert(e.getMessage.contains("previously carried"), e.getMessage)
    // and renaming another column ONTO it is refused too
    val e2 = intercept[IllegalArgumentException] {
      TxTable.renameColumn(spark, dir, "w", "secret")
    }
    assert(e2.getMessage.contains("previously carried"), e2.getMessage)
  }

  test("refusals: partition columns, constraint-referenced columns, collisions, missing") {
    val dir = tmpDir("cm-refuse")
    TxTable.append(spark, dir,
      (1 to 8).map(i => (i % 2, i.toLong, i * 1.0)).toDF("pb", "id", "w"),
      partitionCols = Seq("pb"))
    TxTable.setConstraint(spark, dir, "pos_w", "w >= 0")
    assert(intercept[IllegalArgumentException] {
      TxTable.renameColumn(spark, dir, "pb", "bucket")
    }.getMessage.contains("partition column"))
    assert(intercept[IllegalArgumentException] {
      TxTable.dropColumns(spark, dir, Seq("pb"))
    }.getMessage.contains("partition column"))
    assert(intercept[IllegalArgumentException] {
      TxTable.renameColumn(spark, dir, "w", "weight")
    }.getMessage.contains("CHECK constraint"))
    assert(intercept[IllegalArgumentException] {
      TxTable.dropColumns(spark, dir, Seq("w"))
    }.getMessage.contains("CHECK constraint"))
    assert(intercept[IllegalArgumentException] {
      TxTable.renameColumn(spark, dir, "id", "w")
    }.getMessage.contains("already exists"))
    assert(intercept[IllegalArgumentException] {
      TxTable.renameColumn(spark, dir, "nope", "x")
    }.getMessage.contains("no column"))
    assert(intercept[IllegalArgumentException] {
      TxTable.dropColumns(spark, dir, Seq("id", "w", "nope"))
    }.getMessage.contains("nope"))
    // dropping the constraint unblocks the rename
    TxTable.dropConstraint(spark, dir, "pos_w")
    TxTable.renameColumn(spark, dir, "w", "weight")
    assert(TxTable.read(spark, dir).get.columns.contains("weight"))
  }

  test("stats skipping prunes on the renamed column; rewrites and vectors compose") {
    val dir = tmpDir("cm-skip")
    // two files with disjoint id ranges -> envelopes prune
    TxTable.append(spark, dir,
      (1 to 50).map(i => (i.toLong, s"a$i")).toDF("id", "v").coalesce(1))
    TxTable.append(spark, dir,
      (51 to 100).map(i => (i.toLong, s"b$i")).toDF("id", "v").coalesce(1))
    TxTable.renameColumn(spark, dir, "id", "doc_id")
    // the logical name probes the physical envelopes
    assert(TxTable.skippingStats(spark, dir, "doc_id",
      BigDecimal(60), BigDecimal(70)) == ((1, 2)))
    assert(TxTable.readSkipping(spark, dir, "doc_id",
      BigDecimal(60), BigDecimal(70)).get
      .filter(col("doc_id").between(60, 70)).count() == 11)
    // row-level rewrites speak logical names end to end
    TxTable.deleteWhereDV(spark, dir, col("doc_id") === 60L)
    TxTable.updateWhere(spark, dir, col("doc_id") === 61L,
      Map("v" -> lit("patched")))
    val t = TxTable.read(spark, dir).get
    assert(t.count() == 99)
    assert(t.filter(col("v") === "patched").select("doc_id")
      .as[Long].head() == 61L)
    // compaction folds everything back and the logical view is unchanged
    TxTable.compactData(spark, dir)
    assert(TxTable.read(spark, dir).get.count() == 99)
    assert(TxTable.read(spark, dir).get.columns.toSeq == Seq("doc_id", "v"))
  }

  test("rename of an ADD COLUMNS-declared column; CDC feed speaks logical names") {
    val dir = tmpDir("cm-evo")
    TxTable.append(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    TxTable.addColumns(spark, dir, Seq(
      org.apache.spark.sql.types.StructField("note",
        org.apache.spark.sql.types.StringType)))
    TxTable.renameColumn(spark, dir, "note", "comment")
    val t = TxTable.read(spark, dir).get
    assert(t.columns.toSeq == Seq("id", "v", "comment"))
    assert(t.filter(col("comment").isNull).count() == 2)
    // a write carrying the logical name round-trips
    TxTable.append(spark, dir, Seq((3L, "c", "hi")).toDF("id", "v", "comment"))
    assert(TxTable.read(spark, dir).get
      .filter(col("comment") === "hi").count() == 1)
    // the change feed presents logical names too
    val v = TxTable.headVersion(spark, dir).get
    TxTable.deleteWhere(spark, dir, col("id") === 1L)
    val ch = TxTable.readChanges(spark, dir, v - 1).get
    assert(ch.columns.contains("comment") && !ch.columns.contains("note"))
  }

  test("racing schema DDLs are OCC-pinned: neither rename is lost") {
    // renameColumn/dropColumns/addColumns read-merge-write the FULL
    // mapping/declaration property; un-pinned slot retry would let two
    // concurrent DDLs last-writer-win (one silently lost). Pinned commits
    // + withRetry make the loser re-read and re-merge instead.
    val dir = tmpDir("cm-race")
    TxTable.append(spark, dir,
      Seq((1L, "a", 1.0, "x")).toDF("id", "v", "score", "tag"))
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    val fa = Future { barrier.await()
      TxTable.renameColumn(spark, dir, "v", "val2") }
    val fb = Future { barrier.await()
      TxTable.renameColumn(spark, dir, "tag", "label") }
    Await.result(fa, 120.seconds); Await.result(fb, 120.seconds)
    pool.shutdown()
    assert(TxTable.read(spark, dir).get.columns.toSeq ==
      Seq("id", "val2", "score", "label"))
    // and a third DDL over the merged state still lands
    TxTable.dropColumns(spark, dir, Seq("score"))
    assert(TxTable.read(spark, dir).get.columns.toSeq ==
      Seq("id", "val2", "label"))
  }
}
