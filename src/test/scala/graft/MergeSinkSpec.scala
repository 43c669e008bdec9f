package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.merge.MergeSink

/** The four merge modes (SURVEY §2.10): semantics + the idempotency property
  * every mode must satisfy under 90 s-overlap replay (apply twice ≡ once). */
class MergeSinkSpec extends SparkTestBase {
  import spark.implicits._

  private def snapshot(dir: String): Seq[(String, String, String)] =
    spark.read.parquet(dir).select("k", "status", "note")
      .as[(String, String, String)].collect().toSeq.sortBy(_._1)

  test("M1 upsertPartial: mutable cols overwritten, immutable keep first-seen") {
    val dir = tmpDir("m1")
    val b1 = Seq(("a", "open", "created-a"), ("b", "open", "created-b"))
      .toDF("k", "status", "note")
    MergeSink.upsertPartial(spark, dir, b1, Seq("k"), Seq("status"))
    val b2 = Seq(("a", "closed", "SHOULD-NOT-REPLACE"), ("c", "open", "created-c"))
      .toDF("k", "status", "note")
    MergeSink.upsertPartial(spark, dir, b2, Seq("k"), Seq("status"))
    assert(snapshot(dir) == Seq(
      ("a", "closed", "created-a"),   // status updated, note immutable
      ("b", "open", "created-b"),     // untouched
      ("c", "open", "created-c")))    // inserted
    // idempotency: replaying b2 changes nothing
    MergeSink.upsertPartial(spark, dir, b2, Seq("k"), Seq("status"))
    assert(snapshot(dir) == Seq(("a", "closed", "created-a"),
      ("b", "open", "created-b"), ("c", "open", "created-c")))
  }

  test("M1 partial update applies batch NULLs to mutable cols (SET c = EXCLUDED.c)") {
    val dir = tmpDir("m1null")
    val b1 = Seq(("a", "open", "n1")).toDF("k", "status", "note")
    MergeSink.upsertPartial(spark, dir, b1, Seq("k"), Seq("status"))
    val b2 = Seq(("a", null: String, "nX")).toDF("k", "status", "note")
    MergeSink.upsertPartial(spark, dir, b2, Seq("k"), Seq("status"))
    val r = spark.read.parquet(dir).collect()(0)
    assert(r.getAs[String]("status") == null)
    assert(r.getAs[String]("note") == "n1")
  }

  test("M2 scd2: close-out flips is_current, invariant holds, replay converges") {
    val dir = tmpDir("m2")
    def row(id: String, entity: String, endAt: Option[String], cur: Boolean) =
      (id, entity, endAt.orNull, cur)
    // v1 arrives current
    val b1 = Seq(row("v1", "e1", None, cur = true))
      .toDF("source_id", "entity", "version_ended_at", "is_current_version")
    MergeSink.scd2(spark, dir, b1, "source_id",
      Seq("version_ended_at", "is_current_version"))
    // v2 arrives: source closed v1 (end_at set) and opened v2
    val b2 = Seq(
      row("v1", "e1", Some("2024-01-02 00:00:00"), cur = false),
      row("v2", "e1", None, cur = true))
      .toDF("source_id", "entity", "version_ended_at", "is_current_version")
    MergeSink.scd2(spark, dir, b2, "source_id",
      Seq("version_ended_at", "is_current_version"))
    val t = spark.read.parquet(dir)
    assert(t.count() == 2)
    assert(t.filter(col("is_current_version")).select("source_id").as[String].head() == "v2")
    assert(MergeSink.scd2Violations(t, Seq("entity"), "is_current_version").isEmpty)
    // overlap replay of b2
    MergeSink.scd2(spark, dir, b2, "source_id",
      Seq("version_ended_at", "is_current_version"))
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("M3 insertIfAbsent: conflicts dropped, facts never change") {
    val dir = tmpDir("m3")
    val b1 = Seq(("r1", 1.0), ("r2", 2.0)).toDF("k", "v")
    MergeSink.insertIfAbsent(spark, dir, b1, Seq("k"))
    val b2 = Seq(("r2", 999.0), ("r3", 3.0)).toDF("k", "v")
    MergeSink.insertIfAbsent(spark, dir, b2, Seq("k"))
    val got = spark.read.parquet(dir).as[(String, Double)].collect().toMap
    assert(got == Map("r1" -> 1.0, "r2" -> 2.0, "r3" -> 3.0)) // r2 kept original
    MergeSink.insertIfAbsent(spark, dir, b2, Seq("k"))        // replay
    assert(spark.read.parquet(dir).count() == 3)
  }

  test("M4 appendDedup: within-batch and cross-batch dedup on source_key") {
    val dir = tmpDir("m4")
    val b = Seq(("SC_1", "x"), ("SC_1", "x"), ("SC_2", "y")).toDF("source_key", "payload")
    MergeSink.appendDedup(spark, dir, b, "source_key")
    assert(spark.read.parquet(dir).count() == 2)
    MergeSink.appendDedup(spark, dir, b, "source_key")
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("latestPerKey picks newest by orderCols for within-batch upserts") {
    val b = Seq(("a", "old", "2024-01-01 00:00:00"), ("a", "new", "2024-01-02 00:00:00"))
      .toDF("k", "v", "at")
    val got = MergeSink.latestPerKey(b, Seq("k"), Seq("at")).select("v").as[String].collect()
    assert(got.toSeq == Seq("new"))
  }
}
