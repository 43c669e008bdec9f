package graft

import graft.ops.Diff

/** Snapshot-diff CDC derivation: classification and null-safety. */
class DiffSpec extends SparkTestBase {
  import spark.implicits._

  test("snapshotDiff: insert/delete/update classified, null transitions are updates, unchanged absent") {
    val prev = Seq(
      (1L, "a", Some(10.0)), (2L, "b", None),
      (3L, "c", Some(30.0)), (4L, "d", Some(40.0)))
      .toDF("id", "s", "v")
    val next = Seq(
      (1L, "a", Some(10.0)),   // unchanged → absent
      (2L, "b", Some(20.0)),   // NULL → value: update
      (3L, null.asInstanceOf[String], Some(30.0)), // value → NULL: update
      (5L, "e", Some(50.0)))   // new key: insert; 4 gone: delete
      .toDF("id", "s", "v")
    val got = Diff.snapshotDiff(prev, next, Seq("id"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(2L -> "updated", 3L -> "updated",
      4L -> "deleted", 5L -> "inserted"))
    // explicit compare-column subset: v-only ignores the s change on id 3
    val sub = Diff.snapshotDiff(prev, next, Seq("id"), Seq("v"))
      .as[(Long, String)].collect().toMap
    assert(sub == Map(2L -> "updated", 4L -> "deleted", 5L -> "inserted"))
  }
}
