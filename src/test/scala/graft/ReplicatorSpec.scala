package graft

import org.apache.spark.sql.functions._
import graft.merge.{Replicator, TxTable}

/** Change-feed-driven replication: after every sync the replica must equal
  * the source EXACTLY (same keys, same values), having consumed only the
  * feed — plus the replay/no-op and net-collapse properties. */
class ReplicatorSpec extends SparkTestBase {
  import spark.implicits._

  private def df(rows: (Int, String, Int)*) = rows.toDF("k", "v", "pb")

  private def contents(dir: String): Map[Int, String] =
    TxTable.read(spark, dir).map {
      _.select("k", "v").as[(Int, String)].collect().toMap
    }.getOrElse(Map.empty)

  test("replica tracks the source through appends, updates, and deletes; syncs replay as no-ops") {
    val src = tmpDir("rep-src"); val dst = tmpDir("rep-dst")
    val keys = Seq("k")

    // nothing to replicate yet
    assert(Replicator.sync(spark, src, dst, keys).isEmpty)

    // v1: first sync = snapshot
    TxTable.append(spark, src, df((1, "a1", 0), (2, "b1", 1)), Seq("pb"))
    assert(Replicator.sync(spark, src, dst, keys)
      .contains(TxTable.headVersion(spark, src).get))
    assert(contents(dst) == contents(src))

    // already current: no-op
    assert(Replicator.sync(spark, src, dst, keys).isEmpty)

    // v2 append + v3 swap (k=1 updated, k=3 appears then is dropped by the
    // swap — its whole life inside ONE sync window nets to nothing)
    TxTable.append(spark, src, df((3, "c1", 0)), Seq("pb"))
    TxTable.replacePartitionsBy(spark, src, df((1, "a2", 0)), Seq("pb"))
    assert(Replicator.sync(spark, src, dst, keys).isDefined)
    assert(contents(dst) == contents(src))
    assert(contents(dst) == Map(1 -> "a2", 2 -> "b1"))

    // v4: pure delete via swap (k=2's bucket rewritten without it)
    TxTable.replacePartitionsBy(spark, src, df((4, "d1", 1)), Seq("pb"))
    assert(Replicator.sync(spark, src, dst, keys).isDefined)
    assert(contents(dst) == contents(src))
    assert(!contents(dst).contains(2) && contents(dst)(4) == "d1")

    // replay after convergence: no-op, byte-stable
    val before = contents(dst)
    assert(Replicator.sync(spark, src, dst, keys).isEmpty)
    assert(contents(dst) == before)
    assert(Replicator.appliedVersion(spark, dst, keys)
      .contains(TxTable.headVersion(spark, src).get))
  }

  test("blown feed horizon fails loudly; resnapshot recovers") {
    val src = tmpDir("rep-src2"); val dst = tmpDir("rep-dst2")
    val keys = Seq("k")
    TxTable.append(spark, src, df((1, "a", 0)), Seq("pb"))
    assert(Replicator.sync(spark, src, dst, keys).isDefined)
    // source moves on and vacuums past the replica's base
    TxTable.replace(spark, src, df((1, "a2", 0), (5, "e", 1)), Seq("pb"))
    TxTable.replace(spark, src, df((1, "a3", 0)), Seq("pb"))
    TxTable.vacuum(spark, src, retainVersions = 1)
    val e = intercept[IllegalArgumentException] {
      Replicator.sync(spark, src, dst, keys)
    }
    assert(e.getMessage.contains("retention floor"), e.getMessage)
    assert(Replicator.resnapshot(spark, src, dst, keys).isDefined)
    assert(contents(dst) == Map(1 -> "a3"))
    // and the mark advanced: the next sync is a clean no-op
    assert(Replicator.sync(spark, src, dst, keys).isEmpty)
  }

  test("replica tracks a row-level deleteWhere/updateWhere — rewrite commits collapse to the true net change") {
    val src = tmpDir("rep-rw-src"); val dst = tmpDir("rep-rw-dst")
    val keys = Seq("k")
    TxTable.append(spark, src, df((1, "a1", 0), (2, "b1", 0), (3, "c1", 1)),
      Seq("pb"))
    Replicator.sync(spark, src, dst, keys)
    // one rewrite deletes k=2; its file's SURVIVOR (k=1) rides the feed as
    // a delete+insert pair the keyed collapse must net to a same-value
    // update, not a spurious delete
    TxTable.deleteWhere(spark, src, col("k") === 2)
    assert(Replicator.sync(spark, src, dst, keys).isDefined)
    assert(contents(dst) == contents(src))
    assert(contents(dst) == Map(1 -> "a1", 3 -> "c1"))
    // and an in-place update replicates as an update
    TxTable.updateWhere(spark, src, col("k") === 3, Map("v" -> lit("c2")))
    assert(Replicator.sync(spark, src, dst, keys).isDefined)
    assert(contents(dst) == Map(1 -> "a1", 3 -> "c2"))
  }

  test("replica tracks merge-on-read deletes/updates — a dv commit's feed nets like a rewrite's") {
    val src = tmpDir("rep-dv-src"); val dst = tmpDir("rep-dv-dst")
    val keys = Seq("k")
    TxTable.append(spark, src, df((1, "a1", 0), (2, "b1", 0), (3, "c1", 1)),
      Seq("pb"))
    Replicator.sync(spark, src, dst, keys)
    // vector out k=2: the touched file's survivor (k=1) rides the feed as
    // a same-value delete+insert pair (file@oldDv -> file@newDv), which
    // the keyed collapse nets to an update; k=2 nets to a true delete
    TxTable.deleteWhereDV(spark, src, col("k") === 2)
    assert(Replicator.sync(spark, src, dst, keys).isDefined)
    assert(contents(dst) == Map(1 -> "a1", 3 -> "c1"))
    // MoR update: old image vectored, copy appended — one commit, one sync
    TxTable.updateWhereDV(spark, src, col("k") === 3, Map("v" -> lit("c2")))
    assert(Replicator.sync(spark, src, dst, keys).isDefined)
    assert(contents(dst) == Map(1 -> "a1", 3 -> "c2"))
    // purge is maintenance (dataChange=false): the sync advances its mark
    // past the commit but applies zero rows — replica untouched
    val dstHead = TxTable.headVersion(spark, dst)
    TxTable.purgeDvs(spark, src)
    assert(Replicator.sync(spark, src, dst, keys).isDefined) // mark moves
    assert(TxTable.headVersion(spark, dst) == dstHead ||
      contents(dst) == Map(1 -> "a1", 3 -> "c2"))
    assert(contents(dst) == contents(src))
  }
}
