package graft

import org.apache.spark.sql.functions._

import graft.merge.TxTable
import graft.ops.{Layout, MaintainPolicy, Maintenance}

/** The self-driving maintenance policy: health probes from the log,
  * actions only when their thresholds trip, every action a permutation
  * of live rows. */
class MaintenanceSpec extends SparkTestBase {
  import spark.implicits._

  test("healthy table is a noop; tripped thresholds run compaction, checkpoint, vacuum") {
    val dir = tmpDir("maint-basic")
    (1 to 6).foreach(i => TxTable.append(spark, dir,
      Seq((i.toLong, s"v$i")).toDF("id", "v")))
    val before = TxTable.headVersion(spark, dir).get

    // nothing trips: zero commits, explicit noop
    assert(Maintenance.maintain(spark, dir, MaintainPolicy(
      minSmallFiles = 100, minLogCommits = 100, minVacuumItems = 100)) ==
      Seq("noop" -> "no threshold tripped"))
    assert(TxTable.headVersion(spark, dir).contains(before))

    // six tiny files + six commits + (post-compaction) retired debris
    val acts = Maintenance.maintain(spark, dir, MaintainPolicy(
      minSmallFiles = 2, minLogCommits = 3, minVacuumItems = 1,
      vacuumMinOrphanAgeMs = 0, retainVersions = 1)).map(_._1)
    assert(acts.contains("compact_small_files"), acts)
    assert(acts.contains("compact_log"), acts)
    assert(acts.contains("vacuum"), acts)
    // every action was a permutation of the live rows
    assert(TxTable.read(spark, dir).get.select("id").as[Long]
      .collect().sorted.toSeq == (1L to 6L))
    assert(TxTable.liveFilePaths(spark, dir).size == 1)
  }

  test("purge_dvs trips only at/over the policy fraction — the read-tax bound") {
    val dir = tmpDir("maint-dv")
    TxTable.append(spark, dir,
      (1 to 20).map(i => (i.toLong, s"v$i")).toDF("id", "v").coalesce(1))
    TxTable.deleteWhereDV(spark, dir, col("id") <= 2) // 10% deleted
    val quiet = Maintenance.maintain(spark, dir, MaintainPolicy(
      dvMinDeletedFraction = 0.4, minSmallFiles = 100,
      minLogCommits = 100, minVacuumItems = 100)).map(_._1)
    assert(quiet == Seq("noop"), quiet) // 10% < 40%: vector stays (cheap)
    assert(TxTable.hasLiveDvs(spark, dir))
    TxTable.deleteWhereDV(spark, dir, col("id") <= 10) // now 50%
    val acts = Maintenance.maintain(spark, dir, MaintainPolicy(
      dvMinDeletedFraction = 0.4, minSmallFiles = 100,
      minLogCommits = 100, minVacuumItems = 100)).map(_._1)
    assert(acts == Seq("purge_dvs"), acts)
    assert(!TxTable.hasLiveDvs(spark, dir))
    assert(TxTable.read(spark, dir).get.count() == 10)
  }

  test("analyze refresh trips only for previously-analyzed tables past the commit threshold") {
    val dir = tmpDir("maint-an")
    TxTable.append(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    def quiet = MaintainPolicy(minSmallFiles = 100, minLogCommits = 100,
      minVacuumItems = 100, minCommitsSinceAnalyze = 3)
    // never analyzed: the policy never invents a stats obligation
    assert(Maintenance.maintain(spark, dir, quiet).map(_._1) == Seq("noop"))
    TxTable.analyze(spark, dir)
    // fresh stats: no refresh
    assert(Maintenance.maintain(spark, dir, quiet).map(_._1) == Seq("noop"))
    (2 to 4).foreach(i => TxTable.append(spark, dir,
      Seq((i.toLong, s"v$i")).toDF("id", "v")))
    val acts = Maintenance.maintain(spark, dir, quiet)
    assert(acts.map(_._1) == Seq("analyze"), acts)
    assert(acts.head._2.contains("4 rows"), acts) // refreshed to live truth
    assert(TxTable.catalogStats(spark, dir, None)
      .exists(_.rowCount.contains(BigInt(4))))
  }

  test("bloom refresh trips only for opted-in columns with index lag") {
    val dir = tmpDir("maint-bloom")
    TxTable.append(spark, dir,
      (1 to 20).map(i => (i.toLong, s"u$i")).toDF("id", "u").coalesce(1))
    val quiet = MaintainPolicy(minSmallFiles = 100, minLogCommits = 100,
      minVacuumItems = 100)
    // not opted in: no bloom work
    assert(Maintenance.maintain(spark, dir, quiet).map(_._1) == Seq("noop"))
    graft.ops.Layout.refreshBloomIndexTx(spark, dir, "u", 1000L)
    // current index: the probe is a no-op
    assert(Maintenance.maintain(spark, dir, quiet).map(_._1) == Seq("noop"))
    // new files lag the index: maintain refreshes it incrementally
    TxTable.append(spark, dir,
      (21 to 30).map(i => (i.toLong, s"u$i")).toDF("id", "u").coalesce(1))
    val acts = Maintenance.maintain(spark, dir, quiet)
    assert(acts.map(_._1) == Seq("refresh_bloom"), acts)
    assert(acts.head._2.contains("column u"), acts)
  }

  test("zorder runs only for opted-in tables with enough new files, on the recorded columns") {
    val dir = tmpDir("maint-z")
    TxTable.append(spark, dir,
      (1 to 40).map(i => (i.toLong, (i * 7 % 40).toLong)).toDF("x", "y")
        .repartition(2))
    // not opted in: no zorder even with new files everywhere
    assert(!Maintenance.maintain(spark, dir, MaintainPolicy(
      minUnclusteredFiles = 1, minSmallFiles = 100,
      minLogCommits = 100, minVacuumItems = 100)).map(_._1)
      .contains("zorder_incremental"))
    // opt in with one explicit incremental pass, then append new files
    Layout.zorderIncrementalTx(spark, dir, Seq("x", "y"), nParts = 2)
    TxTable.append(spark, dir,
      (41 to 80).map(i => (i.toLong, i.toLong)).toDF("x", "y")
        .repartition(2))
    val acts = Maintenance.maintain(spark, dir, MaintainPolicy(
      minUnclusteredFiles = 2, minSmallFiles = 100,
      minLogCommits = 100, minVacuumItems = 100)).map(_._1)
    assert(acts == Seq("zorder_incremental"), acts)
    assert(TxTable.read(spark, dir).get.count() == 80)
    // immediately after: nothing new, noop again
    assert(Maintenance.maintain(spark, dir, MaintainPolicy(
      minUnclusteredFiles = 2, minSmallFiles = 100,
      minLogCommits = 100, minVacuumItems = 100)).map(_._1) == Seq("noop"))
  }
}
