package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Z-order layout: correctness of the Morton key and the property the
  * layout exists for — per-FILE min/max envelopes tight enough that a
  * predicate on EITHER dimension prunes files (what parquet footer
  * skipping does with pushed filters at scan time). */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("zValue interleaves bits exactly (known values)") {
    // b1=0b101 (bits at 0,2 → z positions 0,4), b2=0b011 (bits at 0,1 →
    // z positions 1,3): z = 1 + 2 + 8 + 16 = 27
    val r = Seq((5L, 3L)).toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), 8).as("z"))
      .head().getLong(0)
    assert(r == 27L)
    // identity grid corners at bits=2
    val grid = Seq((0L, 0L), (3L, 0L), (0L, 3L), (3L, 3L))
      .toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), 2).as("z"))
      .as[Long].collect().toSeq
    assert(grid == Seq(0L, 5L, 10L, 15L))
  }

  test("linearBucket: full range covered, max clamps into top cell, degenerate span → 0") {
    val df = Seq(0.0, 2.5, 4.999, 5.0, 10.0).toDF("x")
    val got = df.select(Layout.linearBucket(col("x"), 0.0, 10.0, 2).as("b"))
      .as[Long].collect().toSeq
    // 4 cells over [0,10]: 0→0, 2.5→1, 4.999→1, 5.0→2, 10.0→clamped 3
    assert(got == Seq(0L, 1L, 1L, 2L, 3L))
    val degen = df.select(Layout.linearBucket(col("x"), 7.0, 7.0, 2).as("b"))
      .as[Long].collect().toSet
    assert(degen == Set(0L))
  }

  test("linearBucketN clamps BOTH boundary cells: below-min values land in bin 0, never bin -1") {
    // driftMonitor's contract: out-of-range values clamp into the boundary
    // cells, so a frozen-edge drift batch below the reference lo must count
    // as bin-0 mass, not vanish into a negative bin
    val df = Seq(-5.0, 0.0, 5.0, 10.0, 25.0).toDF("x")
    val got = df.select(Layout.linearBucketN(col("x"), 0.0, 10.0, 4).as("b"))
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 0L, 2L, 3L, 3L))
  }

  /** Per-file [min,max] of a column across the files written at `path` —
    * exactly the envelope parquet footer stats expose to the scan. */
  private def envelopes(path: String, c: String): Seq[(Double, Double)] = {
    val files = new java.io.File(path).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.toString).toSeq
    files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
      (r.getDouble(0), r.getDouble(1))
    }
  }

  private def overlapping(env: Seq[(Double, Double)], lo: Double,
                          hi: Double): Int =
    env.count { case (mn, mx) => mx >= lo && mn <= hi }

  test("z-ordered files prune on BOTH dimensions; a single-column sort prunes on one") {
    val orders = graft.model.Tables.load(spark, sf(), "orders")
    val nFiles = 8
    val zPath = tmpDir("layout-z")
    Layout.writeZOrdered(orders, zPath, "o_custkey", "o_totalprice", nFiles)

    // the comparison layout every warehouse has: sort by custkey alone
    val sPath = tmpDir("layout-s")
    orders.repartitionByRange(nFiles, col("o_custkey"))
      .sortWithinPartitions(col("o_custkey"))
      .write.parquet(sPath)

    // nothing lost or duplicated by the rewrite
    assert(spark.read.parquet(zPath).count() == orders.count())

    val Seq(ckLo, ckHi, tpLo, tpHi) = {
      val r = orders.agg(
        min(col("o_custkey")).cast("double"), max(col("o_custkey")).cast("double"),
        min(col("o_totalprice")), max(col("o_totalprice"))).head()
      Seq(r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    }
    // a selective band (~12% of the value range) on each dimension — away
    // from the range midpoint, which every top-bit half-envelope straddles
    def band(lo: Double, hi: Double): (Double, Double) = {
      val w = hi - lo
      (lo + 0.10 * w, lo + 0.22 * w)
    }
    val (cb1, cb2) = band(ckLo, ckHi)
    val (tb1, tb2) = band(tpLo, tpHi)

    val zCust = envelopes(zPath, "o_custkey")
    val zPrice = envelopes(zPath, "o_totalprice")
    val sCust = envelopes(sPath, "o_custkey")
    val sPrice = envelopes(sPath, "o_totalprice")
    assert(zCust.size == nFiles && sCust.size == nFiles)

    // single-column layout: perfect on its own column, blind on the other
    assert(overlapping(sCust, cb1, cb2) <= 2)
    assert(overlapping(sPrice, tb1, tb2) == nFiles,
      "custkey-sorted files should all overlap a price band")

    // z-order: prunes meaningfully on BOTH dimensions — each file covers a
    // compact curve segment, so its envelope is a sub-box of the grid
    val zc = overlapping(zCust, cb1, cb2)
    val zp = overlapping(zPrice, tb1, tb2)
    assert(zc < nFiles, s"z layout pruned nothing on custkey: $zCust")
    assert(zp < nFiles, s"z layout pruned nothing on price: $zPrice")
    assert(zc + zp < 2 * nFiles - 2,
      s"expected real two-dimensional pruning, got custkey=$zc price=$zp of $nFiles")
  }

  test("z-ordered TxTable batches skip at the LOG level on both dimensions") {
    import graft.merge.TxTable
    // the full stack: z-order clustering supplies tight per-file
    // envelopes, the commit log records them from the footers, and
    // readSkipping prunes without opening anything — Delta's
    // OPTIMIZE ZORDER + stats skipping as two composing primitives
    val dir = tmpDir("zx-tx")
    val pts = for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong, y.toLong, x * 64L + y)
    val df = spark.createDataFrame(pts).toDF("x", "y", "payload")
    TxTable.replace(spark, dir,
      Layout.zOrdered(df, "x", "y", nParts = 16).drop("zval"))
    val (keptX, totX) = TxTable.skippingStats(spark, dir, "x",
      BigDecimal(0), BigDecimal(7))
    val (keptY, totY) = TxTable.skippingStats(spark, dir, "y",
      BigDecimal(0), BigDecimal(7))
    assert(totX == 16 && totY == 16)
    assert(keptX <= totX / 2, s"x-range kept $keptX of $totX")
    assert(keptY <= totY / 2, s"y-range kept $keptY of $totY")
    // correctness: skipped read + filter ≡ full read + filter
    val got = TxTable.readSkipping(spark, dir, "x",
      BigDecimal(0), BigDecimal(7)).get
      .filter(col("x") <= 7).agg(count(lit(1)), sum("payload")).head()
    val want = TxTable.read(spark, dir).get
      .filter(col("x") <= 7).agg(count(lit(1)), sum("payload")).head()
    assert(got == want && got.getLong(0) == 8 * 64)
  }

  test("partitioned tables z-order WITHIN fragments: layout preserved, both-dimension skipping, rows exact") {
    import graft.merge.TxTable
    // date-partitioned + clustered-within — THE lakehouse layout: the
    // hive fragments keep serving partition pruning, and inside each
    // fragment the z-order gives tight per-file envelopes on both
    // clustered columns
    val dir = tmpDir("zx-part")
    val pts = for (b <- 0 until 2; x <- 0 until 32; y <- 0 until 32)
      yield (b, x.toLong, y.toLong, x * 32L + y)
    TxTable.replace(spark, dir,
      spark.createDataFrame(pts).toDF("b", "x", "y", "payload")
        .repartition(4),
      partitionCols = Seq("b"))
    val before = TxTable.read(spark, dir).get
      .agg(count(lit(1)), sum("payload")).head()
    val (nBefore, nAfter) = Layout.zorderTx(spark, dir, Seq("x", "y"),
      nParts = 8)
    assert(nBefore >= 1 && nAfter >= 2)
    // fragments preserved: every live file still under b=<v>/
    val frags = TxTable.liveEntriesForSql(spark, dir, None).flatMap(_.part)
    assert(frags.nonEmpty && frags.forall(_.startsWith("b=")),
      frags.mkString(", "))
    // rows exactly preserved (the rewrite is a permutation)
    assert(TxTable.read(spark, dir).get
      .agg(count(lit(1)), sum("payload")).head() == before)
    // skipping prunes on BOTH clustered dimensions within the layout
    val (keptX, totX) = TxTable.skippingStats(spark, dir, "x",
      BigDecimal(0), BigDecimal(3))
    val (keptY, totY) = TxTable.skippingStats(spark, dir, "y",
      BigDecimal(0), BigDecimal(3))
    assert(keptX < totX, s"x kept $keptX of $totX")
    assert(keptY < totY, s"y kept $keptY of $totY")
    // and partition pruning still works through the SQL-level entries
    assert(TxTable.read(spark, dir, parts = Some(Set("b=1"))).get
      .count() == 32 * 32)
    // z-ordering ON a partition column is refused loudly
    val e = intercept[IllegalArgumentException] {
      Layout.zorderTx(spark, dir, Seq("b", "x"), nParts = 4)
    }
    assert(e.getMessage.contains("partition column"), e.getMessage)
    // the incremental form clusters new partitioned files the same way
    TxTable.append(spark, dir,
      spark.createDataFrame(for (b <- 0 until 2; x <- 32 until 48)
        yield (b, x.toLong, 1L, 0L)).toDF("b", "x", "y", "payload"),
      partitionCols = Seq("b"))
    val (c1, _) = Layout.zorderIncrementalTx(spark, dir, Seq("x", "y"), 4)
    assert(c1 >= 1)
    assert(TxTable.read(spark, dir).get.count() == 2 * 32 * 32 + 2 * 16)
    assert(TxTable.liveEntriesForSql(spark, dir, None)
      .flatMap(_.part).forall(_.startsWith("b=")))
    // nothing new afterwards: no-op
    assert(Layout.zorderIncrementalTx(spark, dir, Seq("x", "y"), 4) == (0, 0))
  }

  test("incremental z-order: each pass clusters ONLY new files; old cells keep pruning") {
    import graft.merge.TxTable
    val dir = tmpDir("zx-inc")
    def pts(lo: Int, hi: Int) = spark.createDataFrame(
      for (x <- lo until hi; y <- 0 until 32)
        yield (x.toLong, y.toLong, x * 32L + y)).toDF("x", "y", "payload")
    TxTable.append(spark, dir, pts(0, 32).repartition(3))
    // first pass = full clustering of everything live
    val (c1, w1) = Layout.zorderIncrementalTx(spark, dir, Seq("x", "y"),
      nParts = 8)
    assert(c1 == 3 && w1 == 8)
    val afterFirst = TxTable.liveFilePaths(spark, dir).toSet
    // nothing new -> no commit at all
    val head1 = TxTable.headVersion(spark, dir)
    assert(Layout.zorderIncrementalTx(spark, dir, Seq("x", "y"), 8) == ((0, 0)))
    assert(TxTable.headVersion(spark, dir) == head1)
    // new appends: ONLY they cluster; the first pass's files never move
    TxTable.append(spark, dir, pts(32, 64).repartition(2))
    TxTable.append(spark, dir, pts(64, 96).repartition(2))
    val (c2, w2) = Layout.zorderIncrementalTx(spark, dir, Seq("x", "y"),
      nParts = 8)
    assert(c2 == 4 && w2 == 8)
    assert(afterFirst.subsetOf(TxTable.liveFilePaths(spark, dir).toSet))
    // both generations prune on both dimensions (per-file envelopes need
    // no global structure); rows are exactly preserved
    val (keptX, totX) = TxTable.skippingStats(spark, dir, "x",
      BigDecimal(0), BigDecimal(7))
    val (keptY, totY) = TxTable.skippingStats(spark, dir, "y",
      BigDecimal(0), BigDecimal(3))
    assert(totX == 16 && keptX <= 4, s"x kept $keptX of $totX")
    assert(keptY <= totY / 2, s"y kept $keptY of $totY")
    assert(TxTable.read(spark, dir).get.agg(sum("payload")).head.getLong(0) ==
      (for (x <- 0 until 96; y <- 0 until 32) yield x * 32L + y).sum)
    // changing the column list invalidates the state: full recluster
    val (c3, _) = Layout.zorderIncrementalTx(spark, dir, Seq("x"), 4)
    assert(c3 == 16)
    // compaction re-mixes files -> its outputs become candidates again
    TxTable.compactSmallFiles(spark, dir,
      targetBytes = 1L << 30, smallBytes = 1L << 30)
    val (c4, _) = Layout.zorderIncrementalTx(spark, dir, Seq("x"), 4)
    assert(c4 >= 1) // exactly the compaction outputs
    // the clustering commit is maintenance: the change feed never saw it
    assert(TxTable.readChanges(spark, dir,
      TxTable.headVersion(spark, dir).get - 1).isEmpty)
  }

  test("incremental bloom sidecar over a TxTable: refresh scans only new files, probes stay exact through appends and compaction") {
    import graft.merge.TxTable
    import spark.implicits._
    val dir = tmpDir("bloomtx")
    def batch(lo: Int, n: Int) =
      (lo until lo + n).map(i => (s"uid-$i", i)).toDF("uid", "v").repartition(2)
    TxTable.append(spark, dir, batch(0, 200))
    // first refresh indexes both files of batch 1
    assert(Layout.refreshBloomIndexTx(spark, dir, "uid", 200L) == ((2, 0)))
    // converged: nothing to do
    assert(Layout.refreshBloomIndexTx(spark, dir, "uid", 200L) == ((0, 0)))
    // append → only the 2 NEW files are scanned/indexed
    TxTable.append(spark, dir, batch(200, 200))
    assert(Layout.refreshBloomIndexTx(spark, dir, "uid", 200L) == ((2, 0)))

    def lookup(v: String) =
      Layout.readBloomPrunedTx(spark, dir, "uid", v)
        .select("uid", "v").as[(String, Int)].collect().toSet
    assert(lookup("uid-137") == Set(("uid-137", 137)))
    assert(lookup("uid-321") == Set(("uid-321", 321)))
    assert(lookup("uid-99999").isEmpty)

    // INDEX LAG safety: a batch appended after the refresh is always
    // scanned (never a false negative), before any re-refresh
    TxTable.append(spark, dir, batch(400, 50))
    assert(lookup("uid-423") == Set(("uid-423", 423)))

    // compaction rewrites the live set: refresh drops every stale row and
    // indexes the compacted file(s); probes still exact
    TxTable.compactData(spark, dir, targetPartitions = 1)
    val (built, dropped) = Layout.refreshBloomIndexTx(spark, dir, "uid", 500L)
    assert(built >= 1 && dropped == 4, s"built=$built dropped=$dropped")
    assert(lookup("uid-137") == Set(("uid-137", 137)))
    assert(lookup("uid-423") == Set(("uid-423", 423)))
    assert(lookup("uid-99999").isEmpty)
  }

  test("z-ordered rewrite preserves rows exactly (layout is a permutation)") {
    val orders = graft.model.Tables.load(spark, sf(), "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val zPath = tmpDir("layout-perm")
    Layout.writeZOrdered(orders, zPath, "o_custkey", "o_totalprice", 4)
    val back = spark.read.parquet(zPath)
    assert(back.columns.toSet == orders.columns.toSet)
    assert(back.exceptAll(orders).count() == 0 &&
      orders.exceptAll(back).count() == 0)
  }

  test("bloom sidecar index: point lookups read a fraction of the files, never miss a row") {
    // 10k rows in 8 files; uid is high-cardinality and UNCORRELATED with
    // the write layout (hash-spread), so min/max envelopes are useless —
    // the regime the sidecar exists for
    val n = 10000
    val df = (0 until n).map(i => (i.toLong, s"uid-${(i * 2654435761L) % n}"))
      .toDF("id", "uid")
    val dataDir = tmpDir("bloom-data")
    // repartition on id RANGE: every file spans the whole uid space
    df.repartitionByRange(8, col("id")).write.parquet(dataDir)
    val files = new java.io.File(dataDir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files == 8)
    val idxDir = Layout.writeBloomIndex(spark, dataDir, "uid",
      expectedItemsPerFile = 2000L, fpp = 0.01)
    // every present value is found, with far fewer files scanned
    for (probe <- Seq(0, 137, 9999)) {
      val v = s"uid-${(probe * 2654435761L) % n}"
      val pruned = Layout.bloomPrunedFiles(spark, idxDir, v)
      assert(pruned.nonEmpty && pruned.size <= 2,
        s"$v hit ${pruned.size} of $files files") // ~1 + fpp stragglers
      val got = Layout.readBloomPruned(spark, dataDir, idxDir, "uid", v)
        .select("id").as[Long].collect().toSet
      val expect = df.filter(col("uid") === v)
        .select("id").as[Long].collect().toSet
      assert(got == expect && got.nonEmpty)
    }
    // absent value: no false negatives by construction; usually 0 files
    val absent = Layout.readBloomPruned(spark, dataDir, idxDir, "uid",
      "uid-definitely-not-here")
    assert(absent.count() == 0)
  }
}
