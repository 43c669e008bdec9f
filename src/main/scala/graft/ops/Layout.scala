package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional storage layout: Z-order (Morton-curve) clustering.
  *
  * A table range-partitioned and sorted on ONE column prunes scans on that
  * column only; predicates on a second column read everything. Interleaving
  * the bits of two bucketed dimensions into one sort key gives every file a
  * tight min/max envelope in BOTH dimensions, so parquet row-group and
  * file skipping (which Spark applies automatically from pushed filters)
  * works for either predicate — the standard lakehouse layout technique
  * for multi-dimensional workloads.
  *
  * Scale shape: bucketing is a narrow map over two broadcast min/max
  * literals (one O(1) agg to fetch them); the layout write is one range
  * shuffle — exactly what a plain sorted write costs, with strictly more
  * skipping surface. All arithmetic is IEEE double + integer bit ops, so
  * the z-values replay bit-for-bit in any engine (q87's oracle).
  */
object Layout {

  /** Interleave the low `bits` bits of two bucket ids (Morton/Z curve):
    * bit i of `b1` lands at position 2i, bit i of `b2` at 2i+1. */
  def zValue(b1: Column, b2: Column, bits: Int): Column =
    zValueN(Seq(b1, b2), bits)

  /** N-dimensional Morton interleave: bit i of dimension d lands at
    * position i·|dims| + d. |dims|·bits must fit a long (≤ 63). */
  def zValueN(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty && dims.size * bits <= 63,
      s"zValueN: ${dims.size} dims × $bits bits exceeds a long")
    val k = dims.size
    (for (i <- 0 until bits; (d, j) <- dims.zipWithIndex) yield
      shiftleft(shiftright(d, i).bitwiseAND(lit(1L)), i * k + j)
    ).reduce(_ bitwiseOR _)
  }

  /** Min/max-scaled linear bucket of `c` into 2^bits cells. Replayable:
    * all-double IEEE arithmetic ((x−min)·2^bits, then one divide), floor,
    * and out-of-range values clamp symmetrically into the boundary cells
    * (below min → cell 0, the max row → top cell); a degenerate span
    * (min == max) collapses to cell 0. Linear bucketing is deliberate — quantile
    * bucketing spreads skew better but needs a global sort or a sampled
    * (nondeterministic) boundary set; min/max costs one O(1) agg and keeps
    * the layout reproducible. */
  def linearBucket(c: Column, cmin: Double, cmax: Double, bits: Int): Column =
    linearBucketN(c, cmin, cmax, 1L << bits)

  /** [[linearBucket]] for an arbitrary (non-power-of-two) cell count. */
  def linearBucketN(c: Column, cmin: Double, cmax: Double, cells: Long): Column =
    if (!(cmax > cmin)) lit(0L)
    else greatest(lit(0L), least(lit(cells - 1),
      floor((c.cast("double") - lit(cmin)) * lit(cells.toDouble) / lit(cmax - cmin))))

  /** `df` plus a z-value column derived from the ACTUAL min/max of the two
    * dimensions (one tiny agg, collected to four literals — the returned
    * plan is an exchange-free narrow map). */
  def withZValue(df: DataFrame, c1: String, c2: String, bits: Int = 8,
                 as: String = "zval"): DataFrame =
    withZValueN(df, Seq(c1, c2), bits, as)

  /** [[withZValue]] over N dimensions (one tiny agg for all 2N min/max
    * literals; `dims`·bits must fit a long). */
  def withZValueN(df: DataFrame, cols: Seq[String], bits: Int = 8,
                  as: String = "zval"): DataFrame = {
    require(cols.nonEmpty, "z-order needs >= 1 column")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val buckets = cols.zipWithIndex.map { case (c, i) =>
      require(!r.isNullAt(2 * i), s"cannot z-order on all-null column $c")
      linearBucket(col(c), r.getDouble(2 * i), r.getDouble(2 * i + 1), bits)
    }
    df.withColumn(as, zValueN(buckets, bits))
  }

  /** Range-partition + sort `df` along the Z curve of (`c1`, `c2`). Every
    * output partition (→ file on write) covers a compact curve segment, so
    * its min/max envelope is tight in both dimensions. */
  def zOrdered(df: DataFrame, c1: String, c2: String, nParts: Int,
               bits: Int = 8): DataFrame =
    zOrderedN(df, Seq(c1, c2), nParts, bits)

  /** [[zOrdered]] over N dimensions. */
  def zOrderedN(df: DataFrame, cols: Seq[String], nParts: Int,
                bits: Int = 8): DataFrame =
    withZValueN(df, cols, bits)
      .repartitionByRange(nParts, col("zval"))
      .sortWithinPartitions(col("zval"))

  /** Write `df` as `nParts` z-ordered parquet files (the `zval` key is
    * dropped — it is a layout device, not data). */
  def writeZOrdered(df: DataFrame, path: String, c1: String, c2: String,
                    nParts: Int, bits: Int = 8): Unit =
    zOrdered(df, c1, c2, nParts, bits).drop("zval")
      .write.mode("overwrite").parquet(path)

  /** OPTIMIZE ZORDER over a [[graft.merge.TxTable]]: rewrite the live
    * rows into `nParts` z-ordered files along `cols` (any number of
    * dimensions, `cols.size × bits ≤ 63`) in ONE OCC-pinned replace
    * commit — every output file gets a tight min/max envelope in every
    * dimension, so the commit log's ColStat skipping
    * (and parquet's own row-group pruning) serve range predicates on
    * either column from then on. O(table rewrite) by design — the full
    * clustering pass behind Delta's OPTIMIZE ZORDER BY; run it on cold,
    * query-heavy tables where ongoing two-dimensional skipping pays back
    * the rewrite (the incremental maintenance loop stays
    * `compactSmallFiles`).
    *
    * Hive-PARTITIONED tables cluster WITHIN their fragments (the
    * canonical date-partitioned + z-ordered lakehouse layout): the
    * range partitioning keys on (partition cols, zval) so every output
    * task writes one fragment's contiguous zval slice, the staged files
    * land back under their `col=val/` directories (partition pruning
    * untouched), and each file's envelope stays tight on every listed
    * column. Z-ordering ON a partition column is refused — its value is
    * constant inside a fragment, so the bits would be wasted. Concurrent
    * writers surface as the rewrite's OCC conflict, not silent row loss.
    * Returns (filesBefore, filesAfter). */
  def zorderTx(spark: org.apache.spark.sql.SparkSession, dir: String,
               cols: Seq[String], nParts: Int, bits: Int = 8): (Int, Int) = {
    import graft.merge.TxTable
    require(cols.nonEmpty && cols.size * bits <= 63,
      s"zorderTx: ${cols.size} columns × $bits bits must fit a long")
    val head = TxTable.headVersion(spark, dir)
    require(head.isDefined, s"no TxTable at $dir")
    val df = TxTable.read(spark, dir).get
    require(!df.columns.contains("zval"),
      "table already has a 'zval' column — reserved by the z-order rewrite")
    val partCols = livePartCols(spark, dir)
    requireZorderableCols(cols, partCols, dir)
    val before = TxTable.liveFilePaths(spark, dir)
    if (partCols.isEmpty) {
      TxTable.replace(spark, dir,
        zOrderedN(df, cols, nParts, bits).drop("zval"),
        expectedHead = head, dataChange = false)
      (before.size, TxTable.liveFilePaths(spark, dir).size)
    } else
      TxTable.rewriteSet(spark, dir,
        TxTable.liveRelPaths(spark, dir).toSet,
        d => zOrderedWithinN(d, partCols, cols, nParts, bits).drop("zval"),
        expectedHead = head)
  }

  /** Partition column sequence of the live layout (empty when
    * unpartitioned). */
  private def livePartCols(spark: org.apache.spark.sql.SparkSession,
                           dir: String): Seq[String] =
    graft.merge.TxTable.liveEntriesForSql(spark, dir, None)
      .flatMap(_.part).headOption
      .map(_.split('/').toSeq.map(_.takeWhile(_ != '='))).getOrElse(Nil)

  private def requireZorderableCols(cols: Seq[String],
                                    partCols: Seq[String],
                                    dir: String): Unit = {
    val clash = cols.filter(partCols.contains)
    require(clash.isEmpty,
      s"z-order on partition column(s) ${clash.mkString(", ")} of $dir is " +
        "pointless — their value is constant inside a fragment; cluster " +
        "on data columns (partition pruning already serves the layout)")
    // a bucketed table's file-per-bucket invariant and a z-ordered range
    // layout are mutually exclusive clustering disciplines: every write
    // (including this rewrite) re-routes through repartition(N, bucketCol),
    // which would silently destroy the z-clustering it just built
    require(graft.merge.TxTable.bucketSpec(
      org.apache.spark.sql.SparkSession.active, dir).isEmpty,
      s"z-order on $dir refused: the table declares a graft.bucket layout " +
        "(hash-bucketed files) — the two clustering disciplines are " +
        "mutually exclusive; drop the bucket property to z-order instead")
  }

  /** [[zOrderedN]] inside a hive layout: range partition on
    * (partition cols, zval) so each output task holds one fragment's
    * contiguous zval slice — the partitioned write then splits files per
    * fragment with tight per-file envelopes, file count bounded by
    * `nParts` (+1 per fragment boundary straddle). */
  private def zOrderedWithinN(df: DataFrame, partCols: Seq[String],
                              cols: Seq[String], nParts: Int,
                              bits: Int): DataFrame = {
    val keys = partCols.map(col) :+ col("zval")
    withZValueN(df, cols, bits)
      .repartitionByRange(nParts, keys: _*)
      .sortWithinPartitions(keys: _*)
  }

  /** Property recording incremental-clustering progress:
    * `<version>|<col,col,...>` — the commit version of the last
    * clustering pass and the column list it clustered by. Rides IN the
    * clustering commit itself (see [[graft.merge.TxTable.rewriteSet]]),
    * so progress and data can never disagree. */
  private val ZorderStateProp = "graft.zorder.state"

  /** (version of the last incremental pass, its columns) — None when the
    * table never opted into incremental clustering. The health probe
    * [[Maintenance.maintain]] uses to decide whether (and on which
    * columns) to run another pass. */
  def zorderState(spark: org.apache.spark.sql.SparkSession,
                  dir: String): Option[(Long, Seq[String])] =
    graft.merge.TxTable.tableProperties(spark, dir).get(ZorderStateProp)
      .map { s =>
        val i = s.indexOf('|')
        (s.substring(0, i).toLong,
          s.substring(i + 1).split(',').filter(_.nonEmpty).toSeq)
      }

  /** Incremental OPTIMIZE ZORDER — the 100 TB form of [[zorderTx]]:
    * cluster ONLY the live files that were NOT live at the last
    * clustering pass (new appends, compaction outputs, rewrite
    * successors), leaving already-clustered files untouched. Each cycle
    * costs O(new bytes), never O(table); skipping needs no global
    * structure — every output file's min/max envelope is tight on every
    * listed column, so old cells and new cells prune independently.
    * `nParts` bounds THIS cycle's output files. Falls back to clustering
    * everything (≡ a first full pass) when no state exists, the recorded
    * version fell below the log-compaction floor, or `cols` changed.
    * Returns (files clustered, files written); (0, 0) = nothing new,
    * no commit. Partitioned tables cluster within fragments, same as
    * [[zorderTx]]. */
  def zorderIncrementalTx(spark: org.apache.spark.sql.SparkSession,
                          dir: String, cols: Seq[String], nParts: Int,
                          bits: Int = 8): (Int, Int) = {
    import graft.merge.TxTable
    require(cols.nonEmpty && cols.size * bits <= 63,
      s"zorderIncrementalTx: ${cols.size} columns × $bits bits must fit a long")
    val head = TxTable.headVersion(spark, dir)
    require(head.isDefined, s"no TxTable at $dir")
    val partCols = livePartCols(spark, dir)
    requireZorderableCols(cols, partCols, dir)
    val liveNow = TxTable.liveRelPaths(spark, dir)
    val clustered: Set[String] =
      TxTable.tableProperties(spark, dir).get(ZorderStateProp) match {
        case Some(s) =>
          val i = s.indexOf('|')
          val (v, cs) = (s.substring(0, i).toLong, s.substring(i + 1))
          if (cs != cols.mkString(",") ||
              !TxTable.versions(spark, dir).contains(v)) Set.empty
          else TxTable.liveRelPaths(spark, dir, Some(v)).toSet
        case None => Set.empty
      }
    val candidates = liveNow.filterNot(clustered).toSet
    if (candidates.isEmpty) return (0, 0)
    TxTable.rewriteSet(spark, dir, candidates,
      df => {
        require(!df.columns.contains("zval"),
          "table already has a 'zval' column — reserved by the z-order rewrite")
        (if (partCols.isEmpty) zOrderedN(df, cols, nParts, bits)
         else zOrderedWithinN(df, partCols, cols, nParts, bits))
          .drop("zval")
      },
      // the pinned commit lands at head+1 exactly; stamping that version
      // makes THIS commit's live set the next pass's "already clustered"
      props = Map(ZorderStateProp ->
        s"${head.get + 1}|${cols.mkString(",")}"),
      expectedHead = head)
  }

  // ---------------------------------------------------------------------
  // Per-file Bloom sidecar index: file skipping BEYOND min/max. Parquet
  // envelopes (and the z-order layout above) prune RANGE predicates; a
  // point lookup on a high-cardinality column that is NOT the sort key
  // (every file spans the whole id space) prunes nothing and reads the
  // table. The sidecar stores one Bloom filter per data file; a point
  // query probes |files| filters driver-side (tiny — KBs per file) and
  // reads only the files that might contain the value. This is the
  // Delta/Iceberg bloom-index technique as a plain parquet sidecar.
  // ---------------------------------------------------------------------

  /** Build (file, bloom) rows for `dataDir`'s parquet files over column
    * `c`: one distributed pass, grouped by `_metadata.file_path` — the
    * shuffle carries one filter per (file, partition). Size with
    * `expectedItemsPerFile` ≥ the max rows per file (overestimating only
    * wastes bits). */
  def buildBloomIndex(spark: org.apache.spark.sql.SparkSession,
      dataDir: String, c: String, expectedItemsPerFile: Long,
      fpp: Double = 0.01): DataFrame =
    spark.read.parquet(dataDir)
      .select(col("_metadata.file_path").as("file"), col(c).cast("string").as("__v"))
      .groupBy(col("file"))
      .agg(graft.functions.SketchAggs.bloomAgg(col("__v"),
        expectedItemsPerFile, fpp).as("bloom"))

  /** Write the sidecar next to the data (`<dataDir>/_bloom_<c>`). */
  def writeBloomIndex(spark: org.apache.spark.sql.SparkSession,
      dataDir: String, c: String, expectedItemsPerFile: Long,
      fpp: Double = 0.01): String = {
    val out = s"$dataDir/_bloom_$c"
    buildBloomIndex(spark, dataDir, c, expectedItemsPerFile, fpp)
      .coalesce(1).write.mode("overwrite").parquet(out)
    out
  }

  /** Files that MIGHT contain `value` (no false negatives): probe every
    * sidecar filter driver-side — a bounded collect of |files| rows, the
    * whole point of the index (the 100 TB pass built it; the probe is
    * O(files), not O(rows)). */
  def bloomPrunedFiles(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, value: String): Seq[String] =
    spark.read.parquet(indexDir).collect().toSeq
      .filter(r => graft.functions.SketchAggs.bloomMightContain(
        r.getAs[Array[Byte]]("bloom"), value))
      .map(_.getAs[String]("file"))

  /** Point-lookup read through the sidecar: scan only the surviving
    * files, then apply the exact predicate (Bloom false positives never
    * reach the result — the filter re-checks). Falls back to an
    * empty frame when no file can match. */
  def readBloomPruned(spark: org.apache.spark.sql.SparkSession,
      dataDir: String, indexDir: String, c: String,
      value: String): DataFrame = {
    val files = bloomPrunedFiles(spark, indexDir, value)
    val base = spark.read.parquet(dataDir)
    if (files.isEmpty) base.limit(0)
    else spark.read.schema(base.schema).parquet(files: _*)
      .filter(col(c).cast("string") === value)
  }

  // ---------------------------------------------------------------------
  // Incremental sidecar maintenance over a TxTable: the index stays keyed
  // by the log's live file set, so a refresh scans ONLY files that joined
  // the set since the last refresh and drops rows for files that left it —
  // O(changed files) per maintenance cycle where a rebuild is O(table).
  // At a 30 s append cadence against a 100 TB table that is the entire
  // difference between an index you can afford and one you can't.
  // ---------------------------------------------------------------------

  /** Bring the Bloom sidecar for `tableDir` (a [[graft.merge.TxTable]])
    * up to date with its live file set. Returns (files indexed this
    * refresh, stale rows dropped). The sidecar lives at
    * `<tableDir>/_bloom_<c>` and is derivative state: it is rewritten
    * with a plain overwrite (crash → next refresh rebuilds the delta;
    * probes meanwhile degrade to at-worst-stale pruning, and
    * [[readBloomPrunedTx]]'s exact re-check keeps results correct). */
  def refreshBloomIndexTx(spark: org.apache.spark.sql.SparkSession,
      tableDir: String, c: String, expectedItemsPerFile: Long,
      fpp: Double = 0.01): (Int, Int) = {
    import graft.merge.TxTable
    val live = TxTable.liveFilePaths(spark, tableDir).toSet
    val idxDir = bloomIndexDirTx(tableDir, c)
    val fs = new org.apache.hadoop.fs.Path(idxDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old =
      if (fs.exists(new org.apache.hadoop.fs.Path(idxDir)))
        Some(spark.read.parquet(idxDir))
      else None
    val indexed: Set[String] = old match {
      case None    => Set.empty
      case Some(d) => d.select("file").collect().map(_.getString(0)).toSet
    }
    val missing = (live -- indexed).toSeq.sorted
    val stale = indexed -- live
    if (missing.isEmpty && stale.isEmpty) return (0, 0)
    val fresh =
      if (missing.isEmpty) None
      else Some(TxTable.readFiles(spark, tableDir, missing.toSet,
          filePathCol = Some("file")).get
        .select(col("file"), col(c).cast("string").as("__v"))
        .groupBy(col("file"))
        .agg(graft.functions.SketchAggs.bloomAgg(col("__v"),
          expectedItemsPerFile, fpp).as("bloom")))
    val keptOld = old.map(_.filter(col("file").isin(live.toSeq: _*)))
    val next = (keptOld, fresh) match {
      case (Some(a), Some(b)) => a.unionByName(b)
      case (Some(a), None)    => a
      case (None, Some(b))    => b
      case (None, None)       => return (0, 0)
    }
    // the index must be fully materialized BEFORE the overwrite deletes
    // its own input (keptOld reads idxDir)
    val pinned = next.coalesce(1).localCheckpoint()
    pinned.write.mode("overwrite").parquet(idxDir)
    (missing.size, stale.size)
  }

  /** Sidecar location for [[refreshBloomIndexTx]]. Lives OUTSIDE the
    * table's `data/` tree, so vacuum/compaction never mistake it for a
    * staging batch. */
  def bloomIndexDirTx(tableDir: String, c: String): String =
    s"$tableDir/_bloom_$c"

  /** Columns with a Bloom sidecar on `tableDir` (empty when the table
    * never opted in) — [[Maintenance.maintain]]'s refresh probe. */
  def bloomIndexedColumns(spark: org.apache.spark.sql.SparkSession,
                          tableDir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(tableDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("_bloom_"))
      .map(_.getPath.getName.stripPrefix("_bloom_")).sorted
  }

  /** Point lookup on a TxTable through its incrementally-maintained
    * sidecar: probe O(files) filters driver-side, plan ONLY surviving
    * live files (partition columns re-materialize as in TxTable.read),
    * re-check exactly. Files newer than the last refresh are not yet in
    * the index — they are always scanned (no false negatives from
    * index lag). */
  def readBloomPrunedTx(spark: org.apache.spark.sql.SparkSession,
      tableDir: String, c: String, value: String): DataFrame = {
    import graft.merge.TxTable
    val idxDir = bloomIndexDirTx(tableDir, c)
    val live = TxTable.liveFilePaths(spark, tableDir).toSet
    val rows = spark.read.parquet(idxDir).collect().toSeq
    val indexed = rows.map(_.getAs[String]("file")).toSet
    val hits = rows.filter(r => graft.functions.SketchAggs.bloomMightContain(
      r.getAs[Array[Byte]]("bloom"), value)).map(_.getAs[String]("file"))
    val unindexed = live -- indexed // index lag: must be scanned
    val targets = (hits.toSet ++ unindexed) & live
    TxTable.readFiles(spark, tableDir, targets) match {
      case None => TxTable.read(spark, tableDir).get.limit(0)
      case Some(df) => df.filter(col(c).cast("string") === value)
    }
  }
}
