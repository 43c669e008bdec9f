package graft.sql

import java.util.Collections

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.merge.TxTable

/** Maintenance procedures for `CALL graft.system.<proc>(...)` — the SQL
  * face of the lakehouse's operational loop (the affordances Delta ships
  * as `VACUUM`/`OPTIMIZE` statements, expressed through Spark 4's
  * standard `ProcedureCatalog` binding so no parser extension is needed):
  *
  *  - `vacuum(table, retain_versions, min_orphan_age_ms, dry_run)` —
  *    reclaim (or, dry_run => true, just REPORT) superseded batches and
  *    rewrite-retired files; one result row per reclaimable item plus a
  *    byte-total summary row;
  *  - `compact_small_files(table, target_bytes, small_bytes)` — OPTIMIZE
  *    bin packing; returns the packed/written/untouched counts;
  *  - `compact_log(table, retain_versions)` — checkpoint + prune the
  *    commit log;
  *  - `zorder(table, cols, n_files)` — OPTIMIZE ZORDER: one OCC-pinned
  *    full rewrite into files z-ordered along the comma-separated
  *    columns, so the log's ColStat skipping prunes range predicates on
  *    EVERY listed column;
  *  - `refresh_bloom(table, col, expected_items_per_file, fpp)` —
  *    incrementally refresh the per-file Bloom sidecar for `col`
  *    (O(changed files)); once built, the SQL scan's [[GraftFileIndex]]
  *    prunes equality/IN point lookups on that column through it — the
  *    unsorted-high-cardinality shape min/max envelopes cannot prune;
  *  - `purge_dvs(table, min_deleted_fraction)` — fold deletion vectors
  *    back into clean files (the maintenance half of
  *    `graft.deletes.mode = dv`): files at/above the deleted fraction are
  *    rewritten without their deleted positions, restoring the plain
  *    vectorized scan; row-preserving, change-feed silent;
  *  - `restore(table, version)` — metadata-only rollback.
  *
  * `table` is the catalog-relative name (`db.t`). Every procedure
  * delegates to the [[TxTable]] maintenance API — same floors, same OCC,
  * same loud fences. */
object GraftProcedures {

  private def spark: SparkSession = SparkSession.active

  private val procs: Map[String, GraftCatalog => BoundUnbound] = Map(
    "vacuum" -> (cat => new BoundUnbound("vacuum",
      Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("retain_versions", IntegerType)
          .defaultValue("1").build(),
        ProcedureParameter.in("min_orphan_age_ms", LongType)
          .defaultValue("0").build(),
        ProcedureParameter.in("dry_run", BooleanType)
          .defaultValue("false").build()),
      StructType(Seq(StructField("kind", StringType),
        StructField("item", StringType))),
      { in =>
        val dir = tableDir(cat, in.getUTF8String(0).toString)
        val r = TxTable.vacuumReport(spark, dir,
          retainVersions = in.getInt(1), minOrphanAgeMs = in.getLong(2),
          dryRun = in.getBoolean(3))
        (r.batchDirs.map(p => Seq("batch_dir", p)) ++
          r.files.map(p => Seq("file", p)) :+
          Seq(if (in.getBoolean(3)) "reclaimable" else "reclaimed",
            s"${r.bytes} bytes" + r.newFloor.fold("")(f => s", floor -> $f")))
          .map(strRow)
      })),
    "compact_small_files" -> (cat => new BoundUnbound("compact_small_files",
      Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("target_bytes", LongType)
          .defaultValue((128L << 20).toString).build(),
        ProcedureParameter.in("small_bytes", LongType)
          .defaultValue((64L << 20).toString).build()),
      StructType(Seq(StructField("files_packed", IntegerType),
        StructField("files_written", IntegerType),
        StructField("files_untouched", IntegerType))),
      { in =>
        val dir = tableDir(cat, in.getUTF8String(0).toString)
        val s = TxTable.compactSmallFiles(spark, dir,
          targetBytes = in.getLong(1), smallBytes = in.getLong(2))
        Seq(InternalRow(s.filesPacked, s.filesWritten, s.filesUntouched))
      })),
    "compact_log" -> (cat => new BoundUnbound("compact_log",
      Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("retain_versions", IntegerType)
          .defaultValue("0").build()),
      StructType(Seq(StructField("status", StringType))),
      { in =>
        val dir = tableDir(cat, in.getUTF8String(0).toString)
        TxTable.compactLog(spark, dir, retainVersions = in.getInt(1))
        Seq(strRow(Seq("log compacted")))
      })),
    "zorder" -> (cat => new BoundUnbound("zorder",
      Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("cols", StringType).build(),
        ProcedureParameter.in("n_files", IntegerType)
          .defaultValue("16").build(),
        ProcedureParameter.in("incremental", BooleanType)
          .defaultValue("false").build()),
      StructType(Seq(StructField("files_before", IntegerType),
        StructField("files_after", IntegerType))),
      { in =>
        // incremental => cluster only files NOT live at the last pass
        // (O(new bytes) per cycle; first pass ≡ full); false => the full
        // one-commit table rewrite
        val dir = tableDir(cat, in.getUTF8String(0).toString)
        val cols = in.getUTF8String(1).toString
          .split(',').map(_.trim).filter(_.nonEmpty).toSeq
        val (before, after) =
          if (in.getBoolean(3))
            graft.ops.Layout.zorderIncrementalTx(spark, dir, cols,
              nParts = in.getInt(2))
          else graft.ops.Layout.zorderTx(spark, dir, cols,
            nParts = in.getInt(2))
        Seq(InternalRow(before, after))
      })),
    "refresh_bloom" -> (cat => new BoundUnbound("refresh_bloom",
      Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("col", StringType).build(),
        ProcedureParameter.in("expected_items_per_file", LongType)
          .defaultValue("1000000").build(),
        ProcedureParameter.in("fpp", DoubleType)
          .defaultValue("0.01").build()),
      StructType(Seq(StructField("files_indexed", IntegerType),
        StructField("stale_dropped", IntegerType))),
      { in =>
        // incremental: scans only files that joined the live set since
        // the last refresh; the SQL scan's GraftFileIndex then prunes
        // point lookups on the column through the sidecar
        val dir = tableDir(cat, in.getUTF8String(0).toString)
        val (indexed, dropped) = graft.ops.Layout.refreshBloomIndexTx(
          spark, dir, in.getUTF8String(1).toString,
          expectedItemsPerFile = in.getLong(2), fpp = in.getDouble(3))
        Seq(InternalRow(indexed, dropped))
      })),
    "purge_dvs" -> (cat => new BoundUnbound("purge_dvs",
      Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("min_deleted_fraction", DoubleType)
          .defaultValue("0.0").build()),
      StructType(Seq(StructField("files_purged", IntegerType),
        StructField("files_written", IntegerType),
        StructField("files_untouched", IntegerType))),
      { in =>
        // fold deletion vectors back into clean files (row-preserving,
        // change-feed silent) — the maintenance half of `graft.deletes.
        // mode = dv`; superseded sidecars reclaim via vacuum
        val dir = tableDir(cat, in.getUTF8String(0).toString)
        val s = TxTable.purgeDvs(spark, dir,
          minDeletedFraction = in.getDouble(1))
        Seq(InternalRow(s.filesPacked, s.filesWritten, s.filesUntouched))
      })),
    "maintain" -> (cat => new BoundUnbound("maintain",
      Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("small_bytes", LongType)
          .defaultValue((64L << 20).toString).build(),
        ProcedureParameter.in("min_small_files", IntegerType)
          .defaultValue("8").build(),
        ProcedureParameter.in("dv_min_deleted_fraction", DoubleType)
          .defaultValue("0.2").build(),
        ProcedureParameter.in("min_log_commits", IntegerType)
          .defaultValue("32").build(),
        ProcedureParameter.in("min_vacuum_items", IntegerType)
          .defaultValue("16").build(),
        ProcedureParameter.in("retain_versions", IntegerType)
          .defaultValue("3").build()),
      StructType(Seq(StructField("action", StringType),
        StructField("detail", StringType))),
      { in =>
        // the self-driving policy loop: reads table health from the log
        // (small files, DV fractions, unclustered files, log length,
        // debris) and runs ONLY the actions whose thresholds trip — see
        // graft.ops.Maintenance for the decision order
        val dir = tableDir(cat, in.getUTF8String(0).toString)
        graft.ops.Maintenance.maintain(spark, dir,
          graft.ops.MaintainPolicy(
            smallBytes = in.getLong(1),
            minSmallFiles = in.getInt(2),
            dvMinDeletedFraction = in.getDouble(3),
            minLogCommits = in.getInt(4),
            minVacuumItems = in.getInt(5),
            retainVersions = in.getInt(6)))
          .map { case (a, d) => strRow(Seq(a, d)) }
      })),
    "analyze" -> (cat => new BoundUnbound("analyze",
      Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("cols", StringType)
          .defaultValue("''").build(),
        ProcedureParameter.in("all_columns", BooleanType)
          .defaultValue("false").build()),
      StructType(Seq(StructField("row_count", LongType),
        StructField("size_bytes", LongType),
        StructField("columns_analyzed", IntegerType))),
      { in =>
        // row/size stats: O(files) footer metadata, DV-exact; column
        // stats (cols => 'a,b' or all_columns => true): one aggregate
        // scan. Persisted as a property commit — checkpoints carry it,
        // so compactLog keeps the stats; the SQL scan rule attaches
        // them to plan estimation (GraftSqlRules.swapToV1).
        val dir = tableDir(cat, in.getUTF8String(0).toString)
        val (rows, bytes) = TxTable.analyze(spark, dir)
        val cols =
          if (in.getBoolean(2))
            TxTable.read(spark, dir).map(_.columns.toSeq).getOrElse(Nil)
          else in.getUTF8String(1).toString
            .split(',').map(_.trim).filter(_.nonEmpty).toSeq
        if (cols.nonEmpty) TxTable.analyzeColumns(spark, dir, cols)
        Seq(InternalRow(rows, bytes, cols.size))
      })),
    "restore" -> (cat => new BoundUnbound("restore",
      Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("version", LongType).build()),
      StructType(Seq(StructField("status", StringType))),
      { in =>
        val dir = tableDir(cat, in.getUTF8String(0).toString)
        val v = in.getLong(1)
        TxTable.restore(spark, dir, v)
        Seq(strRow(Seq(s"restored to version $v")))
      })),
    // CONVERT TO GRAFT: in-place adoption of an existing parquet/hive
    // directory already under the catalog root — one metadata commit, no
    // rewrite ([[TxTable.convertInPlace]]). The target must NOT already
    // be a graft table (no exists() gate here, unlike every other proc).
    "convert" -> (cat => new BoundUnbound("convert",
      Array(ProcedureParameter.in("table", StringType).build()),
      StructType(Seq(StructField("files_adopted", IntegerType))),
      { in =>
        val name = in.getUTF8String(0).toString
        val parts = name.split('.')
        val dir = cat.tableDir(Identifier.of(parts.init, parts.last))
        Seq(InternalRow(TxTable.convertInPlace(spark, dir)))
      })),
    // SHALLOW CLONE: a new table referencing the source's live files by
    // absolute path — zero data copied ([[TxTable.cloneShallow]]).
    "clone" -> (cat => new BoundUnbound("clone",
      Array(
        ProcedureParameter.in("source", StringType).build(),
        ProcedureParameter.in("target", StringType).build()),
      StructType(Seq(StructField("files_referenced", IntegerType))),
      { in =>
        val src = tableDir(cat, in.getUTF8String(0).toString)
        val tgtName = in.getUTF8String(1).toString
        val parts = tgtName.split('.')
        val dst = cat.tableDir(Identifier.of(parts.init, parts.last))
        Seq(InternalRow(TxTable.cloneShallow(spark, src, dst)))
      })),
    // Write-audit-publish refs: a branch is an isolated shallow clone
    // under the table's _graft_branches/, addressed from SQL as
    // graft.db.`t@branch`; publish fast-forwards main (zero copies).
    "create_branch" -> (cat => new BoundUnbound("create_branch",
      Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("branch", StringType).build()),
      StructType(Seq(StructField("base_version", LongType))),
      { in =>
        val dir = tableDir(cat, in.getUTF8String(0).toString)
        Seq(InternalRow(TxTable.createBranch(spark, dir,
          in.getUTF8String(1).toString)))
      })),
    "publish_branch" -> (cat => new BoundUnbound("publish_branch",
      Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("branch", StringType).build()),
      StructType(Seq(StructField("commits_published", IntegerType))),
      { in =>
        val dir = tableDir(cat, in.getUTF8String(0).toString)
        Seq(InternalRow(TxTable.publishBranch(spark, dir,
          in.getUTF8String(1).toString)))
      })),
    "drop_branch" -> (cat => new BoundUnbound("drop_branch",
      Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("branch", StringType).build()),
      StructType(Seq(StructField("dropped", BooleanType))),
      { in =>
        val dir = tableDir(cat, in.getUTF8String(0).toString)
        Seq(InternalRow(TxTable.dropBranch(spark, dir,
          in.getUTF8String(1).toString)))
      })),
    // Tag refs: immutable named versions; read via VERSION AS OF 'name'
    "create_tag" -> (cat => new BoundUnbound("create_tag",
      Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("tag", StringType).build(),
        ProcedureParameter.in("version", LongType)
          .defaultValue("-1").build()),
      StructType(Seq(StructField("version", LongType))),
      { in =>
        val dir = tableDir(cat, in.getUTF8String(0).toString)
        val v = in.getLong(2)
        Seq(InternalRow(TxTable.createTag(spark, dir,
          in.getUTF8String(1).toString, if (v < 0) None else Some(v))))
      })),
    "drop_tag" -> (cat => new BoundUnbound("drop_tag",
      Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("tag", StringType).build()),
      StructType(Seq(StructField("dropped", BooleanType))),
      { in =>
        val dir = tableDir(cat, in.getUTF8String(0).toString)
        Seq(InternalRow(TxTable.dropTag(spark, dir,
          in.getUTF8String(1).toString)))
      })))

  private def strRow(ss: Seq[String]): InternalRow =
    InternalRow.fromSeq(ss.map(UTF8String.fromString))

  private def tableDir(cat: GraftCatalog, name: String): String = {
    val parts = name.split('.')
    val dir = cat.tableDir(Identifier.of(parts.init, parts.last))
    require(TxTable.exists(spark, dir),
      s"no TxTable at $name (resolved to $dir)")
    dir
  }

  def list(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      procs.keys.toArray.sorted.map(Identifier.of(Array("system"), _))
    else Array.empty

  def load(cat: GraftCatalog, ident: Identifier): UnboundProcedure = {
    require(ident.namespace().sameElements(Array("system")),
      s"unknown procedure namespace ${ident.namespace().mkString(".")} " +
        "(procedures live under `system`)")
    procs.get(ident.name()) match {
      case Some(f) => f(cat)
      case None => throw new IllegalArgumentException(
        s"unknown procedure ${ident.name()} " +
          s"(available: ${procs.keys.toSeq.sorted.mkString(", ")})")
    }
  }

  /** One class serving both halves of the procedure contract: parameters
    * are static, so bind() is the identity. */
  private final class BoundUnbound(procName: String,
                                   params: Array[ProcedureParameter],
                                   outSchema: StructType,
                                   body: InternalRow => Seq[InternalRow])
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = s"graft $procName"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val resultRows = body(input).toArray
      Collections.singletonList[Scan](new LocalScan {
        override def rows(): Array[InternalRow] = resultRows
        override def readSchema(): StructType = outSchema
        override def description(): String = s"graft $procName result"
      }).iterator()
    }
  }
}
