package graft.merge

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The four merge/load modes of the reference (SURVEY §2.10 M1-M4), as
  * join-based plans over a parquet-directory target.
  *
  * The reference implements these as `INSERT … ON CONFLICT` statements on
  * PostgreSQL (load.py:10-187). Spark has no native parquet upsert, so:
  *  - M3/M4 (insert-if-absent / dedup append) are an anti-join against the
  *    sink keys followed by an APPEND — only new files are written, nothing
  *    is rewritten; at 100 TB this is the cheap idempotent path.
  *  - M1/M2 (partial upsert / SCD2 close-out) rewrite via a full-outer merge
  *    join and an atomic directory swap. This is exactly what a Delta MERGE
  *    does minus the transaction log; on a real deployment the target would
  *    be Delta/Iceberg and these become `whenMatched.updateExpr` merges with
  *    partition pruning. The join itself is key-partitioned and never
  *    collects to the driver.
  *
  * All four modes are idempotent: re-applying a batch (the 90 s overlap
  * re-extraction, SURVEY §2.11 T3) converges to the same state —
  * at-least-once extract + idempotent sink ⇒ effectively-once.
  */
object MergeSink {

  /** Read current sink contents, or None before first write. A directory
    * holding only a _SUCCESS marker (a bootstrapped PARTITIONED table has no
    * data files until the first append) also counts as absent. */
  def readTarget(spark: SparkSession, dir: String): Option[DataFrame] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).nonEmpty)
      try Some(spark.read.parquet(dir))
      catch {
        // empty partitioned dir: no footers to infer from
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") => None
      }
    else None
  }

  /** Latest row per key within a batch (ties broken by orderCols desc).
    * The reference gets within-batch uniqueness from source PKs; we make it
    * explicit so overlap re-extraction can never double-apply. */
  def latestPerKey(batch: DataFrame, keys: Seq[String], orderCols: Seq[String]): DataFrame =
    if (orderCols.isEmpty) batch.dropDuplicates(keys)
    else {
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy(orderCols.map(c => col(c).desc_nulls_last): _*)
      batch.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }

  /** M1 — upsert with partial update (load.py:10-47, 86-114): insert new
    * rows; on key match overwrite ONLY `mutableCols` (with the batch value,
    * nulls included, like `SET c = EXCLUDED.c`); all other columns keep
    * their first-seen values. */
  def upsertPartial(spark: SparkSession, dir: String, batch: DataFrame,
                    keys: Seq[String], mutableCols: Seq[String],
                    orderCols: Seq[String] = Nil): Unit = {
    val b = latestPerKey(batch, keys, orderCols)
    readTarget(spark, dir) match {
      case None => writeReplace(spark, dir, b)
      case Some(existing) =>
        val cols = existing.columns.toSeq
        val e = existing.withColumn("__e", lit(true))
        val n = b.withColumn("__b", lit(true))
        val joined = e.alias("e").join(n.alias("n"),
          keys.map(k => col(s"e.$k") <=> col(s"n.$k")).reduce(_ && _), "full_outer")
        val merged = joined.select(cols.map { c =>
          val fromE = col(s"e.$c"); val fromN = col(s"n.$c")
          val out =
            if (keys.contains(c)) coalesce(fromE, fromN)
            else if (mutableCols.contains(c))
              when(col("n.__b").isNotNull, fromN).otherwise(fromE)
            else when(col("e.__e").isNotNull, fromE).otherwise(fromN)
          out.as(c)
        }: _*)
        writeReplace(spark, dir, merged)
    }
  }

  /** M2 — versioned upsert, SCD2-flavored (load.py:50-83, 139-166): rows are
    * immutable versions keyed by `key` (source_id); a re-delivered version
    * refreshes only the close-out/validation columns (`mutableCols`,
    * typically version_ended_at + is_current_version + validation fields).
    * Mechanically M1; the ≤1-current-per-entity invariant is the source's
    * end_at discipline, checkable via [[scd2Violations]]. */
  def scd2(spark: SparkSession, dir: String, batch: DataFrame,
           key: String, mutableCols: Seq[String],
           orderCols: Seq[String] = Nil): Unit =
    upsertPartial(spark, dir, batch, Seq(key), mutableCols, orderCols)

  /** Entities with more than one current version (SCD2 invariant breach). */
  def scd2Violations(target: DataFrame, entityKeys: Seq[String],
                     isCurrentCol: String): DataFrame =
    target.filter(col(isCurrentCol))
      .groupBy(entityKeys.map(col): _*)
      .agg(count(lit(1)).as("n_current"))
      .filter(col("n_current") > 1)

  /** M3 — insert-if-absent (load.py:117-136, `ON CONFLICT DO NOTHING`):
    * append only rows whose key is not already in the sink. Pure append —
    * no rewrite, safe under overlap replay. */
  def insertIfAbsent(spark: SparkSession, dir: String, batch: DataFrame,
                     keys: Seq[String], partitionCols: Seq[String] = Nil): Unit = {
    def write(df: DataFrame): Unit = {
      val w = df.write.mode("append")
      // date-partitioned layout (the reference's index access paths become
      // partition pruning, SURVEY §4): new files land only in the partitions
      // the batch touches
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(dir)
    }
    val b = batch.dropDuplicates(keys)
    readTarget(spark, dir) match {
      case None => write(b)
      case Some(existing) =>
        write(b.join(existing.select(keys.map(col): _*).dropDuplicates(keys),
            keys, "left_anti")
          .select(existing.columns.map(col).toSeq: _*)) // stable column order
    }
  }

  /** M4 — event-log append with unique-key dedup (load.py:169-187): same as
    * M3 on a synthesized source_key. */
  def appendDedup(spark: SparkSession, dir: String, batch: DataFrame,
                  key: String, partitionCols: Seq[String] = Nil): Unit =
    insertIfAbsent(spark, dir, batch, Seq(key), partitionCols)

  /** Materialize `df` into `dir` via tmp-dir + swap, so a reader never sees
    * a half-written table and the plan can read the old contents. Local-FS
    * commit protocol; a cluster deployment swaps this for Delta's log. */
  def writeReplace(spark: SparkSession, dir: String, df: DataFrame,
                   partitionCols: Seq[String] = Nil): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir + "__tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmp.toString)
    if (fs.exists(p)) fs.delete(p, true)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"merge commit failed: rename $tmp -> $p")
  }

  /** Number of parquet data files under the table (recursively). */
  def dataFileCount(spark: SparkSession, dir: String): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else {
      val it = fs.listFiles(p, true)
      var n = 0
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
  }

  /** Small-file compaction: append-mode sinks (M3/M4) accrete one file set
    * per micro-batch — at a 30 s cadence that is ~2.9k file sets/day, which
    * degrades scan planning and row-group pruning long before storage cost
    * matters. When the file count passes `maxFiles`, rewrite the table into
    * `targetPartitions` files per partition (atomic swap). Run it from a
    * maintenance cycle, not the hot path. */
  def compactIfNeeded(spark: SparkSession, dir: String, maxFiles: Int,
                      targetPartitions: Int,
                      partitionCols: Seq[String] = Nil): Boolean = {
    if (dataFileCount(spark, dir) <= maxFiles) false
    else readTarget(spark, dir) match {
      case None => false
      case Some(df) =>
        val compacted =
          if (partitionCols.nonEmpty)
            df.repartition(targetPartitions, partitionCols.map(col): _*)
          else df.repartition(targetPartitions)
        // localCheckpoint: the rewrite reads the dir it will replace
        writeReplace(spark, dir, compacted.localCheckpoint(), partitionCols)
        true
    }
  }
}
