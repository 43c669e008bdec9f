package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.unsafe.types.UTF8String

import graft.merge.TxTable

/** Table-valued functions for ad-hoc lakehouse access from SQL text —
  * the operational affordances a Delta user gets from `DESCRIBE HISTORY`
  * and `table_changes(...)`, usable without mounting a catalog:
  *
  *  - `graft_table('<dir>' [, version | 'timestamp'])` — snapshot
  *    (optionally time-travelled, by commit version or timestamp text)
  *    read of a TxTable path, planned through [[GraftFileIndex]]
  *    (partition pruning + stats skipping intact);
  *  - `graft_changes('<dir>', after [, until])` — the CDC feed between
  *    versions ([[TxTable.readChanges]]), `_change_type` /
  *    `_commit_version` tagged; empty result when nothing changed;
  *  - `graft_history('<dir>')` — one audit row per advertised commit;
  *  - `graft_files('<dir>' [, version])` — the live file layout (path,
  *    partition fragment, bytes, per-column min/max envelopes): the
  *    observability feed behind compaction / z-order decisions, the
  *    DESCRIBE DETAIL counterpart. Driver-side O(live files), same
  *    contract as the planner's own listing.
  *
  * Arguments must be literals (the plan is built at resolution time).
  * Registered by [[graft.GraftExtensions]]. */
object GraftTableFunctions {

  private def spark: SparkSession = SparkSession.active

  private def arg(e: Expression, fn: String, what: String): Any = {
    require(e.foldable, s"$fn: $what must be a literal, got ${e.sql}")
    e.eval()
  }

  private def strArg(e: Expression, fn: String, what: String): String =
    arg(e, fn, what) match {
      case s: UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"$fn: $what must be a string literal, got $other")
    }

  private def longArg(e: Expression, fn: String, what: String): Long =
    arg(e, fn, what) match {
      case i: Int  => i.toLong
      case l: Long => l
      case other => throw new IllegalArgumentException(
        s"$fn: $what must be an integer literal, got $other")
    }

  val all: Seq[(String, Seq[Expression] => LogicalPlan)] = Seq(
    "graft_table" -> { args =>
      require(args.size == 1 || args.size == 2,
        "graft_table(dir [, version | 'timestamp'])")
      val dir = strArg(args.head, "graft_table", "dir")
      require(TxTable.exists(spark, dir), s"no TxTable commit log at $dir")
      // integer second arg = commit version; string = timestamp text
      // (the reader's timestampAsOf grammar), resolved to the newest
      // commit at or before the instant
      val asOf = args.lift(1).map { e =>
        arg(e, "graft_table", "version/timestamp") match {
          case i: Int  => i.toLong
          case l: Long => l
          case s: UTF8String =>
            val t = s.toString.trim
            val micros =
              if (t.matches("-?\\d+")) t.toLong * 1000L // epoch millis
              else java.sql.Timestamp.valueOf(t).getTime * 1000L
            TxTable.versionAtTimestampMicros(spark, dir, micros).getOrElse(
              throw new IllegalArgumentException(
                s"graft_table: '$t' predates every commit of $dir"))
          case other => throw new IllegalArgumentException(
            "graft_table: second argument must be an integer version or " +
              s"a timestamp string literal, got $other")
        }
      }
      PlanBridge.analyzed(GraftSql.dataFrame(spark, dir, asOf))
    },
    "graft_changes" -> { args =>
      require(args.size == 2 || args.size == 3,
        "graft_changes(dir, afterVersion [, untilVersion])")
      val dir = strArg(args.head, "graft_changes", "dir")
      val after = longArg(args(1), "graft_changes", "afterVersion")
      val until = args.lift(2).map(longArg(_, "graft_changes", "untilVersion"))
      val df = TxTable.readChanges(spark, dir, after, until).getOrElse(
        spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          GraftStreamSource.schemaFor(spark, dir, cdc = true)))
      PlanBridge.analyzed(df)
    },
    "graft_history" -> { args =>
      require(args.size == 1, "graft_history(dir)")
      PlanBridge.analyzed(
        TxTable.history(spark, strArg(args.head, "graft_history", "dir")))
    },
    "graft_files" -> { args =>
      require(args.size == 1 || args.size == 2,
        "graft_files(dir [, version])")
      val dir = strArg(args.head, "graft_files", "dir")
      require(TxTable.exists(spark, dir), s"no TxTable commit log at $dir")
      val asOf = args.lift(1).map(longArg(_, "graft_files", "version"))
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val rows = TxTable.liveEntriesForSql(spark, dir, asOf).map { e =>
        val len = fs.getFileStatus(
          new org.apache.hadoop.fs.Path(p, e.path)).getLen
        (e.path, e.part.orNull, len,
          e.stats.map { case (c, cs) => c -> cs.min },
          e.stats.map { case (c, cs) => c -> cs.max },
          e.dv.map(_.dir).orNull, e.dv.map(_.deleted).getOrElse(0L))
      }
      val sq = spark.sqlContext; import sq.implicits._
      PlanBridge.analyzed(
        rows.toDF("path", "partition", "bytes", "stat_min", "stat_max",
          "dv_path", "n_deleted"))
    })
}
