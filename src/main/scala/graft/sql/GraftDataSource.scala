package graft.sql

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.execution.streaming.{Sink, Source}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, InsertableRelation, RelationProvider, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.merge.TxTable

/** `spark.read.format("graft")` / `df.write.format("graft")` — the
  * DataFrameReader/Writer front door over a TxTable path (registered by
  * short name via META-INF/services).
  *
  * Read options:
  *  - `versionAsOf`   — time-travel to a commit version;
  *  - `timestampAsOf` — epoch millis or `yyyy-MM-dd HH:mm:ss`-style text,
  *    resolved to the newest commit at or before that instant.
  *
  * Write: `mode("append")` commits an append, `mode("overwrite")` an
  * atomic replace; `option("partitionBy", "a,b")` sets the layout (the
  * writer API's own `.partitionBy` is not forwarded to V1 relations, so
  * the option is the contract — same approach as other V1 connectors). */
object GraftDataSource {
  /** Count of DV-fallback warnings emitted (asserted by the spec — the
    * warning must fire exactly once per relation build, not per row). */
  private[graft] val dvFallbackWarnings = new java.util.concurrent.atomic.AtomicLong

  private[sql] def warnDvFallback(dir: String): Unit = {
    dvFallbackWarnings.incrementAndGet()
    // one plain line on stderr: visible under every log4j config,
    // impossible to misattribute
    System.err.println(
      s"[graft] WARN: reading $dir through the row-materializing V1 " +
        "fallback (table has live deletion vectors or column mapping). " +
        "Install GraftExtensions — .config(\"spark.sql.extensions\", " +
        "\"graft.GraftExtensions\") — and this read plans as the " +
        "vectorized clean-files ∪ position-anti-join scan instead.")
  }
}

class GraftDataSource extends RelationProvider
    with CreatableRelationProvider with StreamSourceProvider
    with StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  // `df.writeStream.format("graft")` — exactly-once micro-batch commits
  // into the TxTable log; modes and the txn handshake documented on
  // [[GraftStreamSink]]
  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): Sink = {
    require(outputMode != OutputMode.Update(),
      "graft streaming sink supports append (exactly-once TxTable.append) " +
        "and complete (exactly-once TxTable.replace); update-mode needs a " +
        "key contract — use the Streams.Sinks merge sinks via foreachBatch")
    val parts =
      if (partitionColumns.nonEmpty) partitionColumns
      else parameters.get("partitionBy").toSeq
        .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
    new GraftStreamSink(sqlContext.sparkSession, pathOf(parameters), parts,
      outputMode, parameters.get("txnAppId"))
  }

  // `spark.readStream.format("graft")` — commit-log subscription; modes
  // and options documented on [[GraftStreamSource]]
  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty,
      "graft streams carry the table's own schema; don't pass one")
    val dir = pathOf(parameters)
    (shortName(), GraftStreamSource.schemaFor(sqlContext.sparkSession, dir,
      parameters.get("mode").contains("cdc")))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source =
    GraftStreamSource.fromParameters(sqlContext.sparkSession,
      pathOf(parameters), parameters)

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft source needs a path: spark.read.format(\"graft\").load(dir)"))

  private[sql] def resolveAsOf(spark: SparkSession,
                               dir: String,
                               parameters: Map[String, String]): Option[Long] = {
    val byVersion = parameters.get("versionAsOf").map(_.trim.toLong)
    val byTs = parameters.get("timestampAsOf").map { raw =>
      val t = raw.trim
      val micros: Long =
        if (t.matches("-?\\d+")) t.toLong * 1000L // epoch millis
        else java.sql.Timestamp.valueOf(t).getTime * 1000L
      TxTable.versionAtTimestampMicros(spark, dir, micros).getOrElse(
        throw new IllegalArgumentException(
          s"timestampAsOf '$raw' predates every commit of $dir"))
    }
    require(byVersion.isEmpty || byTs.isEmpty,
      "give versionAsOf OR timestampAsOf, not both")
    byVersion.orElse(byTs)
  }

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val dir = pathOf(parameters)
    require(TxTable.exists(spark, dir),
      s"no TxTable commit log at $dir")
    val asOf = resolveAsOf(spark, dir, parameters)
    // live deletion vectors need the position anti-join branch, and a
    // RENAME/DROP mapping needs the logical re-labelling — neither fits
    // a stock HadoopFsRelation, so fall back to a PrunedFilteredScan over
    // the full DataFrame (filters still push into the inner parquet
    // scans; the V1 boundary materializes rows). Plain tables keep the
    // zero-overhead relation.
    if (TxTable.hasLiveDvs(spark, dir, asOf) ||
        TxTable.hasColumnMapping(spark, dir, asOf)) {
      // on an extensions-enabled session the analyzer swaps this relation
      // for the vectorized clean∪anti-join plan before execution; a BARE
      // session keeps the correct but row-materializing fallback — say so
      // ONCE per relation build, naming the fix, instead of silently
      // running slower for exactly the user least likely to know why
      if (!GraftSqlRules.installedOn(spark))
        GraftDataSource.warnDvFallback(dir)
      GraftDvScanRelation(dir, asOf)
    } else GraftSql.relation(spark, dir, asOf)
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val dir = pathOf(parameters)
    val partCols = parameters.get("partitionBy").toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
    val exists = TxTable.exists(spark, dir)
    mode match {
      case SaveMode.Append =>
        TxTable.insertWithIdentity(spark, dir, data, overwrite = false, partCols)
      case SaveMode.Overwrite =>
        TxTable.insertWithIdentity(spark, dir, data, overwrite = true, partCols)
      case SaveMode.ErrorIfExists =>
        require(!exists, s"TxTable already exists at $dir (mode=ErrorIfExists)")
        TxTable.append(spark, dir, data, partCols)
      case SaveMode.Ignore =>
        if (!exists) TxTable.append(spark, dir, data, partCols)
    }
    GraftSql.relation(spark, dir, None)
  }
}

/** format("graft") read fallback for tables with live deletion vectors:
  * the DV-aware scan ([[GraftSql.dataFrame]] — clean files vectorized,
  * DV'd files position-anti-joined) exposed through the V1
  * `PrunedFilteredScan` seam. Column pruning and the translatable filters
  * are applied INSIDE the DataFrame (so they reach the parquet scans);
  * every filter is also declared unhandled, so Spark re-applies them above
  * — double evaluation, never a missed predicate. The SQL catalog path
  * does not use this (it swaps the logical plan directly and keeps
  * whole-stage codegen across the union); this exists so
  * `spark.read.format("graft")` stays correct mid-delete-cycle. */
final case class GraftDvScanRelation(dir: String, asOf: Option[Long])
    extends BaseRelation
    with org.apache.spark.sql.sources.PrunedFilteredScan {
  private def spark: SparkSession = SparkSession.active
  override def sqlContext: SQLContext = spark.sqlContext
  override val schema: StructType = GraftSql.tableSchema(spark, dir, asOf)
  // rows handed back are already InternalRow (toRdd) — skip the Row
  // conversion layer, the JDBC-style connector contract
  override def needConversion: Boolean = false
  override def unhandledFilters(filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = filters

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[org.apache.spark.sql.sources.Filter])
      : org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.functions.col
    val df0 = GraftSql.dataFrame(spark, dir, asOf)
    val filtered = filters.flatMap(toColumn(_, df0)).foldLeft(df0)(_.filter(_))
    val pruned = filtered.select(requiredColumns.map(col(_)).toSeq: _*)
    pruned.queryExecution.toRdd.map(_.copy())
      .asInstanceOf[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]]
  }

  /** Best-effort V1-filter → Column translation for pushdown INTO the
    * DataFrame (None = skip; Spark re-applies everything anyway). */
  private def toColumn(f: org.apache.spark.sql.sources.Filter,
                       df: org.apache.spark.sql.DataFrame)
      : Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.sources._
    import org.apache.spark.sql.functions.{col, lit}
    f match {
      case EqualTo(a, v)            => Some(col(a) === lit(v))
      case GreaterThan(a, v)        => Some(col(a) > lit(v))
      case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
      case LessThan(a, v)           => Some(col(a) < lit(v))
      case LessThanOrEqual(a, v)    => Some(col(a) <= lit(v))
      case In(a, vs)                => Some(col(a).isin(vs.toIndexedSeq: _*))
      case IsNull(a)                => Some(col(a).isNull)
      case IsNotNull(a)             => Some(col(a).isNotNull)
      case StringStartsWith(a, p)   => Some(col(a).startsWith(p))
      case And(l, r) =>
        (toColumn(l, df), toColumn(r, df)) match {
          case (Some(a), Some(b)) => Some(a && b)
          case (one, other)       => one.orElse(other) // half is still sound
        }
      case Or(l, r) =>
        for (a <- toColumn(l, df); b <- toColumn(r, df)) yield a || b
      case _ => None
    }
  }
}

/** V1 insertable relation — the vehicle `INSERT INTO` / CTAS ride through
  * Spark's own `InsertIntoDataSourceCommand` (which materializes the query
  * as a DataFrame and hands it here): append on `overwrite=false`, atomic
  * replace on `overwrite=true`. Kept schema-explicit so CTAS can target a
  * table that has no commits yet.
  *
  * `initProps`: TBLPROPERTIES from a CTAS/RTAS statement, folded into the
  * SAME commit as the data — the statement is atomic including its
  * declared properties (a crash can never land the data without them),
  * and `graft.identity.*` specs declared this way govern the CTAS insert
  * itself. */
final case class GraftInsertableRelation(dir: String,
                                         override val schema: StructType,
                                         partCols: Seq[String],
                                         initProps: Map[String, String] = Map.empty)
    extends BaseRelation with InsertableRelation {
  override def sqlContext: SQLContext = SparkSession.active.sqlContext

  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    val spark = data.sparkSession
    // identity-aware: assigns GENERATED ... AS IDENTITY values and
    // advances the allocator in the same commit; identical to plain
    // append/replace when the table declares no identity columns
    TxTable.insertWithIdentity(spark, dir, data, overwrite, partCols,
      extraProps = initProps.toSeq.sortBy(_._1))
  }
}
