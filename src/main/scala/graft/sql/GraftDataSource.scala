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
    GraftSql.relation(spark, dir, resolveAsOf(spark, dir, parameters))
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
      case SaveMode.Append => TxTable.append(spark, dir, data, partCols)
      case SaveMode.Overwrite => TxTable.replace(spark, dir, data, partCols)
      case SaveMode.ErrorIfExists =>
        require(!exists, s"TxTable already exists at $dir (mode=ErrorIfExists)")
        TxTable.append(spark, dir, data, partCols)
      case SaveMode.Ignore =>
        if (!exists) TxTable.append(spark, dir, data, partCols)
    }
    GraftSql.relation(spark, dir, None)
  }
}

/** V1 insertable relation — the vehicle `INSERT INTO` / CTAS ride through
  * Spark's own `InsertIntoDataSourceCommand` (which materializes the query
  * as a DataFrame and hands it here): append on `overwrite=false`, atomic
  * replace on `overwrite=true`. Kept schema-explicit so CTAS can target a
  * table that has no commits yet. */
final case class GraftInsertableRelation(dir: String,
                                         override val schema: StructType,
                                         partCols: Seq[String])
    extends BaseRelation with InsertableRelation {
  override def sqlContext: SQLContext = SparkSession.active.sqlContext

  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    val spark = data.sparkSession
    if (overwrite) TxTable.replace(spark, dir, data, partCols)
    else TxTable.append(spark, dir, data, partCols)
  }
}
