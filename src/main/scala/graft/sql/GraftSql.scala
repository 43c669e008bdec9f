package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** Builders for the SQL front door's relation objects — one place that
  * decides how a TxTable path becomes a Spark scan, shared by the
  * `format("graft")` reader ([[GraftDataSource]]), the catalog
  * ([[GraftCatalog]]), and the analyzer swap rule ([[GraftSqlRules]]).
  *
  * The relation is a stock `HadoopFsRelation` over [[GraftFileIndex]]:
  * vectorized parquet, pushed filters, codegen — the identical physical
  * shape a plain `spark.read.parquet` gets, with the commit log deciding
  * file visibility. Schema ORDER is the `HadoopFsRelation` contract:
  * data columns first, partition columns last. */
object GraftSql {

  /** Index + relation for a table snapshot (asOf None = head). */
  def relation(spark: SparkSession, dir: String,
               asOf: Option[Long] = None): HadoopFsRelation = {
    val index = new GraftFileIndex(spark, dir, asOf)
    HadoopFsRelation(
      location = index,
      partitionSchema = index.partitionSchema,
      dataSchema = index.dataSchema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty[String, String])(spark)
  }

  /** The front door's view of the table schema (data ++ partition). */
  def tableSchema(spark: SparkSession, dir: String,
                  asOf: Option[Long] = None): StructType = {
    val index = new GraftFileIndex(spark, dir, asOf)
    StructType(index.dataSchema ++ index.partitionSchema)
  }

  /** Partition column names recorded by the live layout (empty when the
    * table is unpartitioned). */
  def partitionColumns(spark: SparkSession, dir: String): Seq[String] =
    new GraftFileIndex(spark, dir, None).partitionSchema.map(_.name)

  /** DataFrame over the relation — the programmatic twin of
    * `spark.read.format("graft").load(dir)`, used by tests and the
    * insert path. */
  def dataFrame(spark: SparkSession, dir: String,
                asOf: Option[Long] = None): DataFrame =
    spark.sqlContext.baseRelationToDataFrame(relation(spark, dir, asOf))
}
