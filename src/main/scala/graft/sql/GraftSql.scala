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

  /** Index + relation for a table snapshot (asOf None = head).
    * `excludeDv` lists only the files WITHOUT deletion vectors — the clean
    * branch of [[dataFrame]]'s union; scanning DV'd files through a stock
    * relation would resurrect deleted rows. */
  def relation(spark: SparkSession, dir: String,
               asOf: Option[Long] = None,
               excludeDv: Boolean = false): HadoopFsRelation = {
    val index = new GraftFileIndex(spark, dir, asOf, excludeDv)
    HadoopFsRelation(
      location = index,
      partitionSchema = index.partitionSchema,
      dataSchema = index.dataSchema,
      // declared + file-verified bucket layout surfaces as a Spark
      // bucketed scan: HashPartitioning output, storage-partitioned
      // joins/aggs on the bucket column skip their shuffle
      bucketSpec = index.scanBucketSpec,
      fileFormat = new ParquetFileFormat,
      options = Map.empty[String, String])(spark)
  }

  /** The front door's view of the table schema (data ++ partition), in
    * LOGICAL names — physical scan names re-labelled through the
    * RENAME COLUMN mapping (identity on unmapped tables). */
  def tableSchema(spark: SparkSession, dir: String,
                  asOf: Option[Long] = None): StructType = {
    val index = new GraftFileIndex(spark, dir, asOf)
    val ren = graft.merge.TxTable.renameMap(spark, dir, asOf)
    // insert-facing view of defaults: CURRENT only. The scan schema
    // carries EXISTS_DEFAULT (the parquet reader's fill for
    // pre-declaration files); surfacing it HERE would let the output
    // resolver pad omitted INSERT columns from the frozen existence
    // constant after a DROP DEFAULT. Strip, then attach current.
    val bare = graft.merge.TxTable.stripDefaultMetadata(
      (index.dataSchema ++ index.partitionSchema).toSeq)
    val current = graft.merge.TxTable.columnDefaults(spark, dir, asOf)
      .collect { case (c, (cur @ Some(_), _)) => c -> (cur, Option.empty[String]) }
    StructType(graft.merge.TxTable
      .withDefaultMetadata(StructType(bare), current)
      .map(f => f.copy(name = ren.getOrElse(f.name, f.name))))
  }

  /** Partition column names recorded by the live layout (empty when the
    * table is unpartitioned). */
  def partitionColumns(spark: SparkSession, dir: String): Seq[String] =
    new GraftFileIndex(spark, dir, None).partitionSchema.map(_.name)

  /** DataFrame over the table snapshot — the scan every SQL read plans
    * (the catalog swap rule, the `graft_table` TVF, tests).
    *
    * Clean tables stay ONE stock vectorized relation. A table with live
    * deletion vectors splits: files WITHOUT a vector keep the
    * [[GraftFileIndex]] relation (partition pruning + log-level stats
    * skipping fully intact — the 100 TB bulk), files WITH one read
    * through [[TxTable]]'s position anti-join branch, unioned by name.
    * Catalyst pushes predicates into both branches; [[TxTable.purgeDvs]]
    * (or any rewrite) returns a file to the clean side. */
  def dataFrame(spark: SparkSession, dir: String,
                asOf: Option[Long] = None): DataFrame = {
    val dvSlice = graft.merge.TxTable.readDvSlice(spark, dir, asOf)
    val phys = spark.sqlContext.baseRelationToDataFrame(
      relation(spark, dir, asOf, excludeDv = dvSlice.isDefined))
    // re-label the physical scan to the logical schema (a Project the
    // optimizer pushes filters straight through — pruning and skipping
    // below it keep operating on the physical names the stats carry)
    val base = graft.merge.TxTable.presentLogicalDf(spark, dir, phys, asOf)
    dvSlice match {
      case None => base
      case Some(dv) =>
        import org.apache.spark.sql.functions.col
        base.unionByName(dv.select(base.columns.map(col(_)): _*))
    }
  }
}
