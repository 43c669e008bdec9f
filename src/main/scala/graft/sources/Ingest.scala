package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Raw-file corpus intake — the format layer in front of the parquet/JDBC
  * sources: training corpora arrive as JSONL dumps and CSV exports, and at
  * 100 TB some lines WILL be malformed. The house rule here is PERMISSIVE
  * ingest with a quarantine column: a corrupt line becomes a row whose
  * `_corrupt` column holds the raw text (schema fields null), so bad data
  * is COUNTED and INSPECTABLE instead of silently dropped (DROPMALFORMED)
  * or job-fatal (FAILFAST). [[split]] separates the streams; the clean
  * side flows into the dedup/curation pipeline, the quarantine side into
  * an audit table ([[graft.ops.Stats.manifest]] works on either).
  *
  * Scale shape: both readers are ordinary file scans — splittable,
  * schema-pruned, filter-pushed like any other source; the quarantine
  * split is one narrow filter each side.
  */
object Ingest {

  val CorruptCol = "_corrupt"

  private def withQuarantine(schema: StructType): StructType =
    schema.add(CorruptCol, StringType, nullable = true)

  /** JSON-lines ingest with quarantine. `schema` is the EXPECTED shape —
    * explicit, never inferred: inference costs an extra full pass at
    * 100 TB and silently widens on dirty data. */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withQuarantine(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** CSV ingest with quarantine; `header` skips a header line. */
  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(withQuarantine(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  /** (clean, quarantined): clean rows drop the quarantine column;
    * quarantined rows keep only the raw line. Spark refuses to plan a
    * query that references ONLY the corrupt column of a raw scan, so the
    * split materializes through a localCheckpoint first — documented
    * Spark behavior, not a workaround choice. */
  def split(df: DataFrame): (DataFrame, DataFrame) = {
    val m = df.localCheckpoint()
    (m.filter(col(CorruptCol).isNull).drop(CorruptCol),
      m.filter(col(CorruptCol).isNotNull).select(col(CorruptCol).as("raw")))
  }
}
