package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.model.Schemas
import graft.runtime.WatermarkStore

/** Target-catalog bootstrap — the reference's `setup_target.py` (SURVEY §2.1
  * S6, §3.2): create the star-schema tables + the watermark table, seeded,
  * idempotently (`CREATE TABLE IF NOT EXISTS` / `ON CONFLICT DO NOTHING`).
  *
  * Targets are parquet directories under one warehouse root. The reference's
  * eight secondary indexes have no Spark-storage equivalent; their access
  * paths are served instead by partitioning/sorting choices documented per
  * table (SURVEY §4): the timeline is date-partitionable on event_time, and
  * the partial index `WHERE is_current_version` becomes a filter-pushdown
  * predicate over a boolean column.
  */
class Bootstrap(spark: SparkSession, warehouseDir: String) {

  def tablePath(name: String): String = s"$warehouseDir/$name"

  private def exists(name: String): Boolean = {
    val p = new Path(tablePath(name))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }

  private def createEmpty(name: String, schema: StructType): Unit = {
    val w = spark.createDataFrame(java.util.Collections.emptyList[Row](), schema)
      .write.mode("ignore")
    val parts = Bootstrap.partitioning.getOrElse(name, Nil)
    (if (parts.nonEmpty) w.partitionBy(parts: _*) else w).parquet(tablePath(name))
  }

  /** Idempotent: creates missing tables, seeds missing watermark rows,
    * leaves existing data untouched (setup_target.py:244-261). */
  def setup(sourceTables: Seq[String] = Bootstrap.defaultSourceTables): Unit = {
    Schemas.targets.foreach { case (name, schema) =>
      if (!exists(name)) createEmpty(name, schema)
    }
    if (!exists("etl_watermark"))
      createEmpty("etl_watermark", WatermarkStore.schema)
    // seed one watermark row per source stream (setup_target.py:24-32),
    // ON CONFLICT DO NOTHING ≡ only seed streams not yet present
    val store = new WatermarkStore(spark, tablePath("etl_watermark"))
    val present = store.all().keySet
    sourceTables.filterNot(present).foreach { t =>
      store.advance(t, 0L, WatermarkStore.defaultSince, WatermarkStore.defaultSince)
    }
  }
}

object Bootstrap {
  /** The six source streams the reference seeds (setup_target.py:24-32). */
  val defaultSourceTables: Seq[String] = Seq(
    "fc_scenario", "fc_scenario_node_data", "fc_scenario_run",
    "fc_scenario_node_calc", "fc_scenario_event_data", "fc_scenario_timeline")

  /** Physical layout: the event log is date-partitioned — the reference's
    * timeline indexes (setup_target.py:104-107) become partition pruning. */
  val partitioning: Map[String, Seq[String]] =
    Map("fact_scenario_timeline" -> Seq("event_date"))
}
