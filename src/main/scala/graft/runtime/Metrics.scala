package graft.runtime

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Per-cycle, per-stream run metrics persisted as a queryable table — the
  * reference's row-count logging (extract.py/load.py info lines +
  * pipeline.py:112-113 cycle totals) as data instead of log text.
  */
class MetricsStore(spark: SparkSession, dir: String) {
  import MetricsStore._

  def record(cycleId: Long, at: Timestamp, report: CycleReport): Unit = {
    val rows = report.results.map { r =>
      org.apache.spark.sql.Row(cycleId, at, r.name, r.rows, r.drainedLoops,
        r.error.isDefined, r.error.orNull)
    }
    spark.createDataFrame(
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, schema)
      .write.mode("append").parquet(dir)
  }
}

object MetricsStore {
  val schema: StructType = StructType(Seq(
    StructField("cycle_id", LongType, nullable = false),
    StructField("cycle_at", TimestampType, nullable = false),
    StructField("stream", StringType, nullable = false),
    StructField("rows", LongType, nullable = false),
    StructField("drained_loops", IntegerType, nullable = false),
    StructField("failed", BooleanType, nullable = false),
    StructField("error", StringType)))
}
