package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Table loaders over the driver-provided parquet corpus (TESTDATA.md).
  *
  * The reference reads named tables from a source PostgreSQL with explicit
  * column lists (reference extract.py:58-107 — never `SELECT *`); our scans are
  * parquet reads whose projection/filters Catalyst pushes into the scan
  * (SURVEY §2.1 S1, §4). Column pruning happens automatically downstream of
  * `select`, so loaders hand back the full table lazily.
  */
object Tables {
  val relational: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val stream: Seq[String] = Seq("events")
  val corpus: Seq[String] = Seq("documents", "embeddings")

  /** Columns stored as parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects outright. Sessions must set
    * `spark.sql.legacy.parquet.nanosAsLong=true`; the loader then restores
    * TimestampType by integer-dividing to micros — the same truncation DuckDB
    * applies when it narrows ns → µs, so oracle comparisons line up. */
  private val nanosColumns: Map[String, Seq[String]] = Map("events" -> Seq("ts"))

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    nanosColumns.getOrElse(name, Nil).foldLeft(df) { (d, c) =>
      if (d.schema(c).dataType == LongType)
        // `div` = integer division: ns values (~1.7e18) overflow double's
        // exact-integer range, so a float divide would corrupt low micros.
        d.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
      else d
    }
  }

  /** Incremental scan with watermark pushdown. A predicate on the CONVERTED
    * timestamp can't reach the parquet scan (the conversion expression hides
    * the column), which would make every incremental cycle a full scan at
    * 100 TB. Filtering the raw nanos long first is pushed into the scan
    * (row-group pruning) and is exactly equivalent:
    * floor_us(ts_ns) >= since  ⟺  ts_ns >= since_us × 1000 for whole-µs
    * `since`. Falls back to a plain timestamp filter for µs-typed tables. */
  def loadSince(spark: SparkSession, dir: String, name: String,
                tsCol: String, since: java.sql.Timestamp): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    val sinceUs = since.toInstant.getEpochSecond * 1000000L + since.getNanos / 1000L
    if (nanosColumns.getOrElse(name, Nil).contains(tsCol) &&
        raw.schema(tsCol).dataType == LongType) {
      val filtered = raw.filter(col(tsCol) >= sinceUs * 1000L)
      nanosColumns.getOrElse(name, Nil).foldLeft(filtered) { (d, c) =>
        if (d.schema(c).dataType == LongType)
          d.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
        else d
      }
    } else
      load(spark, dir, name).filter(col(tsCol) >= lit(since))
  }
}
