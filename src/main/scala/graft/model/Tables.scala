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
}
