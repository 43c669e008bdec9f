package graft.model

import java.time.ZoneOffset

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

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

  /** Event-time columns whose parquet physical encoding has varied across
    * corpus generations. Three encodings are normalized to one logical type:
    *
    *   - TIMESTAMP(NANOS): Spark's reader rejects it unless
    *     `spark.sql.legacy.parquet.nanosAsLong=true`, under which it surfaces
    *     as a raw LongType of epoch-nanos;
    *   - TIMESTAMP_MICROS with `isAdjustedToUTC=false`: surfaces as
    *     `TIMESTAMP_NTZ` (wall-clock, no zone);
    *   - UTC-adjusted TIMESTAMP: surfaces as TimestampType directly.
    *
    * All normalize to session-zoned `TimestampType`, so everything downstream
    * (`unix_micros`, `withWatermark`, `Row.getTimestamp`) sees one type.
    * Sessions run with `spark.sql.session.timeZone=UTC`, making the
    * NTZ wall-clock → instant cast the identity on the stored values. */
  private val eventTimeColumns: Map[String, Seq[String]] = Map("events" -> Seq("ts"))

  /** Normalize one event-time column to TimestampType, keyed on the type the
    * reader actually produced (not on an assumed corpus encoding). The ns→µs
    * path uses integer division (`div`): ns values (~1.7e18) overflow double's
    * exact-integer range, so a float divide would corrupt low micros — and the
    * truncation matches DuckDB's own ns → µs narrowing, so oracle comparisons
    * line up. */
  private def normalize(df: DataFrame, c: String): DataFrame =
    df.schema(c).dataType match {
      case LongType         => df.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
      case TimestampNTZType => df.withColumn(c, col(c).cast("timestamp"))
      case _                => df // already TimestampType
    }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    eventTimeColumns.getOrElse(name, Nil).foldLeft(df)(normalize)
  }

  /** Incremental scan with watermark pushdown. A predicate on the CONVERTED
    * timestamp can't reach the parquet scan (the conversion expression hides
    * the column), which would make every incremental cycle a full scan at
    * 100 TB. So the filter is phrased against the RAW column in its native
    * encoding — pushed into the scan (row-group pruning) — then normalized:
    *
    *   - nanos-long: floor_us(ts_ns) >= since ⟺ ts_ns >= since_us × 1000 for
    *     whole-µs `since`, so the long comparison is exactly equivalent;
    *   - NTZ: the literal is `since`'s UTC wall-clock, matching the UTC
    *     session under which the cast interprets stored values;
    *   - TimestampType: a plain timestamp filter already pushes down. */
  def loadSince(spark: SparkSession, dir: String, name: String,
                tsCol: String, since: java.sql.Timestamp): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    val filtered = raw.schema(tsCol).dataType match {
      case LongType if eventTimeColumns.getOrElse(name, Nil).contains(tsCol) =>
        val sinceUs = since.toInstant.getEpochSecond * 1000000L + since.getNanos / 1000L
        raw.filter(col(tsCol) >= sinceUs * 1000L)
      case TimestampNTZType => // any NTZ column, event-time or not: an NTZ
        // literal keeps the comparison same-typed (no cast above the scan)
        raw.filter(col(tsCol) >= lit(since.toInstant.atOffset(ZoneOffset.UTC).toLocalDateTime))
      case _ =>
        raw.filter(col(tsCol) >= lit(since))
    }
    eventTimeColumns.getOrElse(name, Nil).foldLeft(filtered)(normalize)
  }
}
