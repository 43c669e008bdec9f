package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Tables

/** Pins the encoding-agnostic event-time contract (the round-7 incident:
  * the corpus regenerated from TIMESTAMP(NANOS) to TIMESTAMP_NTZ micros and
  * three green queries broke at analysis with zero code changes).
  *
  * For each physical encoding the corpus has shipped — raw epoch-nanos long
  * (what `nanosAsLong=true` surfaces for TIMESTAMP(NANOS)), TIMESTAMP_NTZ,
  * and UTC-adjusted TIMESTAMP — `Tables.load` must yield the SAME
  * session-zoned TimestampType values, and `Tables.loadSince` must keep its
  * watermark predicate on the RAW column so it still reaches the parquet
  * scan (the property that makes incremental cycles row-group-prunable
  * instead of full scans at 100 TB).
  */
class TablesEncodingSpec extends SparkTestBase {
  import spark.implicits._

  // three instants straddling a watermark cut at 12:00:00
  private val instants = Seq(
    "2024-03-01 10:30:00", "2024-03-01 12:00:00", "2024-03-01 13:45:00")
  private val cut = Timestamp.valueOf("2024-03-01 12:00:00")

  /** Write an `events.parquet` with `ts` in one encoding; return its dir. */
  private def corpusWith(encoding: String): String = {
    val dir = tmpDir(s"enc-$encoding")
    val base = instants.zipWithIndex
      .map { case (s, i) => (i.toLong, Timestamp.valueOf(s)) }
      .toDF("event_id", "ts_src")
    val df = encoding match {
      case "nanos-long" => // what the vectorized reader hands back for
        // TIMESTAMP(NANOS) under nanosAsLong=true: an epoch-nanos LongType
        base.select(col("event_id"),
          (unix_micros(col("ts_src")) * 1000L).as("ts"))
      case "ntz" =>
        base.select(col("event_id"),
          col("ts_src").cast(TimestampNTZType).as("ts"))
      case "utc" =>
        base.select(col("event_id"), col("ts_src").as("ts"))
    }
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  for (enc <- Seq("nanos-long", "ntz", "utc")) {
    test(s"load normalizes a $enc ts column to TimestampType with identical values") {
      val dir = corpusWith(enc)
      val got = Tables.load(spark, dir, "events")
      assert(got.schema("ts").dataType == TimestampType, got.schema.treeString)
      val vals = got.select(col("ts").cast("string")).as[String].collect().sorted
      assert(vals.toSeq == instants, s"$enc values: ${vals.mkString(", ")}")
    }

    test(s"loadSince over $enc filters correctly and keeps the predicate scan-level") {
      val dir = corpusWith(enc)
      val since = Tables.loadSince(spark, dir, "events", "ts", cut)
      assert(since.schema("ts").dataType == TimestampType)
      val vals = since.select(col("ts").cast("string")).as[String].collect().sorted
      assert(vals.toSeq == instants.filter(_ >= "2024-03-01 12:00:00"),
        s"$enc since-filter: ${vals.mkString(", ")}")
      // the watermark predicate must be phrased on the RAW column so it
      // reaches the parquet scan — a filter above the conversion expression
      // would make every incremental cycle a full scan
      val plan = since.queryExecution.executedPlan.toString
      assert("PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(ts,".r.findFirstIn(plan).isDefined,
        s"$enc pushdown missing:\n$plan")
    }
  }

  test("tsOf coerces every timestamp flavor the runtime can encounter") {
    import graft.runtime.WatermarkStore.tsOf
    val t = Timestamp.valueOf("2024-03-01 10:30:00")
    assert(tsOf(t) == t)
    // NTZ rows surface LocalDateTime: interpreted as UTC wall-clock
    val ldt = java.time.LocalDateTime.of(2024, 3, 1, 10, 30, 0)
    assert(tsOf(ldt) == Timestamp.from(
      ldt.atOffset(java.time.ZoneOffset.UTC).toInstant))
    // java8API sessions surface Instant
    val inst = java.time.Instant.parse("2024-03-01T10:30:00Z")
    assert(tsOf(inst) == Timestamp.from(inst))
    intercept[IllegalArgumentException] { tsOf("not-a-timestamp") }
  }
}
