package graft

import org.apache.spark.sql.functions._
import graft.functions.SafeCasts._

/** Truth tables for the permissive coercion library against executable
  * models of the reference's transform.py:19-47 (SURVEY §2.9 C9-C11). */
class SafeCastsSpec extends SparkTestBase {
  import spark.implicits._

  test("safeBool matches the reference's string truth table") {
    // reference safe_bool: lower(s) in {"true","1","yes"} (transform.py:19-27)
    val in = Seq("true", "TRUE", "1", "yes", "YES", "false", "0", "no",
      "anything", "3.5", "", null)
    val got = in.toDF("s").select(safeBool(col("s"))).as[Option[Boolean]].collect()
    val expected = in.map {
      case null => None
      case s    => Some(Set("true", "1", "yes").contains(s.toLowerCase))
    }
    assert(got.toSeq == expected)
  }

  test("safeNumeric: numeric strings parse, junk is null (never throws)") {
    val got = Seq("3.5", "42", "-0.25", "1e3", "abc", "", null).toDF("s")
      .select(safeNumeric(col("s"))).as[Option[Double]].collect()
    assert(got.toSeq == Seq(Some(3.5), Some(42.0), Some(-0.25), Some(1000.0),
      None, None, None))
  }

  test("safeLong: int('3.5') fails -> null; numeric 3.9 truncates -> 3") {
    val fromStrings = Seq("3", "3.5", "x", null).toDF("s")
      .select(safeLong(col("s"))).as[Option[Long]].collect()
    assert(fromStrings.toSeq == Seq(Some(3L), None, None, None))
    val fromDoubles = Seq(3.9, -3.9).toDF("d")
      .select(safeLong(col("d"))).as[Long].collect()
    assert(fromDoubles.toSeq == Seq(3L, -3L))
  }

  test("isCurrent / zeroIfNull") {
    val df = Seq((1, Some("2024-01-01 00:00:00")), (2, None))
      .toDF("id", "end_at")
    val cur = df.select(isCurrent(col("end_at"))).as[Boolean].collect()
    assert(cur.toSeq == Seq(false, true))
    val z = Seq[Option[Long]](Some(5L), None).toDF("n")
      .select(zeroIfNull(col("n"))).as[Long].collect()
    assert(z.toSeq == Seq(5L, 0L))
  }

  test("durationSeconds keeps sub-second precision (3dp)") {
    val df = Seq(("2024-01-01 00:00:00.25", "2024-01-01 00:00:01.5"))
      .toDF("a", "b")
      .select(durationSeconds(col("a").cast("timestamp"), col("b").cast("timestamp")))
    assert(df.as[Double].head() == 1.25)
  }

  test("decimalSum is exact and order-independent") {
    val vals = (1 to 1000).map(i => i * 0.01)
    val a = vals.toDF("v").repartition(4).agg(decimalSum(col("v"))).as[Double].head()
    val b = vals.reverse.toDF("v").repartition(7).agg(decimalSum(col("v"))).as[Double].head()
    assert(a == b)
    assert(a == 5005.0)
  }
}
