package graft

import java.sql.Timestamp
import graft.ops.AsOfJoin

/** As-of join semantics: most-recent-at-or-before, exact-time ties match,
  * lefts before any right get nulls, keys never cross. */
class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("asof picks latest right <= left time, per key, with tie inclusion") {
    val trades = Seq(
      (1L, "A", t("2024-01-01 10:00:00")),  // before any quote -> null
      (2L, "A", t("2024-01-01 10:05:00")),  // exact tie with quote@10:05
      (3L, "A", t("2024-01-01 10:30:00")),  // after both -> quote@10:10
      (4L, "B", t("2024-01-01 10:30:00")))  // other key -> B's quote only
      .toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      ("A", t("2024-01-01 10:05:00"), 101.0),
      ("A", t("2024-01-01 10:10:00"), 102.0),
      ("B", t("2024-01-01 09:00:00"), 55.0))
      .toDF("q_sym", "q_ts", "price")
    val got = AsOfJoin.asof(trades, quotes, "sym", "q_sym", "ts", "q_ts",
        Seq("q_ts", "price"))
      .select("trade_id", "asof_price")
      .as[(Long, Option[Double])].collect().toMap
    assert(got == Map(
      1L -> None, 2L -> Some(101.0), 3L -> Some(102.0), 4L -> Some(55.0)))
  }

  test("matched right row is carried atomically: its nulls are NOT back-filled") {
    val lefts = Seq((1L, "A", t("2024-01-01 11:00:00"))).toDF("id", "sym", "ts")
    val quotes = Seq(
      ("A", t("2024-01-01 10:00:00"), Some(100.0), Some("src-old")),
      ("A", t("2024-01-01 10:30:00"), None, Some("src-new"))) // matched row, null price
      .toDF("q_sym", "q_ts", "price", "src")
    val got = AsOfJoin.asof(lefts, quotes, "sym", "q_sym", "ts", "q_ts",
        Seq("price", "src"))
      .select("id", "asof_price", "asof_src")
      .as[(Long, Option[Double], Option[String])].collect().toSeq
    // price must stay null (from the 10:30 matched row), not 100.0 from 10:00
    assert(got == Seq((1L, None, Some("src-new"))))
  }
}
