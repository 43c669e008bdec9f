package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Funnel

/** Ordered conversion funnel + cohort retention: strict-order semantics,
  * monotone nulls, lossless week arithmetic. */
class FunnelSpec extends SparkTestBase {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("conversionFunnel: strictly-after ordering, monotone nulls, depth counts") {
    val ev = Seq(
      // u1 converts fully, in order
      (1L, "view", t("2024-01-01 10:00:00")),
      (1L, "click", t("2024-01-01 10:05:00")),
      (1L, "purchase", t("2024-01-01 10:30:00")),
      // u2: purchase BEFORE the first view — must not count
      (2L, "purchase", t("2024-01-01 09:00:00")),
      (2L, "view", t("2024-01-01 10:00:00")),
      (2L, "click", t("2024-01-01 11:00:00")),
      // u3: click only — never reached step 1, depth 0
      (3L, "click", t("2024-01-01 10:00:00")),
      // u4: view then a click at the SAME instant — strict > excludes it
      (4L, "view", t("2024-01-01 10:00:00")),
      (4L, "click", t("2024-01-01 10:00:00")))
      .toDF("user_id", "event_type", "ts")
    val got = Funnel.conversionFunnel(ev, col("user_id"), col("ts"),
        Seq("view" -> (col("event_type") === "view"),
          "click" -> (col("event_type") === "click"),
          "purchase" -> (col("event_type") === "purchase")))
      .as[(Long, Option[Timestamp], Option[Timestamp], Option[Timestamp], Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, Some(t("2024-01-01 10:00:00")),
      Some(t("2024-01-01 10:05:00")), Some(t("2024-01-01 10:30:00")), 3L)))
    // u2's early purchase is ignored; no later purchase exists → depth 2
    assert(got(2L) == ((2L, Some(t("2024-01-01 10:00:00")),
      Some(t("2024-01-01 11:00:00")), None, 2L)))
    assert(got(3L) == ((3L, None, None, None, 0L)))
    assert(got(4L) == ((4L, Some(t("2024-01-01 10:00:00")), None, None, 1L)))
    // nulls are monotone: a reached step implies every earlier step
    assert(got.values.forall(r =>
      Seq(r._2, r._3, r._4).map(_.isDefined).foldLeft((true, true)) {
        case ((ok, prev), cur) => (ok && (prev || !cur), cur)
      }._1))
  }

  test("cohortRetention: ISO-Monday cohorts, exact week offsets, full cohort at offset 0") {
    val ev = Seq(
      // u1 first active Wed Jan 3 (cohort week = Mon Jan 1), again 2 weeks later
      (1L, t("2024-01-03 10:00:00")),
      (1L, t("2024-01-16 10:00:00")),
      // u2 same cohort week, active only then (two events, one distinct week)
      (2L, t("2024-01-01 09:00:00")),
      (2L, t("2024-01-07 23:00:00")),
      // u3 cohort = week of Jan 8, active next week too
      (3L, t("2024-01-08 00:00:00")),
      (3L, t("2024-01-15 12:00:00")))
      .toDF("user_id", "ts")
    val got = Funnel.cohortRetention(ev, col("user_id"), col("ts"))
      .as[(java.sql.Date, Long, Long)].collect()
      .map(r => (r._1.toString, r._2) -> r._3).toMap
    assert(got == Map(
      ("2024-01-01", 0L) -> 2L,   // u1+u2 in their cohort week
      ("2024-01-01", 2L) -> 1L,   // u1 back two weeks later
      ("2024-01-08", 0L) -> 1L,
      ("2024-01-08", 1L) -> 1L))
  }
}
