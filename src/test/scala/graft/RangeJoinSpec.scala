package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.RangeJoin

/** Binned range join: boundary semantics (start inclusive, end exclusive),
  * multi-bin intervals, empty intervals, no duplicate pairs, and
  * equivalence with the naive inequality join on randomized data. */
class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("boundaries: start inclusive, end exclusive; keys never cross") {
    val points = Seq(
      (1L, "A", t("2024-01-01 10:00:00")),  // == start -> match
      (2L, "A", t("2024-01-01 11:00:00")),  // == end   -> no match
      (3L, "A", t("2024-01-01 10:59:59")),  // inside   -> match
      (4L, "B", t("2024-01-01 10:30:00")))  // other key -> no match
      .toDF("pid", "k", "ts")
    val ivs = Seq(("A", 100L, t("2024-01-01 10:00:00"), t("2024-01-01 11:00:00")))
      .toDF("ik", "iid", "s", "e")
    val got = RangeJoin.pointInInterval(points, ivs, "k", "ik", "ts", "s", "e",
        binSeconds = 600L)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L, 3L))
  }

  test("interval spanning many bins matches each point exactly once") {
    val points = Seq(
      (1L, "A", t("2024-01-01 00:05:00")),
      (2L, "A", t("2024-01-03 23:00:00")))
      .toDF("pid", "k", "ts")
    // 4-day interval over 1-hour bins: ~96 bins, every pair must stay unique
    val ivs = Seq(("A", 7L, t("2024-01-01 00:00:00"), t("2024-01-04 00:00:00")))
      .toDF("ik", "iid", "s", "e")
    val got = RangeJoin.pointInInterval(points, ivs, "k", "ik", "ts", "s", "e",
        binSeconds = 3600L)
      .groupBy("pid").count().as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }

  test("empty and inverted intervals are dropped") {
    val points = Seq((1L, "A", t("2024-01-01 10:00:00"))).toDF("pid", "k", "ts")
    val ivs = Seq(
      ("A", 1L, t("2024-01-01 10:00:00"), t("2024-01-01 10:00:00")),  // empty
      ("A", 2L, t("2024-01-01 11:00:00"), t("2024-01-01 09:00:00"))) // inverted
      .toDF("ik", "iid", "s", "e")
    assert(RangeJoin.pointInInterval(points, ivs, "k", "ik", "ts", "s", "e",
      binSeconds = 60L).count() == 0L)
  }

  test("equivalence with the naive inequality join on randomized data") {
    val rnd = new scala.util.Random(42)
    val base = t("2024-01-01 00:00:00").getTime
    val points = (1 to 300).map { i =>
      (i.toLong, s"k${rnd.nextInt(5)}",
        new Timestamp(base + rnd.nextInt(72 * 3600) * 1000L))
    }.toDF("pid", "k", "ts")
    val ivs = (1 to 80).map { i =>
      val s = base + rnd.nextInt(72 * 3600) * 1000L
      (s"k${rnd.nextInt(5)}", i.toLong, new Timestamp(s),
        new Timestamp(s + rnd.nextInt(8 * 3600) * 1000L))
    }.toDF("ik", "iid", "s", "e")

    val binned = RangeJoin.pointInInterval(points, ivs, "k", "ik", "ts", "s", "e",
        binSeconds = 1800L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.join(ivs,
        col("k") === col("ik") && col("ts") >= col("s") && col("ts") < col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(binned == naive)
    assert(naive.nonEmpty) // the comparison must actually exercise matches
  }

  test("intervalOverlap: equals the naive inequality join, exactly once, across bin widths") {
    val rnd = new scala.util.Random(7)
    val base = t("2024-01-01 00:00:00").getTime
    def ivs(n: Int, pre: String) = (1 to n).map { i =>
      val s = base + rnd.nextInt(72 * 3600) * 1000L
      (s"k${rnd.nextInt(4)}", i.toLong, new Timestamp(s),
        new Timestamp(s + (1 + rnd.nextInt(8 * 3600)) * 1000L))
    }.toDF(s"${pre}k", s"${pre}id", s"${pre}s", s"${pre}e")
    val a = ivs(60, "a"); val b = ivs(60, "b")
    val naive = a.join(b,
        col("ak") === col("bk") && col("as") < col("be") && col("bs") < col("ae"))
      .select("aid", "bid").as[(Long, Long)].collect()
    assert(naive.nonEmpty && naive.length == naive.toSet.size)
    for (bin <- Seq(600L, 3600L, 86400L)) {
      val got = RangeJoin.intervalOverlap(a, b, "ak", "bk",
          "as", "ae", "bs", "be", binSeconds = bin)
        .select("aid", "bid").as[(Long, Long)].collect()
      // exactly once: multiset equality, not just set equality — the
      // intersection-start-bin device must suppress duplicate bin meetings
      assert(got.sorted.toSeq == naive.sorted.toSeq, s"binSeconds=$bin")
    }
  }

  test("intervalOverlap: touching endpoints don't overlap (half-open); empty intervals drop") {
    val a = Seq(("A", 1L, t("2024-01-01 10:00:00"), t("2024-01-01 11:00:00")))
      .toDF("ak", "aid", "as", "ae")
    val b = Seq(
      ("A", 1L, t("2024-01-01 11:00:00"), t("2024-01-01 12:00:00")), // abuts
      ("A", 2L, t("2024-01-01 10:59:59"), t("2024-01-01 12:00:00")), // overlaps 1s
      ("A", 3L, t("2024-01-01 10:30:00"), t("2024-01-01 10:30:00")), // empty
      ("B", 4L, t("2024-01-01 10:00:00"), t("2024-01-01 11:00:00"))) // other key
      .toDF("bk", "bid", "bs", "be")
    val got = RangeJoin.intervalOverlap(a, b, "ak", "bk",
        "as", "ae", "bs", "be", binSeconds = 60L)
      .select("bid").as[Long].collect().toSeq
    assert(got == Seq(2L))
  }
}
