package graft

import org.apache.spark.sql.functions._
import graft.ops.Stats

/** ANALYZE-style stats: column profile + equi-width histogram. */
class StatsSpec extends SparkTestBase {
  import spark.implicits._

  test("columnProfile: nulls, distincts, min/max per column; sketch stays in band") {
    val df = Seq(
      (1L, Some("a"), 10.0), (2L, Some("b"), 20.0), (3L, None, 20.0),
      (4L, Some("a"), 30.0), (5L, None, 40.0))
      .toDF("id", "s", "v")
    val got = Stats.columnProfile(df, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    val s = got("s")
    assert(s.getLong(1) == 5L && s.getLong(2) == 2L)
    assert(s.getDouble(3) == 0.4)
    assert(s.getLong(4) == 2L)             // distinct excludes nulls
    assert(s.getBoolean(6))                // HLL within 5% at tiny n
    assert(s.getString(7) == "a" && s.getString(8) == "b")
    val v = got("v")
    assert(v.getLong(2) == 0L && v.getLong(4) == 4L)
    assert(v.getString(7) == "10.0" && v.getString(8) == "40.0")
    // the 100 TB knob: no exact distinct, sketch only
    val cheap = Stats.columnProfile(df, Seq("s"), exactDistinct = false)
      .head()
    assert(cheap.isNullAt(4) && cheap.isNullAt(6))
    assert(cheap.getLong(5) > 0)
  }

  test("drift: shared edges align both sides; TV distance 0 for identical, 1 for disjoint, exact for half-shift") {
    val a = (1 to 100).map(_.toDouble).toDF("x")
    val b = (1 to 100).map(_.toDouble).toDF("x")
    assert(Stats.totalVariation(a, a, "x", 10) == 0.0)
    // disjoint supports → TV = 1
    val lo = (1 to 50).map(_.toDouble).toDF("x")
    val hi = (1000 to 1049).map(_.toDouble).toDF("x")
    assert(Stats.totalVariation(lo, hi, "x", 2) == 1.0)
    // adjacent but non-overlapping supports: with 2 bins over the combined
    // range [1,200] the edge falls between them — a fills bin 0, b bin 1
    val b2 = (101 to 200).map(_.toDouble).toDF("x")
    val d = Stats.drift(a, b2, "x", 2)
      .orderBy("bin").as[(Long, Long, Long, Double, Double)].collect()
    assert(d.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq((0L, 100L, 0L), (1L, 0L, 100L)))
    assert(Stats.totalVariation(a, b2, "x", 2) == 1.0)
    // drift rows carry exact fractions
    assert(d.head._4 == 1.0 && d.head._5 == 0.0)
  }

  test("histogram: exact bucket edges, max clamps to top cell, nulls excluded, empty cells absent") {
    val withNulls = Seq[Option[Double]](Some(0.0), Some(0.0), Some(4.999),
      Some(5.0), Some(10.0), None, None).toDF("x")
    val h = Stats.histogram(withNulls, "x", 2)
      .orderBy("bin").as[(Long, Double, Double, Long)].collect().toSeq
    // 2 cells over [0,10]: [0,5) and [5,10]; max clamps into cell 1
    assert(h == Seq((0L, 0.0, 4.999, 3L), (1L, 5.0, 10.0, 2L)))
    // empty cells are absent, not zero rows
    val sparse = Seq(0.0, 100.0).toDF("x")
    val hs = Stats.histogram(sparse, "x", 10)
      .orderBy("bin").as[(Long, Double, Double, Long)].collect().toSeq
    assert(hs == Seq((0L, 0.0, 0.0, 1L), (9L, 100.0, 100.0, 1L)))
    // all-null column → empty result, not a crash
    val empty = Seq[Option[Double]](None, None).toDF("x")
    assert(Stats.histogram(empty, "x", 4).count() == 0)
  }

  test("histogramEquiDepth: rank cuts give equal counts; ties straddle edges; non-divisible n front-loads") {
    // 12 rows / 4 cells → exactly 3 per cell; the four 1.0s straddle the
    // first edge by tieBreak order (rank cut, not value cut)
    val df = Seq((1.0, 1), (1.0, 2), (1.0, 3), (1.0, 4), (2.0, 5), (2.0, 6),
      (3.0, 7), (3.0, 8), (4.0, 9), (5.0, 10), (6.0, 11), (7.0, 12))
      .toDF("x", "id")
    val h = Stats.histogramEquiDepth(df, "x", 4, col("id"))
      .orderBy("bin").as[(Long, Long, Double, Double)].collect().toSeq
    assert(h == Seq((0L, 3L, 1.0, 1.0), (1L, 3L, 1.0, 2.0),
      (2L, 3L, 3.0, 4.0), (3L, 3L, 5.0, 7.0)))
    // n=10, 3 cells: ⌊(r−1)·3/10⌋ gives sizes 4,3,3
    val df10 = (1 to 10).map(i => (i.toDouble, i)).toDF("x", "id")
    val h10 = Stats.histogramEquiDepth(df10, "x", 3, col("id"))
      .orderBy("bin").as[(Long, Long, Double, Double)].collect().toSeq
    assert(h10.map(_._2) == Seq(4L, 3L, 3L))
    assert(h10 == Seq((0L, 4L, 1.0, 4.0), (1L, 3L, 5.0, 7.0),
      (2L, 3L, 8.0, 10.0)))
    // layout-independent: same cells from a different partitioning
    val hr = Stats.histogramEquiDepth(df.repartition(7), "x", 4, col("id"))
      .orderBy("bin").as[(Long, Long, Double, Double)].collect().toSeq
    assert(hr == h)
  }

  test("histogramEquiDepthSketch: sketch edges land cells within the rank band of exact") {
    val df = (1 to 10000).map(i => (i.toDouble, i)).toDF("x", "id")
    val cells = Stats.histogramEquiDepthSketch(df, "x", 4)
      .orderBy("bin").as[(Long, Long, Double, Double)].collect().toSeq
    assert(cells.map(_._1) == Seq(0L, 1L, 2L, 3L))
    // ~2500 per cell; approx_percentile at default accuracy is near-exact
    // on 10k uniform rows — allow a 2% band
    assert(cells.forall(c => math.abs(c._2 - 2500L) <= 200), cells.toString)
    assert(cells.map(_._2).sum == 10000L)
    // cells tile the value range in order
    assert(cells.sliding(2).forall { case Seq(a, b) => a._4 <= b._3 })
  }

  test("manifest: signature is order/partition-independent, moves on any row change, counts nulls") {
    val df = Seq((1L, Some("aa"), "s1"), (2L, Some("bb"), "s1"),
      (3L, None, "s1"), (4L, Some("cc"), "s2")).toDF("id", "text", "src")
    def m(d: org.apache.spark.sql.DataFrame) =
      Stats.manifest(d, col("src"), col("id"), col("text"))
        .orderBy("group_key")
        .as[(String, Long, Long, String, String, Long)].collect().toSeq
    val base = m(df)
    assert(base.map(r => (r._1, r._2, r._3, r._4, r._5)) ==
      Seq(("s1", 3L, 1L, "1", "3"), ("s2", 1L, 0L, "4", "4")))
    // partitioning and row order don't move the signature
    assert(m(df.repartition(5)) == base)
    assert(m(df.orderBy(col("id").desc)) == base)
    // any single-row content change moves its group's signature only
    val mutated = Seq((1L, Some("aa"), "s1"), (2L, Some("bX"), "s1"),
      (3L, None, "s1"), (4L, Some("cc"), "s2")).toDF("id", "text", "src")
    val after = m(mutated)
    assert(after.head._6 != base.head._6 && after(1)._6 == base(1)._6)
    // null vs empty content are distinguished by n_null_content, and the
    // signature treats them identically (count carries the difference)
    val emptied = Seq((3L, Some(""), "s1")).toDF("id", "text", "src")
    val nulled = Seq((3L, Option.empty[String], "s1")).toDF("id", "text", "src")
    assert(m(emptied).head._6 == m(nulled).head._6)
    assert(m(emptied).head._3 == 0L && m(nulled).head._3 == 1L)
  }
}
