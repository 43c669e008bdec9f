package graft

import org.apache.spark.sql.functions._
import graft.functions.SketchAggs

/** SpaceSaving heavy-hitters: exact when distinct ≤ capacity (any
  * partitioning), overestimate-within-err and heavy-item retention when
  * evicting. */
class SketchAggsSpec extends SparkTestBase {
  import spark.implicits._

  private def topk(df: org.apache.spark.sql.DataFrame, cap: Int) =
    df.agg(SketchAggs.topkFreq(col("item"), cap).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.item"), col("h.cnt"), col("h.err"))
      .as[(String, Long, Long)].collect()

  test("exact regime: distinct ≤ capacity ⇒ counts match GROUP BY, err 0") {
    val items = (1 to 1000).map(i => s"u${i % 40}")
    // 7 partitions forces partial buffers + merges
    val df = spark.createDataset(items).repartition(7).toDF("item")
    val got = topk(df, 64).map { case (i, c, e) => (i, c, e) }
    val exact = items.groupBy(identity).map { case (i, xs) => i -> xs.size.toLong }
    assert(got.map(_._3).forall(_ == 0L))
    assert(got.map { case (i, c, _) => i -> c }.toMap == exact)
  }

  test("eviction regime: counts overestimate by ≤ err; heavy item retained") {
    val heavy = Seq.fill(500)("HOT")
    val tail = (1 to 400).map(i => s"t$i") // 401 distinct > capacity 32
    val df = spark.createDataset(scala.util.Random.shuffle(heavy ++ tail))
      .repartition(3).toDF("item")
    val got = topk(df, 32)
    assert(got.length <= 32) // merged buffers trim back to capacity
    val hot = got.find(_._1 == "HOT")
    assert(hot.isDefined, "guaranteed heavy hitter (freq >> N/capacity) evicted")
    val (_, cnt, err) = hot.get
    assert(cnt >= 500L, "SpaceSaving never undercounts")
    assert(cnt - err <= 500L, "overestimate must be bounded by err")
  }

  test("deterministic output order: (cnt desc, item asc)") {
    val df = Seq("b", "b", "a", "a", "c").toDF("item")
    val got = topk(df, 8)
    assert(got.toSeq == Seq(("a", 2L, 0L), ("b", 2L, 0L), ("c", 1L, 0L)))
  }
}
