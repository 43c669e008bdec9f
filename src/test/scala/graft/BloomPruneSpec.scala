package graft

import org.apache.spark.sql.functions._
import graft.ops.BloomPrune

/** Bloom semi-join reduction: no false negatives (pruned join ≡ plain
  * join), and the pre-filter genuinely shrinks the probe side. */
class BloomPruneSpec extends SparkTestBase {
  import spark.implicits._

  private val probe = (1L to 5000L).map(i => (i, s"p$i")).toDF("pk", "payload")
  private val build = (1L to 5000L by 100).map(i => (i, s"b$i")).toDF("bk", "attr")

  test("pruned join returns exactly the plain join result") {
    val pruned = BloomPrune.prunedJoin(probe, build, "pk", "bk", 1000L)
      .select("pk", "payload", "bk", "attr")
      .as[(Long, String, Long, String)].collect().toSet
    val plain = probe.join(build, col("pk") === col("bk"))
      .select("pk", "payload", "bk", "attr")
      .as[(Long, String, Long, String)].collect().toSet
    assert(pruned == plain)
    assert(plain.size == 50)
  }

  test("semiReduce keeps every matching row and drops most others") {
    val kept = BloomPrune.semiReduce(probe, build, "pk", "bk", 1000L)
      .select("pk").as[Long].collect().toSet
    val matching = build.select("bk").as[Long].collect().toSet
    assert(matching.subsetOf(kept), "bloom filters must not have false negatives")
    // 50 true matches out of 5000; default FPP leaves only a small excess
    assert(kept.size < 500, s"pruning ineffective: kept ${kept.size}/5000")
  }

  test("pruning an empty build side keeps nothing after the join") {
    val emptyBuild = build.filter(col("bk") < 0)
    assert(BloomPrune.prunedJoin(probe, emptyBuild, "pk", "bk", 10L).count() == 0L)
  }
}
