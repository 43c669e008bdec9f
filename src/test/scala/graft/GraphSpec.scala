package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

/** PageRank: hand-checked values on a star graph, symmetry, dangling
  * leak semantics, partition independence. */
class GraphSpec extends SparkTestBase {
  import spark.implicits._

  test("pageRank: star graph values exact, symmetric twins equal, dangling node keeps teleport only") {
    // a—b, a—c (symmetric edges); d isolated
    val nodes = Seq("a", "b", "c", "d").toDF("id")
    val pairs = Seq(("a", "b"), ("a", "c"))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val got = Graph.pageRank(nodes, edges, iters = 1, damping = 0.85)
      .as[(String, Double)].collect().toMap
    // replicate the exact arithmetic (same op order → same doubles)
    val n = 4.0
    val t = (1 - 0.85) / n
    val init = 1.0 / n
    val expA = t + 0.85 * (init / 1 + init / 1) // b and c each deg 1
    val expB = t + 0.85 * (init / 2)            // a's deg is 2
    assert(got("a") == expA && got("b") == expB && got("c") == expB)
    assert(got("d") == t, "dangling node holds teleport mass only")
    // two iterations: hub keeps the lead; mass stays below 1 (leak by design)
    val it2 = Graph.pageRank(nodes, edges, iters = 2, damping = 0.85)
      .as[(String, Double)].collect().toMap
    assert(it2("a") > it2("b") && it2("b") == it2("c"))
    assert(it2.values.sum < 1.0 && it2.values.sum > (1 - 0.85))
    // physical layout cannot move a rank
    val again = Graph.pageRank(nodes.repartition(3), edges.repartition(5),
      iters = 2, damping = 0.85).as[(String, Double)].collect().toMap
    assert(again == it2)
  }
}
