package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph algorithms as DataFrame loops. [[graft.ext.Dedup
  * .nearDupClusters]] covers reachability (connected components, with
  * pointer-jumping); this adds CENTRALITY — PageRank over an explicit
  * edge table — the standard "which node matters" signal, e.g. ranking
  * documents inside a near-duplicate neighborhood graph by how connected
  * they are (hub boilerplate scores high, leaf one-off dups low).
  */
object Graph {

  /** PageRank, simplified dangling semantics (nodes without out-edges
    * leak their damped mass rather than redistributing it — documented,
    * deterministic, and what ranking-within-components needs). Every
    * arithmetic step is replayable: per-target contribution sums are
    * decimal-exact (order/partition independent), the teleport and
    * damping terms are plain IEEE doubles computed once on the driver.
    *
    * Scale shape per iteration: two equi-joins on src (edges ⋈ ranks ⋈
    * out-degrees) + one map-side-combined aggregate on dst + a left join
    * back to the node set — all key-partitioned, no broadcast of
    * anything node-sized, no driver collect. `iters` is expected to be
    * small (single digits); each iteration localCheckpoints so lineage
    * stays flat. */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int = 2,
               damping: Double = 0.85): DataFrame = {
    import graft.functions.SafeCasts.decimalSum
    require(iters >= 0 && damping > 0 && damping < 1,
      s"bad pageRank params: iters=$iters damping=$damping")
    val ids = nodes.select(col("id")).localCheckpoint()
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val n = ids.count().toDouble
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    var rank = ids.select(col("id"), lit(1.0 / n).as("rank"))
    for (_ <- 0 until iters) {
      val contrib = e
        .join(rank.withColumnRenamed("id", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
      val sums = contrib.groupBy(col("id"))
        .agg(decimalSum(col("c"), 12).as("cs"))
      rank = ids.join(sums, Seq("id"), "left")
        .select(col("id"),
          (lit((1 - damping) / n) +
            lit(damping) * coalesce(col("cs"), lit(0.0))).as("rank"))
        .localCheckpoint()
    }
    rank
  }
}
