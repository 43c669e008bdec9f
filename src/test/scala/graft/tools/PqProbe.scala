package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.SimSearch
import graft.model.Tables

/** Dev-only PQ recall probe (not part of the driver contract): recall@5 of
  * pqTopK across (m, lloydIters) on the test embeddings, vs brute force. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val bf = SimSearch.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    for (m <- Seq(4, 8, 16); it <- Seq(0, 1, 2, 4)) {
      val pq = SimSearch.pqTopK(emb, queries, "vec_id", "embedding", 5,
        m = m, nCodes = 16, dim = 64, lloydIters = it)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val recall = (bf intersect pq).size.toDouble / bf.size
      println(f"[pqprobe] m=$m%2d iters=$it: recall@5=$recall%.3f")
    }
    spark.stop()
  }
}
