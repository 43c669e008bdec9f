package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only probe: q42 (salted join) at 1x and 8x replication, repeated,
  * to separate plan pathology from machine noise in the bench slope. */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.1"
    def scaled(name: String, keys: Seq[String], k: Int): DataFrame = {
      val base = graft.model.Tables.load(spark, sfDir, name)
      (0 until k).map { i =>
        keys.foldLeft(base)((acc, c) => acc.withColumn(c, col(c) + lit(i * 10000000L)))
      }.reduce(_ unionByName _)
    }
    def q42(li: DataFrame, o: DataFrame): Long =
      graft.ops.Skew.saltedJoin(
          li.select(col("l_orderkey").as("k"), col("l_extendedprice")),
          o.select(col("o_orderkey").as("k"), col("o_orderstatus")),
          Seq("k"), saltFactor = 4)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_items")).count()
    val li1 = graft.model.Tables.load(spark, sfDir, "lineitem")
    val o1 = graft.model.Tables.load(spark, sfDir, "orders")
    val li8 = scaled("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"), 8)
      .localCheckpoint()
    val o8 = scaled("orders", Seq("o_orderkey", "o_custkey"), 8).localCheckpoint()
    for (r <- 1 to 3) {
      val t0 = System.nanoTime(); q42(li1, o1)
      val t1x = (System.nanoTime() - t0) / 1e9
      val t2 = System.nanoTime(); q42(li8, o8)
      val t8x = (System.nanoTime() - t2) / 1e9
      println(f"[skewprobe] rep$r: 1x=$t1x%.2f s  8x=$t8x%.2f s  slope=${t8x / t1x}%.2f")
    }
    spark.stop()
  }
}
