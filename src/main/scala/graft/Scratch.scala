package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Dedup
import graft.model.Tables

/** Dev-only timing harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $label: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val sigs = Dedup.signatures(docs, "doc_id", "text", 1, 32)
    time("sigs")(sigs.count())
    val narrow = Dedup.lshBands(sigs, 32, 8)
    time("bands")(narrow.count())
    val pairs = narrow
      .join(narrow.withColumnRenamed("doc_id", "doc_b"), Seq("band_id", "band_hash"))
      .filter(col("doc_id") < col("doc_b"))
      .select(col("doc_id").as("doc_a"), col("doc_b")).distinct()
    time("pairs")(pairs.count())
    time("full")(Dedup.minhashNearDups(docs, "doc_id", "text", 1, 32, 8, 0.5).count())
    time("simhashTable")(Dedup.simhashTable(docs, "doc_id", "text").count())
    spark.stop()
  }
}
