package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Q112Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = graft.model.Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val k = 8
    val docs8 = (0 until k).map { i =>
      var d = base.withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
      if (i > 0) d = d.withColumn("text", expr(
        s"array_join(transform(split(text, ' '), (w, j) -> " +
          s"CASE WHEN pmod(j + $i, 7) = 0 THEN concat(w, '_r$i') " +
          s"ELSE w END), ' ')"))
      d
    }.reduce(_ unionByName _).cache()
    println("DOCS8: " + docs8.count())
    for (fence <- Seq(1000L, 64L); rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.ext.InvertedIndex.sparseCosinePairs(
        docs8, "doc_id", "text", n = 3, maxDf = fence, minSim = 0.5).count()
      println(f"FENCE $fence rep $rep: ${(System.nanoTime()-t0)/1e9}%.2f s, $n pairs")
    }
    spark.stop()
  }
}
