package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Local probe for q86's 8x slope in the BENCH regime: the replicated
  * corpus materialized to parquet, min-of-3 timings. */
object Q86Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val base = graft.model.Tables.load(spark, sf, "documents")
    val out1 = "/tmp/q86probe/x1"; val out8 = "/tmp/q86probe/x8"
    if (!new java.io.File(out8).isDirectory) {
      base.write.mode("overwrite").parquet(out1)
      (0 until 8).map { i =>
        var d = base.withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
        if (i > 0) d = d.withColumn("text", expr(
          s"array_join(transform(split(text, ' '), (w, j) -> " +
            s"CASE WHEN pmod(j + $i, 7) = 0 THEN concat(w, '_r$i') " +
            s"ELSE w END), ' ')"))
        d
      }.reduce(_ unionByName _).write.mode("overwrite").parquet(out8)
    }
    def q86(dir: String): Long = {
      val docs = spark.read.parquet(dir)
      graft.ext.Dedup.fuzzyNearDups(
        docs.filter(col("text").isNotNull)
          .select(col("doc_id"), substring(col("text"), 1, 40).as("head")),
        "doc_id", "head", maxDist = 5, prefixLen = 10, lenBand = 8).count()
    }
    def best(dir: String): Double =
      (1 to 4).map { _ =>
        val t0 = System.nanoTime(); q86(dir); (System.nanoTime() - t0) / 1e9
      }.tail.min
    q86(out1); q86(out8) // warm codegen
    val t1 = best(out1); val t8 = best(out8)
    println(f"q86 1x=${t1}%.3f 8x=${t8}%.3f slope=${t8 / t1}%.2f")
    spark.stop()
  }
}
