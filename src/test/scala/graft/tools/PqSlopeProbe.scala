package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev-only: time q13/q28/q67/q68/q72 at 1x and 8x (the bench's replica
  * recipe) to read the top-k-aggregate slope directly. */
object PqSlopeProbe extends App {
  val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
  val spark = SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val k = 8
  // bench-identical 8x embeddings replica (perturbed per replica)
  import org.apache.spark.sql.functions._
  val out = java.nio.file.Files.createTempDirectory(s"pqslope-").toString
  val base = graft.model.Tables.load(spark, sfDir, "embeddings")
  val rep = (0 until k).map { i =>
    var d = base.withColumn("vec_id", col("vec_id") + lit(i * 10000000L))
    if (i > 0) d = d.withColumn("embedding", expr(
      s"transform(embedding, (x, j) -> cast(x + (pmod($i * 31 + j, 7) - 3) * 0.17 as float))"))
    d
  }.reduce(_ unionByName _)
  rep.write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  for (t <- Seq("region","nation","customer","supplier","part","orders","lineitem","events","documents"))
    try { val p = new java.io.File(s"$sfDir/$t.parquet"); if (p.exists())
      java.nio.file.Files.createSymbolicLink(java.nio.file.Paths.get(s"$out/$t.parquet"), p.toPath) } catch { case _: Throwable => }
  val qs = Seq("q13_ann_topk", "q28_ivf_ann", "q67_pq_ann", "q68_ivfpq_ann", "q72_pq_refined")
  for (q <- qs) {
    val fn = graft.SparkEntry.queries(q)
    fn(spark, sfDir).count() // warm
    def t(dir: String): Double = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); fn(spark, dir).count(); (System.nanoTime()-t0)/1e9 }.min
    val t1 = t(sfDir); val t8 = t(out)
    println(f"[pqslope] $q: 1x=$t1%.2f 8x=$t8%.2f slope=${t8/t1}%.2f")
  }
  org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(out))
  spark.stop()
}
