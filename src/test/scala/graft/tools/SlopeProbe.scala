package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: time arbitrary SparkEntry queries at 1x and 8x over a
  * bench-identical replicated corpus (key shifts + per-replica text/
  * embedding perturbation — the Bench.buildScaled recipe) and print the
  * slope. Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "Test/runMain graft.tools.SlopeProbe q60_semantic_dedup_bucketed,q109_interval_overlap"
  */
object SlopeProbe extends App {
  val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
  val names =
    if (args.nonEmpty) args(0).split(',').map(_.trim).filter(_.nonEmpty).toSeq
    else Seq("q60_semantic_dedup_bucketed", "q86_fuzzy_blocked_dedup",
      "q109_interval_overlap", "q112_sparse_cosine")
  val spark = SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")

  private val keyShifts: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  val k = 8
  val out = java.nio.file.Files.createTempDirectory(s"slope-${k}x-").toString
  val all = graft.model.Tables.relational ++ graft.model.Tables.stream ++
    graft.model.Tables.corpus
  for (t <- all) {
    val base = graft.model.Tables.load(spark, sfDir, t)
    val df =
      if (!keyShifts.contains(t)) base
      else (0 until k).map { i =>
        var d = keyShifts(t).foldLeft(base)((acc, c) =>
          acc.withColumn(c, col(c) + lit(i * 10000000L)))
        if (i > 0 && t == "documents")
          d = d.withColumn("text", expr(
            s"array_join(transform(split(text, ' '), (w, j) -> " +
              s"CASE WHEN pmod(j + $i, 7) = 0 THEN concat(w, '_r$i') " +
              s"ELSE w END), ' ')"))
        if (i > 0 && t == "embeddings")
          d = d.withColumn("embedding", expr(
            s"transform(embedding, (x, j) -> " +
              s"cast(x + (pmod($i * 31 + j, 7) - 3) * 0.17 as float))"))
        d
      }.reduce(_ unionByName _)
    df.write.mode("overwrite").parquet(s"$out/$t.parquet")
  }
  for (q <- names) {
    val fn = graft.SparkEntry.queries(q)
    try fn(spark, sfDir).count() catch { case e: Throwable =>
      println(s"[slope] $q warmup failed: $e") }
    def t(dir: String): Double = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); fn(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }.min
    val t1 = t(sfDir); val t8 = t(out)
    println(f"[slope] $q: 1x=$t1%.2f 8x=$t8%.2f slope=${t8 / t1}%.2f")
  }
  org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(out))
  spark.stop()
}
