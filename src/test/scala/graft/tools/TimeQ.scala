package graft
import org.apache.spark.sql.SparkSession

/** Dev-only: time named queries N times each in one warm session — run1
  * includes plan+codegen compile, repeats show steady-state data-path cost.
  * Usage: runMain graft.TimeQ q17_simhash,q28_ivf_ann [reps]. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',')
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    for (name <- names; i <- 1 to reps) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val n = df.count()
      println(f"[timeq] $name run$i: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      if (i == 1 && sys.env.contains("GRAFT_PRINT_PLAN")) {
        // post-action executedPlan = AQE final plan (shows runtime reuse)
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
