package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool: time selected queries under the Bench session profile and
  * break the wall-clock into Spark jobs (count + per-job duration), so
  * "where do q149's 9.7 s go" is a measured fact, not a guess.
  *
  * Usage: sbt "runMain graft.tools.Profile q149_sql_maintenance[:reps] ..."
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS   (default min(32, cores)).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).count()

    // job ledger: (jobId -> (desc, startNs)); closed jobs accumulate
    val open = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val closed = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val d = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        open.put(js.jobId, (d, System.nanoTime()))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val v = open.remove(je.jobId)
        if (v != null) closed.add((v._1, (System.nanoTime() - v._2) / 1e9))
      }
    })

    val warmDir =
      if (new java.io.File("/root/testdata/sf0.001").isDirectory) "/root/testdata/sf0.001"
      else sfDir
    for (a <- args) {
      val (name, reps) = a.split(':') match {
        case Array(n, r) => (n, r.toInt)
        case Array(n) => (n, 3)
      }
      val fn = graft.SparkEntry.queries(name)
      try fn(spark, warmDir).count()
      catch { case e: Throwable => System.err.println(s"[profile] warmup $name: $e") }
      val times = (1 to reps).map { i =>
        closed.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        if (i == reps) {
          // last rep: print the job ledger, slowest first
          import scala.jdk.CollectionConverters._
          val jobs = closed.asScala.toSeq
          val tot = jobs.map(_._2).sum
          println(f"== $name rep$i wall=$wall%.3f s, ${jobs.size} jobs, job-sum=$tot%.3f s")
          jobs.sortBy(-_._2).take(25).foreach { case (d, t) =>
            println(f"   $t%8.3f  ${d.take(110)}")
          }
        }
        wall
      }
      println(f"== $name min=${times.min}%.3f med=${times.sorted.apply(times.size / 2)}%.3f times=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
