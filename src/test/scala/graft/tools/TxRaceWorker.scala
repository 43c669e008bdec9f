package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.merge.TxTable

/** One competing writer PROCESS for TxTableSpec's multi-JVM OCC test: a
  * fresh JVM with its own SparkSession (no shared driver state, no shared
  * Hadoop FileSystem cache — the real multi-process contention TxTable's
  * link(2)/rename slot claim is designed for).
  *
  * Protocol: args = (tableDir, writerId, nAppends, barrierDir). The worker
  * signals `ready-<id>` in the barrier dir, blocks until the parent drops
  * `go` (so all racers hit the log together rather than serializing behind
  * JVM startup), then fires `nAppends` single-row appends. Stdout line
  * `TXRACE_OK=<n>` reports how many commits the OCC layer accepted; every
  * one of those must be live in the final table (the no-lost-commit
  * invariant the parent asserts). */
object TxRaceWorker {
  def main(args: Array[String]): Unit = {
    val Array(dir, idStr, nStr, barrier) = args
    val id = idStr.toInt
    val n = nStr.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"tx-race-worker-$id")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    Files.writeString(Paths.get(barrier, s"ready-$id"), "ready")
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (!Files.exists(Paths.get(barrier, "go"))) {
      if (System.nanoTime() > deadline) sys.error("barrier timeout: no go signal")
      Thread.sleep(20)
    }

    var ok = 0
    for (i <- 1 to n) {
      try {
        TxTable.append(spark, dir, Seq((id * 1000L + i, s"w$id-$i")).toDF("k", "s"))
        ok += 1
      } catch { case _: java.io.IOException => () } // bounded retry exhausted
    }
    // Parseable result line — the parent greps this out of Spark's noise.
    println(s"TXRACE_OK=$ok")
    spark.stop()
    sys.exit(0)
  }
}
