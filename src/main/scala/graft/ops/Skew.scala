package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY §7.5 scale posture). AQE's skew-join
  * split is the first line of defense; explicit salting is for the cases
  * AQE can't rewrite — e.g. a hot key on the BUILD side of an aggregation,
  * or a key whose row count exceeds a single task's memory even after
  * splits.
  */
object Skew {

  /** Salted equi-join: the skewed left side gets a deterministic salt from a
    * uniformity hash of its whole row; the right side is replicated
    * `saltFactor` times (explode of a literal range), so each (key, salt)
    * pair co-locates a 1/saltFactor slice of the hot key. Use when `right`
    * is too big to broadcast and `left` has hot keys. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col).toSeq: _*)), lit(saltFactor))
        .cast("int"))
    val replicated = right.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase (partial → final) aggregation with salting: counts/sums for
    * a heavily skewed group key. Phase 1 aggregates (key, salt) partitions;
    * phase 2 combines the saltFactor partials per key. Catalyst already
    * does map-side partial agg; this adds an extra REDUCE level for keys
    * whose partials alone overwhelm one task. */
  def saltedCount(df: DataFrame, key: Column, saltFactor: Int): DataFrame =
    df.groupBy(key.as("key"),
        pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltFactor))
          .as("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col("key"))
      .agg(sum(col("__partial")).as("n"))
}
