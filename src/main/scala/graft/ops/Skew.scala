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
    * is too big to broadcast and `left` has hot keys.
    *
    * `hotKeyMinRows > 0` switches to HOT-KEY-ONLY salting — the production
    * form: one map-combined count over the left's keys finds the keys at/
    * over the threshold (bounded collect, loud fence), ONLY their rows
    * salt/replicate, and every other key joins plain under salt 0. The
    * replication tax becomes O(hot keys' right rows) instead of
    * O(right × saltFactor) — on a uniform key the operator measures,
    * finds nothing hot, and degrades to the plain join it must equal
    * (the [[keyProfile]] philosophy: salting should follow measurement).
    * Output is identical either way.
    *
    * Join types: the replicated build side makes unmatched RIGHT rows
    * appear once per salt, so right/full outer joins are refused loudly;
    * inner/left/semi/anti are exact. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltFactor: Int, joinType: String = "inner",
                 hotKeyMinRows: Long = 0L,
                 maxHotKeys: Int = 100000): DataFrame = {
    require(!Set("right", "rightouter", "right_outer", "full", "outer",
        "fullouter", "full_outer").contains(
        joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin($joinType): a replicated build side would emit " +
        "unmatched right rows once per salt — use a plain join or flip " +
        "the sides")
    val rowSalt =
      pmod(xxhash64(struct(left.columns.map(col).toSeq: _*)), lit(saltFactor))
        .cast("int")
    if (hotKeyMinRows <= 0L) {
      val salted = left.withColumn("__salt", rowSalt)
      val replicated = right.withColumn("__salt",
        explode(array((0 until saltFactor).map(lit): _*)))
      salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
    } else {
      val hotRows = left.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__n"))
        .filter(col("__n") >= hotKeyMinRows)
        .select(keys.map(col): _*)
        .limit(maxHotKeys + 1).collect()
      require(hotRows.length <= maxHotKeys,
        s"saltedJoin: more than $maxHotKeys keys at/over " +
          s"hotKeyMinRows=$hotKeyMinRows — the key isn't skewed, it's " +
          "dense; salt everything (hotKeyMinRows = 0) or raise maxHotKeys")
      if (hotRows.isEmpty)
        // measured: nothing hot — the plain join IS the right plan
        left.join(right, keys, joinType)
      else {
        val spark = left.sparkSession
        import scala.jdk.CollectionConverters._
        val hotDf = broadcast(spark.createDataFrame(
          hotRows.toSeq.asJava,
          org.apache.spark.sql.types.StructType(
            keys.map(k => left.schema(k))))
          .withColumn("__hot", lit(1)))
        val salted = left
          .withColumn("__salt0", rowSalt) // over ORIGINAL columns only
          .join(hotDf, keys, "left")
          .withColumn("__salt",
            when(col("__hot").isNotNull, col("__salt0")).otherwise(lit(0)))
          .drop("__hot", "__salt0")
        val replicated = right.join(hotDf, keys, "left")
          .withColumn("__salt", explode(
            when(col("__hot").isNotNull,
              array((0 until saltFactor).map(lit): _*))
              .otherwise(array(lit(0)))))
          .drop("__hot")
        salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
      }
    }
  }

  /** Key-skew profile + salting advisory for a prospective shuffle on
    * `key`: the `topK` hottest keys with exact counts, each key's share of
    * the table, and the salt factor that slices the key's rows into
    * `targetRowsPerTask`-sized tasks (ceil(n/target) — 1 means no salting
    * needed). Run this BEFORE committing to [[saltedJoin]]/[[saltedCount]]
    * factors: salting costs a replicated build side, so the factor should
    * come from measurement, not guesswork.
    *
    * Scale shape: one map-side-combined count per key, a broadcast 1-row
    * total, and a TakeOrdered top-k — no unpartitioned window over the
    * counts table (whose row count is the key cardinality, potentially
    * billions). Keys are stringified first so tie order and output schema
    * are type-independent. */
  def keyProfile(df: DataFrame, key: Column, topK: Int = 10,
                 targetRowsPerTask: Long = 4000000L): DataFrame = {
    val counts = df.groupBy(key.cast("string").as("key_value"))
      .agg(count(lit(1)).as("n_rows"))
    val total = broadcast(df.agg(count(lit(1)).as("__total")))
    counts.crossJoin(total)
      .orderBy(col("n_rows").desc, col("key_value"))
      .limit(topK)
      .select(col("key_value"), col("n_rows"),
        round(col("n_rows") / col("__total"), 6).as("share_r6"),
        ceil(col("n_rows") / lit(targetRowsPerTask.toDouble)).cast("long")
          .as("suggested_salt"))
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
