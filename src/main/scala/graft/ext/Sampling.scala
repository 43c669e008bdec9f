package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines (SURVEY §7.6).
  *
  * `sample()`/`rand()` are banned here: a training corpus must be
  * reproducible run-over-run, stable under repartitioning, and auditable
  * ("why is this doc in the sample?"). All operators below derive their
  * randomness from the md5 of a caller-chosen key, so the decision for a
  * row is a pure function of the row — the same row set falls out on any
  * cluster layout, any retry, and in any engine (the DuckDB oracle computes
  * the identical buckets).
  *
  * Scale shape: uniform sampling and sharding are narrow (no shuffle — the
  * filter pushes to the scan); stratified quotas shuffle once on the strata
  * key, which is the floor for an exact per-group quota.
  */
object Sampling {

  /** Bucket in [0, 65536): the first 4 hex digits of md5(key). Engine-
    * portable (DuckDB: `CAST('0x' || substr(md5(k),1,4) AS INTEGER)`). */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("int")

  /** Keep ~`rate` of rows, deterministically. Resolution is 1/65536. */
  def uniform(df: DataFrame, key: Column, rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate out of [0,1]: $rate")
    df.filter(hashBucket(key) < math.round(rate * 65536).toInt)
  }

  /** Deterministic shard assignment in [0, nShards) — the "global shuffle"
    * of a training pipeline: hash-ordered, not data-ordered, and stable. */
  def shard(key: Column, nShards: Int): Column = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    hashBucket(key) % nShards
  }

  /** Weighted mixture: keep each row at its source's rate — the
    * data-mixture knob of a pretraining corpus ("2x web, 0.5x forums").
    * Rates are a literal when-chain on the source column (no join, stays
    * narrow); sources absent from `rates` are dropped. Deterministic like
    * [[uniform]]: the same doc survives the same mixture everywhere. */
  def weightedMixture(df: DataFrame, source: Column, key: Column,
      rates: Map[String, Double]): DataFrame = {
    require(rates.nonEmpty, "rates must not be empty")
    require(rates.values.forall(r => r >= 0 && r <= 1),
      s"rates out of [0,1]: $rates")
    val threshold = rates.tail.foldLeft(
      when(source === rates.head._1,
        lit(math.round(rates.head._2 * 65536).toInt))) {
      case (acc, (s, r)) =>
        acc.when(source === s, lit(math.round(r * 65536).toInt))
    }.otherwise(lit(0))
    df.filter(hashBucket(key) < threshold)
  }

  /** Per-stratum quota: the `n` rows of each group with the smallest
    * (md5(key), key) — a deterministic "random n per group". Emits the
    * stratum rank as `rankCol` (1-based). */
  def stratified(df: DataFrame, strata: Seq[String], key: Column, n: Int,
      rankCol: String = "strat_rank"): DataFrame = {
    require(n > 0, s"quota must be positive: $n")
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(md5(key.cast("string")), key)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= n)
  }
}
