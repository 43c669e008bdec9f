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

  /** Temperature-scaled mixture (the α-sampling of multilingual /
    * multi-source pretraining corpora, Lample & Conneau 2019 §3.1): keep
    * counts proportional to n_s^alpha, flattening the source distribution —
    * alpha=1 keeps everything (natural proportions), alpha=0 targets a
    * uniform mix. Acceptance sampling can only downsample, so rates are
    * scaled to the largest feasible corpus: rate_s = (n_min/n_s)^(1−α),
    * which gives the smallest source rate 1.0 and every kept-count exactly
    * ∝ n_s^alpha. Unlike [[weightedMixture]] the rates are DERIVED from the
    * observed counts — the operator is the self-tuning form of the mixture
    * knob.
    *
    * Output adds audit columns: `mix_bucket` (the row's md5 bucket) and
    * `mix_thr` (its source's acceptance threshold in [0, 65536]).
    *
    * Scale shape: one count aggregate over the source column (narrow), the
    * per-source thresholds broadcast back (|sources| rows), and the filter
    * is a scan-level predicate — no corpus shuffle at any point.
    * Determinism: rows are kept by the same md5-bucket rule as [[uniform]];
    * for alpha=0.5 the threshold arithmetic is sqrt (IEEE-exact in any
    * engine), which is what the q71 oracle pins — other alphas go through
    * pow and are unit-verified instead. */
  def temperatureMixture(df: DataFrame, source: Column, key: Column,
      alpha: Double): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha out of [0,1]: $alpha")
    val e = 1.0 - alpha
    val counts = df.groupBy(source.as("__src"))
      .agg(count(lit(1)).as("__n"))
    val nMin = counts.agg(min(col("__n")).as("__n_min"))
    val ratio = col("__n_min").cast("double") / col("__n").cast("double")
    // sqrt, not pow, for the α=0.5 case: sqrt is correctly rounded per
    // IEEE 754 so the DuckDB twin computes the identical threshold; pow
    // carries no such guarantee across libm implementations.
    val rate = if (e == 0.5) sqrt(ratio) else pow(ratio, lit(e))
    val thr = counts.crossJoin(broadcast(nMin))
      .select(col("__src"), floor(rate * lit(65536.0)).cast("int").as("mix_thr"))
    // Null-safe join: `groupBy` above counts NULL sources as their own
    // stratum, so NULL-source rows must reach their threshold too — a plain
    // `===` never matches NULL and silently dropped that whole stratum.
    df.join(broadcast(thr), source <=> col("__src"))
      .withColumn("mix_bucket", hashBucket(key))
      .filter(col("mix_bucket") < col("mix_thr"))
      .drop("__src")
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
