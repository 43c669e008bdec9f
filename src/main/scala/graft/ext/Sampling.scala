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

  /** Epoch mixture: [[weightedMixture]] with rates ABOVE 1 — the
    * "books ×2.5, web ×0.3" knob of a pretraining run, where high-value
    * sources are repeated for multiple epochs while low-value ones are
    * subsampled. A rate e means each row appears floor(e) times, plus one
    * more iff its md5 bucket clears the fractional part (so counts are
    * exact in expectation and repetition is deterministic per row — the
    * same docs get the extra epoch on every run and every engine).
    *
    * Output adds `epoch` (0-based copy number): downstream shuffling can
    * interleave epochs (e.g. shard on (key, epoch)) rather than emitting
    * the corpus k times back-to-back. Sources absent from `rates` drop,
    * matching [[weightedMixture]].
    *
    * Scale shape: narrow — a literal when-chain picks the per-source copy
    * count n = floor(e) + (bucket < frac(e)·65536), and one
    * explode(sequence(0, n-1)) expands rows in place; no join, no shuffle,
    * output bytes ∝ the requested epochs. */
  def epochMixture(df: DataFrame, source: Column, key: Column,
      rates: Map[String, Double]): DataFrame = {
    require(rates.nonEmpty, "rates must not be empty")
    require(rates.values.forall(r => r >= 0 && r <= 100),
      s"rates out of [0,100]: $rates")
    val bucket = hashBucket(key)
    def copies(e: Double): Column = {
      val whole = math.floor(e).toInt
      val fracThr = math.round((e - whole) * 65536).toInt
      lit(whole) + when(bucket < fracThr, 1).otherwise(0)
    }
    val n = rates.tail.foldLeft(
      when(source === rates.head._1, copies(rates.head._2))) {
      case (acc, (s, e)) => acc.when(source === s, copies(e))
    }.otherwise(lit(0))
    df.withColumn("__n_epochs", n)
      .filter(col("__n_epochs") > 0)
      .withColumn("epoch",
        explode(sequence(lit(0), col("__n_epochs") - 1)))
      .drop("__n_epochs")
  }

  /** Priority sampling (Duffield, Lund & Thorup, "Priority sampling for
    * estimation of arbitrary subset sums", JACM 2007): a WEIGHTED sample of
    * exactly k rows without replacement whose kept rows carry an unbiased
    * subset-sum estimator — the right way to downsample a corpus when rows
    * have very different sizes/importances and downstream consumers still
    * need `sum(weight)`-style totals from the sample alone.
    *
    * Each row gets priority q = w / u with u uniform in (0, 1]; the k
    * largest priorities are kept; τ is the (k+1)-th priority (0 when the
    * input has ≤ k rows) and each kept row's estimated weight is
    * max(w, τ). Σ est_weight over the sample is an unbiased estimator of
    * Σ w over the population, and heavy rows (w ≥ τ) are kept with
    * certainty at their true weight — the property plain md5-rate sampling
    * ([[uniform]]) cannot give.
    *
    * Determinism (house rule — no `rand()`): u = (md5 bucket + 1)/65536,
    * so q = (w · 65536) / (bucket + 1). The multiply is by a power of two
    * (IEEE-exact) and the divide is correctly rounded, so every priority —
    * and therefore the kept set, τ, and every estimate — replays
    * bit-for-bit in the DuckDB oracle. Ties break by (md5(key), key).
    *
    * Scale shape: priorities are a narrow map; the top-(k+1) runs as
    * TakeOrdered (per-partition heads, no global sort shuffle); τ and the
    * rank cut are a window over those ≤ k+1 rows only (bounded, single
    * task — NOT an unpartitioned window over the corpus). Output bytes are
    * O(k) however large the input. */
  def prioritySample(df: DataFrame, key: Column, weight: Column,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val pri = (weight.cast("double") * lit(65536.0)) /
      (hashBucket(key) + lit(1)).cast("double")
    val topK1 = df
      .filter(weight.isNotNull && weight > 0)
      .withColumn("sample_pri", pri)
      .withColumn("__tb", md5(key.cast("string")))
      .orderBy(col("sample_pri").desc, col("__tb"), key)
      .limit(k + 1)
    // window over at most k+1 rows (post-limit), not over the corpus
    val w = Window.orderBy(col("sample_pri").desc, col("__tb"), key)
    val ranked = topK1.withColumn("__rn", row_number().over(w))
    val tau = ranked.agg(coalesce(
      max(when(col("__rn") === k + 1, col("sample_pri"))), lit(0.0)).as("__tau"))
    ranked.filter(col("__rn") <= k)
      .crossJoin(broadcast(tau))
      .withColumn("est_weight", greatest(weight.cast("double"), col("__tau")))
      .drop("__tb", "__rn", "__tau")
  }

  /** Per-GROUP priority sampling: [[prioritySample]]'s weighted k-sample
    * and unbiased estimator, one independent sample per group — the
    * "representative weighted sample per source/language/domain" knob of
    * a mixture pipeline. Composes the [[graft.functions.SketchAggs
    * .topkRows]] bounded-heap aggregate, so the per-group top-(k+1) cut
    * shuffles ≤ k+1 rows per (group, partition) — no rank window over
    * each group's full population, and no driver involvement at any
    * group count (unlike the single-sample form's bounded τ collect).
    *
    * Same IEEE-exact arithmetic as [[prioritySample]]; the tie rule here
    * is the key's string form (the aggregate's keying), pinned by the
    * oracle. Output: (group_key, key, rnk, sample_pri, est_weight) —
    * est_weight = max(w, τ_group), τ_group = the group's (k+1)-th
    * priority (0 when the group has ≤ k rows). */
  def prioritySampleByGroup(df: DataFrame, group: Column, key: Column,
      weight: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val pri = (weight.cast("double") * lit(65536.0)) /
      (hashBucket(key) + lit(1)).cast("double")
    val base = df.filter(weight.isNotNull && weight > 0)
      .select(group.as("group_key"), key.cast("string").as("__key"),
        weight.cast("double").as("__w"), pri.as("__pri"))
    val top = graft.functions.SketchAggs.topkRows(base,
      Seq(col("group_key")), col("__pri"), col("__key"), k + 1)
    val tau = top.groupBy(col("group_key"))
      .agg(coalesce(max(when(col("rnk") === k + 1, col("val"))), lit(0.0))
        .as("__tau"))
    top.filter(col("rnk") <= k)
      .join(tau, Seq("group_key"))
      .join(base.select(col("group_key"), col("__key").as("tie"), col("__w")),
        Seq("group_key", "tie"))
      .select(col("group_key"), col("tie").as("key"), col("rnk"),
        col("val").as("sample_pri"),
        greatest(col("__w"), col("__tau")).as("est_weight"))
  }

  /** Leakage-safe train/val/test split: the atomic unit of assignment is
    * the NEAR-DUP CLUSTER, not the document — a doc-keyed split would put
    * one copy of a near-duplicated document in train and its twin in the
    * eval set, leaking training text into evaluation (the classic corpus-
    * split bug benchmark-decontamination papers warn about). Every member
    * of a cluster inherits the cluster's md5 bucket, so near-duplicates
    * can never straddle a split boundary by construction.
    *
    * `clusters` is a (doc_id, cluster_id) labeling — [[graft.ext.Dedup
    * .nearDupClusters]] output or any other grouping worth keeping atomic
    * (e.g. one cluster per source URL or per repository). Documents absent
    * from `clusters` are their own singleton cluster (cluster_id =
    * doc_id), so the operator composes with a labels table that only
    * records docs that HAVE near-dups.
    *
    * `fractions` are (split name, fraction) in declaration order, summing
    * to 1; cuts are cumulative-fraction thresholds on the 16-bit bucket
    * (resolution 1/65536, same rule as [[uniform]] — realized sizes are
    * binomial around the targets, exact only in expectation). The LAST
    * split takes the remainder so every bucket lands somewhere.
    *
    * Output: (doc_id, cluster_id, split). Deterministic and engine-
    * portable: assignment is a pure function of cluster_id, so the q78
    * oracle replays it from the recursive-CTE components, and re-running
    * with a grown corpus moves no existing cluster between splits (bucket
    * depends on nothing but the cluster id).
    *
    * Scale shape: one equi-join docs⋈labels (broadcast when the label
    * table is small — it only holds docs with near-dups), then a narrow
    * projection; no aggregate, no extra shuffle. */
  def leakageSafeSplit(docs: DataFrame, idCol: String, clusters: DataFrame,
      fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty, "fractions must not be empty")
    require(fractions.forall(_._2 > 0), s"fractions must be positive: $fractions")
    require(fractions.map(_._1).distinct.size == fractions.size,
      s"duplicate split names: $fractions")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1: $fractions")
    val cuts = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => math.round(c * 65536).toInt)
    val withCluster = docs.select(col(idCol).as("doc_id"))
      .join(clusters.select(col("doc_id"), col("cluster_id")), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    val bucket = hashBucket(col("cluster_id"))
    // last split takes the remainder: rounding must never orphan bucket 65535
    val split = fractions.init.zip(cuts.init)
      .foldLeft(None: Option[Column]) { case (acc, ((name, _), cut)) =>
        Some(acc.fold(when(bucket < cut, name))(_.when(bucket < cut, name)))
      }
      .fold(lit(fractions.last._1))(_.otherwise(fractions.last._1))
    withCluster.select(col("doc_id"), col("cluster_id"), split.as("split"))
  }
}
