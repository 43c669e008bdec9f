package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators: the last mile of a training-data pipeline —
  * turn curated documents into a tokenized, packed, decontaminated corpus.
  * Tokenization matches the house rule (`split(trim(lower(text)), "\s+")`)
  * shared by TextStats/TextPrep/Dedup.
  */
object Corpus {

  private def toks(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Frequency-ranked vocabulary: `(token, token_id, freq)`, token_id
    * 1-based rank by (freq desc, token).
    *
    * The rank is computed WITHOUT a global single-partition window: the
    * distinct-token aggregate is range-partitioned on the rank order, ranked
    * within each partition, and shifted by per-partition row-count offsets
    * (a bounded collect of one row per partition). Output is identical to
    * `row_number() OVER (ORDER BY freq DESC, token)` — (freq, token) is a
    * strict total order since token is unique — but the sort distributes
    * over all shuffle partitions, so a 10M-token web-scale vocab ranks in
    * parallel instead of on one executor thread. */
  def buildVocab(docs: DataFrame, text: Column): DataFrame = {
    val freqs = docs.select(explode(toks(text)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
    globalRank(freqs, Seq(desc("freq"), col("token")), "token_id")
  }

  /** Attach a 1-based global rank column by `order` (which must be a strict
    * total order) without a single-partition window: range-partition on the
    * order, rank within partitions, add per-partition offsets. The only
    * driver-side state is one (partition, count) row per shuffle partition.
    *
    * Caveats of the `localCheckpoint` pin (same trade as the connected-
    * components rounds in [[Dedup]]): it executes the upstream scan EAGERLY
    * at call time, truncates lineage — losing an executor that holds
    * checkpointed blocks (spot kill, dynamic deallocation) fails the job
    * unrecoverably rather than recomputing — and the blocks stay cached
    * until the result is fully consumed and GC'd. On a cluster where
    * executor churn is expected, swap for `persist(MEMORY_AND_DISK)` +
    * `count()`: same double-read protection, lineage preserved. */
  private[graft] def globalRank(df: DataFrame, order: Seq[Column],
      out: String): DataFrame = {
    // withColumn silently REPLACES an existing column of the same name,
    // which would corrupt both the rank and the caller's data.
    val reserved = Set("__pid", "__r", "__offset")
    require(!df.columns.exists(reserved),
      s"globalRank input must not contain helper columns $reserved")
    // Pin the range-shuffled aggregate: both the offset job and the final
    // plan read it, and without the checkpoint each would re-run the
    // upstream corpus scan.
    val parted = df.repartitionByRange(order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    // Bounded collect: one row per shuffle partition. Offsets make the
    // within-partition ranks globally consecutive in range order.
    val counts = parted.groupBy("__pid").agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _).init)
    val offDf = df.sparkSession.createDataFrame(offsets.toSeq)
      .toDF("__pid", "__offset")
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
    parted
      .withColumn("__r", row_number().over(w).cast("long"))
      .join(broadcast(offDf), "__pid")
      .withColumn(out, col("__offset") + col("__r"))
      .drop("__pid", "__r", "__offset")
  }

  /** Integer-encode documents against a vocabulary: one row per token
    * position `(doc_id, pos, token, token_id)`. The vocab join shuffles on
    * token (broadcast is wrong at web scale: a 10M-entry vocab is too big
    * to ship to every executor); unknown tokens keep a null token_id. */
  def encode(docs: DataFrame, id: Column, text: Column,
      vocab: DataFrame): DataFrame =
    docs.select(id.as("doc_id"), posexplode(toks(text)).as(Seq("pos", "token")))
      .join(vocab.select(col("token"), col("token_id")), Seq("token"), "left")
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("token"),
        col("token_id"))

  /** Greedy sequence packing: documents are laid end-to-end in a
    * deterministic hash order and cut into fixed-capacity packs; a doc's
    * pack is decided by the token count accumulated BEFORE it. Packing is
    * per-shard (hash of the id), so the window sort parallelizes across
    * `nShards` partitions instead of one global sort — the pack key is
    * (shard, pack_id). Emits (doc_id, shard, pack_id, pack_offset,
    * n_tokens). */
  def packSequences(docs: DataFrame, id: Column, text: Column,
      capacity: Int, nShards: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    val w = Window.partitionBy("shard")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(id.as("doc_id"), size(toks(text)).cast("long").as("n_tokens"))
      .withColumn("shard", Sampling.shard(col("doc_id"), nShards))
      .withColumn("cum_before", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("doc_id"), col("shard"),
        expr(s"cum_before DIV $capacity").as("pack_id"),
        expr(s"cum_before % $capacity").as("pack_offset"), col("n_tokens"))
  }

  /** Publish a corpus: parquet partitioned by shard, rows sorted within
    * partitions (clusters parquet min/max stats on the sort key, so pack-
    * range reads prune row groups), file sizes bounded by
    * `maxRecordsPerFile`. One shuffle (the repartition on shard); the sort
    * is partition-local. Readers consume one `shard=N/` directory per
    * training worker. */
  def writeSharded(df: DataFrame, outDir: String, shardCol: String,
      sortCols: Seq[String], maxRecordsPerFile: Long): Unit =
    df.repartition(col(shardCol))
      .sortWithinPartitions((shardCol +: sortCols).map(col): _*)
      .write.mode("overwrite")
      .partitionBy(shardCol)
      .option("maxRecordsPerFile", maxRecordsPerFile.toString)
      .parquet(outDir)

  /** Benchmark decontamination: training docs sharing at least one distinct
    * `n`-gram with any benchmark doc, with the shared-gram count as
    * evidence. Shuffles on the gram hash — each side carries only
    * (gram, id) pairs, and per-doc DISTINCT runs before the join so a
    * repeated phrase inside one doc doesn't amplify. */
  def contamination(train: DataFrame, trainId: Column, trainText: Column,
      bench: DataFrame, benchId: Column, benchText: Column,
      n: Int): DataFrame = {
    def grams(df: DataFrame, id: Column, text: Column, out: String) =
      df.select(id.as(out),
        explode(graft.functions.TextExprs.wordNGrams(text, n)).as("gram"))
    val tg = grams(train, trainId, trainText, "doc_id")
    val bg = grams(bench, benchId, benchText, "bench_id").select("gram").distinct()
    tg.join(bg, Seq("gram"))
      .groupBy("doc_id")
      .agg(countDistinct(col("gram")).as("n_shared_grams"))
  }
}
