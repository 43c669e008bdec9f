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
    * 1-based dense rank by (freq desc, token). The global window runs on a
    * single partition, but only over the DISTINCT-token aggregate — ~10M
    * rows at web scale, not the corpus — which is the standard shape for
    * vocab construction. */
  def buildVocab(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(toks(text)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .withColumn("token_id",
        row_number().over(Window.orderBy(desc("freq"), col("token"))).cast("long"))

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
