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

  // ---------------------------------------------------------------------
  // BPE subword vocabulary (Sennrich, Haddow & Birch 2016, "Neural
  // Machine Translation of Rare Words with Subword Units"): iteratively
  // merge the most frequent adjacent symbol pair. The classic trainer is
  // a single-machine loop over the corpus; the scale insight here is that
  // BPE statistics are a pure function of the WORD FREQUENCY table — the
  // corpus is scanned exactly once (the word count aggregate), and every
  // merge iteration runs over the distinct-word table (a few million rows
  // for a web corpus), with a single 1-row collect (the argmax pair) per
  // iteration. Applying trained merges likewise segments the distinct
  // words, never the corpus — documents get their subwords by an
  // equi-join on word.
  // ---------------------------------------------------------------------

  /** The end-of-word marker appended to each word's symbol sequence so
    * merges can learn word-final subwords (standard BPE practice). */
  val BpeEow = "</w>"

  private def wordFreqs(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(toks(text)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wcount"))

  /** Initial symbol sequence of a word: its characters plus [[BpeEow]].
    * Spark's `split(w, "")` keeps the trailing zero-width match as an
    * empty string (Java split with limit -1) — filter it out, or every
    * word ends in a phantom "" symbol that poisons pair counts. */
  private def initialSyms(word: Column): Column =
    concat(filter(split(word, ""), s => length(s) > 0), array(lit(BpeEow)))

  /** One greedy left-to-right non-overlapping merge pass of (left, right)
    * over a symbol array, as a pure Catalyst fold: "a a a" under (a,a)
    * becomes ["aa", "a"], because the merged symbol is the concatenated
    * STRING and no longer matches `left` on the next step. */
  private def mergePass(syms: Column, left: String, right: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === left && x === right,
          concat(slice(acc, lit(1), size(acc) - 1),
            array(lit(left + right))))
          .otherwise(concat(acc, array(x))))

  /** Train `nMerges` BPE merges on the corpus. Returns the ordered merge
    * table (rank 1-based, left, right, pair_count) — possibly shorter
    * than `nMerges` if no remaining pair reaches `minPairCount`.
    * Deterministic: the argmax pair tie-breaks on (count desc, left,
    * right), so the same corpus trains the same merges on any layout.
    *
    * Scale shape: ONE corpus scan (word counts); each iteration is a
    * pair-count aggregate + argmax over the distinct-word table (pairs
    * shuffle as (symbol, symbol, count) — no text) and a 1-row collect;
    * the evolving word segmentation is checkpointed per iteration so the
    * plan stays flat across tens of merges. */
  def bpeTrain(docs: DataFrame, text: Column, nMerges: Int,
      minPairCount: Long = 2): DataFrame = {
    require(nMerges > 0, s"nMerges must be positive: $nMerges")
    require(minPairCount >= 1, s"minPairCount must be at least 1: $minPairCount")
    val spark = docs.sparkSession
    var state = wordFreqs(docs, text)
      .select(col("wcount"), initialSyms(col("word")).as("syms"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      val best = state
        .select(col("wcount"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("left"), b.as("right")))).as("p"))
        .groupBy(col("p.left").as("left"), col("p.right").as("right"))
        .agg(sum(col("wcount")).as("pair_count"))
        .orderBy(desc("pair_count"), asc("left"), asc("right"))
        .limit(1).collect() // bounded: exactly one argmax row
      best.headOption match {
        case Some(r) if r.getLong(2) >= minPairCount =>
          val (l, rt, c) = (r.getString(0), r.getString(1), r.getLong(2))
          merges += ((rank, l, rt, c))
          state = state
            .select(col("wcount"), mergePass(col("syms"), l, rt).as("syms"))
            .localCheckpoint()
          rank += 1
        case _ => exhausted = true
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("rank", "left", "right", "pair_count")
      .select(col("rank"), col("left"), col("right"), col("pair_count"))
  }

  /** Segment documents into BPE subwords under a trained merge table:
    * one row per (doc_id, pos, word, sub_pos, subword), `pos` the word
    * position, `sub_pos` the 0-based subword position. [[BpeEow]] appears
    * as trained: merged into a word-final subword where the merges
    * learned it, else as the word's own trailing symbol.
    *
    * The merge table is driver-collected (bounded by the trained merge
    * count — tens of thousands at most, the caller chose it) and applied
    * in rank order to the DISTINCT words of the corpus, checkpointing
    * every few passes; the corpus itself is touched only by the final
    * equi-join on word. */
  def bpeSegment(docs: DataFrame, id: Column, text: Column,
      merges: DataFrame, checkpointEvery: Int = 8): DataFrame = {
    require(checkpointEvery > 0, s"checkpointEvery must be positive: $checkpointEvery")
    val ranked = merges.select(col("rank"), col("left"), col("right"))
      .orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getString(2)))
    var words = docs.select(explode(toks(text)).as("word")).distinct()
      .select(col("word"), initialSyms(col("word")).as("syms"))
    for ((group, gi) <- ranked.grouped(checkpointEvery).zipWithIndex) {
      words = group.foldLeft(words) { case (df, (l, r)) =>
        df.select(col("word"), mergePass(col("syms"), l, r).as("syms"))
      }.localCheckpoint()
      val _ = gi // checkpoint cadence only
    }
    docs.select(id.as("doc_id"), posexplode(toks(text)).as(Seq("pos", "word")))
      .join(words, Seq("word"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("word"),
        posexplode(col("syms")).as(Seq("sub_pos", "subword")))
      .select(col("doc_id"), col("pos"), col("word"),
        col("sub_pos").cast("long").as("sub_pos"), col("subword"))
  }
}
