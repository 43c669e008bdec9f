package graft

import org.apache.spark.sql.functions._
import graft.ext.Corpus

/** Corpus assembly: vocab ranks are dense and frequency-ordered, encoding
  * round-trips, packing respects capacity and shard-determinism,
  * contamination finds exactly the planted overlaps. */
class CorpusSpec extends SparkTestBase {
  import spark.implicits._

  test("vocab: frequency-ranked, deterministic ties, dense 1-based ids") {
    val docs = Seq("b b b a a c", "a c").toDF("text")
    val v = Corpus.buildVocab(docs, col("text"))
      .select("token", "token_id", "freq")
      .as[(String, Long, Long)].collect().sortBy(_._2)
    // freq: b=3, a=3, c=2 — tie between a and b broken by token asc
    assert(v.toSeq == Seq(("a", 1L, 3L), ("b", 2L, 3L), ("c", 3L, 2L)))
  }

  test("encode: every position, in order, with vocab ids; unknowns null") {
    val docs = Seq((1L, "b a b")).toDF("id", "text")
    val vocab = Seq(("a", 1L), ("b", 2L)).toDF("token", "token_id")
    val got = Corpus.encode(docs, col("id"), col("text"), vocab)
      .orderBy("pos").select("pos", "token", "token_id")
      .as[(Long, String, Long)].collect()
    assert(got.toSeq == Seq((0L, "b", 2L), (1L, "a", 1L), (2L, "b", 2L)))
    val unk = Corpus.encode(docs, col("id"), col("text"),
        vocab.filter(col("token") =!= "a"))
      .filter(col("token") === "a").select("token_id")
      .collect().head.isNullAt(0)
    assert(unk)
  }

  test("packing: offsets stay within capacity and are contiguous per pack") {
    val docs = (1L to 200L).map(i => (i, Seq.fill(7)(s"w$i").mkString(" ")))
      .toDF("id", "text") // every doc is 7 tokens
    val got = Corpus.packSequences(docs, col("id"), col("text"),
        capacity = 50, nShards = 3)
      .select("doc_id", "shard", "pack_id", "pack_offset", "n_tokens")
      .as[(Long, Int, Long, Long, Long)].collect()
    assert(got.forall { case (_, _, _, off, _) => off >= 0 && off < 50 })
    // concat-and-chunk semantics: per shard the docs tile the token stream
    // contiguously (cum = pack_id*C + offset advances by exactly n_tokens),
    // and a doc straddling a boundary stays in the pack of its first token
    got.groupBy(_._2).foreach { case (_, rows) =>
      val cums = rows.map { case (_, _, pid, off, n) => (pid * 50L + off, n) }
        .sortBy(_._1)
      assert(cums.head._1 == 0L)
      cums.sliding(2).foreach {
        case Array((c0, n0), (c1, _)) => assert(c1 == c0 + n0)
        case _ =>
      }
    }
    // deterministic under repartitioning
    val again = Corpus.packSequences(docs.repartition(11), col("id"),
        col("text"), capacity = 50, nShards = 3)
      .select("doc_id", "shard", "pack_id", "pack_offset", "n_tokens")
      .as[(Long, Int, Long, Long, Long)].collect()
    assert(got.toSet == again.toSet)
  }

  test("contamination: exactly the planted n-gram overlaps, distinct-counted") {
    val bench = Seq((100L, "the secret benchmark phrase ends here")).toDF("id", "text")
    val train = Seq(
      (1L, "nothing shared at all with anything"),
      // shares "secret benchmark phrase" (and the 3-grams around it)
      (2L, "contains the secret benchmark phrase twice the secret benchmark phrase"),
      (3L, "phrase ends here but nothing else")).toDF("id", "text")
    val got = Corpus.contamination(train, col("id"), col("text"),
        bench, col("id"), col("text"), n = 3)
      .as[(Long, Long)].collect().toMap
    // doc 2: "the secret benchmark","secret benchmark phrase" (dup counted once)
    // doc 3: "phrase ends here"
    assert(got == Map(2L -> 2L, 3L -> 1L))
  }

  test("contamination: docs shorter than n produce no grams and no crash") {
    val bench = Seq((1L, "a b")).toDF("id", "text")
    val train = Seq((2L, "a b")).toDF("id", "text")
    assert(Corpus.contamination(train, col("id"), col("text"),
      bench, col("id"), col("text"), n = 3).count() == 0L)
  }

  test("writeSharded: shard dirs, bounded files, sorted within each file") {
    val out = tmpDir("corpus-out")
    val docs = (1L to 800L)
      .map(i => (i, ((i * 37) % 100).toString + " tokens here for " + i))
      .toDF("id", "text")
    val packed = Corpus.packSequences(docs, col("id"), col("text"),
      capacity = 64, nShards = 4)
    Corpus.writeSharded(packed, out, "shard",
      Seq("pack_id", "pack_offset"), maxRecordsPerFile = 100L)

    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs == Set("shard=0", "shard=1", "shard=2", "shard=3"))
    val files = new java.io.File(out).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    for (f <- files) {
      val rows = spark.read.parquet(f.getAbsolutePath)
        .select("pack_id", "pack_offset")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.length <= 100, s"${f.getName}: ${rows.length} rows")
      assert(rows.sameElements(rows.sortBy(identity)), s"${f.getName} unsorted")
    }
    // nothing lost in the layout
    assert(spark.read.parquet(out).count() == 800L)
  }

  // ------------------------------------------------------------------
  // BPE: model-based tests against an independent driver-side reference
  // implementation of the same greedy rules (chars + </w>, argmax pair by
  // (count desc, left, right), left-to-right non-overlapping merge).
  // ------------------------------------------------------------------

  private def refBpe(words: Map[String, Long], nMerges: Int,
      minPairCount: Long): (Seq[(String, String, Long)], Map[String, Seq[String]]) = {
    var segs: Map[Seq[String], Long] =
      words.groupMapReduce(w => w._1.split("").toSeq :+ "</w>")(_._2)(_ + _)
    var wordSegs: Map[String, Seq[String]] =
      words.keys.map(w => w -> (w.split("").toSeq :+ "</w>")).toMap
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    def mergeSeq(s: Seq[String], l: String, r: String): Seq[String] =
      s.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == l && x == r)
          acc.init :+ (l + r)
        else acc :+ x
      }
    var done = false
    for (_ <- 1 to nMerges if !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((s, c) <- segs; Seq(a, b) <- s.sliding(2))
        counts((a, b)) = counts.getOrElse((a, b), 0L) + c
      val best = counts.toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }.headOption
      best match {
        case Some(((l, r), c)) if c >= minPairCount =>
          out += ((l, r, c))
          segs = segs.groupMapReduce(e => mergeSeq(e._1, l, r))(_._2)(_ + _)
          wordSegs = wordSegs.view.mapValues(mergeSeq(_, l, r)).toMap
        case _ => done = true
      }
    }
    (out.toSeq, wordSegs)
  }

  test("bpeTrain matches an independent reference on a classic corpus; deterministic under repartition") {
    val corpus = Seq.fill(5)("low").mkString(" ") + " " +
      Seq.fill(2)("lower").mkString(" ") + " " +
      Seq.fill(6)("newest").mkString(" ") + " " +
      Seq.fill(3)("widest").mkString(" ")
    val docs = Seq((1L, corpus)).toDF("doc_id", "text")
    val wordCounts = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

    val got = Corpus.bpeTrain(docs, col("text"), nMerges = 10)
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
    val (expected, _) = refBpe(wordCounts, 10, 2)
    assert(got.map(t => (t._2, t._3, t._4)).toSeq == expected,
      s"got=${got.toSeq}\nexp=$expected")
    // the first merges are the famous ones: (e,s) over newest+widest (9),
    // then (es,t), then (est,</w>)
    assert(got.take(3).map(t => (t._2, t._3)).toSeq ==
      Seq(("e", "s"), ("es", "t"), ("est", "</w>")))

    // word-frequency sufficiency: doc layout can't matter
    val resharded = Seq.tabulate(16)(i =>
      (i.toLong, corpus.split(" ").zipWithIndex
        .filter(_._2 % 16 == i).map(_._1).mkString(" ")))
      .toDF("doc_id", "text").repartition(7)
    val re = Corpus.bpeTrain(resharded, col("text"), nMerges = 10)
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
    assert(re.toSeq == got.toSeq)
  }

  test("bpeTrain stops below minPairCount instead of emitting singleton merges") {
    val docs = Seq((1L, "ab ab xy")).toDF("doc_id", "text")
    val merges = Corpus.bpeTrain(docs, col("text"), nMerges = 50, minPairCount = 2)
      .as[(Int, String, String, Long)].collect()
    // only the "ab"-family pairs reach count 2; the xy word never merges
    assert(merges.forall(_._4 >= 2), merges.toSeq.toString)
    assert(merges.nonEmpty)
    assert(!merges.exists(m => m._2.contains("x") || m._3.contains("y")))
  }

  test("bpeSegment reconstructs every word and matches the reference segmentation") {
    val corpus = Seq.fill(5)("low").mkString(" ") + " " +
      Seq.fill(2)("lower").mkString(" ") + " " +
      Seq.fill(6)("newest").mkString(" ") + " " +
      Seq.fill(3)("widest").mkString(" ")
    val train = Seq((1L, corpus)).toDF("doc_id", "text")
    val merges = Corpus.bpeTrain(train, col("text"), nMerges = 6)
    val (_, refSegs) = refBpe(
      Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 6, 2)

    val apply = Seq((9L, "newest lower low unseen")).toDF("doc_id", "text")
    val segd = Corpus.bpeSegment(apply, col("doc_id"), col("text"), merges,
        checkpointEvery = 2)
      .as[(Long, Long, String, Long, String)].collect()
    val byWordPos = segd.groupBy(t => (t._2, t._3)).view
      .mapValues(_.sortBy(_._4).map(_._5).toSeq).toMap
    assert(byWordPos((0L, "newest")) == refSegs("newest"))
    assert(byWordPos((1L, "lower")) == refSegs("lower"))
    assert(byWordPos((2L, "low")) == refSegs("low"))
    // unseen word: segmented by whatever trained merges apply, and the
    // subwords always reconstruct the word + the eow marker
    for (((_, w), subs) <- byWordPos)
      assert(subs.mkString("") == w + Corpus.BpeEow, s"$w -> $subs")
  }
}
