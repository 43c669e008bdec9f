package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import graft.functions.SafeCasts

/** Property-based laws (SURVEY §5): coercions vs executable models of
  * transform.py:19-47, decimal-sum order independence, merge idempotency
  * under arbitrary batches. Driver-free ScalaCheck over local evaluation
  * where possible (collect-once per property batch for speed).
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def checkProp(p: Prop, min: Int = 15): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(min), p)
    assert(r.passed, r.status.toString)
  }

  /** Model of reference safe_bool restricted to string/None inputs —
    * the shape our engine receives post-JSON-extraction. */
  private def modelSafeBool(s: Option[String]): Option[Boolean] =
    s.map(v => Set("true", "1", "yes").contains(v.toLowerCase))

  private def modelSafeNumeric(s: Option[String]): Option[Double] =
    s.flatMap(v => try Some(v.trim.toDouble) catch { case _: Throwable => None })

  test("safeBool law: engine == model over arbitrary strings") {
    val gen = Gen.listOfN(60, Gen.option(Gen.oneOf(
      Gen.alphaNumStr, Gen.oneOf("true", "TRUE", "1", "yes", "Yes", "no", "0", ""))))
    checkProp(forAll(gen) { inputs =>
      val got = inputs.toDF("s").select(SafeCasts.safeBool(col("s")))
        .as[Option[Boolean]].collect().toList
      got == inputs.map(modelSafeBool)
    })
  }

  test("range join law: binned == naive inequality join for any bin width") {
    import java.sql.Timestamp
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val gen = for {
      binSec <- Gen.oneOf(60L, 600L, 3600L, 7200L)
      pts <- Gen.listOfN(80, Gen.zip(Gen.choose(0, 3), Gen.choose(0L, 48 * 3600L)))
      ivs <- Gen.listOfN(25, Gen.zip(Gen.choose(0, 3), Gen.choose(0L, 48 * 3600L),
        Gen.choose(-600L, 6 * 3600L))) // negative span = empty interval case
    } yield (binSec, pts, ivs)
    checkProp(forAll(gen) { case (binSec, pts, ivs) =>
      val points = pts.zipWithIndex.map { case ((k, off), i) =>
        (i.toLong, s"k$k", new Timestamp(base + off * 1000L)) }
        .toDF("pid", "k", "ts")
      val intervals = ivs.zipWithIndex.map { case ((k, off, span), i) =>
        (s"k$k", i.toLong, new Timestamp(base + off * 1000L),
          new Timestamp(base + (off + span) * 1000L)) }
        .toDF("ik", "iid", "s", "e")
      val binned = graft.ops.RangeJoin.pointInInterval(points, intervals,
          "k", "ik", "ts", "s", "e", binSec)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      val naive = points.join(intervals,
          col("k") === col("ik") && col("ts") >= col("s") && col("ts") < col("e"))
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      binned == naive
    }, min = 8)
  }

  test("SpaceSaving law: never undercounts; heavy items always retained") {
    val gen = for {
      cap <- Gen.oneOf(8, 16, 64)
      items <- Gen.listOfN(400, Gen.frequency(
        5 -> Gen.const("HEAVY"), 3 -> Gen.choose(0, 500).map(i => s"t$i")))
    } yield (cap, items)
    checkProp(forAll(gen) { case (cap, items) =>
      val out = items.toDF("item")
        .repartition(3)
        .agg(graft.functions.SketchAggs.topkFreq(col("item"), cap).as("hh"))
        .select(explode(col("hh")).as("h"))
        .select(col("h.item"), col("h.cnt"), col("h.err"))
        .as[(String, Long, Long)].collect()
      val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val noUndercount = out.forall { case (i, c, _) => c >= truth.getOrElse(i, 0L) }
      val boundedOver = out.forall { case (i, c, e) => c - e <= truth.getOrElse(i, 0L) }
      // SpaceSaving guarantee: true freq > N/cap => retained
      val n = items.size.toLong
      val mustKeep = truth.filter(_._2 > n / cap).keySet
      val kept = out.map(_._1).toSet
      noUndercount && boundedOver && mustKeep.subsetOf(kept)
    }, min = 8)
  }

  test("chunking law: stride-aligned prefix windows reconstruct every doc") {
    val word = Gen.choose('a', 'z').map(_.toString)
    val gen = Gen.listOfN(12, Gen.choose(1, 120).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" "))))
    checkProp(forAll(gen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "txt")
      val chunks = graft.ext.TextPrep.chunkTokens(docs, col("id"), col("txt"),
          window = 16, stride = 8)
        .select("doc_id", "chunk_no", "chunk", "chunk_tokens")
        .as[(Long, Long, String, Long)].collect()
      texts.zipWithIndex.forall { case (t, i) =>
        val toks = t.trim.toLowerCase.split("\\s+").toSeq
        val mine = chunks.filter(_._1 == i.toLong).sortBy(_._2)
        // stitching the first `stride` tokens of every chunk plus the whole
        // final chunk reconstructs the doc exactly (overlap = window-stride)
        val rebuilt = mine.init.flatMap(_._3.split(" ").take(8)) ++
          mine.last._3.split(" ")
        rebuilt.toSeq == toks && mine.forall(_._4 <= 16)
      }
    }, min = 8)
  }

  test("word_ngrams law: custom expression == the HOF chain, any n") {
    val word = Gen.oneOf(Gen.alphaNumStr.suchThat(_.nonEmpty), Gen.const("The"),
      Gen.const("x"), Gen.const("éß"))
    val doc = for {
      k <- Gen.choose(0, 12)
      ws <- Gen.listOfN(k, word)
      sep <- Gen.oneOf(" ", "  ", "\t", " \n ")
      // leading/trailing whitespace matters: trim strips only 0x20, so \t\n
      // edges exercise the empty-token semantics of split(limit = -1)
      lead <- Gen.oneOf("", " ", "\t", "\n ")
      tail <- Gen.oneOf("", " ", "\t ", "\n")
    } yield lead + ws.mkString(sep) + tail
    val gen = Gen.zip(Gen.choose(1, 4), Gen.listOfN(25, doc))
    checkProp(forAll(gen) { case (n, texts) =>
      val df = texts.toDF("text")
      val fast = df.select(
        graft.functions.TextExprs.wordNGrams(col("text"), n).as("g"))
        .as[Seq[String]].collect().toSeq
      val hof = df
        .select(split(trim(lower(col("text"))), "\\s+").as("t"))
        .select(expr(
          s"CASE WHEN size(t) >= $n THEN array_distinct(transform(" +
            s"sequence(0, size(t) - $n), i -> array_join(slice(t, i + 1, $n), ' ')))" +
            " ELSE array() END").as("g"))
        .as[Seq[String]].collect().toSeq
      fast == hof
    }, min = 10)
  }

  test("word_ngrams law (distinct=false): positional multiplicity == the HOF chain") {
    val word = Gen.oneOf(Gen.alphaNumStr.suchThat(_.nonEmpty), Gen.const("a"),
      Gen.const("a")) // repeats likely, so multiplicity actually differs from distinct
    val doc = for {
      k <- Gen.choose(0, 12)
      ws <- Gen.listOfN(k, word)
    } yield ws.mkString(" ")
    val gen = Gen.zip(Gen.choose(1, 4), Gen.listOfN(25, doc))
    checkProp(forAll(gen) { case (n, texts) =>
      val df = texts.toDF("text")
      val fast = df.select(
        graft.functions.TextExprs.wordNGrams(col("text"), n, distinct = false)
          .as("g"))
        .as[Seq[String]].collect().toSeq
      val hof = df
        .select(split(trim(lower(col("text"))), "\\s+").as("t"))
        .select(expr(
          s"CASE WHEN size(t) >= $n THEN transform(" +
            s"sequence(0, size(t) - $n), i -> array_join(slice(t, i + 1, $n), ' '))" +
            " ELSE array() END").as("g"))
        .as[Seq[String]].collect().toSeq
      fast == hof
    }, min = 10)
  }

  test("safeNumeric law: engine == model over numeric-ish strings") {
    val numish = Gen.oneOf(
      Gen.chooseNum(-1e6, 1e6).map(_.toString),
      Gen.chooseNum(-1000000L, 1000000L).map(_.toString),
      Gen.alphaStr, Gen.const("3.5"), Gen.const("1e3"), Gen.const(""))
    checkProp(forAll(Gen.listOfN(60, Gen.option(numish))) { inputs =>
      val got = inputs.toDF("s").select(SafeCasts.safeNumeric(col("s")))
        .as[Option[Double]].collect().toList
      got == inputs.map(modelSafeNumeric)
    })
  }

  test("decimalSum is invariant under permutation and partitioning") {
    val gen = for {
      xs <- Gen.listOfN(200, Gen.chooseNum(-1e5, 1e5))
      parts <- Gen.chooseNum(1, 13)
    } yield (xs, parts)
    checkProp(forAll(gen) { case (xs, parts) =>
      val a = xs.toDF("v").repartition(parts)
        .agg(SafeCasts.decimalSum(col("v"))).as[Option[Double]].head()
      val b = scala.util.Random.shuffle(xs).toDF("v").repartition(1)
        .agg(SafeCasts.decimalSum(col("v"))).as[Option[Double]].head()
      a == b
    })
  }

  test("scoped merge law: any batch sequence == the unscoped merge result") {
    val scheme = graft.merge.MergeSink.PartitionScheme.keyHash(Seq("k"), 4)
    val rowGen = for {
      k <- Gen.chooseNum(0, 15); status <- Gen.oneOf("open", "closed", "held")
      note <- Gen.alphaStr.map(_.take(6))
    } yield (s"k$k", status, note)
    val gen = Gen.listOfN(3, Gen.listOfN(12, rowGen)) // a sequence of batches
    checkProp(forAll(gen) { batches =>
      val scopedDir = tmpDir("p-scoped"); val plainDir = tmpDir("p-plain")
      batches.foreach { rows =>
        val df = rows.toDF("k", "status", "note")
        graft.merge.MergeSink.upsertPartialScoped(spark, scopedDir, df,
          Seq("k"), Seq("status"), scheme, orderCols = Seq("note"))
        graft.merge.MergeSink.upsertPartial(spark, plainDir, df,
          Seq("k"), Seq("status"), orderCols = Seq("note"))
      }
      val scoped = spark.read.parquet(scopedDir).drop("part_bucket")
        .collect().map(_.toString).sorted.toSeq
      val plain = spark.read.parquet(plainDir)
        .collect().map(_.toString).sorted.toSeq
      scoped == plain
    }, min = 5)
  }

  test("simhash is invariant under token order (portable and fast paths)") {
    val docGen = Gen.listOfN(12, Gen.oneOf(
      "alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"))
    checkProp(forAll(docGen) { toks =>
      val shuffled = scala.util.Random.shuffle(toks)
      val df = Seq((1L, toks.mkString(" ")), (2L, shuffled.mkString(" ")))
        .toDF("doc_id", "text")
      def fps(f: org.apache.spark.sql.DataFrame) =
        f.orderBy("doc_id").select("simhash64").as[Long].collect().toSeq
      val portable = fps(graft.ext.Dedup.portableSimhashTable(df, "doc_id", "text"))
      val fast = fps(graft.ext.Dedup.simhashTable(df, "doc_id", "text"))
      portable(0) == portable(1) && fast(0) == fast(1)
    }, min = 8)
  }

  test("merge idempotency: applying any batch twice == once (M1, M3)") {
    val rowGen = for {
      k <- Gen.chooseNum(0, 20); status <- Gen.oneOf("a", "b", "c")
      note <- Gen.alphaStr.map(_.take(8))
    } yield (s"k$k", status, note)
    val gen = Gen.listOfN(30, rowGen)
    checkProp(forAll(gen) { rows =>
      val dirs = Seq(tmpDir("p-m1"), tmpDir("p-m3"))
      val df = rows.toDF("k", "status", "note")
      graft.merge.MergeSink.upsertPartial(spark, dirs(0), df, Seq("k"), Seq("status"),
        orderCols = Seq("note"))
      val once1 = spark.read.parquet(dirs(0)).collect().toSet
      graft.merge.MergeSink.upsertPartial(spark, dirs(0), df, Seq("k"), Seq("status"),
        orderCols = Seq("note"))
      val twice1 = spark.read.parquet(dirs(0)).collect().toSet
      graft.merge.MergeSink.insertIfAbsent(spark, dirs(1), df, Seq("k"))
      val once3 = spark.read.parquet(dirs(1)).collect().toSet
      graft.merge.MergeSink.insertIfAbsent(spark, dirs(1), df, Seq("k"))
      val twice3 = spark.read.parquet(dirs(1)).collect().toSet
      once1 == twice1 && once3 == twice3
    }, min = 6)
  }

  test("semDedupParamsFor law: any returned config fits one long and meets the recall bound") {
    // pure parameter math — no Spark. Either the solver returns a config
    // that (a) packs into the 63-bit bucket word and (b) satisfies the
    // banding recall bound it was solved for, or it refuses loudly.
    val gen = for {
      n <- Gen.choose(1L, 2_000_000_000L)
      theta <- Gen.choose(0.05, 0.95)
      occ <- Gen.oneOf(16, 64, 256)
      rec <- Gen.oneOf(0.9, 0.95, 0.99)
    } yield (n, theta, occ, rec)
    checkProp(forAll(gen) { case (n, theta, occ, rec) =>
      try {
        val (l, r) = graft.ext.SimSearch.semDedupParamsFor(n, theta, occ, rec)
        val p = 1.0 - math.acos(theta) / math.Pi
        val recall = 1.0 - math.pow(1.0 - math.pow(p, r), l)
        l >= 1 && r >= 1 && r * l <= 63 && recall >= rec - 1e-9
      } catch {
        // infeasible corners (tiny theta + high recall) must refuse loudly
        case e: IllegalArgumentException => e.getMessage.contains("63 bits")
      }
    }, min = 200)
  }
}
