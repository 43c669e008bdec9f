package graft

import org.apache.spark.sql.functions._
import graft.ext.Sampling

/** Deterministic sampling: decisions are pure functions of the key —
  * stable under repartitioning, nested across rates, quota-exact. */
class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private val ids = (1L to 2000L).toDF("id")

  test("uniform: deterministic, partition-independent, rate in bounds") {
    val a = Sampling.uniform(ids, col("id"), 0.2).select("id")
      .as[Long].collect().toSet
    val b = Sampling.uniform(ids.repartition(13), col("id"), 0.2).select("id")
      .as[Long].collect().toSet
    assert(a == b)
    // md5 is uniform: 2000 draws at p=0.2 land well inside ±5σ (~±90)
    assert(a.size > 310 && a.size < 490, s"rate off: ${a.size}/2000")
  }

  test("uniform: samples nest — a lower rate is a subset of a higher rate") {
    val small = Sampling.uniform(ids, col("id"), 0.05).select("id")
      .as[Long].collect().toSet
    val big = Sampling.uniform(ids, col("id"), 0.2).select("id")
      .as[Long].collect().toSet
    assert(small.subsetOf(big))
  }

  test("shard: complete, in-range, and balanced-ish") {
    val shards = ids.select(Sampling.shard(col("id"), 8).as("s"))
      .groupBy("s").count().as[(Int, Long)].collect().toMap
    assert(shards.keySet.forall(s => s >= 0 && s < 8))
    assert(shards.values.sum == 2000L)
    assert(shards.size == 8 && shards.values.forall(_ > 150L))
  }

  test("stratified: exact quota per stratum, stable under repartitioning") {
    val df = (1 to 900).map(i => (s"g${i % 3}", i.toLong)).toDF("g", "id")
    val a = Sampling.stratified(df, Seq("g"), col("id"), 10)
      .select("g", "id").as[(String, Long)].collect().toSet
    val b = Sampling.stratified(df.repartition(11), Seq("g"), col("id"), 10)
      .select("g", "id").as[(String, Long)].collect().toSet
    assert(a == b)
    assert(a.groupBy(_._1).forall(_._2.size == 10))
  }

  test("weightedMixture: rate 1.0 keeps all, 0 and unlisted drop all, mid-rates nest in uniform") {
    val df = (1L to 900L).map(i => (i, s"s${i % 3}")).toDF("id", "src")
    val out = Sampling.weightedMixture(df, col("src"), col("id"),
        Map("s0" -> 1.0, "s1" -> 0.25))
      .select("id", "src").as[(Long, String)].collect()
    val bySrc = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(bySrc.getOrElse("s0", Set.empty).size == 300) // rate 1.0: everything
    assert(!bySrc.contains("s2"))                        // unlisted: dropped
    // mixture at rate r == uniform at rate r restricted to that source
    val uni = Sampling.uniform(df.filter(col("src") === "s1"), col("id"), 0.25)
      .select("id").as[Long].collect().toSet
    assert(bySrc.getOrElse("s1", Set.empty) == uni)
  }

  test("stratified: a stratum's picks don't depend on other strata") {
    val base = (1 to 300).map(i => ("keep", i.toLong)).toDF("g", "id")
    val noisy = base.union(
      (1000 to 1400).map(i => ("other", i.toLong)).toDF("g", "id"))
    def picks(df: org.apache.spark.sql.DataFrame) =
      Sampling.stratified(df, Seq("g"), col("id"), 7)
        .filter(col("g") === "keep").select("id").as[Long].collect().toSet
    assert(picks(base) == picks(noisy))
  }

  test("temperatureMixture: α=1 keeps all, α=0.5 flattens to √n proportions, min source kept whole, deterministic") {
    // skewed sources: 1600 / 400 / 100 rows
    val df = ((1L to 1600L).map(i => (i, "big")) ++
        (2001L to 2400L).map(i => (i, "mid")) ++
        (3001L to 3100L).map(i => (i, "min"))).toDF("id", "src")

    // α=1: natural proportions — everything survives, thresholds saturate
    val all = Sampling.temperatureMixture(df, col("src"), col("id"), 1.0)
    assert(all.count() == 2100)

    // α=0.5: rate_s = sqrt(n_min/n_s) → 0.25 / 0.5 / 1.0; kept counts
    // target 400/200/100 (∝ √n), md5 noise within ±5σ (√(n·p·(1-p)))
    val kept = Sampling.temperatureMixture(df, col("src"), col("id"), 0.5)
      .select("id", "src").as[(Long, String)].collect()
    val bySrc = kept.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySrc("min") == 100, "the smallest source is kept whole")
    assert(math.abs(bySrc("big") - 400) < 90, s"big kept ${bySrc("big")}")
    assert(math.abs(bySrc("mid") - 200) < 55, s"mid kept ${bySrc("mid")}")

    // pure function of (key, observed counts): stable under repartitioning
    val re = Sampling.temperatureMixture(df.repartition(13), col("src"),
        col("id"), 0.5).select("id").as[Long].collect().toSet
    assert(re == kept.map(_._1).toSet)
  }

  test("temperatureMixture: NULL source is its own stratum, never silently dropped") {
    // 800 labeled + 50 null-source rows: the null stratum is the smallest,
    // so at α=0.5 it must be kept WHOLE — with a non-null-safe join those
    // 50 rows would vanish from the mixture entirely
    val df = ((1L to 800L).map(i => (i, Some("big"))) ++
        (2001L to 2050L).map(i => (i, Option.empty[String])))
      .toDF("id", "src")
    val all = Sampling.temperatureMixture(df, col("src"), col("id"), 1.0)
    assert(all.count() == 850, "α=1 keeps every row, null-source included")
    val kept = Sampling.temperatureMixture(df, col("src"), col("id"), 0.5)
      .select("id", "src").as[(Long, Option[String])].collect()
    assert(kept.count(_._2.isEmpty) == 50, "the null stratum is min — kept whole")
    // big: rate = sqrt(50/800) = 0.25 → ~200 expected
    val big = kept.count(_._2.contains("big"))
    assert(math.abs(big - 200) < 60, s"big kept $big")
  }

  test("epochMixture: whole epochs exact, fractional epoch ~expected, interleavable epoch ids, deterministic") {
    val df = ((1L to 1000L).map(i => (i, "books")) ++
        (2001L to 3000L).map(i => (i, "web")) ++
        (4001L to 4100L).map(i => (i, "junk")))
      .toDF("id", "src")
    val out = Sampling.epochMixture(df, col("src"), col("id"),
        Map("books" -> 2.5, "web" -> 0.5))
      .select("id", "src", "epoch").as[(Long, String, Int)].collect()

    assert(!out.exists(_._2 == "junk"), "unlisted sources drop")
    val books = out.filter(_._2 == "books")
    // every books doc appears at least twice (whole part), ~half a third time
    val perDoc = books.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perDoc.size == 1000 && perDoc.values.forall(n => n == 2 || n == 3))
    val third = perDoc.values.count(_ == 3)
    assert(math.abs(third - 500) < 80, s"fractional epoch hit $third docs")
    // epoch ids are 0..n-1 per doc — interleavable downstream
    books.groupBy(_._1).foreach { case (id, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0 until rows.length).toSeq,
        s"doc $id epochs ${rows.map(_._3).toSeq}")
    }
    val web = out.filter(_._2 == "web")
    assert(web.forall(_._3 == 0))
    assert(math.abs(web.length - 500) < 80, s"web kept ${web.length}")
    // rate 0.5's keepers are exactly uniform(0.5)'s keepers: one bucket rule
    val uni = Sampling.uniform(df.filter(col("src") === "web"), col("id"), 0.5)
      .select("id").as[Long].collect().toSet
    assert(web.map(_._1).toSet == uni)

    // deterministic under repartitioning
    val re = Sampling.epochMixture(df.repartition(11), col("src"), col("id"),
        Map("books" -> 2.5, "web" -> 0.5))
      .select("id", "src", "epoch").as[(Long, String, Int)].collect()
    assert(re.sortBy(t => (t._1, t._3)).toSeq == out.sortBy(t => (t._1, t._3)).toSeq)
  }

  test("leakageSafeSplit: clusters never straddle splits, singleton fallback, fractions honored, deterministic") {
    // 2000 docs; docs 0-99 form 50 near-dup pairs (one cluster per pair),
    // the rest are unlabeled → singleton clusters
    val docs = (0L until 2000L).toDF("doc_id")
    val clusters = (0L until 100L).map(i => (i, i / 2 * 2)) // pair (0,1)→0, (2,3)→2…
      .toDF("doc_id", "cluster_id")
    val fr = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val out = Sampling.leakageSafeSplit(docs, "doc_id", clusters, fr)
      .as[(Long, Long, String)].collect()
    assert(out.length == 2000, "every doc is assigned")
    assert(out.map(_._3).toSet == Set("train", "val", "test"))

    // THE invariant: one split per cluster — a near-dup pair can never
    // land half in train, half in eval
    val perCluster = out.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    assert(perCluster.forall(_._2.size == 1),
      s"clusters straddling splits: ${perCluster.filter(_._2.size > 1).keys.take(5)}")
    // paired docs share their pair's cluster and split
    val byDoc = out.map(t => t._1 -> ((t._2, t._3))).toMap
    (0L until 100L by 2).foreach { i =>
      assert(byDoc(i) == byDoc(i + 1), s"pair ($i,${i + 1}) split apart")
    }
    // singleton fallback: unlabeled docs are their own unit
    assert(byDoc(1500L)._1 == 1500L)

    // realized sizes are binomial around 80/10/10
    val sizes = out.groupBy(_._3).view.mapValues(_.length).toMap
    assert(math.abs(sizes("train") - 1600) < 120, s"train ${sizes("train")}")
    assert(math.abs(sizes("val") - 200) < 80, s"val ${sizes("val")}")
    assert(math.abs(sizes("test") - 200) < 80, s"test ${sizes("test")}")

    // pure function of cluster_id: stable under repartitioning, and a
    // GROWN corpus moves no existing cluster between splits
    val re = Sampling.leakageSafeSplit(docs.repartition(7), "doc_id",
        clusters.repartition(3), fr).as[(Long, Long, String)].collect()
    assert(re.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
    val grown = Sampling.leakageSafeSplit((0L until 3000L).toDF("doc_id"),
        "doc_id", clusters, fr).as[(Long, Long, String)].collect()
      .map(t => t._1 -> t._3).toMap
    assert(out.forall(t => grown(t._1) == t._3),
      "growing the corpus must not reassign existing docs")
  }

  test("prioritySample: exact top-k by priority, τ-capped estimates, heavy-row certainty, layout independence") {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def bucket(s: String): Int = Integer.parseInt(md5hex(s).take(4), 16)

    val rows = (1 to 40).map(i =>
      (i.toLong, if (i == 7) 1e9 else i.toDouble))
    val df = rows.toDF("id", "w")
    val k = 5
    val got = Sampling.prioritySample(df, col("id"), col("w"), k)
      .select("id", "sample_pri", "est_weight")
      .as[(Long, Double, Double)].collect().sortBy(_._1).toSeq

    // replicate the whole pipeline independently: priorities, tie order, τ
    val pris = rows.map { case (id, w) =>
      (id, w, (w * 65536.0) / (bucket(id.toString) + 1)) }
    val ranked = pris.sortBy { case (id, _, p) => (-p, md5hex(id.toString), id) }
    val tau = ranked(k)._3
    val expect = ranked.take(k)
      .map { case (id, w, p) => (id, p, math.max(w, tau)) }.sortBy(_._1)
    assert(got == expect)
    assert(got.size == k)

    // heavy-row certainty: w=1e9 dominates every possible priority
    // (min pri = w·65536/65536 = w > any small row's max), kept at TRUE
    // weight since w ≥ τ
    assert(got.exists(t => t._1 == 7L && t._3 == 1e9))

    // ≤ k input rows: all kept, τ=0, est = own weight
    val small = Seq((1L, 5.0), (2L, 7.0)).toDF("id", "w")
    val s = Sampling.prioritySample(small, col("id"), col("w"), 5)
      .select("id", "est_weight").as[(Long, Double)].collect().toMap
    assert(s == Map(1L -> 5.0, 2L -> 7.0))

    // nulls and non-positive weights never enter the sample
    val dirty = Seq((1L, Some(3.0)), (2L, None), (3L, Some(0.0)),
      (4L, Some(-2.0))).toDF("id", "w")
    val d = Sampling.prioritySample(dirty, col("id"), col("w"), 10)
      .select("id").as[Long].collect().toSeq
    assert(d == Seq(1L))

    // pure function of (key, weight): stable under repartitioning
    val rep = Sampling.prioritySample(df.repartition(7), col("id"), col("w"), k)
      .select("id", "sample_pri", "est_weight")
      .as[(Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(rep == got)
  }

  test("prioritySampleByGroup: independent per-group samples with per-group τ; small groups kept whole") {
    def bucket(s: String): Int = Integer.parseInt(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(2).map("%02x".format(_)).mkString, 16)
    val rows = (1 to 30).map(i => ("big", i.toLong, i.toDouble)) ++
      Seq(("tiny", 100L, 4.0), ("tiny", 101L, 9.0))
    val df = rows.toDF("g", "id", "w")
    val got = Sampling.prioritySampleByGroup(df, col("g"), col("id"),
        col("w"), k = 3)
      .as[(String, String, Long, Double, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).toSeq).toMap

    // independent replication of the big group's sample
    val pris = rows.filter(_._1 == "big").map { case (_, id, w) =>
      (id.toString, w, (w * 65536.0) / (bucket(id.toString) + 1)) }
    val ranked = pris.sortBy { case (id, _, p) => (-p, id) }
    val tau = ranked(3)._3
    val expect = ranked.take(3).zipWithIndex.map { case ((id, w, p), i) =>
      ("big", id, (i + 1).toLong, p, math.max(w, tau)) }
    assert(got("big") == expect)
    // the tiny group (≤ k rows): all kept, τ=0, est = own weight
    assert(got("tiny").map(t => t._2 -> t._5).toMap ==
      Map("100" -> 4.0, "101" -> 9.0))
    // groups don't leak into each other's τ
    assert(got("tiny").forall(_._5 < 10.0))
  }
}
