package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Multimodal, SimSearch, TextStats}
import graft.model.Tables

/** Extension operators (SURVEY §7.6): dedup finds planted duplicates, ANN
  * ranks a planted near-identical vector first, text stats match hand
  * computation, multimodal plumbing is deterministic. */
class ExtensionsSpec extends SparkTestBase {
  import spark.implicits._

  test("exact dedup groups identical texts, keeps min id") {
    val docs = Seq((1L, "hello world"), (2L, "hello world"), (3L, "unique"))
      .toDF("doc_id", "text")
    val d = Dedup.exact(docs, "doc_id", "text")
    assert(d.count() == 2)
    val dup = d.filter(col("n_copies") === 2).select("keeper_id").as[Long].head()
    assert(dup == 1L)
  }

  test("minhash near-dup surfaces a planted 90%-overlap pair") {
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val near = (1 to 54).map(i => s"w$i").mkString(" ") + " x1 x2 x3 x4 x5 x6"
    val far = (100 to 160).map(i => s"v$i").mkString(" ")
    val docs = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
      n = 1, k = 64, bands = 16, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("production profile (n=5 shingles) finds prose near-dups, ignores shared vocabulary") {
    // two paragraphs that are 90% the same word-SEQUENCE, and a third that
    // reuses much of the same vocabulary in a different order — unigram
    // shingling would flag the third as a near-dup; 5-gram shingling must not
    val words = (1 to 200).map(i => s"tok${i % 50}w$i")
    val base = words.mkString(" ")
    val near = (words.take(180) ++ (1 to 20).map(i => s"fresh$i")).mkString(" ")
    val shuffled = new scala.util.Random(42).shuffle(words).mkString(" ")
    val docs = Seq((1L, base), (2L, near), (3L, shuffled)).toDF("doc_id", "text")
    val assign = Dedup.minhashDedupAssignments(docs, "doc_id", "text",
        Dedup.MinHashParams.production)
      .as[(Long, Long, Option[Double])].collect().map(t => t._1 -> t._2).toMap
    assert(assign(2L) == 1L)   // sequence near-dup collapses
    assert(assign(3L) == 3L)   // same vocabulary, different text: kept
  }

  test("near-dup clusters: transitive chains collapse to one component") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val clusters = Dedup.nearDupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(clusters(1L) == 1L && clusters(2L) == 1L && clusters(3L) == 1L)
    assert(clusters(10L) == 10L && clusters(11L) == 10L)
  }

  test("near-dup clusters THROW at the iteration cap instead of under-merging") {
    // a planted chain 1-2-...-2000: pointer-jumping (armed from round 3)
    // doubles the min label's reach per round thereafter, so 3 rounds
    // cover ≤6 hops — diameter 1999 cannot converge and the loop must
    // THROW rather than return plausible-looking wrong labels
    val chain = (1L until 2000L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val e = intercept[IllegalStateException] {
      Dedup.nearDupClusters(chain, maxIter = 3)
    }
    assert(e.getMessage.contains("did not converge"))
    // O(log diameter): the same 2000-link chain converges comfortably
    // inside 15 rounds (one-hop propagation would need ~2000) — THE
    // pointer-jumping payoff: pathological chain-shaped components at
    // corpus scale cost log rounds, not diameter rounds
    val ok = Dedup.nearDupClusters(chain, maxIter = 15)
      .as[(Long, Long)].collect().toMap
    assert(ok.values.toSet == Set(1L) && ok.size == 2000)
  }

  test("incremental clusters: new edges bridge persisted components, min-label kept") {
    val labels = Seq((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_id")
    // (2,10) bridges the two persisted clusters; (11,30) attaches a new doc
    // THROUGH the merged component; (20,21) is a fresh standalone pair
    val edges = Seq((2L, 10L), (20L, 21L), (11L, 30L)).toDF("doc_a", "doc_b")
    val got = Dedup.incrementalClusters(edges, labels)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L, 30L -> 1L,
      20L -> 20L, 21L -> 20L))
  }

  test("incremental clusters delta: exactly the changed+new rows, override ≡ full fold") {
    val labels = Seq((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L), (99L, 99L))
      .toDF("doc_id", "cluster_id")
    val edges = Seq((2L, 10L), (20L, 21L), (11L, 30L)).toDF("doc_a", "doc_b")
    val delta = Dedup.incrementalClustersDelta(edges, labels)
      .as[(Long, Long)].collect().toMap
    // rows whose label does not change never appear in the delta — 99 is
    // untouched, and 1/2 already carry the merged component's min label —
    // so the streaming sink writes O(changed), not O(corpus)
    assert(!delta.contains(99L) && !delta.contains(1L) && !delta.contains(2L))
    assert(delta == Map(10L -> 1L, 11L -> 1L, 30L -> 1L, 20L -> 20L, 21L -> 20L))
    // old labels overridden by the delta ≡ the full fold
    val full = Dedup.incrementalClusters(edges, labels)
      .as[(Long, Long)].collect().toMap
    val overridden = Seq((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L), (99L, 99L))
      .toMap ++ delta
    assert(overridden == full)
  }

  test("cluster fold enforces the driver-collect bound loudly") {
    val labels = Dedup.emptyLabels(spark)
    // 5 distinct label pairs; a bound of 3 must refuse rather than collect
    val edges = Seq((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L), (9L, 10L))
      .toDF("doc_a", "doc_b")
    val e = intercept[IllegalArgumentException] {
      Dedup.incrementalClusters(edges, labels, maxLabelPairs = 3).collect()
    }
    assert(e.getMessage.contains("maxLabelPairs"), e.getMessage)
    // at the default bound the same fold sails through
    assert(Dedup.incrementalClusters(edges, labels).count() == 10)
  }

  test("folding batch edges one at a time equals batch clustering over the union graph") {
    val batches = Seq(
      Seq((1L, 2L), (10L, 11L)),
      Seq((2L, 10L), (20L, 21L)),             // bridge + fresh pair
      Seq((11L, 30L), (21L, 22L), (40L, 41L)) // growth on both + another
    )
    var labels = Dedup.emptyLabels(spark)
    for (b <- batches)
      labels = Dedup.incrementalClusters(b.toDF("doc_a", "doc_b"), labels)
        .localCheckpoint()
    val folded = labels.as[(Long, Long)].collect().toMap
    val batch = Dedup.nearDupClusters(batches.flatten.toDF("doc_a", "doc_b"))
      .as[(Long, Long)].collect().toMap
    assert(folded == batch)
  }

  test("quality checks return violation rows only") {
    import graft.ext.Quality
    val t = Seq((1L, "a"), (1L, "b"), (2L, null: String)).toDF("id", "v")
    assert(Quality.duplicates(t, Seq("id")).count() == 1)
    assert(Quality.nulls(t, Seq("v")).count() == 1)
    val parent = Seq(1L).toDF("pid")
    assert(Quality.orphans(t, parent, "id", "pid")
      .select("id").as[Long].collect().toSet == Set(2L))
    assert(Quality.outOfRange(Seq(0.5, 99.0).toDF("x"), "x", 0.0, 1.0).count() == 1)
    val rep = Quality.report(Map("dups" -> Quality.duplicates(t, Seq("id"))))
    assert(rep == Map("dups" -> 1L))
  }

  test("semantic dedup maps a planted near-identical vector to its min-id keeper") {
    val base = Array.tabulate(8)(i => 0.1f * (i + 1))
    val near = base.clone(); near(0) += 0.001f
    val far = Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val corpus = Seq((1L, base), (2L, near), (3L, far))
      .toDF("vec_id", "embedding")
    val got = SimSearch.semanticDedupAssignments(corpus, "vec_id", "embedding", 0.95)
      .select("vec_id", "keeper_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("hot band slice: occupancy monitor flags it; salted guard preserves assignments") {
    // planted hot cluster: 60 near-identical vectors collapse into ONE
    // (t, tb) slice of every table (the skew cliff the guard bounds);
    // 40 background vectors spread normally
    val rnd = new scala.util.Random(5)
    val base = Array.tabulate(16)(_ => rnd.nextFloat() * 2 - 1)
    val hot = (1L to 60L).map(i => (i, base.map(x => x + (i % 7) * 1e-4f)))
    val bg = (100L until 140L).map(i =>
      (i, Array.tabulate(16)(_ => rnd.nextFloat() * 2 - 1)))
    val corpus = (hot ++ bg).toDF("vec_id", "embedding")

    val occ = SimSearch.bandSliceOccupancy(corpus, "vec_id", "embedding",
      tables = 4, planesPerTable = 3, dim = 16)
      .as[(Int, Long, Long)].collect()
    assert(occ.map(_._3).max >= 60, "monitor must flag the planted hot slice")

    def assigns(bound: Int, salt: Int) =
      SimSearch.semanticDedupAssignmentsBucketed(corpus, "vec_id", "embedding",
        0.9, tables = 4, planesPerTable = 3, dim = 16,
        hotSliceBound = bound, saltFactor = salt)
        .select("vec_id", "keeper_id").as[(Long, Long)].collect().toMap
    val unguarded = assigns(0, 1)
    // guard routes the hot slices through the salted join: the candidate
    // pair set — and thus every assignment — must be bit-identical
    assert(assigns(8, 4) == unguarded)
    // bound below EVERY slice: the whole sweep goes through the salted
    // path and still reproduces exactly
    assert(assigns(1, 3) == unguarded)
    // the planted cluster actually collapsed (the test is not vacuous)
    assert(unguarded.count { case (v, k) => v != k } >= 55)
  }

  test("solver-derived params drive the bucketed dedup with the q60 contract intact") {
    val emb = Tables.load(spark, sf("sf0.01"), "embeddings")
    val (asg, (l, r)) = SimSearch.semanticDedupAssignmentsBucketedSolved(
      emb, "vec_id", "embedding", 0.4, dim = 64)
    assert((l, r) == (11, 3), "n=500, θ=0.4 must solve to the q60 profile shape")
    val bucketed = asg.select("vec_id", "keeper_id")
      .as[(Long, Long)].collect().toMap
    val exact = SimSearch.semanticDedupAssignments(emb, "vec_id", "embedding", 0.4)
      .select("vec_id", "keeper_id").as[(Long, Long)].collect().toMap
    assert(bucketed.keySet == exact.keySet)
    val exactDups = exact.filter { case (v, k) => v != k }.keySet
    val solvedDups = bucketed.filter { case (v, k) => v != k }.keySet
    assert(solvedDups.subsetOf(exactDups)) // soundness: same cosine gate
    if (exactDups.nonEmpty)                // solver meets its recall target
      assert(solvedDups.size.toDouble / exactDups.size >= 0.9)
  }

  test("bucketed semantic dedup: no false keepers, deterministic recall vs exact") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val exact = SimSearch.semanticDedupAssignments(emb, "vec_id", "embedding", 0.4)
      .select("vec_id", "keeper_id").as[(Long, Long)].collect().toMap
    val bucketed = SimSearch.semanticDedupAssignmentsBucketed(
        emb, "vec_id", "embedding", 0.4, tables = 12, planesPerTable = 3, dim = 64)
      .select("vec_id", "keeper_id").as[(Long, Long)].collect().toMap
    assert(bucketed.keySet == exact.keySet)
    // soundness: every bucketed pair passed the SAME cosine threshold, so a
    // bucketed non-self keeper is always a genuine neighbor — never a false
    // positive (it may differ from exact's min-id keeper when the true min
    // landed in an unprobed bucket)
    val exactDups = exact.filter { case (v, k) => v != k }.keySet
    val bucketedDups = bucketed.filter { case (v, k) => v != k }.keySet
    assert(bucketedDups.subsetOf(exactDups))
    // deterministic recall (fixed hyperplane seed + fixed corpus): the
    // multiprobe buckets must catch most true near-dups
    if (exactDups.nonEmpty) {
      val recall = bucketedDups.size.toDouble / exactDups.size
      // measured 0.98 (61/62) at 12 tables × 3 planes on this corpus;
      // 0.8 floor leaves headroom for testdata regeneration
      assert(recall >= 0.8, s"recall $recall (${bucketedDups.size}/${exactDups.size})")
    }
  }

  test("repetitionProfile: hand-computed bigram stats; sub-n docs emit no row") {
    import graft.ext.TextStats
    val docs = Seq((1L, "a b a b c"), (2L, "solo"), (3L, "x y z"))
      .toDF("doc_id", "text")
    val got = TextStats.repetitionProfile(docs, "doc_id", "text", 2)
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // doc 1 bigrams: "a b","b a","a b","b c" -> 4 total, 3 distinct
    assert(got(1L) == ((4L, 3L, 0.25, 0.5)))
    // doc 3: all unique -> zero repetition
    assert(got(3L) == ((2L, 2L, 0.0, 0.5)))
    assert(!got.contains(2L)) // one token: no bigrams to profile
  }

  test("ngramJaccard computes exact overlap") {
    val pairs = Seq(("a b c d", "a b c z")).toDF("l", "r")
    val j = pairs.select(Dedup.ngramJaccard(pairs, col("l"), col("r"), 1).as("j"))
      .as[Double].head()
    assert(math.abs(j - 3.0 / 5.0) < 1e-12)   // {a,b,c} / {a,b,c,d,z}
  }

  test("segment dedup: cross-doc boilerplate removed, within-doc repeats kept, full-boilerplate doc survives empty") {
    val boiler = "subscribe to our newsletter terms of service apply" // 8 toks
    val uniqA = "alpha beta gamma delta epsilon zeta eta theta"
    val uniqB = "iota kappa lambda mu nu xi omicron pi"
    val solo8 = Seq.fill(8)("solo").mkString(" ")
    val docs = Seq(
      (1L, s"$boiler $uniqA"),
      (2L, s"$boiler $uniqB"),
      (3L, s"$solo8 $solo8"), // repeated WITHIN one doc only — not boilerplate
      (4L, boiler),           // nothing but boilerplate
      (5L, null))             // null text: retained, zero segments
      .toDF("doc_id", "text")
    val out = Dedup.removeRepeatedSegments(docs, "doc_id", "text",
        window = 8, minDocs = 2)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L), "every doc comes back")
    assert(out(0) == ((1L, uniqA, 2L, 1L)))
    assert(out(1) == ((2L, uniqB, 2L, 1L)))
    assert(out(2) == ((3L, s"$solo8 $solo8", 2L, 0L)))
    assert(out(3) == ((4L, "", 1L, 1L)))
    assert(out(4) == ((5L, "", 0L, 0L)), "null text must not drop the corpus row")

    // pure function of the text: stable under repartitioning
    val re = Dedup.removeRepeatedSegments(docs.repartition(7), "doc_id",
        "text", window = 8, minDocs = 2)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(re.toSeq == out.toSeq)
  }

  test("sourceOverlap: pair counts and Jaccard exact; maxSources fences universal chrome; repartition-stable") {
    val s1 = "alpha beta gamma delta epsilon zeta eta theta"     // A+B
    val s2 = "one two three four five six seven eight"           // A+B
    val s3 = "iota kappa lambda mu nu xi omicron pi"             // A+C
    val chrome = "subscribe to our newsletter terms of service apply" // A+B+C
    val uA = "unique alpha content in source a only here"
    val uB = "unique bravo content in source b only here"
    val docs = Seq(
      (1L, "A", s"$s1 $s2 $s3 $chrome $uA"),
      (2L, "B", s"$s1 $s2 $chrome $uB"),
      (3L, "C", s"$s3 $chrome"))
      .toDF("doc_id", "src", "text")

    val out = Dedup.sourceOverlap(docs, "doc_id", "text", "src", window = 8)
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4, t._5, t._6))).toMap
    // universes: A = {s1,s2,s3,chrome,uA} = 5; B = {s1,s2,chrome,uB} = 4;
    // C = {s3,chrome} = 2. chrome is in all three (within maxSources=64).
    assert(out(("A", "B")) == ((3L, 5L, 4L, 3.0 / 6)))
    assert(out(("A", "C")) == ((2L, 5L, 2L, 2.0 / 5)))
    assert(out(("B", "C")) == ((1L, 4L, 2L, 1.0 / 5)))

    // the quadratic fence: chrome lives in 3 sources; maxSources=2 drops
    // it from PAIR counting (universes are untouched) — B/C now share
    // nothing and the pair row disappears rather than reading 0
    val fenced = Dedup.sourceOverlap(docs, "doc_id", "text", "src",
        window = 8, maxSources = 2)
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4, t._5, t._6))).toMap
    assert(fenced(("A", "B")) == ((2L, 5L, 4L, 2.0 / 7)))
    assert(fenced(("A", "C")) == ((1L, 5L, 2L, 1.0 / 6)))
    assert(!fenced.contains(("B", "C")))

    val re = Dedup.sourceOverlap(docs.repartition(5), "doc_id", "text",
        "src", window = 8)
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4, t._5, t._6))).toMap
    assert(re == out)
  }

  test("incremental segment dedup: cross-batch hotness, batch-local hotness, delta fold ≡ direct counts, null text retained") {
    val boiler = "subscribe to our newsletter terms of service apply" // 8 toks
    val uniqA = "alpha beta gamma delta epsilon zeta eta theta"
    val uniqB = "iota kappa lambda mu nu xi omicron pi"
    val pair  = "rho sigma tau upsilon phi chi psi omega"
    val batchA = Seq((1L, s"$boiler $uniqA")).toDF("doc_id", "text")
    val batchB = Seq(
      (10L, s"$boiler $uniqB"),  // boiler: 1 old doc + this → hot cross-batch
      (11L, s"$pair one two three four five six seven eight"),
      (12L, pair),               // pair seen in 2 batch docs → hot batch-local
      (13L, null))               // null text: corpus row retained
      .toDF("doc_id", "text")

    val (cleanA, deltaA) = Dedup.incrementalSegmentDedup(batchA, "doc_id",
      "text", Dedup.emptySegmentIndex(spark), window = 8, minDocs = 2)
    // single-doc first batch: nothing repeats, everything survives
    assert(cleanA.filter(col("segs_removed") > 0).count() == 0)
    val idx = Dedup.foldSegmentIndex(Dedup.emptySegmentIndex(spark), deltaA)

    val (cleanB, deltaB) = Dedup.incrementalSegmentDedup(batchB, "doc_id",
      "text", idx, window = 8, minDocs = 2)
    val out = cleanB.as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(10L, 11L, 12L, 13L), "every batch doc reports")
    assert(out(0) == ((10L, uniqB, 2L, 1L)), "index count pushes boiler over threshold")
    assert(out(1) == ((11L, "one two three four five six seven eight", 2L, 1L)),
      "batch-local repetition is hot with zero index support")
    assert(out(2) == ((12L, "", 1L, 1L)))
    assert(out(3) == ((13L, "", 0L, 0L)), "null text must not drop the corpus row")

    // delta fold ≡ direct distinct-doc counts over the union corpus
    val folded = Dedup.foldSegmentIndex(idx, deltaB)
      .as[(Long, Long)].collect().toMap
    val direct = {
      val all = batchA.unionByName(batchB)
      Dedup.incrementalSegmentDedup(all, "doc_id", "text",
        Dedup.emptySegmentIndex(spark), window = 8, minDocs = 2)
        ._2.as[(Long, Long)].collect().toMap
    }
    assert(folded == direct, "two-batch fold must equal one-shot counts")

    // empty index + whole corpus in one batch ≡ the batch operator
    val union = batchA.unionByName(batchB)
    val oneShot = Dedup.incrementalSegmentDedup(union, "doc_id", "text",
        Dedup.emptySegmentIndex(spark), window = 8, minDocs = 2)
      ._1.as[(Long, String, Long, Long)].collect().sortBy(_._1)
    val batchOp = Dedup.removeRepeatedSegments(union, "doc_id", "text",
        window = 8, minDocs = 2)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(oneShot.toSeq == batchOp.toSeq,
      "empty-index incremental must reproduce removeRepeatedSegments")
  }

  test("duplicated spans: cross-doc windows found at UNALIGNED offsets; within-doc repeats and null text excluded") {
    val shared = "the quick brown fox jumps over the lazy" // 8 tokens
    val a = s"$shared dog and then some unique tail words here"      // span at 0
    val b = s"prefix words shift everything $shared dog ending now"  // span at 4
    val c = "totally unrelated content with no overlap at all okay"  // clean
    val dups = Seq.fill(2)("again again again again again again again again").mkString(" ")
    val docs = Seq((1L, a), (2L, b), (3L, c), (4L, dups), (5L, null))
      .toDF("doc_id", "text")
    val out = Dedup.duplicatedSpanProfile(docs, "doc_id", "text",
        window = 8, minDocs = 2)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L), "every doc reports")
    // docs 1 and 2 share the 8-token span at DIFFERENT offsets (0 vs 4) —
    // the case fixed-segment dedup (removeRepeatedSegments) cannot see;
    // both must report exactly one hot span covering 8 tokens... plus the
    // shifted copy extends the shared run to 9 tokens ("... lazy dog"), so
    // two overlapping hot spans covering 9 positions
    assert(out(0)._3 == 2 && out(0)._4 == 9, s"doc1: ${out(0)}")
    assert(out(1)._3 == 2 && out(1)._4 == 9, s"doc2: ${out(1)}")
    assert(out(2) == ((3L, 9L, 0L, 0L, 0.0)), "clean doc untouched")
    // doc 4 repeats WITHIN itself only — count(DISTINCT doc) = 1, not hot
    assert(out(3)._3 == 0 && out(3)._4 == 0, s"within-doc repeats are not cross-doc: ${out(3)}")
    assert(out(4) == ((5L, 0L, 0L, 0L, 0.0)), "null text reports zeros")
    // ratio = covered / total tokens
    assert(math.abs(out(0)._5 - 9.0 / out(0)._2) < 1e-9)

    // the transform twin: exactly the covered tokens are cut, order kept
    val cut = Dedup.removeDuplicatedSpans(docs, "doc_id", "text",
        window = 8, minDocs = 2)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(cut(0) == ((1L, "and then some unique tail words here", 16L, 9L)))
    assert(cut(1) == ((2L, "prefix words shift everything ending now", 15L, 9L)))
    assert(cut(2)._2 == c && cut(2)._4 == 0L, "clean doc text survives verbatim")
    assert(cut(3)._4 == 0L, "within-doc repeats are never cut")
    assert(cut(4) == ((5L, "", 0L, 0L)), "null text rebuilds to empty")
  }

  test("bigram fluency: collocation-heavy text outscores unseen-bigram gibberish; tiny docs null; deterministic") {
    import graft.ext.TextStats
    val fluent = (1L to 10L).map(i => (i, "the cat sat on the mat"))
    val docs = (fluent ++ Seq(
      (90L, "qzx wvu tsr qpo nml kji"), // every bigram unique to this doc
      (91L, "solo"),                    // 1 token: no bigrams
      (92L, null)))                     // null text: no bigrams
      .toDF("doc_id", "text")
    val out = TextStats.bigramFluency(docs, "doc_id", "text")
      .as[(Long, Long, Option[Double])].collect().sortBy(_._1)
    val byId = out.map(o => o._1 -> o).toMap
    // ten identical docs share every bigram (cb = 10 per pair): far above
    // the gibberish doc whose bigrams occur once each
    assert(byId(1L)._3.get > 2 * byId(90L)._3.get,
      s"fluent ${byId(1L)} vs gibberish ${byId(90L)}")
    assert(byId(1L)._2 == 5 && byId(90L)._2 == 5)
    assert(byId(91L) == ((91L, 0L, None)), "single-token doc has no score")
    assert(byId(92L) == ((92L, 0L, None)), "null text has no score")
    // decimal-exact mean: stable under repartitioning
    val re = TextStats.bigramFluency(docs.repartition(7), "doc_id", "text")
      .as[(Long, Long, Option[Double])].collect().sortBy(_._1)
    assert(re.toSeq == out.toSeq)
  }

  test("cross-corpus fluency: reference-like targets outscore alien ones; self-trained form unchanged") {
    import graft.ext.TextStats
    val ref = (1L to 10L).map(i => (i, "the cat sat on the mat"))
      .toDF("doc_id", "text")
    val target = Seq(
      (100L, "the cat sat on the mat"),  // pure reference phrasing
      (101L, "mat the on sat cat the"),  // reference VOCAB, alien order
      (102L, "qzx wvu tsr qpo nml kji"), // fully out-of-reference
      (103L, "solo"), (104L, null))
      .toDF("doc_id", "text")
    val out = TextStats.bigramFluencyAgainst(ref, target, "doc_id", "text")
      .as[(Long, Long, Option[Double])].collect().map(o => o._1 -> o).toMap
    assert(out(100L)._3.get > 2 * out(101L)._3.get,
      s"phrasing must beat bag-of-words: ${out(100L)} vs ${out(101L)}")
    // add-α semantics: an unseen continuation of a FREQUENT known context
    // (doc 101: cb=0, cp("the")=20 → 0.5/22.5) is rated MORE surprising
    // than a wholly novel context (doc 102: 0.5/(0.5·V) = 1/V = 0.2) —
    // the model has strong evidence against the former, none about the
    // latter. Both sit far below the reference-phrased doc.
    assert(out(100L)._3.get > 2 * out(102L)._3.get, out(100L).toString)
    assert(out(101L)._3.get > 0, "unseen pairs score positive, never 0/null")
    // the fully-novel doc sits exactly on the smoothed floor 1/V (V = 5
    // reference types), not at 0/null — smoothing, not poisoning
    assert(math.abs(out(102L)._3.get - 1.0 / 5) < 1e-9, out(102L).toString)
    assert(out(103L) == ((103L, 0L, None)) && out(104L) == ((104L, 0L, None)))

    // ref = target delegates to the same core: bit-identical to the
    // self-trained operator (q76's oracle depends on this)
    val docs = ref.unionByName(target)
    val self = TextStats.bigramFluency(docs, "doc_id", "text")
      .as[(Long, Long, Option[Double])].collect().sortBy(_._1)
    val viaAgainst = TextStats.bigramFluencyAgainst(docs, docs, "doc_id", "text")
      .as[(Long, Long, Option[Double])].collect().sortBy(_._1)
    assert(self.toSeq == viaAgainst.toSeq)
  }

  test("simhash: identical texts agree, Column and table forms agree") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "totally different words here")).toDF("doc_id", "text")
    val viaTable = Dedup.simhashTable(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(viaTable(1L) == viaTable(2L))
    assert(viaTable(1L) != viaTable(3L))
    val viaColumn = docs.select(col("doc_id"), Dedup.simhash(col("text")))
      .as[(Long, Long)].collect().toMap
    assert(viaTable == viaColumn)
  }

  test("brute-force ANN ranks a planted near-duplicate vector first") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val v0 = emb.filter(col("vec_id") === 0).select("embedding")
      .as[Seq[Float]].head()
    val planted = v0.updated(0, v0.head + 0.001f)
    val corpus = emb.select(col("vec_id"), col("embedding"))
      .union(Seq((9999L, planted)).toDF("vec_id", "embedding"))
    val top = SimSearch.bruteForceTopK(corpus,
      corpus.filter(col("vec_id") === 0), "vec_id", "embedding", 3)
    val first = top.filter(col("rank") === 1).select("neighbor_id").as[Long].head()
    assert(first == 9999L)
  }

  test("brute-force ANN is correct over NEGATIVE numeric ids (bias-encoded tie key)") {
    // a corpus whose ids span the signed range: the tie key must order
    // -20 < -3 < 0 < 7 numerically and decode back losslessly — a raw
    // lpad would encode -3 as '0…0-3' (mis-ordered) and decode to NULL
    val base = Seq(1.0f, 0.0f, 0.0f, 0.0f)
    val corpus = Seq(
      (-20L, base), (-3L, base), (0L, base), (7L, base),
      (Long.MinValue, base), (Long.MaxValue, base))
      .toDF("vec_id", "embedding")
    val q = Seq((100L, base)).toDF("vec_id", "embedding")
    val got = SimSearch.bruteForceTopK(corpus, q, "vec_id", "embedding", 6)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    // all sims tie at 1.0 → rank order IS ascending id order, none NULL
    assert(got == Seq(Long.MinValue, -20L, -3L, 0L, 7L, Long.MaxValue), got)
  }

  test("lsh ANN recall vs brute force is reasonable on testdata") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val bf = SimSearch.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = SimSearch.lshTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect lsh).size.toDouble / bf.size
    assert(recall > 0.2, s"recall=$recall")  // bucketed search trades recall for cost
  }

  test("IVF ANN recall vs brute force is reasonable on testdata") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val bf = SimSearch.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = SimSearch.ivfTopK(emb, queries, "vec_id", "embedding", 5,
      nCells = 16, nProbe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect ivf).size.toDouble / bf.size
    assert(recall > 0.3, s"recall=$recall")
  }

  test("PQ ANN: planted same-code vector ranks first; recall vs brute force reasonable") {
    val emb = Tables.load(spark, sf(), "embeddings")
    // a near-identical copy of vector 0 encodes to vector 0's own argmin
    // codes in every subspace, which is the global ADC minimum for query 0
    // — PQ must rank it first
    val v0 = emb.filter(col("vec_id") === 0).select("embedding")
      .as[Seq[Float]].head()
    val planted = v0.updated(0, v0.head + 0.001f)
    val corpus = emb.select(col("vec_id"), col("embedding"))
      .union(Seq((9999L, planted)).toDF("vec_id", "embedding"))
    val top = SimSearch.pqTopK(corpus, corpus.filter(col("vec_id") === 0),
      "vec_id", "embedding", 3, m = 4, nCodes = 16, dim = 64)
    val first = top.filter(col("rank") === 1).select("neighbor_id").as[Long].head()
    assert(first == 9999L)

    // coarse 16-entry codebooks on random data: recall tracks the other
    // ANN variants' band, not exactness
    val queries = emb.filter(col("vec_id") < 10)
    val bf = SimSearch.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val pq = SimSearch.pqTopK(emb, queries, "vec_id", "embedding", 5,
      m = 16, nCodes = 16, dim = 64)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect pq).size.toDouble / bf.size
    assert(recall > 0.2, s"recall=$recall")
  }

  test("PQ Lloyd refinement: k-means objective monotone, recall sane, deterministic") {
    val emb = Tables.load(spark, sf(), "embeddings")
    // the k-means INVARIANT (the only data-independent guarantee): every
    // assign+average round is non-increasing in the training objective —
    // ADC recall per config is corpus-dependent and may wobble, the
    // objective may not (1e-9 headroom for the decimal-10dp sum rounding)
    for (m <- Seq(4, 16)) {
      val errs = Seq(0, 1, 2).map(it => SimSearch.pqTrainingError(
        emb, "vec_id", "embedding", m = m, nCodes = 16, dim = 64, lloydIters = it))
      assert(errs(1) <= errs(0) + 1e-9 && errs(2) <= errs(1) + 1e-9,
        s"m=$m objective not monotone: $errs")
      assert(errs(2) < errs(0), s"m=$m refinement did nothing: $errs")
    }

    // recall sanity on the refined books (generous band — random test
    // vectors; the probe measured 0.36 at this config vs 0.26 for seeds)
    val queries = emb.filter(col("vec_id") < 10)
    val bf = SimSearch.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val pq = SimSearch.pqTopK(emb, queries, "vec_id", "embedding", 5,
      m = 16, nCodes = 16, dim = 64, lloydIters = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect pq).size.toDouble / bf.size
    assert(recall > 0.15, s"refined recall: $recall")

    // refinement is decimal-exact (order-independent sums): identical books
    // — and thus identical results — under a different partitioning
    val a = SimSearch.pqTopK(emb, queries, "vec_id", "embedding", 5,
      m = 4, nCodes = 16, dim = 64, lloydIters = 2)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    val b = SimSearch.pqTopK(emb.repartition(7), queries, "vec_id", "embedding", 5,
      m = 4, nCodes = 16, dim = 64, lloydIters = 2)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(a == b)
  }

  test("IVF-PQ ANN: recall in the ANN band; candidates bounded by probed cells") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val bf = SimSearch.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivfpq = SimSearch.ivfPqTopK(emb, queries, "vec_id", "embedding", 5,
      nCells = 16, nProbe = 8, m = 16, nCodes = 16, dim = 64)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect ivfpq).size.toDouble / bf.size
    assert(recall > 0.15, s"recall=$recall") // two quantizers stack losses

    // the cell filter genuinely prunes: with 1 probe of 16 cells, every
    // returned neighbor lives in its query's single probed cell, so the
    // scan touched a fraction of the corpus (IVF's candidate bound) —
    // checked structurally via the result being a strict subset of one
    // cell per query rather than the whole corpus
    val one = SimSearch.ivfPqTopK(emb, queries, "vec_id", "embedding", 1000,
      nCells = 16, nProbe = 1, m = 4, nCodes = 16, dim = 64)
    val perQuery = one.groupBy("query_id").count()
      .select("count").as[Long].collect()
    val n = emb.count()
    assert(perQuery.forall(_ < n), s"nProbe=1 must scan under the corpus size $n")
  }

  test("annRecall: end-to-end recall table — every query reports, hits bounded, more probes never hurt on average") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    val r = SimSearch.annRecall(emb, queries, "vec_id", "embedding", 5,
        nCells = 16, nProbe = 4, m = 16, nCodes = 16, dim = 64)
      .as[(Long, Long, Double)].collect()
    assert(r.length == 5, "one row per query, misses included")
    assert(r.forall { case (_, h, rec) =>
      h >= 0 && h <= 5 && math.abs(rec - h / 5.0) < 1e-9 })

    // probing every cell removes the coarse quantizer's loss, so mean
    // recall at nProbe=16 is at least the nProbe=1 mean (same codebooks)
    def mean(nProbe: Int): Double = SimSearch.annRecall(emb, queries,
        "vec_id", "embedding", 5, nCells = 16, nProbe = nProbe,
        m = 16, nCodes = 16, dim = 64)
      .agg(avg(col("recall_r6"))).as[Double].head()
    assert(mean(16) >= mean(1) - 1e-9)
  }

  test("recallAtK: per-query recall against the exact top-k, misses included") {
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L), (3L, 30L), (3L, 31L))
      .toDF("query_id", "neighbor_id")
    val ann = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 99L), (3L, 98L), (3L, 99L))
      .toDF("query_id", "neighbor_id")
    val got = SimSearch.recallAtK(exact, ann, 2)
      .as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 1.0, 2L -> 0.5, 3L -> 0.0))
  }

  test("token stats match hand computation") {
    val df = Seq("the quick brown fox").toDF("text")
    val r = df.select(
      TextStats.tokenCount(col("text")).as("n"),
      TextStats.avgTokenLen(col("text")).as("avg"),
      TextStats.stopwordRatio(col("text"), TextStats.englishStopwords).as("sw"))
      .as[(Int, Double, Double)].head()
    assert(r._1 == 4)
    assert(r._2 == 16.0 / 4)                 // 16 non-space chars / 4 tokens
    assert(r._3 == 0.25)                     // "the" of 4 tokens
  }

  test("multimodal: feature extraction is deterministic, schema is typed") {
    val docs = Tables.load(spark, sf(), "documents").limit(30)
    val assets = Multimodal.assetsFromDocuments(docs)
    val f1 = Multimodal.extractFeatures(assets).orderBy("asset_id").collect()
    val f2 = Multimodal.extractFeatures(assets).orderBy("asset_id").collect()
    assert(f1.sameElements(f2))
    assert(f1.head.getAs[scala.collection.Seq[Float]]("feature").size == 16)
    assert(Multimodal.sampleFrames(assets).columns.toSeq ==
      Seq("asset_id", "frame_no", "frame_payload_b64"))
  }

  test("ImageIO decoder: real PNG bytes yield real dimensions and a luminance histogram") {
    import java.awt.image.BufferedImage
    // synthesize a REAL png in-test (ImageIO write -> decode roundtrip):
    // 4x2, left half black, right half white
    val img = new BufferedImage(4, 2, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4)
      img.setRGB(x, y, if (x < 2) 0x000000 else 0xFFFFFF)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", baos))
    val png = baos.toByteArray

    val facts = Multimodal.ImageIoDecoder.decode(png, 8).get
    assert(facts.width == 4 && facts.height == 2 && facts.channels == 3)
    // 4 black pixels -> bin 0, 4 white -> top bin; normalized by pixel count
    assert(facts.feature(0) == 0.5f && facts.feature(7) == 0.5f)
    assert(math.abs(facts.feature.sum - 1.0f) < 1e-6)
    // corrupt payload: None, never a throw
    assert(Multimodal.ImageIoDecoder.decode("not an image".getBytes, 8).isEmpty)

    // through the Spark pipeline: the real PNG gets real metadata; an
    // undecodable "image" payload and an audio payload take the hash
    // fallback with null dimensions
    val assets = Seq((1L, "image", png), (2L, "image", "not an image".getBytes),
      (3L, "audio", "some waveform".getBytes))
      .toDF("asset_id", "modality", "content")
    val got = Multimodal.extractFeatures(assets, dim = 8)
      .orderBy("asset_id").collect()
    assert(got(0).getAs[Int]("width") == 4 &&
      got(0).getAs[Int]("height") == 2 && got(0).getAs[Int]("channels") == 3)
    assert(got(0).getAs[scala.collection.Seq[Float]]("feature")(0) == 0.5f)
    assert(got(1).isNullAt(got(1).fieldIndex("width")))
    assert(got(2).isNullAt(got(2).fieldIndex("width")))
    // the fallback features are the FakeDecoder's, unchanged
    assert(got(2).getAs[scala.collection.Seq[Float]]("feature") ==
      Multimodal.FakeDecoder.features("some waveform".getBytes, 8).toSeq)
  }

  test("WAV decoder: real PCM bytes yield stream layout and an amplitude histogram") {
    import javax.sound.sampled._
    // synthesize a REAL wav in-test (AudioSystem write -> decode
    // roundtrip): 8 kHz mono 16-bit, 800 frames = 100 ms, constant
    // half-amplitude square wave
    val frames = 800
    val pcm = new Array[Byte](frames * 2)
    for (i <- 0 until frames) {
      val v = if (i % 2 == 0) 16384 else -16384 // |amplitude| = 0.5 exactly
      pcm(2 * i) = (v & 0xFF).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong),
      AudioFileFormat.Type.WAVE, baos)
    val wav = baos.toByteArray

    val facts = Multimodal.WavDecoder.decode(wav, 8).get
    assert(facts.channels == 1 && facts.sampleRateHz == 8000)
    assert(facts.durationMs == 100)
    // every sample sits at |amp| = 0.5 -> bin 4 of 8 holds all the mass
    assert(facts.feature(4) == 1.0f)
    assert(math.abs(facts.feature.sum - 1.0f) < 1e-6)
    // corrupt payload: None, never a throw
    assert(Multimodal.WavDecoder.decode("not audio".getBytes, 8).isEmpty)

    // through the Spark pipeline: real WAV gets real stream metadata;
    // video stays on the hash fallback with null metadata
    val assets = Seq((1L, "audio", wav), (2L, "video", "frames".getBytes))
      .toDF("asset_id", "modality", "content")
    val got = Multimodal.extractFeatures(assets, dim = 8)
      .orderBy("asset_id").collect()
    assert(got(0).getAs[Int]("sample_rate_hz") == 8000 &&
      got(0).getAs[Long]("duration_ms") == 100L &&
      got(0).getAs[Int]("channels") == 1)
    assert(got(0).isNullAt(got(0).fieldIndex("width")))
    assert(got(1).isNullAt(got(1).fieldIndex("sample_rate_hz")))
    assert(got(1).getAs[scala.collection.Seq[Float]]("feature") ==
      Multimodal.FakeDecoder.features("frames".getBytes, 8).toSeq)
  }

  // -- in-test MJPEG-AVI synthesis: JPEG frames via ImageIO, hand-framed
  // RIFF container (fourcc + LE u32 length chunks) — a REAL AVI any
  // player would open, built with zero external tooling
  private def jpegFrame(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", baos))
    baos.toByteArray
  }

  private def aviBytes(frames: Seq[Array[Byte]], usPerFrame: Int): Array[Byte] = {
    def u32(v: Long): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def chunk(fourcc: String, data: Array[Byte]): Array[Byte] = {
      val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      fourcc.getBytes("US-ASCII") ++ u32(data.length.toLong) ++ data ++ pad
    }
    def list(listType: String, data: Array[Byte]): Array[Byte] =
      chunk("LIST", listType.getBytes("US-ASCII") ++ data)
    // avih: dwMicroSecPerFrame @0, dwTotalFrames @16, rest zero (56 bytes)
    val avih = new Array[Byte](56)
    u32(usPerFrame.toLong).copyToArray(avih, 0)
    u32(frames.size.toLong).copyToArray(avih, 16)
    val hdrl = list("hdrl", chunk("avih", avih))
    val movi = list("movi", frames.map(chunk("00dc", _)).reduce(_ ++ _))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ u32(body.length.toLong) ++ body
  }

  test("AVI decoder: real MJPEG container yields geometry, fps and a temporal-mean histogram") {
    // 3 frames: black, white, white — 25 fps
    val avi = aviBytes(Seq(jpegFrame(4, 2, 0x000000),
      jpegFrame(4, 2, 0xFFFFFF), jpegFrame(4, 2, 0xFFFFFF)), usPerFrame = 40000)
    val facts = Multimodal.AviMjpegDecoder.decode(avi, 4).get
    assert(facts.width == 4 && facts.height == 2 && facts.channels == 3)
    assert(facts.fpsHz == 25 && facts.nFrames == 3)
    assert(facts.durationMs == 120L) // 3 frames / 25 fps
    // JPEG is lossy but constant-color frames stay in their wide dim=4
    // bins: 1/3 of sampled mass dark, 2/3 bright
    assert(math.abs(facts.feature(0) - 1f / 3) < 0.05f)
    assert(math.abs(facts.feature(3) - 2f / 3) < 0.05f)
    assert(math.abs(facts.feature.sum - 1.0f) < 1e-5)
    // corrupt payloads: None, never a throw (truncated AVI included)
    assert(Multimodal.AviMjpegDecoder.decode("not video".getBytes, 4).isEmpty)
    assert(Multimodal.AviMjpegDecoder.decode(avi.take(40), 4).isEmpty)

    // through the Spark pipeline: real AVI gets real metadata (fps in the
    // rate slot); a non-MJPEG payload stays on the hash fallback
    val assets = Seq((1L, "video", avi), (2L, "video", "h264???".getBytes))
      .toDF("asset_id", "modality", "content")
    val got = Multimodal.extractFeatures(assets, dim = 4)
      .orderBy("asset_id").collect()
    assert(got(0).getAs[Int]("width") == 4 && got(0).getAs[Int]("height") == 2)
    assert(got(0).getAs[Int]("sample_rate_hz") == 25 &&
      got(0).getAs[Long]("duration_ms") == 120L)
    assert(got(1).isNullAt(got(1).fieldIndex("width")))
    assert(got(1).getAs[scala.collection.Seq[Float]]("feature") ==
      Multimodal.FakeDecoder.features("h264???".getBytes, 4).toSeq)

    // frame sampling: every real frame row round-trips through ImageIO
    val sampled = Multimodal.sampleFrames(assets, stride = 1)
      .orderBy("asset_id", "frame_no").collect()
    val realRows = sampled.filter(_.getAs[Long]("asset_id") == 1L)
    assert(realRows.map(_.getAs[Int]("frame_no")).toSeq == Seq(0, 1, 2))
    for (r <- realRows) {
      val bytes = java.util.Base64.getDecoder.decode(r.getAs[String]("frame_payload_b64"))
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img.getWidth == 4 && img.getHeight == 2)
    }
    // stride skips frames: stride=2 over 3 frames keeps 0 and 2
    assert(Multimodal.sampleFrames(assets, stride = 2)
      .filter(col("asset_id") === 1L).select("frame_no")
      .as[Int].collect().sorted.toSeq == Seq(0, 2))
    // the non-AVI payload keeps the chunking stand-in (one kb-chunk row)
    assert(sampled.count(_.getAs[Long]("asset_id") == 2L) == 1)
  }

  test("incremental dedup: empty index degenerates to the batch algorithm") {
    val docs = Tables.load(spark, sf(), "documents")
    val (assign, _) = Dedup.incrementalAssignments(docs, "doc_id", "text",
      Dedup.emptyIndex(spark), threshold = 0.6)
    val batch = Dedup.minhashDedupAssignments(docs, "doc_id", "text",
      n = 3, k = 64, bands = 16, threshold = 0.6)
    val a = assign.select("doc_id", "keeper_id")
      .as[(Long, Long)].collect().toSet
    val b = batch.select("doc_id", "keeper_id")
      .as[(Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("buildIndex indexes only the kept representatives (no ghost keepers)") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta"), // dropped dup of 1
      (5L, "one two three four five six seven eight nine"))
      .toDF("doc_id", "text")
    val idx = Dedup.buildIndex(docs, "doc_id", "text", threshold = 0.6)
    // doc 3 was assigned to keeper 1, so it must not be indexable as a
    // keeper for future batches
    assert(idx.signatures.select("doc_id").as[Long].collect().toSet == Set(1L, 5L))
    assert(idx.bands.select("doc_id").distinct().as[Long].collect().toSet == Set(1L, 5L))
    val (a, _) = Dedup.incrementalAssignments(
      Seq((9L, "alpha beta gamma delta epsilon zeta eta theta"))
        .toDF("doc_id", "text"), "doc_id", "text", idx, threshold = 0.6)
    assert(a.select("doc_id", "keeper_id").as[(Long, Long)].collect().toMap ==
      Map(9L -> 1L))
  }

  test("incremental dedup: cross-batch duplicates map to the corpus keeper") {
    val b1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different content about spark and parquet files"))
      .toDF("doc_id", "text")
    val (a1, idx1) = Dedup.incrementalAssignments(b1, "doc_id", "text",
      Dedup.emptyIndex(spark), threshold = 0.6)
    assert(a1.filter(col("doc_id") === col("keeper_id")).count() == 2)

    // batch 2: an exact copy of doc 1 (smaller id!) + a fresh doc
    val b2 = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (9L, "novel text that matches nothing else in the whole corpus"))
      .toDF("doc_id", "text")
    val (a2, idx2) = Dedup.incrementalAssignments(b2, "doc_id", "text", idx1,
      threshold = 0.6)
    val m = a2.select("doc_id", "keeper_id").as[(Long, Long)].collect().toMap
    // first-seen semantics: the corpus doc wins even over the smaller id
    assert(m == Map(0L -> 1L, 9L -> 9L))
    // only the kept doc's rows extend the index
    assert(idx2.signatures.select("doc_id").as[Long].collect().toSeq == Seq(9L))

    // idempotent replay of the same batch against the same index
    val (a2b, _) = Dedup.incrementalAssignments(b2, "doc_id", "text", idx1,
      threshold = 0.6)
    assert(a2b.select("doc_id", "keeper_id").as[(Long, Long)].collect().toMap == m)
  }

  test("truncationProfile: identical prefixes score 1.0 at the prefix width, lower at full") {
    // a and b agree exactly on dims 0-3 and diverge after → cos at d=4 is
    // exactly 1.0 while the full-width cosine is strictly below it
    val a = Array.tabulate(8)(i => if (i < 4) 1.0f else 1.0f)
    val b = Array.tabulate(8)(i => if (i < 4) 1.0f else -1.0f)
    val c = Array.tabulate(8)(_ => 1.0f) // exact dup of a
    val corpus = Seq((1L, a), (2L, b), (3L, c)).toDF("vec_id", "embedding")
    val rows = SimSearch.truncationProfile(corpus, "vec_id", "embedding",
        threshold = -1.0, dims = Seq(4))
      .select("id_a", "id_b", "cos_full_r6", "cos_d4_r6")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(rows((1L, 2L)) == ((0.0, 1.0)))  // orthogonal at full, equal prefix
    assert(rows((1L, 3L)) == ((1.0, 1.0)))  // exact dup everywhere
    assert(rows((2L, 3L)) == ((0.0, 1.0)))
  }

  test("trigramFluencyAgainst: backoff tiers score exactly, novel text hits the λ²/V floor") {
    val ref = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox runs through the green field"))
      .toDF("doc_id", "text")
    // ref: N=18 tokens, V=12 distinct
    val tgt = Seq(
      (10L, "the quick brown fox jumps"), // all 3 trigrams seen
      (11L, "zz yy xx ww vv"),            // fully novel → every s = λ²/V
      (12L, "ok"),                        // <3 tokens → no trigrams
      (14L, "lazy dog runs through"))     // tiers: λ²·(c1/N) then λ·(c2/c2ctx)
      .toDF("doc_id", "text")
    val got = graft.ext.TextStats
      .trigramFluencyAgainst(ref, tgt, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.toString.toDouble)))).toMap
    assert(got(10L)._1 == 3 && got(11L)._1 == 3 && got(14L)._1 == 2)
    assert(got(12L) == ((0L, None)))
    // doc 10: (2/2 + 2/2 + 1/2)/3
    assert(math.abs(got(10L)._2.get - 2.5 / 3) < 1e-9)
    // doc 11: every trigram fully novel
    assert(math.abs(got(11L)._2.get - 0.4 * (0.4 * (1.0 / 12))) < 1e-9)
    // doc 14: "lazy dog runs" → λ²·(c1(runs)/N)=0.16/18;
    //         "dog runs through" → λ·(c2/c2ctx)=0.4
    assert(math.abs(got(14L)._2.get - (0.4 * (0.4 * (1.0 / 18)) + 0.4) / 2) < 1e-9)
    // seen phrasing ≫ novel
    assert(got(10L)._2.get > 10 * got(11L)._2.get)
    // self-trained convenience form is the ref=target special case
    val a = graft.ext.TextStats.trigramFluency(ref, "doc_id", "text").collect().toSeq
    val b = graft.ext.TextStats.trigramFluencyAgainst(ref, ref, "doc_id", "text")
      .collect().toSeq
    assert(a.toSet == b.toSet)
  }

  test("langIdAgainst: trained char-n-gram classifier routes planted languages; gates compose") {
    val train = Seq(
      "en" -> "the quick brown fox jumps over the lazy dog while children read their books in the evening and the weather turns warm",
      "en" -> "a journey of a thousand miles begins with a single step and every good boy deserves fruit in the summer months",
      "fr" -> "le renard brun saute par dessus le chien paresseux et les enfants lisent leurs livres le soir quand le temps devient chaud",
      "fr" -> "un voyage de mille lieues commence par un premier pas et chaque bon garcon merite des fruits au debut des mois d ete",
      "de" -> "der schnelle braune fuchs springt ueber den faulen hund und die kinder lesen abends ihre buecher wenn das wetter warm wird",
      "de" -> "eine reise von tausend meilen beginnt mit einem einzigen schritt und jeder gute junge verdient obst in den sommermonaten")
      .toDF("lang", "text")
    val docs = Seq(
      (1L, "she walks to the market every morning to buy fresh bread for the children"),
      (2L, "elle marche au marche chaque matin pour acheter du pain frais pour les enfants"),
      (3L, "sie geht jeden morgen zum markt um frisches brot fuer die kinder zu kaufen"),
      // char-level signal works where stopword lists are blind: a short
      // fragment of in-domain words, no function words at all
      (4L, "schnelle buecher ueber sommermonaten"),
      (5L, null.asInstanceOf[String])) // null text: null lang, 0 grams
      .toDF("doc_id", "text")
    val got = graft.ext.TextStats
      .langIdAgainst(train, "lang", "text", docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), r.getLong(3)))).toMap
    assert(got(1L)._1.contains("en"), got(1L))
    assert(got(2L)._1.contains("fr"), got(2L))
    assert(got(3L)._1.contains("de"), got(3L))
    assert(got(4L)._1.contains("de"), got(4L))
    assert(got(5L)._1.isEmpty && got(5L)._2 == 0L, got(5L))
    // composition: a langModel-armed gate keeps only the allowed language
    val kept = graft.ext.Curation.curate(
      docs.filter(col("text").isNotNull),
      graft.ext.Curation.Gates(minChars = 10, langAllow = Seq("fr"),
        langModel = Some(train)))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L), kept)
  }

  test("fuzzyNearDups: typo pairs found with exact distances, blocking contract enforced, pairs unique") {
    val docs = Seq(
      (1L, "spark streaming guide"),        // base
      (2L, "spark streamin guide"),         // 1 deletion → dist 1
      (3L, "spark streaming guid"),         // 1 deletion → dist 1
      (4L, "spark structured streaming"),   // same prefix, far → cut by dist
      (5L, "Spark streaming guide"),        // case diff in prefix: blocks
                                            // together (lowered), dist 1 (S/s)
      (6L, "flink streaming guide"),        // different prefix: NEVER a pair
      (7L, "zpark streaming guide"))        // edit INSIDE prefix: not a candidate
      .toDF("id", "s")
    val got = Dedup.fuzzyNearDups(docs, "id", "s", maxDist = 3,
        prefixLen = 4, lenBand = 8)
      .as[(Long, Long, Long)].collect()
    assert(got.length == got.toSet.size, "duplicate pair rows")
    val m = got.map(t => (t._1, t._2) -> t._3).toMap
    assert(m((1L, 2L)) == 1L && m((1L, 3L)) == 1L && m((1L, 5L)) == 1L)
    assert(m((2L, 3L)) == 2L)
    assert(!m.contains((1L, 4L)), "distance cut must hold")
    assert(!got.exists(t => t._1 == 6L || t._2 == 6L), "cross-prefix pair leaked")
    // id 7 is dist 1 from id 1 but its prefix "zpar" ≠ "spar": the blocking
    // contract excludes head-edited pairs by design
    assert(!m.contains((1L, 7L)), "prefix-edit pair must not be a candidate")
    // repartition stability
    val again = Dedup.fuzzyNearDups(docs.repartition(5), "id", "s", 3, 4, 8)
      .as[(Long, Long, Long)].collect()
    assert(again.toSet == got.toSet)
  }

  test("fuzzyNearDups: hot blocks salt-split EXACTLY (same pairs, spread work); maxPairs fences degenerate keys") {
    // every row shares the 2-char prefix and the length band — previously
    // the fence refused; now the block salt-splits into cells and the
    // reported pair set must be IDENTICAL to an un-split run
    val docs = (1 to 20).map(i => (i.toLong, f"ab$i%02d")).toDF("id", "s")
    val split = Dedup.fuzzyNearDups(docs, "id", "s", maxDist = 2,
        prefixLen = 2, lenBand = 8, maxBlock = 5)
      .as[(Long, Long, Long)].collect().toSet
    val whole = Dedup.fuzzyNearDups(docs, "id", "s", maxDist = 2,
        prefixLen = 2, lenBand = 8, maxBlock = 1000)
      .as[(Long, Long, Long)].collect().toSet
    assert(split == whole, "salt-splitting changed the reported pair set")
    assert(whole.nonEmpty) // ab01..ab20 are all within dist 2 of each other
    // the loud fence now guards TOTAL candidate volume from oversized
    // blocks — a degenerate key for the corpus still refuses
    val e = intercept[IllegalArgumentException] {
      Dedup.fuzzyNearDups(docs, "id", "s", maxDist = 2, prefixLen = 2,
        lenBand = 8, maxBlock = 5, maxPairs = 100)
    }
    assert(e.getMessage.contains("maxPairs"))
  }

  test("fuzzyNearDups: pairs straddling a length-band edge still surface (neighbor probe)") {
    // lenBand=4: "abcdefg" (len 7, band 1) vs "abcdefgh" (len 8, band 2)
    val docs = Seq((1L, "abcdefg"), (2L, "abcdefgh")).toDF("id", "s")
    val got = Dedup.fuzzyNearDups(docs, "id", "s", maxDist = 2,
        prefixLen = 3, lenBand = 4)
      .as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 2L, 1L)))
  }

  test("kmeansClusters: planted blobs separate, objective monotone in Lloyd rounds, repartition-stable") {
    // two tight blobs around orthogonal axes (unit-normalized internally)
    val rows =
      (0 until 10).map(i => (i.toLong,
        Array(1.0f, 0.02f * (i % 3), 0.0f, 0.01f * (i % 2)))) ++
      (10 until 20).map(i => (i.toLong,
        Array(0.01f * (i % 2), 0.0f, 1.0f, 0.02f * (i % 3))))
    val df = rows.toDF("vec_id", "embedding")
    val a = SimSearch.kmeansClusters(df, "vec_id", "embedding", k = 2,
      lloydIters = 2)
    val m = a.select("id", "cluster_id").as[(Long, Long)].collect().toMap
    assert(m.size == 20)
    val g1 = (0L until 10L).map(m).toSet
    val g2 = (10L until 20L).map(m).toSet
    assert(g1.size == 1 && g2.size == 1 && g1 != g2,
      s"blobs must land in distinct clusters whole: $m")
    // the spherical k-means objective (mean cosine to the assigned
    // centroid) never decreases under assign+average rounds
    def obj(iters: Int): Double =
      SimSearch.kmeansClusters(df, "vec_id", "embedding", 2, iters)
        .agg(avg(col("sim"))).head().getDouble(0)
    val o = (0 to 2).map(obj)
    assert(o(1) >= o(0) - 1e-12 && o(2) >= o(1) - 1e-12, s"objective fell: $o")
    // physical layout must not change a single assignment or sim
    val b = SimSearch.kmeansClusters(df.repartition(7), "vec_id", "embedding",
      2, 2)
    assert(b.collect().toSet == a.collect().toSet)
  }

  test("incrementalKmeansAssign: batch routes to the right cluster, state folds, redelivery byte-stable") {
    val blob1 = (0 until 10).map(i => (i.toLong,
      Array(1.0f, 0.02f * (i % 3), 0.0f, 0.0f)))
    val blob2 = (10 until 20).map(i => (i.toLong,
      Array(0.0f, 0.0f, 1.0f, 0.02f * (i % 2))))
    val init = (blob1 ++ blob2.take(5)).toDF("vec_id", "embedding")
    val batch = blob2.drop(5).toDF("vec_id", "embedding")

    val idx0 = SimSearch.buildKmIndex(init, "vec_id", "embedding", k = 2,
      lloydIters = 2)
    val c0 = SimSearch.kmCentroids(idx0)
    assert(c0.length == 2)
    // contribution counts equal the training memberships (10 + 5)
    assert(idx0.contrib.select(col("n")).as[Long].collect().sorted.toSeq ==
      Seq(5L, 10L))

    val (a1, idx1) = SimSearch.incrementalKmeansAssign(batch, "vec_id",
      "embedding", idx0, "b1")
    val m = a1.select("id", "cluster_id").as[(Long, Long)].collect().toMap
    assert(m.keySet == (15L until 20L).toSet)
    // all batch vectors (blob2) join blob2's training cluster
    val blob2Cluster = SimSearch.kmeansClusters(init, "vec_id", "embedding",
        2, 2).filter(col("id") === 10L)
      .select("cluster_id").head().getLong(0)
    assert(m.values.toSet == Set(blob2Cluster))
    // the fold moved blob2's centroid (absorbed 5 members), not blob1's
    val c1 = SimSearch.kmCentroids(idx1).toMap
    assert(c1(blob2Cluster) != c0.toMap.apply(blob2Cluster))
    assert(c1.keySet == c0.toMap.keySet)
    val other = (c0.toMap.keySet - blob2Cluster).head
    assert(c1(other) == c0.toMap.apply(other))

    // redelivery of the same batch_id: folds nothing (state byte-stable);
    // the assignment recomputes against the post-fold centroids, so sims
    // may shift but the routing stays put (an id-keyed sink converges)
    val (a1b, idx2) = SimSearch.incrementalKmeansAssign(batch, "vec_id",
      "embedding", idx1, "b1")
    assert(a1b.select("id", "cluster_id").as[(Long, Long)].collect().toMap == m)
    assert(SimSearch.kmCentroids(idx2).toSeq == SimSearch.kmCentroids(idx1).toSeq)
    // a FRESH batch_id with the same rows would double-count — the guard
    // is the id, which is the same contract the segment/HLL folds use
    assert(idx2.contrib.count() == idx1.contrib.count())
  }

  test("embeddingOutliers: exactly floor(n·frac) worst-sim rows flagged per cluster") {
    // blob + one noticeably off-axis vector per blob (still nearest to it)
    val rows =
      (0 until 9).map(i => (i.toLong, Array(1.0f, 0.02f * (i % 3), 0.0f, 0.0f))) ++
      Seq((9L, Array(1.0f, 0.6f, 0.0f, 0.3f))) ++
      (10 until 19).map(i => (i.toLong, Array(0.0f, 0.0f, 1.0f, 0.02f * (i % 2)))) ++
      Seq((19L, Array(0.3f, 0.0f, 1.0f, 0.6f)))
    val df = rows.toDF("vec_id", "embedding")
    val got = SimSearch.embeddingOutliers(df, "vec_id", "embedding", k = 2,
        frac = 0.2, lloydIters = 2)
      .select("id", "cluster_id", "sim", "is_outlier")
      .as[(Long, Long, Double, Boolean)].collect()
    assert(got.length == 20)
    val byCluster = got.groupBy(_._2)
    assert(byCluster.size == 2)
    for ((_, rs) <- byCluster) {
      val flagged = rs.filter(_._4)
      assert(flagged.length == math.floor(rs.length * 0.2).toInt)
      // every flagged sim is <= every kept sim
      val keptMin = rs.filterNot(_._4).map(_._3).min
      assert(flagged.forall(_._3 <= keptMin))
    }
    // the planted off-axis vectors are among the flagged
    val outIds = got.filter(_._4).map(_._1).toSet
    assert(outIds.contains(9L) && outIds.contains(19L), s"got $outIds")
  }

  test("clusterBalancedSample: quota caps head clusters, tail kept whole, picks dense") {
    // blob A: 12 vectors, blob B: 3 vectors; quota 5 caps A, keeps B whole
    val rows =
      (0 until 12).map(i => (i.toLong,
        Array(1.0f, 0.02f * (i % 3), 0.0f, 0.0f))) ++
      (12 until 15).map(i => (i.toLong,
        Array(0.0f, 0.0f, 1.0f, 0.02f * (i % 2))))
    val df = rows.toDF("vec_id", "embedding")
    val picked = SimSearch.clusterBalancedSample(df, "vec_id", "embedding",
        k = 2, perCluster = 5, lloydIters = 2)
      .select("id", "cluster_id", "pick").as[(Long, Long, Long)].collect()
    val byCluster = picked.groupBy(_._2)
    assert(byCluster.size == 2)
    for ((_, rs) <- byCluster) {
      assert(rs.length <= 5)
      // picks are dense from 1 — a downstream consumer can cut at any m
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq)
    }
    // the 3-vector tail cluster survives whole
    assert(byCluster.values.map(_.length).toSet == Set(5, 3))
    // sample rows are a subset of the full assignment
    val full = SimSearch.kmeansClusters(df, "vec_id", "embedding", 2, 2)
      .select("id", "cluster_id").as[(Long, Long)].collect().toSet
    assert(picked.map(t => (t._1, t._2)).toSet.subsetOf(full))
  }

  test("semDedupParamsFor: reproduces the tuned profile shape and scales planes with log n") {
    // n=500 @ θ=0.4: r = ceil(log2(500/64)) = 3 planes; recall bound at
    // p = 1 - acos(0.4)/π ≈ 0.631 → p³ ≈ 0.251 → 11 tables for 0.95
    assert(SimSearch.semDedupParamsFor(500, 0.4) == ((11, 3)))
    // at θ=0.4 the one-long (63-bit) budget binds: more planes would need
    // more tables than fit, so the helper returns the largest fitting r
    // instead of overflowing — occupancy then grows with n (the documented
    // trade; multiple bucket words would lift it)
    assert(SimSearch.semDedupParamsFor(500000L, 0.4) == ((11, 3)))
    // at a higher similarity threshold the per-plane collision p is larger,
    // banding is cheaper, and the log-n plane scaling fits the budget:
    // 1000× the corpus → more planes per table, occupancy held
    val (l1, r1) = SimSearch.semDedupParamsFor(500L, 0.7)
    val (lK, rK) = SimSearch.semDedupParamsFor(500000L, 0.7)
    assert(rK > r1 && rK * lK <= 63)
    // the recall bound the table count was solved for is actually met
    def recall(theta: Double, l: Int, r: Int): Double = {
      val p = 1.0 - math.acos(theta) / math.Pi
      1.0 - math.pow(1.0 - math.pow(p, r), l)
    }
    assert(recall(0.7, l1, r1) >= 0.95 && recall(0.7, lK, rK) >= 0.95)
    assert(recall(0.4, 11, 3) >= 0.95)
    // looser similarity thresholds collide less per plane → more tables
    val (lLoose, _) = SimSearch.semDedupParamsFor(500L, 0.2)
    assert(lLoose >= 11)
  }

  test("portable incremental dedup: empty index degenerates to portableDedupAssignments") {
    val docs = Tables.load(spark, sf(), "documents")
    val (assign, idx) = Dedup.portableIncrementalAssignments(docs, "doc_id",
      "text", Dedup.emptyPortableIndex(spark))
    val batch = Dedup.portableDedupAssignments(docs, "doc_id", "text")
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "keeper_id", "max_est_jaccard")
        .as[(Long, Long, Option[Double])].collect().toSet
    assert(snap(assign) == snap(batch) && snap(assign).nonEmpty)
    // the delta indexes keepers only, in the portable hash family's types
    assert(idx.signatures.schema("sig").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))
    val keepers = assign.filter(col("keeper_id") === col("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(idx.signatures.select("doc_id").as[Long].collect().toSet == keepers)
  }

  test("incremental semantic dedup: empty index degenerates to the bucketed batch algorithm") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val (assign, _) = SimSearch.incrementalSemanticAssignments(
      emb, "vec_id", "embedding", SimSearch.emptySemIndex(spark),
      threshold = 0.4, tables = 12, planesPerTable = 3, dim = 64)
    val batch = SimSearch.semanticDedupAssignmentsBucketed(
      emb, "vec_id", "embedding", 0.4, tables = 12, planesPerTable = 3, dim = 64)
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "keeper_id", "max_sim_r6")
        .as[(Long, Long, Option[Double])].collect().toSet
    val a = snap(assign); val b = snap(batch)
    assert(a == b && a.nonEmpty)
  }

  test("incremental semantic dedup: cross-batch dups map first-seen; index holds keepers only") {
    val base = Array.tabulate(64)(i => 0.1f * ((i % 7) + 1))
    val near = base.clone(); near(0) += 0.001f
    val far = Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val other = Array.tabulate(64)(i => ((i % 5) - 2).toFloat)

    val b1 = Seq((5L, base), (6L, far)).toDF("vec_id", "embedding")
    val (a1, idx1) = SimSearch.incrementalSemanticAssignments(
      b1, "vec_id", "embedding", SimSearch.emptySemIndex(spark),
      threshold = 0.95, tables = 12, planesPerTable = 3, dim = 64)
    assert(a1.filter(col("vec_id") === col("keeper_id")).count() == 2)
    assert(idx1.entries.select("vec_id").as[Long].collect().toSet == Set(5L, 6L))

    // batch 2: a near-copy of vec 5 with a SMALLER id + a fresh vector —
    // first-seen semantics must pick the corpus keeper 5, not id order
    val b2 = Seq((2L, near), (9L, other)).toDF("vec_id", "embedding")
    val (a2, idx2) = SimSearch.incrementalSemanticAssignments(
      b2, "vec_id", "embedding", idx1,
      threshold = 0.95, tables = 12, planesPerTable = 3, dim = 64)
    val m = a2.select("vec_id", "keeper_id").as[(Long, Long)].collect().toMap
    assert(m == Map(2L -> 5L, 9L -> 9L))
    // only the kept vector extends the index (no ghost keepers)
    assert(idx2.entries.select("vec_id").as[Long].collect().toSeq == Seq(9L))

    // idempotent replay against the same index
    val (a2b, _) = SimSearch.incrementalSemanticAssignments(
      b2, "vec_id", "embedding", idx1,
      threshold = 0.95, tables = 12, planesPerTable = 3, dim = 64)
    assert(a2b.select("vec_id", "keeper_id").as[(Long, Long)].collect().toMap == m)
  }

  test("image perceptual hash: near-identical images pair within maxDist, unrelated don't, undecodable skip") {
    import graft.ext.Multimodal
    def png(f: (Int, Int) => Int, w: Int = 36, h: Int = 32): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = f(x, y) & 0xFF
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", baos))
      baos.toByteArray
    }
    val base = png((x, _) => x * 7)                                  // smooth gradient
    val tweaked = png((x, y) => if (x < 2 && y < 2) 255 else x * 7)  // small bright patch
    val reversed = png((x, _) => 255 - x * 7)                        // opposite gradients
    val assets = Seq(
      (1L, "image", base), (2L, "image", tweaked), (3L, "image", reversed),
      (4L, "image", Array[Byte](1, 2, 3)),  // undecodable → skipped
      (5L, "audio", base))                  // wrong modality → filtered
      .toDF("asset_id", "modality", "content")
    val hashes = Multimodal.imageHashes(assets)
    val hs = hashes.as[(Long, Long)].collect().toMap
    assert(hs.keySet == Set(1L, 2L, 3L))
    // hashes are a pure function of pixels: partitioning-independent
    assert(Multimodal.imageHashes(assets.repartition(4))
      .as[(Long, Long)].collect().toMap == hs)
    val pairs = Multimodal.imageNearDups(hashes, maxDist = 6)
      .as[(Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    // the patch moves exactly one 9×8 cell comparison → tiny Hamming
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) <= 6,
      s"hashes ${hs.view.mapValues(_.toBinaryString).toMap}, pairs $pairs")
    // the reversed gradient flips every gradient bit — no pair survives
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("image near-dup under REAL JPEG recompression: 60 lossy plants, precision 1.0, recall 1.0 at hamming <= 7") {
    import graft.ext.Multimodal
    // 60 distinct base images: random 9x8 cell grids (36x32 px — 4-pixel
    // cells, so one JPEG 8x8 DCT block spans FOUR dHash cells and its
    // quantization error genuinely bleeds across gradient boundaries;
    // horizontal neighbors only ~>= 25 luma apart, a thin margin); their
    // lossy variants are ACTUAL JPEG re-encodes at quality 0.25 — block
    // ringing and chroma subsampling included — not synthetic bit flips
    def cells(seed: Int): Array[Array[Int]] = {
      val rnd = new scala.util.Random(seed)
      val cs = Array.tabulate(8, 9) { (_, _) => 0 }.map { row =>
        var prev = -1000
        row.map { _ =>
          var v = 15 + rnd.nextInt(9) * 25 // 15, 40, ..., 215
          while (math.abs(v - prev) < 25) v = 15 + rnd.nextInt(9) * 25
          prev = v; v
        }
      }
      // plant LOW-CONTRAST neighbor pairs (the flat regions real photos
      // have): six gradient bits per image sit within +-3 luma, where
      // JPEG quantization error is larger than the margin — these are
      // the bits recompression may legitimately flip
      for (r <- Seq(0, 3, 6); c <- Seq(2, 6))
        cs(r)(c + 1) = math.max(0, math.min(255,
          cs(r)(c) + rnd.nextInt(7) - 3))
      cs
    }
    def render(cs: Array[Array[Int]]): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        36, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 36) {
        val v = cs(y / 4)(x / 4)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    def asPng(img: java.awt.image.BufferedImage): Array[Byte] = {
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", baos))
      baos.toByteArray
    }
    def asJpeg(img: java.awt.image.BufferedImage, quality: Float): Array[Byte] = {
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val p = w.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(quality)
      val baos = new java.io.ByteArrayOutputStream()
      w.setOutput(javax.imageio.ImageIO.createImageOutputStream(baos))
      w.write(null, new javax.imageio.IIOImage(img, null, null), p)
      w.dispose()
      baos.toByteArray
    }
    val n = 60
    val assets = (0 until n).flatMap { i =>
      val img = render(cells(7001 + i))
      Seq((i.toLong, "image", asPng(img)),
        (1000L + i, "image", asJpeg(img, 0.25f)))
    }.toDF("asset_id", "modality", "content")

    val hashes = Multimodal.imageHashes(assets)
    assert(hashes.count() == 2L * n, "every payload (PNG and JPEG) decodes")
    val pairs = Multimodal.imageNearDups(hashes, maxDist = 7)
      .as[(Long, Long, Long)].collect()
    val truth = (0 until n).map(i => (i.toLong, 1000L + i)).toSet
    val found = pairs.map(p => (p._1, p._2)).toSet
    // precision 1.0: no cross-image pair sneaks under the threshold
    assert(found.subsetOf(truth),
      s"false positives: ${found -- truth}")
    // recall 1.0: every real lossy variant is recovered
    assert(found == truth,
      s"missed plants: ${truth -- found} (of ${truth.size})")
    // and the lossy variation is genuinely nonzero but inside tolerance:
    // record the measured distance profile
    val dists = pairs.map(_._3)
    assert(dists.forall(d => d >= 0 && d <= 7), dists.mkString(","))
    // the tolerance is genuinely exercised: recompression flipped bits
    // on at least some plants (distance 0 everywhere would mean the
    // setup was too easy to probe the hamming band at all)
    assert(dists.max >= 1, "JPEG q=0.25 produced zero bit flips — " +
      "tighten margins so the tolerance is actually exercised")
    info(s"JPEG q=0.25 hamming distances: min=${dists.min} max=${dists.max} " +
      s"mean=${dists.sum.toDouble / dists.length}")
  }

  test("audio fingerprints: same loudness profile pairs, different profile doesn't, undecodable skips") {
    import javax.sound.sampled._
    import graft.ext.Multimodal
    // REAL WAVs: 8 kHz mono 16-bit, frames alternating between two
    // amplitude levels — mass lands in exactly two histogram bins
    def wav(loA: Double, loB: Double, jitterEvery: Int = 0): Array[Byte] = {
      val frames = 800
      val pcm = new Array[Byte](frames * 2)
      for (i <- 0 until frames) {
        val base = if (i % 2 == 0) loA else loB
        val amp = if (jitterEvery > 0 && i % jitterEvery == 0) base + 0.004
                  else base
        val v = (amp * 32767 * (if (i % 4 < 2) 1 else -1)).toInt
        pcm(2 * i) = (v & 0xFF).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      }
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val baos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong),
        AudioFileFormat.Type.WAVE, baos)
      baos.toByteArray
    }
    val assets = Seq(
      (1L, "audio", wav(0.25, 0.75)),                   // bins ~16 and ~48
      (2L, "audio", wav(0.25, 0.75, jitterEvery = 100)), // same profile + jitter
      (3L, "audio", wav(0.10, 0.90)),                   // bins ~6 and ~57
      (4L, "audio", "not audio".getBytes),              // undecodable → skipped
      (5L, "image", wav(0.25, 0.75)))                   // wrong modality
      .toDF("asset_id", "modality", "content")
    val hashes = Multimodal.audioHashes(assets)
    val hs = hashes.as[(Long, Long)].collect().toMap
    assert(hs.keySet == Set(1L, 2L, 3L))
    val pairs = Multimodal.hashNearDups(hashes, maxDist = 3)
      .as[(Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) <= 3,
      s"hashes ${hs.view.mapValues(_.toBinaryString).toMap}")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("video frame-hash near-dup: shared footage pairs with exact Jaccard, unrelated footage doesn't") {
    import graft.ext.Multimodal
    // distinct high-contrast JPEG frames (period varies per seed, so
    // frame fingerprints differ; identical bytes reused across videos
    // decode to identical hashes)
    def jpegFrame(seed: Int): Array[Byte] = {
      val (w, h) = (36, 32)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = ((x * (seed + 2) * 5) % 256 + 256) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", baos))
      baos.toByteArray
    }
    val shared = (0 until 4).map(jpegFrame)
    val aviA = aviBytes(shared, 40000)
    val aviA2 = aviBytes(shared.take(3) :+ jpegFrame(20), 40000)
    val aviB = aviBytes((10 until 14).map(jpegFrame), 40000)
    val assets = Seq(
      (1L, "video", aviA), (2L, "video", aviA2), (3L, "video", aviB),
      (4L, "video", "not an avi".getBytes))
      .toDF("asset_id", "modality", "content")
    val fh = Multimodal.videoFrameHashes(assets)
    val byAsset = fh.as[(Long, Int, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._3).toSet).toMap
    assert(byAsset.keySet == Set(1L, 2L, 3L))
    // every per-video fingerprint set is full-size (frames distinct)
    assert(byAsset.values.forall(_.size == 4), byAsset.toString)
    val pairs = Multimodal.videoNearDups(fh, minShared = 2L)
      .as[(Long, Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4))).toMap
    // A and A' share exactly the 3 reused frames: Jaccard 3/(4+4−3)
    assert(pairs((1L, 2L)) == ((3L, 3.0 / 5.0)), pairs.toString)
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }
}
